"""Multimodal-column queries: binary payload plumbing, Arrow-batched
feature extraction, frame-sample planning (operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_spark.operators import multimodal as MM
from rust_cdc_spark.queries import register
from rust_cdc_spark.sources.tables import load_table


@register(
    "multimodal_payload_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           'image' AS media_type
    FROM documents
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing check: documents → opaque payload + typed
    metadata struct; byte length computed on the binary column."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.col("meta.media_type").alias("media_type"),
    )


@register(
    "multimodal_feature_extract",
    # The stub feature is deterministic integer byte math: bucket j of the
    # dim=8 feature is sum(bytes at positions i ≡ j mod 8) / n_bytes. The
    # corpus text is pure ASCII (asserted in pytest), so byte i ==
    # unicode(substr(text, i, 1)). Output is posexploded to scalar columns
    # so the driver's canonicalizer can sort/hash it.
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) AS INT) AS n_bytes,
           CAST((i - 1) % 8 AS INT) AS pos,
           CAST(CAST(sum(unicode(substr(text, i, 1))) AS DOUBLE)
                / length(text) AS FLOAT) AS value
    FROM documents
    CROSS JOIN LATERAL (
        SELECT unnest(generate_series(1, length(text))) AS i
    )
    GROUP BY doc_id, length(text), (i - 1) % 8
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (deterministic
    stub model — the real codec slots in per operators/multimodal.py).
    The array<float> feature is posexploded to (media_id, n_bytes, pos,
    value) rows — scalar columns the driver harness can canonicalize, and
    a value-level DuckDB oracle checks the byte math end-to-end."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    feats = MM.extract_features(media, dim=8)
    return feats.select(
        "media_id",
        "n_bytes",
        F.posexplode("feature").alias("pos", "value"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT event_id AS media_id, f.frame_ts_ms
    FROM events,
         LATERAL (SELECT unnest(generate_series(0, CAST(value * 1000 AS BIGINT), 500))
                  AS frame_ts_ms) f
    WHERE event_id % 50 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan: each 'video' (synthesized from events with
    duration = value seconds) expands to frame timestamps every 500 ms —
    map-side explode, no shuffle, no UDF."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 50 == 0)
    media = ev.select(
        F.col("event_id").alias("media_id"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("mp4").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("value") * 1000).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    return MM.frame_sample_plan(media, every_ms=500)


@register(
    "multimodal_resize",
    # The stub resize stride-subsamples the payload to 256 bytes:
    # resized[i] = payload[int(i * n/256)] when n >= 256, else the payload
    # zero-padded. byte_sum over the resized payload checks that math
    # value-for-value (zero padding adds 0 → plain byte sum). Text is
    # pure ASCII so byte i == unicode(substr(text, i, 1)); the float64
    # stride product is the same IEEE op in both engines.
    oracle="""
    SELECT doc_id AS media_id,
           CAST(256 AS INT) AS n_bytes,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(sum(unicode(substr(
               text, CAST(floor(i * (length(text) / 256.0)) AS INT) + 1, 1
           ))) AS BIGINT) AS byte_sum
    FROM documents
    CROSS JOIN LATERAL (SELECT unnest(generate_series(0, 255)) AS i)
    WHERE length(text) >= 256
    GROUP BY doc_id
    UNION ALL
    SELECT doc_id,
           CAST(256 AS INT),
           CAST(16 AS INT),
           CAST(16 AS INT),
           CAST(sum(unicode(substr(text, i, 1))) AS BIGINT)
    FROM documents
    CROSS JOIN LATERAL (SELECT unnest(generate_series(1, length(text))) AS i)
    WHERE length(text) < 256
    GROUP BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image resize plumbing (deterministic stub codec):
    every image payload re-emitted at 16x16 with updated metadata,
    schema-identical to the input so resize stages chain. The emitted
    byte_sum folds the resized payload JVM-side (hex → per-byte conv —
    codegen, no UDF) so the DuckDB oracle checks the subsample math
    value-for-value, not just row counts."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    return MM.resize_images(media, width=16, height=16).select(
        "media_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.expr(
            "aggregate(transform(sequence(1, length(payload)),"
            " i -> cast(conv(substr(hex(payload), i*2-1, 2), 16, 10) as bigint)),"
            " 0L, (a, x) -> a + x)"
        ).alias("byte_sum"),
    )
