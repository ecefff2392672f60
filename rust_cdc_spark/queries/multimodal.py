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


@register("multimodal_feature_extract", oracle=None)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (deterministic
    stub model — the real codec slots in per operators/multimodal.py).
    Rows-only check: byte-level feature math is not SQL-expressible."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    return MM.extract_features(media, dim=8)


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


@register("multimodal_resize", oracle=None)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image resize plumbing (deterministic stub codec):
    every image payload re-emitted at 16x16 with updated metadata,
    schema-identical to the input so resize stages chain. Rows-only
    check; payload determinism and metadata updates are asserted in
    pytest."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    return MM.resize_images(media, width=16, height=16).select(
        "media_id",
        F.length("payload").cast("int").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
