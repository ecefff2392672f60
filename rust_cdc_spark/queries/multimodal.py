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
        # Byte fold over regexp_extract_all's 2-char chunks, NOT over
        # sequence(1, length(payload)) with hex(payload) inside the
        # lambda: a lambda-body hex() re-hexes the WHOLE payload per
        # element (O(bytes²) per row — CollapseProject inlines any
        # hoisted alias used once, so a withColumn can't fix it). As a
        # function argument, hex() runs once per row; the chunk list is
        # the same byte pairs in the same order, so byte_sum is
        # value-identical (guide §1.2 per-task work; r9 paired
        # best-of-3 with the numpy resize runner: 3.63 s → 1.04 s
        # at sf0.1). One caveat (ADVICE r9): on a ZERO-LENGTH non-null
        # payload the old sequence(1, length) fold null-poisoned to
        # NULL while this form yields 0 — immaterial here because the
        # generator never emits empty texts (verified 0 rows with
        # length(text)=0 at all three SFs) and the resize stub always
        # emits 256 bytes, but a reuse against empty payloads should
        # know the NULL→0 divergence.
        F.expr(
            "aggregate(transform("
            " regexp_extract_all(hex(payload), '[0-9A-F]{2}', 0),"
            " h -> cast(conv(h, 16, 10) as bigint)),"
            " 0L, (a, x) -> a + x)"
        ).alias("byte_sum"),
    )


@register(
    "multimodal_dedup_exact",
    oracle="""
    SELECT doc_id AS media_id,
           md5(text) AS payload_md5,
           CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT)
               AS n_copies,
           (doc_id = min(doc_id) OVER (PARTITION BY md5(text)))
               AS is_canonical
    FROM documents
    """,
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by payload digest — the first pass of any
    image/video corpus pipeline (identical bytes re-crawled under many
    URLs). Each media row gets its content hash, its duplicate-group
    size, and a deterministic canonical flag (lowest media_id wins).

    Scale shape: md5 over the binary column is a map expression; group
    stats ride ONE window shuffle keyed on the digest. At 100 TB the
    digest (16 bytes) — not the payload — is what shuffles: project
    payload away before the exchange, as here."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    from pyspark.sql import Window

    w = Window.partitionBy("payload_md5")
    return (
        media.select(
            "media_id", F.md5("payload").alias("payload_md5")
        )
        .select(
            "media_id",
            "payload_md5",
            F.count("*").over(w).cast("bigint").alias("n_copies"),
            (F.col("media_id") == F.min("media_id").over(w)).alias(
                "is_canonical"
            ),
        )
    )


@register(
    "multimodal_phash_buckets",
    # Perceptual-hash shape with exact integer math: bucket j of the
    # 8-bit fingerprint is set iff 8 * byte_sum_j > Σ_k byte_sum_k
    # (i.e. bucket mean > overall mean; payload length cancels, so the
    # comparison is integer-exact cross-engine — no float boundary).
    # Text is pure ASCII, so byte i == unicode(substr(text, i, 1)).
    oracle="""
    WITH b AS (
        SELECT doc_id AS media_id, CAST((i - 1) % 8 AS INT) AS pos,
               sum(unicode(substr(text, i, 1))) AS s
        FROM documents
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, length(text))) AS i
        )
        GROUP BY doc_id, (i - 1) % 8
    ),
    t AS (SELECT media_id, sum(s) AS tot FROM b GROUP BY media_id),
    p AS (
        SELECT b.media_id,
               CAST(sum(CASE WHEN 8 * b.s > t.tot
                        THEN CAST(round(pow(2, b.pos)) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS phash
        FROM b JOIN t USING (media_id)
        GROUP BY b.media_id
    )
    SELECT media_id, phash,
           CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_bucket
    FROM p
    """,
)
def multimodal_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style near-dup bucketing over binary payloads:
    an 8-bit sign fingerprint (byte-bucket sum vs overall mean — the
    aHash/dHash family's shape, stubbed deterministic) plus each
    fingerprint's bucket population, the candidate-pair bound a
    near-dup join would pay.

    Scale shape: the fingerprint is a pure map stage — one Arrow-batched
    numpy pass over payload bytes (operators/multimodal.byte_bucket_sums;
    measured 5.7× over interpreted higher-order folds at sf0.1, gap
    linear in payload bytes) feeding exact integer comparisons; bucket
    sizes ride one window shuffle keyed on the 8-byte phash. Candidate
    generation from equal-phash buckets is exactly SimHash pigeonhole
    banding (operators/dedup.py) applied to media."""
    media = MM.documents_as_media(load_table(spark, "documents", sf_dir))
    sums = MM.byte_bucket_sums(media, dim=8)
    total = F.aggregate(
        "bucket_sums", F.lit(0).cast("long"), lambda a, x: a + x
    )
    phash = sum(
        F.when(
            8 * F.element_at("bucket_sums", j + 1) > F.col("__tot"),
            F.lit(1 << j),
        ).otherwise(0)
        for j in range(8)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("phash")
    return (
        sums.withColumn("__tot", total)
        .select("media_id", phash.cast("bigint").alias("phash"))
        .select(
            "media_id",
            "phash",
            F.count("*").over(w).cast("bigint").alias("n_bucket"),
        )
    )


@register(
    "multimodal_audio_frame_energy",
    # 8-bit PCM stand-in: byte i == unicode(substr(text, i, 1)) (corpus
    # is pure ASCII, asserted in pytest). Frame f covers 1-based char
    # positions f*160+1 .. f*160+400; energy = Σ byte².
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (
        SELECT doc_id, text,
               CAST(fi AS INT) AS frame_idx,
               CAST(fi * 160 AS BIGINT) AS start_sample
        FROM d, LATERAL unnest(
            range(0, CASE WHEN n >= 400 THEN 1 + (n - 400) // 160
                          ELSE 0 END)) AS r(fi)
    )
    SELECT doc_id AS media_id, frame_idx, start_sample,
           CAST(sum(unicode(substr(text, start_sample + i, 1))
                    * unicode(substr(text, start_sample + i, 1)))
                AS BIGINT) AS energy
    FROM f, LATERAL unnest(range(1, 401)) AS p(i)
    GROUP BY doc_id, frame_idx, start_sample
    """,
)
def multimodal_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing: short-time energy per 400-sample frame with a
    160-sample hop (the 50 ms/20 ms VAD-and-STFT framing at 8 kHz) over
    binary payloads — Arrow-batched mapInPandas with a cumulative
    sum-of-squares (operators/multimodal.py:audio_frame_energy); exact
    BIGINT energies value-checked against a character-arithmetic
    oracle."""
    audio = MM.documents_as_audio(load_table(spark, "documents", sf_dir))
    return MM.audio_frame_energy(audio, frame=400, hop=160)


@register(
    "multimodal_shot_boundaries",
    # boundary: relative energy change vs the previous frame ≥ 25%
    # (ppm arithmetic, integer-exact). Frame energies as in
    # multimodal_audio_frame_energy.
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (
        SELECT doc_id, text,
               CAST(fi AS INT) AS frame_idx,
               CAST(fi * 160 AS BIGINT) AS start_sample
        FROM d, LATERAL unnest(
            range(0, CASE WHEN n >= 400 THEN 1 + (n - 400) // 160
                          ELSE 0 END)) AS r(fi)
    ),
    e AS (
        SELECT doc_id, frame_idx,
               CAST(sum(unicode(substr(text, start_sample + i, 1))
                        * unicode(substr(text, start_sample + i, 1)))
                    AS BIGINT) AS energy
        FROM f, LATERAL unnest(range(1, 401)) AS p(i)
        GROUP BY doc_id, frame_idx
    ),
    lagged AS (
        SELECT doc_id, frame_idx, energy,
               lag(energy) OVER (PARTITION BY doc_id
                                 ORDER BY frame_idx) AS prev_e
        FROM e
    )
    SELECT doc_id AS media_id, frame_idx, energy,
           CAST(abs(energy - prev_e) * 1000000
                // greatest(energy, prev_e, 1) AS BIGINT) AS change_ppm
    FROM lagged
    WHERE prev_e IS NOT NULL
      AND abs(energy - prev_e) * 1000000
          // greatest(energy, prev_e, 1) >= 250000
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot/segment boundary detection over the framed energy signal:
    a frame whose energy moved ≥ 25% relative to its predecessor marks
    a boundary (the classic cut detector shape — swap energy for a
    frame-histogram distance and the plumbing is identical). Change is
    integer ppm of the larger energy, exact across engines.

    Scale shape: the lag window is PARTITIONED by media_id (frames per
    media are metadata-bounded — seconds × fps — so per-partition state
    is small); upstream framing is the Arrow-batched mapInPandas
    operator, map-side only."""
    audio = MM.documents_as_audio(load_table(spark, "documents", sf_dir))
    frames = MM.audio_frame_energy(audio, frame=400, hop=160)
    from pyspark.sql import Window

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    lagged = frames.withColumn("prev_e", F.lag("energy").over(w))
    change = F.expr(
        "abs(energy - prev_e) * 1000000 div greatest(energy, prev_e, 1L)"
    )
    return (
        lagged.filter(F.col("prev_e").isNotNull())
        .withColumn("change_ppm", change)
        .filter(F.col("change_ppm") >= 250000)
        .select("media_id", "frame_idx", "energy", "change_ppm")
    )
