"""Large-scale training-data pipeline queries: dedup, text analysis,
similarity search over the ``documents`` and ``embeddings`` tables.

Design rule: everything is a pure column expression or a key-partitioned
shuffle — no driver-side loops, no Python UDFs in the hot path. Hash
functions are md5 (bit-exact across engines) so the DuckDB oracle can
verify even the MinHash path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rust_cdc_spark.functions import text as TX
from rust_cdc_spark.functions import vectors as V
from rust_cdc_spark.queries import register
from rust_cdc_spark.sources.tables import load_table

_SW_SQL = "['the','a','an','and','of','to','in','is','it','that']"
_TOKENS_SQL = "string_split(trim(text), ' ')"


@register(
    "dedup_exact_documents",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           min(doc_id) AS canonical_id,
           count(*)    AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical fingerprint (md5 of normalized text) →
    hash-groupBy. Map-side partial agg means the shuffle carries one row
    per distinct fingerprint, not per document — the 100 TB-safe shape."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(TX.fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS INT) AS n_tokens,
           CAST(length(text) AS INT)       AS n_chars,
           round(CAST(len(list_filter({_TOKENS_SQL},
                         t -> list_contains({_SW_SQL}, lower(t)))) AS DOUBLE)
                 / len({_TOKENS_SQL}), 4)  AS stopword_ratio,
           round(CAST(list_sum(list_transform({_TOKENS_SQL}, t -> length(t))) AS DOUBLE)
                 / len({_TOKENS_SQL}), 4)  AS avg_token_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + per-document text statistics — pure codegen map
    stage (higher-order array functions, no UDF)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.char_count("text").alias("n_chars"),
        F.round(TX.stopword_ratio("text"), 4).alias("stopword_ratio"),
        F.round(TX.avg_token_len("text"), 4).alias("avg_token_len"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len({_TOKENS_SQL}) AS DOUBLE) AS tc,
               CAST(len(list_filter({_TOKENS_SQL},
                        t -> list_contains({_SW_SQL}, lower(t)))) AS DOUBLE)
                   / len({_TOKENS_SQL}) AS sw,
               CAST(list_sum(list_transform({_TOKENS_SQL}, t -> length(t))) AS DOUBLE)
                   / len({_TOKENS_SQL}) AS atl
        FROM documents
    )
    SELECT doc_id,
           round(0.4 * least(tc / 64.0, 1.0)
                 + 0.4 * least(sw * 4.0, 1.0)
                 + 0.2 * (CASE WHEN atl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END),
                 4) AS quality
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality scoring (length saturation + stopword fluency +
    token-length sanity) — the filter stage of a pretraining pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", TX.quality_score("text").alias("quality"))


@register(
    "lang_id_heuristic",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN CAST(len(list_filter({_TOKENS_SQL},
                          t -> list_contains({_SW_SQL}, lower(t)))) AS DOUBLE)
                     / len({_TOKENS_SQL}) >= 0.08
                THEN 'en' ELSE 'other' END AS lang_pred
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-coverage language ID (the n-gram-model column slot)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", "lang", TX.lang_id("text").alias("lang_pred"))


@register(
    "similarity_topk_cosine",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id,
               round(
                 list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv)
                 / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                          list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id
    LIMIT 10
    """,
)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against a query vector (vec_id=0): the
    exactness baseline for ANN. The query vector is a 1-row broadcast
    cross join; scoring is a codegen'd map; top-k is
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(V.cosine(F.col("embedding"), F.col("qv")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


@register(
    "dedup_ngram_jaccard_pairs",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingle_set
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.shingle_set, b.shingle_set)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingle_set, b.shingle_set))), 4)
               AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingle_set, b.shingle_set)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingle_set, b.shingle_set))) >= 0.5
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by 3-gram Jaccard ≥ 0.5.

    Scale shape: an inverted-index join (explode shingles → equi-join on
    shingle → per-pair intersection counts) instead of the O(n²) cross
    join — only pairs sharing ≥1 shingle are ever materialized. The
    oracle states the same semantics as a (small-data) pairwise join.
    """
    docs = load_table(spark, "documents", sf_dir)
    sh = docs.select(
        "doc_id",
        F.array_distinct(TX.shingles("text", 3)).alias("shingle_set"),
    )
    sizes = sh.select("doc_id", F.size("shingle_set").alias("set_size"))
    inv = sh.select("doc_id", F.explode("shingle_set").alias("shingle"))
    # Inverted-index self-join: pairs co-occurring in ≥1 shingle bucket.
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "set_size": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "set_size": "size_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
