"""Behavioral tests for the round-7 operator batch: invariants oracle
parity can't see (cross-query consistency, composition identities).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.queries import load_all

SF = "/root/testdata/sf0.001"
SF1 = "/root/testdata/sf0.01"
REG = load_all()


def rows(spark, name, sf=SF):
    return REG[name].spark_fn(spark, sf).collect()


class TestCurationPipeline:
    def test_funnel_is_monotone(self, spark):
        """Each stage only removes documents: n_docs >= n_corpus >=
        url >= quality >= exact >= fuzzy >= kept >= 0 for every
        source — the alive_k = alive_{k-1} AND pass_k invariant."""
        out = rows(spark, "corpus_curation_pipeline", SF1)
        assert out
        for r in out:
            funnel = [
                r.n_docs, r.n_corpus, r.n_after_url, r.n_after_quality,
                r.n_after_exact, r.n_after_fuzzy, r.n_kept,
            ]
            assert all(a >= b for a, b in zip(funnel, funnel[1:])), r
            assert r.n_kept >= 0

    def test_checksum_tracks_survivors(self, spark):
        """survivor_checksum > 0 iff any doc survived (benchmark
        holdout removes doc_id 0, so every survivor id is > 0)."""
        for r in rows(spark, "corpus_curation_pipeline", SF1):
            assert (r.survivor_checksum > 0) == (r.n_kept > 0), r

    def test_weights_normalize_in_ppm(self, spark):
        """Floor-divided ppm weights sum into (1e6 - |sources|, 1e6]
        when anything survives — the integer-normalization contract
        shared with mixture_temperature_weights."""
        out = rows(spark, "corpus_curation_pipeline", SF1)
        kept_total = sum(r.n_kept for r in out)
        if kept_total == 0:
            assert all(r.weight_ppm is None for r in out)
            return
        total = sum(r.weight_ppm for r in out)
        assert 1_000_000 - len(out) < total <= 1_000_000

    def test_url_stage_matches_standalone(self, spark):
        """Stage-1 survivors equal url_normalize_dedup's kept set
        restricted to the benchmark-holdout corpus: the composed DAG
        reproduces the standalone operator's semantics."""
        from rust_cdc_spark.queries.curation import _BENCH_MOD

        url = REG["url_normalize_dedup"].spark_fn(spark, SF1)
        docs = REG["corpus_curation_pipeline"].spark_fn(spark, SF1)
        # standalone keeps min doc_id over ALL docs; the pipeline keeps
        # min over corpus (non-holdout) docs — counts agree on groups
        # whose canonical min is itself a corpus doc, and the composed
        # per-source total n_after_url can never exceed the standalone
        # canonical-group count.
        n_groups = url.count()
        n_after_url = sum(
            r.n_after_url for r in docs.collect()
        )
        assert 0 < n_after_url <= n_groups
