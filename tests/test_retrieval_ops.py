"""Semantic invariants for the retrieval / model-based-curation queries
(`queries/retrieval.py` + the batch-3 additions in `queries/curation.py`).

Oracle parity (tests/test_oracle_parity.py) already proves value
equality vs DuckDB; these tests pin the *meaning* of the results — rank
contiguity, monotonicity, formula consistency, keep/prune soundness —
so a future change that alters both engines in lockstep still can't
silently change semantics.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.queries import load_all
from rust_cdc_spark.queries.retrieval import _QUERY_TERMS, _RRF_K, _SEM_TAU
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_SMOKE)


class TestBM25:
    def test_ranks_contiguous_and_scores_descending(self, spark):
        rows = run(spark, "retrieval_bm25_topk").orderBy("rank").collect()
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.bm25 for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)

    def test_every_hit_contains_a_query_term(self, spark):
        hits = run(spark, "retrieval_bm25_topk").select("doc_id")
        docs = load_table(spark, "documents", SF_SMOKE)
        joined = hits.join(docs, "doc_id").collect()
        assert len(joined) == hits.count()
        for r in joined:
            toks = set(r.text.strip().lower().split(" "))
            assert toks & set(_QUERY_TERMS), r.doc_id


class TestTfidf:
    def test_per_doc_ranks_and_term_membership(self, spark):
        rows = run(spark, "retrieval_tfidf_top_terms").collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r.doc_id, []).append(r)
        docs = {
            r.doc_id: r.text
            for r in load_table(spark, "documents", SF_SMOKE).collect()
        }
        for doc_id, rs in per_doc.items():
            ranks = sorted(r.term_rank for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            by_rank = sorted(rs, key=lambda r: r.term_rank)
            vals = [r.tfidf for r in by_rank]
            assert vals == sorted(vals, reverse=True)
            toks = set(docs[doc_id].strip().lower().split(" "))
            assert all(r.token in toks for r in rs)


class TestRRF:
    def test_score_matches_rank_formula(self, spark):
        rows = run(spark, "retrieval_rrf_fusion").collect()
        for r in rows:
            expect = 0
            for rank in (r.lex_rank, r.sem_rank):
                if rank is not None:
                    expect += round(1e6 / (_RRF_K + rank))
            assert abs(r.rrf_score - expect / 1e6) < 1e-9, r
            assert r.lex_rank is not None or r.sem_rank is not None

    def test_fused_ranking_is_contiguous_and_descending(self, spark):
        rows = (
            run(spark, "retrieval_rrf_fusion").orderBy("rank").collect()
        )
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.rrf_score for r in rows]
        assert scores == sorted(scores, reverse=True)


class TestBigramLM:
    def test_logprob_negative_and_bigram_count(self, spark):
        rows = run(spark, "text_bigram_logprob").collect()
        docs = {
            r.doc_id: r.text
            for r in load_table(spark, "documents", SF_SMOKE).collect()
        }
        assert len(rows) == sum(
            1 for t in docs.values() if len(t.strip().split(" ")) >= 2
        )
        for r in rows:
            ntok = len(docs[r.doc_id].strip().split(" "))
            assert r.n_bigrams == ntok - 1
            assert r.sum_logp_micro < 0  # log-probs are negative
            # mean micro log-prob within the plausible LM range
            assert -20.0 < r.sum_logp_micro / 1e6 / r.n_bigrams < 0.0


class TestSemanticDedup:
    def test_cluster_min_is_kept_and_prunes_have_cause(self, spark):
        rows = run(spark, "semantic_dedup_prune").collect()
        emb = {
            r.vec_id: [float(x) for x in r.embedding]
            for r in load_table(spark, "embeddings", SF_SMOKE).collect()
        }
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for members in by_cluster.values():
            lowest = min(members, key=lambda r: r.vec_id)
            assert lowest.is_kept, "lowest id of a cluster can't be pruned"
            ids = sorted(r.vec_id for r in members)
            for r in members:
                if r.is_kept:
                    continue
                cause = False
                for other in ids:
                    if other >= r.vec_id:
                        break
                    a, b = emb[other], emb[r.vec_id]
                    dot = sum(x * y for x, y in zip(a, b))
                    na = math.sqrt(sum(x * x for x in a))
                    nb = math.sqrt(sum(x * x for x in b))
                    if dot / (na * nb) >= _SEM_TAU:
                        cause = True
                        break
                assert cause, f"{r.vec_id} pruned without a near neighbor"


class TestDsir:
    def test_target_slice_scores_higher_on_average(self, spark):
        w = run(spark, "dsir_importance_weights")
        docs = load_table(spark, "documents", SF_SMOKE).select(
            "doc_id", "source"
        )
        avg = (
            w.join(docs, "doc_id")
            .groupBy(F.col("source") == "src0")
            .agg(F.avg("dsir_logratio").alias("m"))
            .collect()
        )
        by = {r[0]: r.m for r in avg}
        # Importance weighting must tilt toward the target domain.
        assert by[True] > by[False]


class TestHistogramAndQuality:
    def test_histogram_partitions_the_corpus(self, spark):
        rows = run(spark, "doc_length_histogram").collect()
        n_docs = load_table(spark, "documents", SF_SMOKE).count()
        assert sum(r.n_docs for r in rows) == n_docs
        assert abs(sum(r.doc_frac for r in rows) - 1.0) < 1e-4
        assert all(r.bucket_lo % 32 == 0 for r in rows)

    def test_quality_prob_bounds_and_keep_rule(self, spark):
        rows = run(spark, "quality_logistic_score").collect()
        for r in rows:
            assert 0.0 < r.quality_prob < 1.0
            assert r.keep == (r.quality_prob >= 0.5)


class TestMMRRerank:
    """retrieval_mmr_rerank vs an independent pure-Python greedy MMR
    over the same micro-quantized integers."""

    def _reference(self, spark, probe_ids=(0, 1, 2), pool=8, k=4):
        from rust_cdc_spark.sources.tables import load_table

        rows = load_table(spark, "embeddings", SF_SMOKE).collect()
        q = {
            r.vec_id: [int(round(float(x) * 1e6)) for x in r.embedding]
            for r in rows
        }
        out = []
        for pid in probe_ids:
            pv = q[pid]
            rel = {
                vid: sum(a * b for a, b in zip(v, pv))
                for vid, v in q.items()
                if vid != pid
            }
            cands = sorted(rel, key=lambda v: (-rel[v], v))[:pool]
            sel = []
            for rank in range(1, k + 1):
                best = None
                for c in cands:
                    if c in [s[0] for s in sel]:
                        continue
                    if not sel:
                        score = 7 * rel[c]
                    else:
                        ms = max(
                            sum(a * b for a, b in zip(q[c], q[s[0]]))
                            for s in sel
                        )
                        score = 7 * rel[c] - 3 * ms
                    if best is None or (score, -c) > (best[1], -best[0]):
                        best = (c, score)
                sel.append(best)
                out.append((pid, best[0], rank, rel[best[0]], best[1]))
        return sorted(out)

    def test_matches_pure_python_greedy(self, spark):
        got = sorted(
            (r.query_id, r.cand_id, r.rank, r.rel, r.score)
            for r in run(spark, "retrieval_mmr_rerank").collect()
        )
        assert got == self._reference(spark)

    def test_selection_is_diverse_not_pure_topk(self, spark):
        """MMR must diverge from pure relevance ranking somewhere: at
        least one probe's selection order differs from its top-4 by
        rel (otherwise the diversity term is dead code at this data)."""
        rows = run(spark, "retrieval_mmr_rerank").collect()
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r.query_id, []).append(r)
        diverged = 0
        for pid, sel in by_probe.items():
            sel.sort(key=lambda r: r.rank)
            by_rel = sorted(sel, key=lambda r: (-r.rel, r.cand_id))
            if [r.cand_id for r in sel] != [r.cand_id for r in by_rel]:
                diverged += 1
        assert diverged >= 1, "MMR == top-k everywhere; penalty inert"

    def test_first_pick_is_top_relevance(self, spark):
        rows = run(spark, "retrieval_mmr_rerank").collect()
        pools = {}
        for r in rows:
            pools.setdefault(r.query_id, []).append(r)
        for pid, sel in pools.items():
            first = min(sel, key=lambda r: r.rank)
            assert first.rel == max(r.rel for r in sel)
            assert first.score == 7 * first.rel


class TestSemanticContamination:
    """contamination_semantic vs numpy nearest-benchmark ground truth."""

    def test_matches_numpy_argmax(self, spark):
        import numpy as np
        from rust_cdc_spark.sources.tables import load_table

        rows = load_table(spark, "embeddings", SF_SMOKE).collect()
        ids = np.array([r.vec_id for r in rows])
        Q = np.round(
            np.array([r.embedding for r in rows], dtype=np.float64) * 1e6
        )
        n2 = (Q * Q).sum(axis=1)
        bmask = ids % 97 == 0
        B, bids, bn2 = Q[bmask], ids[bmask], n2[bmask]
        got = {
            r.vec_id: (r.bench_id, r.cos_micro, r.contaminated)
            for r in run(spark, "contamination_semantic").collect()
        }
        assert len(got) == int((~bmask).sum())
        for k in np.nonzero(~bmask)[0]:
            dots = B @ Q[k]
            cm = np.round(
                dots / np.sqrt(n2[k]) / np.sqrt(bn2) * 1e6
            ).astype(np.int64)
            best = cm.max()
            bid = int(bids[cm == best].min())
            g = got[int(ids[k])]
            assert g[1] == best, (ids[k], g, best)
            assert g[0] == bid
            assert g[2] == (best >= 950_000)

    def test_benchmark_rows_are_excluded(self, spark):
        rows = run(spark, "contamination_semantic").collect()
        assert all(r.vec_id % 97 != 0 for r in rows)
        assert all(r.bench_id % 97 == 0 for r in rows)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
