"""Semantic invariants of the training-set assembly operators
(queries/training.py) — properties the DuckDB value parity can't state:
packing bin contiguity, interleave balance, funnel reconciliation, and
an independent numpy re-derivation of the k-means assignment.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rust_cdc_spark.queries import load_all
from rust_cdc_spark.queries.training import _CTX_TOKENS, _K_CENTROIDS, _N_SHARDS
from tests.conftest import SF_SMOKE

REGISTRY = load_all()


def run(spark, name):
    return REGISTRY[name].spark_fn(spark, SF_SMOKE)


class TestPackSequences:
    def test_bins_contiguous_and_budget_consistent(self, spark):
        rows = run(spark, "pack_sequences").collect()
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r.shard_id, []).append(r)
        assert set(by_shard) <= set(range(_N_SHARDS))
        for shard, docs in by_shard.items():
            total = sum(d.n_tokens for d in docs)
            bins = {d.bin_id for d in docs}
            # chunked packing: last bin is exactly the one the final
            # cumulative token lands in; bins form a contiguous range
            assert max(bins) == (total - 1) // _CTX_TOKENS, shard
            assert bins == set(range(max(bins) + 1)), shard

    def test_every_doc_assigned_once(self, spark):
        df = run(spark, "pack_sequences")
        assert df.count() == df.select("doc_id").distinct().count()


class TestMixtureInterleave:
    def test_global_pos_is_permutation(self, spark):
        rows = run(spark, "mixture_interleave").collect()
        pos = sorted(r.global_pos for r in rows)
        assert pos == list(range(1, len(rows) + 1))

    def test_first_block_is_one_per_source(self, spark):
        """Round-robin fairness: the first |sources| positions are the
        rank-1 docs — one per source, no source twice."""
        rows = run(spark, "mixture_interleave").collect()
        n_sources = len({r.source for r in rows})
        head = sorted(rows, key=lambda r: r.global_pos)[:n_sources]
        assert {r.source for r in head} == {r.source for r in rows}
        assert all(r.rank_in_source == 1 for r in head)

    def test_within_source_rank_order(self, spark):
        rows = run(spark, "mixture_interleave").collect()
        by_source: dict[str, list] = {}
        for r in rows:
            by_source.setdefault(r.source, []).append(r)
        for docs in by_source.values():
            docs.sort(key=lambda r: r.global_pos)
            assert [d.rank_in_source for d in docs] == list(
                range(1, len(docs) + 1)
            )


class TestCurationPipeline:
    def test_funnel_reconciles(self, spark):
        rows = run(spark, "curation_pipeline").collect()
        docs = REGISTRY["text_stats"].spark_fn(spark, SF_SMOKE).count()
        assert sum(r.n_docs for r in rows) == docs
        for r in rows:
            assert 0 <= r.n_kept <= r.n_pass_filters <= r.n_docs
            if r.n_kept == 0:
                assert r.kept_quality_sum == 0.0 and r.kept_tokens == 0
            else:
                assert r.kept_tokens > 0
                assert 0.0 <= r.kept_quality_sum <= r.n_kept


class TestKmeansAssign:
    def test_matches_numpy_argmin(self, spark):
        """Full independent re-derivation: numpy L2 argmin over the same
        seed centroids must agree on every assignment and distance."""
        from rust_cdc_spark.sources.tables import load_table

        emb = {
            r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in load_table(spark, "embeddings", SF_SMOKE).collect()
        }
        cents = {cid: emb[cid] for cid in range(_K_CENTROIDS)}
        got = {
            r.vec_id: (r.cluster_id, r.dist)
            for r in run(spark, "embedding_kmeans_assign").collect()
        }
        assert set(got) == set(emb)
        for vid, v in emb.items():
            dists = {c: float(np.linalg.norm(v - cv)) for c, cv in cents.items()}
            want_c = min(dists, key=lambda c: (dists[c], c))
            assert got[vid][0] == want_c, vid
            assert math.isclose(got[vid][1], round(dists[want_c], 4), abs_tol=1e-4)

    def test_centroids_self_assign(self, spark):
        rows = {r.vec_id: r for r in run(spark, "embedding_kmeans_assign").collect()}
        for cid in range(_K_CENTROIDS):
            assert rows[cid].cluster_id == cid
            assert rows[cid].dist == 0.0


class TestClusterProfile:
    def test_sizes_and_purity(self, spark):
        prof = run(spark, "embedding_cluster_profile").collect()
        assign = run(spark, "embedding_kmeans_assign").collect()
        sizes: dict[int, int] = {}
        for r in assign:
            sizes[r.cluster_id] = sizes.get(r.cluster_id, 0) + 1
        assert {r.cluster_id: r.n_vecs for r in prof} == sizes
        for r in prof:
            assert 0.0 < r.label_purity <= 1.0
            assert r.dist_sum >= 0.0


class TestVocab:
    def test_top_tokens_ranked_and_fractional(self, spark):
        rows = sorted(
            run(spark, "vocab_top_tokens").collect(), key=lambda r: r.rank
        )
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        ns = [r.n for r in rows]
        assert ns == sorted(ns, reverse=True)
        assert all(0.0 < r.corpus_frac <= 1.0 for r in rows)
        # fractions of the whole corpus: the head can't exceed 100%
        # (each row rounds to 6 decimals, so allow n·5e-7 upward drift)
        assert sum(r.corpus_frac for r in rows) <= 1.0 + len(rows) * 5e-7

    def test_bpe_pairs_match_brute_force(self, spark):
        """Independent Python recount of weighted pair frequencies."""
        from collections import Counter

        from rust_cdc_spark.sources.tables import load_table

        texts = [
            r.text for r in load_table(spark, "documents", SF_SMOKE).collect()
        ]
        counts: Counter = Counter()
        for t in texts:
            for tok in t.strip().split(" "):
                tok = tok.lower()
                for i in range(len(tok) - 1):
                    counts[tok[i : i + 2]] += 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        got = sorted(
            run(spark, "bpe_merge_candidates").collect(), key=lambda r: r.rank
        )
        assert [(r.pair, r.n) for r in got] == want


class TestGapFill:
    def test_forward_fill_matches_python_replay(self, spark):
        """Independent per-user replay: bucket aggregation, grid
        expansion, and forward-fill recomputed in plain Python."""
        from collections import defaultdict

        from pyspark.sql import functions as F

        from rust_cdc_spark.sources.tables import load_table

        ev = load_table(spark, "events", SF_SMOKE).select(
            "user_id", F.expr("CAST(ts AS LONG) div 21600").alias("b"), "value"
        )
        agg: dict = defaultdict(lambda: [0, 0.0])
        for r in ev.collect():
            a = agg[(r.user_id, r.b)]
            a[0] += 1
            a[1] += r.value
        per_user: dict = defaultdict(dict)
        for (u, b), (n, s) in agg.items():
            per_user[u][b] = (n, round(s, 2))
        want = {}
        for u, buckets in per_user.items():
            last = None
            for b in range(min(buckets), max(buckets) + 1):
                n, s = buckets.get(b, (0, None))
                if s is not None:
                    last = s
                want[(u, b)] = (n, last, b not in buckets)
        got = {
            (r.user_id, r.bucket): (r.n_events, r.filled_sum, r.is_gap)
            for r in run(spark, "events_gap_fill").collect()
        }
        assert set(got) == set(want)
        for k, (n, s, gap) in want.items():
            gn, gs, ggap = got[k]
            assert gn == n and ggap == gap, k
            assert (gs is None) == (s is None), k
            if s is not None:
                assert abs(gs - s) < 1e-6, k


class TestChunking:
    def test_every_token_covered_and_strides_align(self, spark):
        from rust_cdc_spark.queries.training import (
            _CHUNK_STRIDE,
            _CHUNK_TOKENS,
        )
        from rust_cdc_spark.sources.tables import load_table

        n_tokens = {
            r.doc_id: len(r.text.strip().split(" "))
            for r in load_table(spark, "documents", SF_SMOKE).collect()
        }
        by_doc: dict[int, list] = {}
        for r in run(spark, "chunk_documents_overlap").collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(n_tokens)
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r.chunk_id)
            nt = n_tokens[doc_id]
            want_chunks = max(0, -(-(nt - _CHUNK_TOKENS) // _CHUNK_STRIDE)) + 1
            assert len(chunks) == want_chunks, doc_id
            for r in chunks:
                assert r.start_tok == r.chunk_id * _CHUNK_STRIDE
                assert r.n_chunk_tokens == min(_CHUNK_TOKENS, nt - r.start_tok)
            # full coverage: last chunk reaches the end of the doc
            last = chunks[-1]
            assert last.start_tok + last.n_chunk_tokens == nt, doc_id


class TestClusterBalancedSample:
    def test_quota_and_membership(self, spark):
        from rust_cdc_spark.queries.training import _PER_CLUSTER

        assign = {
            r.vec_id: r.cluster_id
            for r in run(spark, "embedding_kmeans_assign").collect()
        }
        picks: dict[int, list] = {}
        for r in run(spark, "cluster_balanced_sample").collect():
            assert assign[r.vec_id] == r.cluster_id, r.vec_id
            picks.setdefault(r.cluster_id, []).append(r.pick)
        sizes: dict[int, int] = {}
        for cid in assign.values():
            sizes[cid] = sizes.get(cid, 0) + 1
        for cid, ps in picks.items():
            want = min(_PER_CLUSTER, sizes[cid])
            assert sorted(ps) == list(range(1, want + 1)), cid


class TestTrainValTestSplit:
    def test_partition_and_stability(self, spark):
        rows = run(spark, "train_val_test_split").collect()
        by_split: dict[str, int] = {}
        for r in rows:
            by_split[r.split] = by_split.get(r.split, 0) + 1
        assert set(by_split) <= {"train", "val", "test"}
        # ~80/10/10 at corpus size (binomial tolerance)
        n = len(rows)
        assert by_split.get("train", 0) > 0.6 * n
        # pure function of doc_id: re-running yields identical splits
        again = {r.doc_id: r.split for r in run(spark, "train_val_test_split").collect()}
        assert {r.doc_id: r.split for r in rows} == again

    def test_no_shuffle(self, spark):
        from rust_cdc_spark.plans import explain as X

        assert X.count_exchanges(run(spark, "train_val_test_split")) == 0


class TestEmbeddingProjection:
    """embedding_jl_project + embedding_pca_abtt: numpy ground truth for
    the linear algebra the oracle replays relationally."""

    def _emb(self, spark):
        from rust_cdc_spark.sources.tables import load_table

        rows = load_table(spark, "embeddings", SF_SMOKE).collect()
        ids = [r.vec_id for r in rows]
        X = np.array([r.embedding for r in rows], dtype=np.float64)
        return ids, X

    def test_jl_matches_numpy_exact_integers(self, spark):
        from rust_cdc_spark.queries.training import _JL, _JL_OUT

        ids, X = self._emb(spark)
        Q = np.round(X * 1e6).astype(np.int64)
        S = np.array(_JL, dtype=np.int64)  # [out][in]
        want = Q @ S.T  # exact int64
        got = {r.vec_id: r for r in run(spark, "embedding_jl_project").collect()}
        for k, vid in enumerate(ids):
            for j in range(_JL_OUT):
                assert got[vid][f"p{j:02d}"] == want[k][j]

    def test_jl_is_near_isometric(self, spark):
        """JL's point: projected distances concentrate around true
        distances (×sqrt(d_out) scale). Loose bound at d_out=16."""
        ids, X = self._emb(spark)
        Q = np.round(X * 1e6).astype(np.int64)
        from rust_cdc_spark.queries.training import _JL

        P = (Q @ np.array(_JL, dtype=np.int64).T).astype(np.float64)
        rng = np.random.RandomState(7)
        idx = rng.choice(len(ids), size=(200, 2))
        ratios = []
        for a, b in idx:
            if a == b:
                continue
            dt = np.linalg.norm(Q[a] - Q[b])
            dp = np.linalg.norm(P[a] - P[b]) / math.sqrt(len(_JL))
            ratios.append(dp / dt)
        med = float(np.median(ratios))
        assert 0.7 < med < 1.3

    def test_pca_components_capture_top_variance(self, spark):
        """The learned directions capture near-maximal variance of the
        micro-quantized covariance (Rayleigh quotient ≥ 0.95·λmax — on
        this synthetic corpus the spectrum is Marchenko-Pastur-flat, so
        *direction* identity with eigh is ill-posed but variance capture
        is not), are unit-norm, near-orthogonal, and the λ estimate
        agrees with the Rayleigh quotient."""
        from rust_cdc_spark.operators import pca as PCA

        _, X = self._emb(spark)
        emb = __import__(
            "rust_cdc_spark.sources.tables", fromlist=["load_table"]
        ).load_table(spark, "embeddings", SF_SMOKE)
        n, S, M = PCA.moment_stats(emb)
        mean, comps = PCA.train_components(n, S, M)
        Q = np.round(X * 1e6) / 1e6
        C = np.cov(Q.T, bias=True)
        evals = np.linalg.eigvalsh(C)
        v1 = np.array(comps[0][1])
        v2 = np.array(comps[1][1])
        assert abs(np.linalg.norm(v1) - 1.0) < 1e-9
        assert abs(np.linalg.norm(v2) - 1.0) < 1e-9
        rq1 = float(v1 @ C @ v1)
        assert rq1 >= 0.95 * evals[-1], (rq1, evals[-1])
        assert abs(comps[0][0] - rq1) < 0.05 * rq1
        # v2 maximizes variance on the deflated matrix → near-⊥ to v1
        assert abs(float(v1 @ v2)) < 0.1
        rq2 = float(v2 @ C @ v2)
        assert rq2 >= 0.9 * evals[-2], (rq2, evals[-2])

    def test_pca_energy_conservation(self, spark):
        """pc1² + pc2² + resid² == ||x − mean||² per vector (micro
        rounding tolerance) and residual never exceeds centered norm."""
        from rust_cdc_spark.operators import pca as PCA

        ids, X = self._emb(spark)
        emb = __import__(
            "rust_cdc_spark.sources.tables", fromlist=["load_table"]
        ).load_table(spark, "embeddings", SF_SMOKE)
        n, S, M = PCA.moment_stats(emb)
        mean, comps = PCA.train_components(n, S, M)
        got = {r.vec_id: r for r in run(spark, "embedding_pca_abtt").collect()}
        Q = np.round(X * 1e6) / 1e6
        cent = Q - np.array(mean)
        for k, vid in enumerate(ids):
            r = got[vid]
            lhs = (
                (r.pc1_micro / 1e6) ** 2
                + (r.pc2_micro / 1e6) ** 2
                + (r.resid_micro / 1e6) ** 2
            )
            rhs = float(np.dot(cent[k], cent[k]))
            assert abs(lhs - rhs) < 1e-3, (vid, lhs, rhs)
            assert r.resid_micro >= 0
