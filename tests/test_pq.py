"""Product quantization (operators/pq.py): compression, determinism,
training progress, recall of the ADC+rerank pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_cdc_spark.operators import pq as PQ
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

M, K, DIM = 8, 16, 64


@pytest.fixture(scope="module")
def corpus(spark):
    return load_table(spark, "embeddings", SF_SMOKE).cache()


@pytest.fixture(scope="module")
def trained(corpus):
    cb = PQ.train_pq(corpus, m=M, k=K, dim=DIM, iters=3)
    codes = PQ.encode_pq(corpus, cb).cache()
    return cb, codes


class TestTrainEncode:
    def test_codebook_shape(self, trained):
        cb, _ = trained
        assert len(cb) == M
        assert all(len(c) == K for c in cb)
        assert all(len(v) == DIM // M for c in cb for v in c)

    def test_codes_are_valid_and_complete(self, corpus, trained):
        _, codes = trained
        assert codes.count() == corpus.count()
        stats = codes.select(
            F.min(F.array_min("codes")).alias("lo"),
            F.max(F.array_max("codes")).alias("hi"),
            F.min(F.size("codes")).alias("m"),
        ).first()
        assert stats.lo >= 0 and stats.hi < K and stats.m == M

    def test_encoding_deterministic_given_codebook(self, corpus, trained):
        cb, _ = trained
        a = {r.vec_id: list(r.codes) for r in PQ.encode_pq(corpus, cb).collect()}
        b = {r.vec_id: list(r.codes) for r in PQ.encode_pq(corpus, cb).collect()}
        assert a == b

    def test_compression_factor(self, trained):
        _, codes = trained
        # m int8-range codes vs dim float32s
        raw, compressed = DIM * 4, M  # bytes per vector
        assert raw / compressed == 32.0

    def test_training_reduces_quantization_error(self, corpus):
        def qerr(cb):
            C = [np.asarray(c) for c in cb]
            codes = {
                r.vec_id: r.codes
                for r in PQ.encode_pq(corpus, cb).collect()
            }
            err = 0.0
            for r in corpus.collect():
                v = np.asarray(r.embedding, dtype=np.float64)
                rec = np.concatenate([C[j][codes[r.vec_id][j]] for j in range(M)])
                err += float(((v - rec) ** 2).sum())
            return err

        cb0 = PQ.train_pq(corpus, m=M, k=K, dim=DIM, iters=0)  # init only
        cb3 = PQ.train_pq(corpus, m=M, k=K, dim=DIM, iters=3)
        assert qerr(cb3) < qerr(cb0) * 0.8


class TestAdcScan:
    def test_adc_approximates_exact_distance(self, corpus, trained):
        cb, codes = trained
        V = {r.vec_id: np.asarray(r.embedding, float) for r in corpus.collect()}
        p = V[0]
        adc = {
            r.vec_id: r.adc_micro
            for r in PQ.pq_topk(codes, cb, [float(x) for x in p],
                                k=len(V)).collect()
        }
        # Spearman-ish sanity: correlation between adc and exact ranks
        ids = sorted(V)
        exact = np.array([((V[i] - p) ** 2).sum() for i in ids])
        approx = np.array([adc[i] for i in ids])
        r = np.corrcoef(exact, approx)[0, 1]
        assert r > 0.6, f"ADC/exact correlation too low: {r}"

    def test_rerank_recall(self, corpus, trained):
        cb, codes = trained
        V = {r.vec_id: np.asarray(r.embedding, float) for r in corpus.collect()}
        n = len(V)
        recalls = []
        for pid in [0, 1, 17]:
            p = V[pid]
            exact = set(
                sorted(V, key=lambda i: ((V[i] - p) ** 2).sum())[:10]
            )
            pool = [
                r.vec_id
                for r in PQ.pq_topk(codes, cb, [float(x) for x in p],
                                    k=max(64, n // 3)).collect()
            ]
            reranked = sorted(pool, key=lambda i: ((V[i] - p) ** 2).sum())[:10]
            recalls.append(len(exact & set(reranked)) / 10)
        assert sum(recalls) / len(recalls) >= 0.8, recalls

    def test_scan_is_codegen_only(self, trained):
        from rust_cdc_spark.plans import explain as X

        cb, codes = trained
        probe = [0.5] * DIM
        # the index is a stored table in practice — truncate the encode
        # lineage so the plan under test is the scan alone
        out = PQ.pq_topk(codes.localCheckpoint(), cb, probe, k=10)
        assert not X.has_python_eval(out)
        assert X.uses_top_k(out)


class TestIvfPq:
    @pytest.fixture(scope="class")
    def ivf_pq(self, spark, corpus, trained):
        from rust_cdc_spark.operators.similarity import kmeans_centroids

        cb, _ = trained
        coarse = kmeans_centroids(corpus, 8, DIM, iters=2, seed=42)
        index = PQ.build_ivf_pq_index(corpus, coarse, cb).cache()
        return coarse, cb, index

    def test_index_shape(self, corpus, ivf_pq):
        _, _, index = ivf_pq
        assert index.count() == corpus.count()
        stats = index.select(
            F.min("cid").alias("lo"), F.max("cid").alias("hi"),
            F.countDistinct("cid").alias("cells"),
        ).first()
        assert stats.lo >= 0 and stats.hi < 8 and stats.cells >= 4

    def test_probe_scans_fraction_of_index(self, spark, ivf_pq):
        coarse, cb, index = ivf_pq
        probe = [0.5] * DIM
        # at n_probe=2 of 8 cells, the candidate scan sees well under
        # the full corpus
        import numpy as np

        from rust_cdc_spark.operators.similarity import _unit_rows

        Cn = _unit_rows(coarse)
        p = np.asarray(probe); pn = p / np.linalg.norm(p)
        cells = [int(c) for c in np.argsort(-(Cn @ pn))[:2]]
        scanned = index.filter(F.col("cid").isin(cells)).count()
        assert 0 < scanned < index.count()

    def test_ivf_pq_rerank_recall(self, corpus, ivf_pq):
        coarse, cb, index = ivf_pq
        V = {r.vec_id: np.asarray(r.embedding, float) for r in corpus.collect()}
        n = len(V)
        recalls = []
        for pid in [0, 1, 17]:
            p = V[pid]
            exact = set(sorted(V, key=lambda i: ((V[i] - p) ** 2).sum())[:10])
            pool = [
                r.vec_id
                for r in PQ.ivf_pq_topk(
                    index, coarse, cb, [float(x) for x in p],
                    n_probe=6, k=max(64, n // 3),
                ).collect()
            ]
            reranked = sorted(pool, key=lambda i: ((V[i] - p) ** 2).sum())[:10]
            recalls.append(len(exact & set(reranked)) / 10)
        assert sum(recalls) / len(recalls) >= 0.6, recalls

    def test_scan_stays_codegen(self, ivf_pq):
        from rust_cdc_spark.plans import explain as X

        coarse, cb, index = ivf_pq
        out = PQ.ivf_pq_topk(
            index.localCheckpoint(), coarse, cb, [0.5] * DIM
        )
        assert not X.has_python_eval(out)
        assert X.uses_top_k(out)
