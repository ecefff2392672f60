"""Tests for the scale-hardening operators: salted aggregation/join
equivalence, one-pass column stats, snapshot compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rust_cdc_spark.operators.skew import salted_agg, salted_join
from rust_cdc_spark.operators.stats import column_stats
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


class TestSalting:
    def test_salted_agg_equals_plain(self, spark):
        ev = load_table(spark, "events", SF_SMOKE)
        plain = {
            (r.user_id,): (r.n, round(r.total, 6))
            for r in ev.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
            .collect()
        }
        salted = salted_agg(
            ev,
            ["user_id"],
            partial_aggs=[F.count("*").alias("c"), F.sum("value").alias("s")],
            final_aggs=[
                F.sum("c").alias("n"),
                F.round(F.sum("s"), 6).alias("total"),
            ],
            n_salts=8,
            unique_col="event_id",
        )
        got = {(r.user_id,): (r.n, round(r.total, 6)) for r in salted.collect()}
        assert got == plain

    def test_salted_join_equals_plain(self, spark):
        li = load_table(spark, "lineitem", SF_SMOKE)
        sup = load_table(spark, "supplier", SF_SMOKE).select(
            F.col("s_suppkey").alias("l_suppkey"), "s_name"
        )
        plain = li.join(sup, on=["l_suppkey"]).count()
        salted = salted_join(
            li, sup, on=["l_suppkey"], n_salts=4, big_unique_col="l_orderkey"
        )
        assert salted.count() == plain
        assert "__salt" not in salted.columns

    def test_salted_join_outer_modes_equal_plain(self, spark):
        """Replication-aware right/full outer: an unmatched small-side
        row must surface exactly once, not once per salt."""
        big = spark.createDataFrame(
            [(1, "k1"), (2, "k1"), (3, "k2")], "rid long, k string"
        )
        small = spark.createDataFrame(
            [("k1", "a"), ("k3", "c")], "k string, v string"
        )
        key = lambda r: (r.rid if r.rid is not None else -1, r.k, r.v or "")  # noqa: E731
        for how in ("right", "full"):
            plain = sorted(
                map(key, big.join(small, on=["k"], how=how).collect())
            )
            salted = sorted(
                map(key, salted_join(
                    big, small, on=["k"], n_salts=4,
                    big_unique_col="rid", how=how,
                ).collect())
            )
            assert salted == plain, how

    def test_salted_join_rejects_semi_anti(self, spark):
        import pytest

        li = load_table(spark, "lineitem", SF_SMOKE)
        sup = load_table(spark, "supplier", SF_SMOKE).select(
            F.col("s_suppkey").alias("l_suppkey"), "s_name"
        )
        for how in ("left_semi", "left_anti"):
            with pytest.raises(ValueError, match="salted_join supports"):
                salted_join(
                    li, sup, on=["l_suppkey"], n_salts=4,
                    big_unique_col="l_orderkey", how=how,
                )


class TestColumnStats:
    def test_stats_against_duckdb(self, spark):
        import duckdb

        cust = load_table(spark, "customer", SF_SMOKE)
        got = {
            r.column: (r.n_rows, r.n_nulls, r.min_str, r.max_str)
            for r in column_stats(cust, ["c_custkey", "c_name", "c_acctbal"]).collect()
        }
        want = duckdb.sql(
            f"""SELECT count(*), min(c_custkey), max(c_custkey),
                       min(c_name), max(c_name),
                       min(c_acctbal), max(c_acctbal)
                FROM '{SF_SMOKE}/customer.parquet'"""
        ).fetchone()
        n = want[0]
        assert got["c_custkey"] == (n, 0, str(want[1]), str(want[2]))
        assert got["c_name"] == (n, 0, want[3], want[4])
        assert got["c_acctbal"][0] == n
        assert float(got["c_acctbal"][2]) == want[5]
        assert float(got["c_acctbal"][3]) == want[6]


class TestCompaction:
    def test_compact_reduces_files(self, spark, tmp_path):
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        table = ParquetUpsertTable(str(tmp_path / "t"), ["id"])
        df = spark.range(10000).select(
            F.col("id"), (F.col("id") % 7).alias("grp")
        ).repartition(16)
        table.overwrite(df)
        snap0 = table._snapshot_dir(table.version())
        files0 = [f for f in os.listdir(snap0) if f.endswith(".parquet")]
        assert len(files0) == 16

        table.compact(spark, target_file_bytes=10 * 1024 * 1024)
        snap1 = table._snapshot_dir(table.version())
        files1 = [f for f in os.listdir(snap1) if f.endswith(".parquet")]
        assert len(files1) == 1  # tiny table → one right-sized file
        assert table.read(spark).count() == 10000


    def test_compact_zorder_clusters_both_columns(self, spark, tmp_path):
        from rust_cdc_spark.operators.layout import file_pruning_fraction
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        table = ParquetUpsertTable(str(tmp_path / "z"), ["id"])
        # two uncorrelated dimensions
        df = spark.range(20000).select(
            F.col("id"), ((F.col("id") * 2654435761) % 20000).alias("h")
        )
        table.overwrite(df.repartition(8))
        table.compact(spark, target_file_bytes=8_000, zorder_by=["id", "h"])
        snap = table._snapshot_dir(table.version())
        files = [f for f in os.listdir(snap) if f.endswith(".parquet")]
        # ≥16 files → ≥2 Morton bits per dimension; with 8 files the
        # second dimension gets a single bit and caps near 50% pruning
        assert len(files) >= 12, f"{len(files)} files: pruning test needs more"
        # a narrow scan on EITHER column can skip most files; average a
        # few window positions so no single z-curve seam decides it
        def avg_prune(col):
            fr = [
                file_pruning_fraction(snap, col, lo, lo + 600)
                for lo in (3000, 9000, 15000)
            ]
            return sum(fr) / len(fr)

        p_id = avg_prune("id")
        p_h = avg_prune("h")
        assert p_id >= 0.4, p_id
        assert p_h >= 0.4, p_h
        assert table.read(spark).count() == 20000


class TestDuplicationProofPairs:
    """The rep-collapse optimization must be output-identical to the
    naive all-pairs computation on a corpus WITH duplicate texts."""

    def _dup_corpus(self, spark):
        docs = load_table(spark, "documents", SF_SMOKE).limit(40)
        copies = docs.select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
            "source", "n_chars",
        )
        return docs.unionByName(copies)

    def test_jaccard_rep_equals_direct(self, spark):
        from rust_cdc_spark.operators.dedup import (
            _jaccard_pairs_direct,
            jaccard_pairs,
        )

        corpus = self._dup_corpus(spark)
        fast = {
            (r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(corpus).collect()
        }
        naive = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in _jaccard_pairs_direct(corpus, "text", "doc_id", 3, 0.5).collect()
        }
        assert fast == naive
        assert len(fast) >= 40  # every duplicated doc pairs with its copy

    def test_jaccard_df_cap_generous_is_identical(self, spark):
        """A cap no shingle reaches must not change ANY output value —
        the verification join is exact, not an approximation."""
        from rust_cdc_spark.operators.dedup import jaccard_pairs

        corpus = self._dup_corpus(spark)
        uncapped = {
            (r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(corpus).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(corpus, df_cap=10_000).collect()
        }
        assert capped == uncapped



    def test_prefix_filter_equals_inverted_index(self, spark):
        """PPJoin prefix filtering must reproduce jaccard_pairs EXACTLY
        (pair set and scores) — on the duplicated corpus and on the
        hot-shingle corpus where every doc shares boilerplate."""
        from rust_cdc_spark.operators.dedup import (
            jaccard_pairs,
            jaccard_pairs_prefix,
        )

        for corpus in (self._dup_corpus(spark), self._boiler_corpus(spark)):
            full = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in jaccard_pairs(corpus, threshold=0.5).collect()
            }
            pref = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in jaccard_pairs_prefix(corpus, threshold=0.5).collect()
            }
            assert pref == full

    def test_positional_filter_is_lossless(self, spark):
        """The r10 PPJoin positional filter must not change the output
        pair set or any score — asserted against the positional=False
        (r9) path on the REAL corpus at two SFs plus both synthetic
        corpora (the Hilbert-style engine-equality guard demanded by
        VERDICT r9 #2 before switching the default)."""
        from rust_cdc_spark.operators.dedup import jaccard_pairs_prefix
        from rust_cdc_spark.sources.tables import load_table
        from tests.conftest import SF_CORRECT

        corpora = [
            self._dup_corpus(spark),
            self._boiler_corpus(spark),
            load_table(spark, "documents", SF_SMOKE),
            load_table(spark, "documents", SF_CORRECT),
        ]
        for corpus in corpora:
            with_pos = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in jaccard_pairs_prefix(
                    corpus, threshold=0.5, positional=True
                ).collect()
            }
            without = {
                (r.doc_a, r.doc_b): r.jaccard
                for r in jaccard_pairs_prefix(
                    corpus, threshold=0.5, positional=False
                ).collect()
            }
            assert with_pos == without

    def _boiler_corpus(self, spark):
        boiler = " subscribe to our newsletter for updates"
        rows = [(i, f"unique document body number {i} talks about topic {i}"
                 + boiler) for i in range(60)]
        for i in range(3):
            rows.append((100 + i, f"unique document body number {i} talks about topic {i} extra{boiler}"))
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_prefix_filter_generates_fewer_candidates(self, spark):
        """Realistic crawl shape: boilerplate is a small fraction of
        each page. The full inverted index pays |bucket|² on the shared
        sentence (all-pairs candidates); the df-ascending prefix cut —
        which fits inside each doc's rare shingles when boilerplate is
        < (1−t) of the doc — must structurally avoid it (≥10× fewer
        candidate pairs). NOTE: when boilerplate dominates a doc
        (> 1−t of its shingles), the prefix legitimately reaches hot
        shingles — the lemma trades candidates for losslessness, it is
        not a cap (see _boiler_corpus, where short bodies make prefix
        == full)."""
        from pyspark.sql import functions as F
        from rust_cdc_spark.operators.dedup import (
            _hashed_inverted_index,
            _jaccard_prefix_direct,
            shingle_sets,
        )

        boiler = " subscribe to our newsletter for updates today"
        rows = [
            (
                i,
                " ".join(f"w{i}x{j}" for j in range(20)) + boiler,
            )
            for i in range(60)
        ]
        for i in range(3):  # 3 true near-dups of docs 0..2
            rows.append(
                (
                    100 + i,
                    " ".join(f"w{i}x{j}" for j in range(20))
                    + " extra"
                    + boiler,
                )
            )
        corpus = spark.createDataFrame(rows, ["doc_id", "text"])
        inv = _hashed_inverted_index(shingle_sets(corpus))
        a, b = inv.alias("a"), inv.alias("b")
        full_cand = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )
        # candidate count of the prefix path = verified rows pre-filter
        pref_cand = _jaccard_prefix_direct(
            corpus, "text", "doc_id", 3, 0.5
        ).count()
        assert pref_cand * 10 <= full_cand, (pref_cand, full_cand)

    def test_jaccard_df_cap_hot_shingle_corpus(self, spark):
        """Every doc shares one boilerplate sentence (the |bucket|² hazard).
        With a cap the hot shingles leave candidate generation, but true
        near-dup pairs (sharing rare shingles) keep their exact scores."""
        from rust_cdc_spark.operators.dedup import jaccard_pairs

        boiler = " subscribe to our newsletter for updates"
        rows = [(i, f"unique document body number {i} talks about topic {i}"
                 + boiler) for i in range(60)]
        # 3 true near-dup pairs: same rare body, tiny difference
        for i in range(3):
            rows.append((100 + i, f"unique document body number {i} talks about topic {i} extra{boiler}"))
        corpus = spark.createDataFrame(rows, ["doc_id", "text"])
        uncapped = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(corpus, threshold=0.5).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(corpus, threshold=0.5, df_cap=10).collect()
        }
        assert capped == uncapped  # hot-only overlaps score < 0.5 anyway
        assert {(i, 100 + i) for i in range(3)} <= set(capped)

    def test_containment_catches_embedded_doc_jaccard_misses(self, spark):
        """The asymmetric score's reason to exist: a short doc wholly
        embedded in a much longer one has containment 1.0 but Jaccard
        ≈ |A|/|B| < 0.5 — a Jaccard-keyed dedup pass keeps both."""
        from rust_cdc_spark.operators.dedup import (
            containment_pairs,
            jaccard_pairs,
        )

        quote = "the quick brown fox jumps over the lazy dog tonight"
        filler = " ".join(f"filler{i} word{i} body{i}" for i in range(40))
        corpus = spark.createDataFrame(
            [(1, quote), (2, quote + " " + filler), (3, filler)],
            ["doc_id", "text"],
        )
        cont = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(corpus, threshold=0.8).collect()
        }
        jac = {
            (r.doc_a, r.doc_b)
            for r in jaccard_pairs(corpus, threshold=0.5).collect()
        }
        assert cont[(1, 2)] == 1.0  # quote ⊂ long doc
        assert (1, 2) not in jac  # symmetric score misses it
        assert (2, 3) in cont  # filler ⊂ long doc too
        assert (1, 3) not in cont  # disjoint texts

    def test_containment_rep_collapse_and_cap_are_exact(self, spark):
        """Rep-collapse + a generous df_cap must be output-identical to
        the direct uncapped computation (same contract as Jaccard's)."""
        from rust_cdc_spark.operators.dedup import (
            _pair_intersections,
            containment_pairs,
        )

        corpus = self._dup_corpus(spark)
        fast = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(corpus, threshold=0.8).collect()
        }
        capped = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(
                corpus, threshold=0.8, df_cap=10_000
            ).collect()
        }
        naive = {
            (r.doc_a, r.doc_b): round(r.n_common / min(r.size_a, r.size_b), 4)
            for r in _pair_intersections(
                corpus, "text", "doc_id", 3
            ).collect()
            if r.n_common / min(r.size_a, r.size_b) >= 0.8
        }
        assert fast == naive == capped
        assert len(fast) >= 40  # every duplicated doc pairs with its copy

    def test_parallelize_is_noop_on_already_parallel_input(self, spark):
        """At scale the scan arrives already split (maxPartitionBytes);
        _parallelize must then NOT round-robin-shuffle the raw text. On a
        narrow local scan it still fans out."""
        from rust_cdc_spark.operators.dedup import _parallelize

        n = spark.sparkContext.defaultParallelism
        docs = load_table(spark, "documents", SF_SMOKE)
        wide = docs.repartition(n + 4)
        assert _parallelize(wide, None) is wide  # no-op, no new Exchange
        narrow = docs.coalesce(1)
        out = _parallelize(narrow, None)
        assert out.rdd.getNumPartitions() == n

    def test_minhash_rep_equals_direct(self, spark):
        from rust_cdc_spark.operators.dedup import (
            _minhash_lsh_direct,
            minhash_lsh_pairs,
        )

        corpus = self._dup_corpus(spark)
        fast = {
            (r.doc_a, r.doc_b): r.sim_est
            for r in minhash_lsh_pairs(corpus, num_hashes=16, bands=4).collect()
        }
        naive = {
            (r.doc_a, r.doc_b): r.sim_est
            for r in _minhash_lsh_direct(corpus, "text", "doc_id", 3, 16, 4).collect()
        }
        assert fast == naive


class TestDedupClusters:
    def test_components_match_union_find(self, spark):
        """Distributed min-label propagation vs an in-test union-find on
        the same pair set (duplicated corpus → non-trivial components)."""
        from rust_cdc_spark.operators.dedup import (
            connected_components,
            jaccard_pairs,
        )

        docs = load_table(spark, "documents", SF_SMOKE).limit(60)
        corpus = docs.unionByName(
            docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text",
                        "lang", "source", "n_chars")
        ).unionByName(
            docs.select((F.col("doc_id") + 2000).alias("doc_id"), "text",
                        "lang", "source", "n_chars")
        )
        pairs = [(r.doc_a, r.doc_b) for r in jaccard_pairs(corpus).collect()]
        assert pairs, "expected near-dup pairs in the tripled corpus"

        parent = {}
        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for a, b in pairs:
            union(a, b)
        want = {x: find(x) for x in parent}
        # canonicalize: min element of each set
        roots = {}
        for x in want:
            r = find(x)
            roots.setdefault(r, []).append(x)
        expected = {x: min(m) for r, m in roots.items() for x in m}

        got = {
            r.node: r.cluster_id
            for r in connected_components(
                jaccard_pairs(corpus)
            ).collect()
        }
        assert got == expected

    def test_dedup_clusters_canonicals(self, spark):
        from rust_cdc_spark.operators.dedup import dedup_clusters

        docs = load_table(spark, "documents", SF_SMOKE).limit(30)
        corpus = docs.unionByName(
            docs.select((F.col("doc_id") + 500).alias("doc_id"), "text",
                        "lang", "source", "n_chars")
        )
        out = dedup_clusters(corpus).collect()
        assert len(out) == 60
        canon = [r for r in out if r.is_canonical]
        # every duplicated doc joins its copy's cluster → at most 30
        # clusters (fewer if base docs are near-dups of each other, which
        # does happen in the synthetic corpus)
        assert 1 <= len(canon) <= 30
        # no copy (id >= 500) may ever be canonical — its base doc has a
        # smaller id and identical text
        assert all(r.doc_id < 500 for r in canon)
        for r in out:
            assert r.cluster_id <= r.doc_id
