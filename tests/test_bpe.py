"""BPE trainer equivalence and semantics (operators/bpe.py): the Spark
DataFrame training loop must match a brute-force Python implementation
of the public algorithm exactly — merges, order, and frequencies — and
the segmentation fold must respect greedy left-to-right overlap rules.
"""

from __future__ import annotations

from collections import Counter

from rust_cdc_spark.operators.bpe import (
    learn_bpe_merges,
    segment_tokens,
)
from rust_cdc_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _brute_force_bpe(token_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Reference implementation: symbol lists, overlap-counting pair
    stats, (freq desc, left, right) tie-break, greedy merge apply."""
    vocab = {t: list(t) for t in token_freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for t, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += token_freqs[t]
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append((left, right, n))
        for t, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[t] = out
    return merges, vocab


def _corpus_token_freqs(spark):
    texts = [r.text for r in load_table(spark, "documents", SF_SMOKE).collect()]
    freqs: Counter = Counter()
    for t in texts:
        for tok in t.strip().split(" "):
            if tok:  # empty tokens (consecutive spaces) are dropped by build_vocab
                freqs[tok.lower()] += 1
    return dict(freqs)


class TestLearnMerges:
    def test_matches_brute_force_on_corpus(self, spark):
        docs = load_table(spark, "documents", SF_SMOKE)
        got = learn_bpe_merges(docs, n_merges=8)
        want, _ = _brute_force_bpe(_corpus_token_freqs(spark), 8)
        assert got == want

    def test_greedy_overlap_semantics(self, spark):
        # 'aaaa' x10: first merge (a,a) with overlap-counted freq 30,
        # then (aa,aa) — the greedy fold must not double-consume
        docs = spark.createDataFrame(
            [(i, "aaaa") for i in range(10)], "doc_id long, text string"
        )
        merges = learn_bpe_merges(docs, n_merges=2)
        assert merges == [("a", "a", 30), ("aa", "aa", 10)]

    def test_min_freq_stops_training(self, spark):
        docs = spark.createDataFrame(
            [(0, "xy xy xy"), (1, "zq")], "doc_id long, text string"
        )
        merges = learn_bpe_merges(docs, n_merges=10, min_freq=2)
        # (x,y) appears 3x; (z,q) only once -> training stops after 1
        assert merges == [("x", "y", 3)]


class TestSegmentTokens:
    def test_segmentation_matches_brute_force(self, spark):
        docs = load_table(spark, "documents", SF_SMOKE)
        merges = learn_bpe_merges(docs, n_merges=6)
        _, vocab = _brute_force_bpe(_corpus_token_freqs(spark), 6)
        seg = segment_tokens(docs, merges)
        for r in seg.limit(2000).collect():
            assert list(r.pieces) == vocab[r.token], r.token

    def test_no_shuffle_in_pure_map_apply(self, spark):
        from rust_cdc_spark.plans import explain as X

        docs = load_table(spark, "documents", SF_SMOKE)
        seg = segment_tokens(
            docs, [("a", "b", 1), ("ab", "c", 1)], collapse_distinct=False
        )
        assert X.count_exchanges(seg) == 0
        assert not X.has_python_eval(seg)

    def test_vocab_collapse_equals_pure_map(self, spark):
        # the distinct-vocab fold + join-back (measured 13× at sf0.1)
        # must be row-identical to folding every token instance
        docs = load_table(spark, "documents", SF_SMOKE).limit(50)
        merges = [("t", "h", 1), ("th", "e", 1), ("e", "e", 1)]
        fast = segment_tokens(docs, merges)
        slow = segment_tokens(docs, merges, collapse_distinct=False)
        key = lambda r: (r.doc_id, r.token, tuple(r.pieces))  # noqa: E731
        assert sorted(map(key, fast.collect())) == sorted(
            map(key, slow.collect())
        )
        assert not X_has_python(fast)


def X_has_python(df):
    from rust_cdc_spark.plans import explain as X

    return X.has_python_eval(df)


class TestMergeFoldProperty:
    def test_property_fold_equals_python_greedy(self, spark):
        """The codegen fold must match greedy left-to-right merging on
        arbitrary symbol strings — overlaps, repeats, and all."""
        from hypothesis import given, settings, strategies as st

        from rust_cdc_spark.operators.bpe import _apply_merge
        from pyspark.sql import functions as F

        def py_greedy(syms, left, right):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        @settings(max_examples=15, deadline=None)
        @given(
            tokens=st.lists(
                st.text(alphabet="ab", min_size=1, max_size=8),
                min_size=1,
                max_size=6,
            ),
            pair=st.tuples(
                st.sampled_from(["a", "b"]), st.sampled_from(["a", "b"])
            ),
        )
        def check(tokens, pair):
            left, right = pair
            df = spark.createDataFrame(
                [(t,) for t in tokens], "token string"
            ).select("token", F.split("token", "").alias("syms"))
            got = {
                r.token: list(r.m)
                for r in df.select(
                    "token", _apply_merge(F.col("syms"), left, right).alias("m")
                ).collect()
            }
            for t in tokens:
                assert got[t] == py_greedy(list(t), left, right), (t, pair)

        check()
