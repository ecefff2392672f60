"""Property tests (hypothesis) for the round-7 document/order
statistics — same discipline as test_property_round7: run the
registered query end-to-end on a generated parquet fixture and match
an independent pure-Python reference.
"""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rust_cdc_spark.queries import load_all

REG = load_all()

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["hash", "join", "vector", "the", "a", "data", "spark"]


def _round_half_away(v: float) -> int:
    """Spark's F.round / DuckDB round: half away from zero (Python's
    built-in round is half-to-even — NOT the engines' rule)."""
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


@st.composite
def document_rows(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12)
        )
        text = " ".join(words)
        rows.append(
            (
                i,
                text,
                draw(st.sampled_from(["en", "xx"])),
                draw(st.sampled_from(["s0", "s1"])),
                len(text),
            )
        )
    return rows


def _write_documents(spark, tmp_path, rows) -> str:
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


@_SETTINGS
@given(rows=document_rows())
def test_simpson_diversity_matches_python(spark, tmp_path_factory, rows):
    sf = _write_documents(spark, tmp_path_factory.mktemp("simp"), rows)
    got = {
        r.source: r
        for r in REG["docs_simpson_diversity"].spark_fn(spark, sf).collect()
    }
    per_source = defaultdict(Counter)
    for (_, text, _, source, _) in rows:
        per_source[source].update(w.lower() for w in text.strip().split(" "))
    assert set(got) == set(per_source)
    for s, cnt in per_source.items():
        n_tok = sum(cnt.values())
        num = sum(c * (c - 1) for c in cnt.values())
        den = n_tok * (n_tok - 1)
        r = got[s]
        assert (r.n_tokens, r.vocab) == (n_tok, len(cnt))
        if den == 0:
            assert r.simpson_micro is None
        else:
            assert r.simpson_micro == num * 1_000_000 // den
            assert r.gini_simpson_micro == 1_000_000 - r.simpson_micro


@_SETTINGS
@given(rows=document_rows())
def test_mrr_matches_python(spark, tmp_path_factory, rows):
    sf = _write_documents(spark, tmp_path_factory.mktemp("mrr"), rows)
    got = {
        r.term: r
        for r in REG["retrieval_eval_mrr"].spark_fn(spark, sf).collect()
    }
    for term in ("hash", "join", "vector"):
        scored = []
        for (doc_id, text, lang, _, _) in rows:
            toks = [w.lower() for w in text.strip().split(" ")]
            if not toks:
                continue
            tf = sum(1 for w in toks if w == term)
            score = tf * 1_000_000 // len(toks)
            scored.append((doc_id, score, lang == "en" and tf > 0))
        rel = [(s, i) for i, s, is_r in scored if is_r]
        r = got[term]
        assert r.n_relevant == len(rel)
        if not rel:
            assert (r.first_rel_rank, r.rr_micro) == (0, 0)
            continue
        bs = max(s for s, _ in rel)
        bid = min(i for s, i in rel if s == bs)
        rank = 1 + sum(
            1
            for i, s, _ in scored
            if s > bs or (s == bs and i < bid)
        )
        assert r.first_rel_rank == rank
        assert r.rr_micro == (1_000_000 // rank if rank <= 20 else 0)


@st.composite
def order_rows(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.integers(min_value=1, max_value=8)),  # custkey
                draw(st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"])),
                draw(st.sampled_from(["O", "F"])),
                # totalprice on an exact cent grid
                draw(st.integers(min_value=1, max_value=50_000)) / 100.0,
            )
        )
    return rows


def _write_orders(spark, tmp_path, rows) -> str:
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string,"
        " o_orderstatus string, o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "orders.parquet")
    )
    return sf


@_SETTINGS
@given(rows=order_rows())
def test_chi2_matches_python(spark, tmp_path_factory, rows):
    sf = _write_orders(spark, tmp_path_factory.mktemp("chi2"), rows)
    (r,) = REG["orders_chi2_priority_status"].spark_fn(spark, sf).collect()
    cells = Counter((p, s) for (_, _, p, s, _) in rows)
    rowt = Counter(p for (_, _, p, _, _) in rows)
    colt = Counter(s for (_, _, _, s, _) in rows)
    n = len(rows)
    chi2 = 0
    for p in rowt:
        for s in colt:
            o = cells.get((p, s), 0)
            chi2 += (o * n - rowt[p] * colt[s]) ** 2 * 1_000_000 // (
                n * rowt[p] * colt[s]
            )
    assert (r.n_orders, r.n_pri, r.n_st) == (n, len(rowt), len(colt))
    assert r.dof == (len(rowt) - 1) * (len(colt) - 1)
    assert r.chi2_micro == chi2
    mindof = min(len(rowt) - 1, len(colt) - 1)
    if mindof > 0:
        assert r.cramers_v2_micro == chi2 // (n * mindof)


@_SETTINGS
@given(rows=order_rows())
def test_theil_matches_python(spark, tmp_path_factory, rows):
    sf = _write_orders(spark, tmp_path_factory.mktemp("theil"), rows)
    (r,) = REG["customer_revenue_theil"].spark_fn(spark, sf).collect()
    cents = defaultdict(int)
    for (_, c, _, _, p) in rows:
        cents[c] += _round_half_away(p * 100)
    n, s = len(cents), sum(cents.values())
    terms = 0
    for x in cents.values():
        if x > 0:
            ratio = float(x) * n / s
            terms += _round_half_away(1e6 * ratio * math.log(ratio))
    assert (r.n_customers, r.total_cents) == (n, s)
    assert r.theil_sum_micro == terms
    # Spark `div` truncates toward zero; Python // floors — match on
    # the truncating form for possibly-negative rounding residue
    q = abs(terms) // n * (1 if terms >= 0 else -1)
    assert r.theil_micro == q


_STOPS = ("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")


def _quality(text: str) -> float:
    """Pure-Python twin of functions/text.py::quality_score, including
    Spark's ROUND_HALF_UP-on-decimal-expansion semantics."""
    from decimal import ROUND_HALF_UP, Decimal

    toks = text.strip().split(" ")
    tc = len(toks)
    sat = min(tc / 64.0, 1.0)
    sw = sum(1 for t in toks if t.lower() in _STOPS) / tc
    atl = sum(len(t) for t in toks) / tc
    len_ok = 1.0 if 2.0 <= atl <= 12.0 else 0.0
    raw = 0.4 * sat + 0.4 * min(sw * 4.0, 1.0) + 0.2 * len_ok
    return float(
        Decimal(raw).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


@_SETTINGS
@given(rows=document_rows())
def test_spearman_matches_python(spark, tmp_path_factory, rows):
    sf = _write_documents(spark, tmp_path_factory.mktemp("sp"), rows)
    got = {
        r.source: r
        for r in REG["quality_spearman_by_source"].spark_fn(spark, sf)
        .collect()
    }
    per_source = defaultdict(list)
    for (_, text, _, source, n_chars) in rows:
        per_source[source].append((_quality(text), n_chars))
    for s, pts in per_source.items():
        rq = _rank2_map([q for q, _ in pts])
        rl = _rank2_map([ln for _, ln in pts])
        xs = [rq[q] for q, _ in pts]
        ys = [rl[ln] for _, ln in pts]
        n = len(pts)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
        r = got[s]
        assert r.n_docs == n
        if d1 == 0 or d2 == 0:
            assert r.spearman_micro is None
        else:
            want = _round_half_away(
                1e6 * float(n * sxy - sx * sy)
                / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
            )
            assert r.spearman_micro == want


def _rank2_map(values):
    lt, cnt = 0, Counter(values)
    out = {}
    for v in sorted(cnt):
        out[v] = 2 * lt + cnt[v] + 1
        lt += cnt[v]
    return out


@_SETTINGS
@given(rows=document_rows())
def test_jsd_matches_python(spark, tmp_path_factory, rows):
    sf = _write_documents(spark, tmp_path_factory.mktemp("jsd"), rows)
    got = {
        r.source: r
        for r in REG["docs_js_divergence_sources"].spark_fn(spark, sf)
        .collect()
    }
    per_source, global_cnt = defaultdict(Counter), Counter()
    for (_, text, _, source, _) in rows:
        ws = [w.lower() for w in text.strip().split(" ")]
        per_source[source].update(ws)
        global_cnt.update(ws)
    t_all = sum(global_cnt.values())
    for s, cnt in per_source.items():
        ts = sum(cnt.values())
        jsd = 0
        present = 0
        for tok, gt in global_cnt.items():
            n = cnt.get(tok, 0)
            q = gt / t_all
            if n == 0:
                cell = 0.5 * q * math.log(2.0)
            else:
                present += 1
                p = n / ts
                cell = 0.5 * p * math.log(2.0 * p / (p + q)) + 0.5 * q * (
                    math.log(2.0 * q / (p + q))
                )
            jsd += _round_half_away(1e6 * cell)
        r = got[s]
        assert (r.n_tokens, r.vocab_present) == (ts, present)
        assert r.jsd_micro == jsd
