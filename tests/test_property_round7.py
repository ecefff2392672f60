"""Property-based tests (hypothesis) for the round-7 statistics: each
query runs end-to-end against a generated events fixture and must
match an INDEPENDENT pure-Python reference — a third implementation
next to the Spark plan and the DuckDB oracle, so a misconception
shared by the two SQL dialects still gets caught.

Fixtures are written as {tmp}/events.parquet so the registered query
runs through its real load_table path.
"""

from __future__ import annotations

import os
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rust_cdc_spark.operators.stats import cusum_daily_finish
from rust_cdc_spark.queries import load_all

REG = load_all()

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TYPES = ["click", "purchase", "error", "view"]


@st.composite
def event_rows(draw):
    n = draw(st.integers(min_value=4, max_value=50))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.integers(min_value=1, max_value=6)),  # user_id
                draw(st.sampled_from(_TYPES)),
                # epoch seconds across up to ~9 days for multi-day series
                draw(st.integers(min_value=0, max_value=800_000)),
                # small integer-valued doubles => deliberate heavy ties
                float(draw(st.integers(min_value=0, max_value=5))),
            )
        )
    return rows


def _write_events(spark, tmp_path, rows) -> str:
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, sec long, value double"
    ).select(
        "event_id", "user_id", "event_type",
        F.timestamp_seconds("sec").alias("ts"), "value",
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    return sf


def _rank2(values):
    """value -> doubled tie-averaged rank (2*cnt_less + cnt_eq + 1)."""
    cnt = Counter(values)
    out, less = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * less + cnt[v] + 1
        less += cnt[v]
    return out


@_SETTINGS
@given(rows=event_rows())
def test_mannwhitney_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(
        spark, tmp_path_factory.mktemp("mw"), rows
    )
    got = REG["events_value_mannwhitney"].spark_fn(spark, sf).collect()
    sample = [
        (t, v) for (_, _, t, _, v) in rows if t in ("click", "purchase")
    ]
    if not sample:
        assert got == []
        return
    r2 = _rank2([v for _, v in sample])
    n1 = sum(1 for t, _ in sample if t == "click")
    n2 = len(sample) - n1
    r1x2 = sum(r2[v] for t, v in sample if t == "click")
    cnt = Counter(v for _, v in sample)
    (r,) = got
    assert (r.n1, r.n2) == (n1, n2)
    assert r.r1_x2 == r1x2
    assert r.u1_x2 == r1x2 - n1 * (n1 + 1)
    assert r.u2_x2 == 2 * n1 * n2 - r.u1_x2
    assert r.tie_cubes == sum(c**3 - c for c in cnt.values())


@_SETTINGS
@given(rows=event_rows())
def test_kruskal_wallis_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(
        spark, tmp_path_factory.mktemp("kw"), rows
    )
    got = REG["events_kruskal_wallis"].spark_fn(spark, sf).collect()
    vals = [(t, v) for (_, _, t, _, v) in rows]
    r2 = _rank2([v for _, v in vals])
    n = len(vals)
    groups = defaultdict(list)
    for t, v in vals:
        groups[t].append(v)
    st_sum = 0
    for g, vs in groups.items():
        ni = len(vs)
        d = sum(r2[v] for v in vs) - ni * (n + 1)
        st_sum += (2 * d * d + ni) // (2 * ni)
    h_micro = (3 * 1_000_000 * st_sum) // (n * (n + 1))
    cnt = Counter(v for _, v in vals)
    (r,) = got
    assert r.n_values == n
    assert r.n_groups == len(groups)
    assert r.h_micro == h_micro
    assert r.tie_cubes == sum(c**3 - c for c in cnt.values())


@_SETTINGS
@given(rows=event_rows())
def test_mann_kendall_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(
        spark, tmp_path_factory.mktemp("mk"), rows
    )
    got = {
        r.event_type: r
        for r in REG["events_mann_kendall_trend"].spark_fn(spark, sf)
        .collect()
    }
    daily = Counter((t, sec // 86400) for (_, _, t, sec, _) in rows)
    by_type = defaultdict(dict)
    for (t, d), x in daily.items():
        by_type[t][d] = x
    for t, series in by_type.items():
        xs = [series[d] for d in sorted(series)]
        nc = sum(
            1
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
            if xs[j] > xs[i]
        )
        nd = sum(
            1
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
            if xs[j] < xs[i]
        )
        nn = len(xs)
        ties = Counter(xs)
        var18 = nn * (nn - 1) * (2 * nn + 5) - sum(
            c * (c - 1) * (2 * c + 5) for c in ties.values()
        )
        r = got[t]
        assert (r.n_days, r.s_stat) == (nn, nc - nd)
        assert (r.n_concordant, r.n_discordant) == (nc, nd)
        assert r.var18 == var18


@_SETTINGS
@given(rows=event_rows())
def test_survival_km_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(
        spark, tmp_path_factory.mktemp("km"), rows
    )
    got = sorted(
        (r.days_to_failure, r.n_risk, r.n_failures, r.n_censored,
         r.surv_micro)
        for r in REG["events_survival_km"].spark_fn(spark, sf).collect()
    )
    users = defaultdict(list)
    for (_, u, t, sec, _) in rows:
        users[u].append((t, sec // 86400))
    obs = []
    for u, evs in users.items():
        first_d = min(d for _, d in evs)
        last_d = max(d for _, d in evs)
        errs = [d for t, d in evs if t == "error"]
        if errs:
            obs.append((min(errs) - first_d, 1))
        else:
            obs.append((last_d - first_d, 0))
    hist = defaultdict(lambda: [0, 0])
    for t, died in obs:
        hist[t][0] += died
        hist[t][1] += 1 - died
    days = sorted(hist)
    want, s, remaining = [], 1_000_000, len(obs)
    for t in days:
        d, c = hist[t]
        n_risk = remaining
        s = (s * (n_risk - d)) // n_risk
        want.append((t, n_risk, d, c, s))
        remaining -= d + c
    assert got == sorted(want)


@_SETTINGS
@given(
    xs=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40)
)
def test_cusum_finish_matches_sequential_recurrence(spark, xs):
    """The closed form P_t − min(0, min P) inside cusum_daily_finish
    must equal the textbook sequential recurrence s_t = max(0,
    s_{t−1} + x_t − k) — including alarm count and first alarm day."""
    daily = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], "event_type string, d int, n long"
    )
    (r,) = cusum_daily_finish(daily).collect()
    k = sum(xs) // len(xs)
    s, smax, alarms, first = 0, 0, 0, 0
    for i, x in enumerate(xs, start=1):
        s = max(0, s + x - k)
        smax = max(smax, s)
        if s > 2 * k:
            alarms += 1
            if first == 0:
                first = i
    assert (r.n_days, r.target_daily) == (len(xs), k)
    assert (r.max_cusum, r.n_alarm_days, r.first_alarm_day) == (
        smax, alarms, first,
    )


@_SETTINGS
@given(rows=event_rows())
def test_runs_test_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(spark, tmp_path_factory.mktemp("runs"), rows)
    got = {
        r.event_type: r
        for r in REG["events_runs_test"].spark_fn(spark, sf).collect()
    }
    daily = Counter((t, sec // 86400) for (_, _, t, sec, _) in rows)
    by_type = defaultdict(dict)
    for (t, d), x in daily.items():
        by_type[t][d] = x
    for t, series in by_type.items():
        xs = [series[d] for d in sorted(series)]
        k = sum(xs) // len(xs)
        ups = [1 if x > k else 0 for x in xs]
        runs = 1 + sum(1 for a, b in zip(ups, ups[1:]) if a != b)
        r = got[t]
        assert r.n_days == len(xs)
        assert r.n_plus == sum(ups)
        assert r.n_minus == len(xs) - sum(ups)
        assert r.n_runs == runs


@_SETTINGS
@given(rows=event_rows())
def test_dp_sensitivity_matches_python(spark, tmp_path_factory, rows):
    sf = _write_events(spark, tmp_path_factory.mktemp("dp"), rows)
    got = {
        r.event_type: r
        for r in REG["privacy_user_sensitivity"].spark_fn(spark, sf)
        .collect()
    }
    contrib = Counter((t, u) for (_, u, t, _, _) in rows)
    by_type = defaultdict(list)
    for (t, _), c in contrib.items():
        by_type[t].append(c)
    for t, cs in by_type.items():
        cs.sort()
        n = len(cs)
        # lower median: min c where 2*(cumulative users at or below c)
        # >= n — computed off the contribution histogram like the query
        cum, med = 0, None
        for c in sorted(set(cs)):
            cum += sum(1 for x in cs if x == c)
            if 2 * cum >= n:
                med = c
                break
        r = got[t]
        assert (r.n_users, r.max_contrib, r.median_contrib) == (
            n, max(cs), med,
        )
        assert r.clip_ratio_micro == med * 1_000_000 // max(cs)


@st.composite
def embedding_rows(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    dim = 4
    return [
        (
            i,
            [
                float(draw(st.integers(min_value=-4, max_value=4)))
                for _ in range(dim)
            ],
            0,
        )
        for i in range(n)
    ]


@_SETTINGS
@given(rows=embedding_rows())
def test_silhouette_matches_python(spark, tmp_path_factory, rows):
    """Pure-Python reference including the SEQUENTIAL L2 fold (sum in
    array order, then sqrt) — validates the determinism assumption
    the engine-parity argument rests on."""
    import math as m

    sf = str(tmp_path_factory.mktemp("sil"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    got = {
        r.cid: r
        for r in REG["embedding_silhouette_simplified"].spark_fn(spark, sf)
        .collect()
    }
    k = 8
    # float32 storage: distances must be computed from the float32
    # values, exactly as both engines read them back
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    vecs = {i: [f32(x) for x in v] for i, v, _ in rows}
    cents = {i: v for i, v in vecs.items() if i < k}

    def l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return m.sqrt(acc)

    per_cluster = defaultdict(list)
    for i, v in vecs.items():
        ds = sorted((l2(v, cv), cid) for cid, cv in cents.items())
        (a, cid), b = ds[0], (ds[1][0] if len(ds) > 1 else None)
        if b is None or max(a, b) == 0:
            s = 0
        else:
            s = int(m.floor(abs(1e6 * (b - a) / max(a, b)) + 0.5)) * (
                1 if b >= a else -1
            )
        per_cluster[cid].append(s)
    assert set(got) == set(per_cluster)
    for cid, ss in per_cluster.items():
        r = got[cid]
        assert r.n_points == len(ss)
        assert r.n_boundary == sum(1 for s in ss if s < 0)
        total = sum(ss)
        q = abs(total) // len(ss) * (1 if total >= 0 else -1)
        assert r.mean_silhouette_micro == q


@_SETTINGS
@given(rows=event_rows())
def test_binseg_matches_python(spark, tmp_path_factory, rows):
    """Gain argmax + earliest-split tie-break, per type, against a
    direct Python evaluation of S_L²/n_L + S_R²/n_R − S²/n."""
    sf = _write_events(spark, tmp_path_factory.mktemp("bs"), rows)
    got = {
        r.event_type: r
        for r in REG["events_changepoint_binseg"].spark_fn(spark, sf)
        .collect()
    }
    daily = Counter((t, sec // 86400) for (_, _, t, sec, _) in rows)
    by_type = defaultdict(dict)
    for (t, d), x in daily.items():
        by_type[t][d] = x
    for t, series in by_type.items():
        ds = sorted(series)
        xs = [series[d] for d in ds]
        n, s = len(xs), sum(xs)
        if n < 2:
            assert t not in got
            continue
        best = None
        sk = 0
        for k in range(1, n):
            sk += xs[k - 1]
            gain = (
                float(sk) * sk / k
                + float(s - sk) * (s - sk) / (n - k)
                - float(s) * s / n
            )
            if best is None or gain > best[0]:
                best = (gain, k, ds[k - 1], sk)
        gain, k, d, sk = best
        r = got[t]
        assert (r.n_days, r.split_index, r.split_epoch_day) == (n, k, d)
        assert r.mean_left_milli == sk * 1000 // k
        assert r.mean_right_milli == (s - sk) * 1000 // (n - k)


@_SETTINGS
@given(rows=event_rows())
def test_poisson_bootstrap_matches_python(spark, tmp_path_factory, rows):
    """Replays the md5 → micro-uniform → inverse-CDF weight draw and
    the replicate means in pure Python — validating the cross-engine
    pseudo-randomness contract itself (conv(hex,16,10) in Spark,
    '0x'||hex cast in DuckDB, hashlib here)."""
    import hashlib

    from rust_cdc_spark.queries.timeseries import _BOOT_B, _POIS_CDF

    sf = _write_events(spark, tmp_path_factory.mktemp("boot"), rows)
    got = {
        r.event_type: r
        for r in REG["events_poisson_bootstrap_ci"].spark_fn(spark, sf)
        .collect()
    }
    daily = Counter((t, sec // 86400) for (_, _, t, sec, _) in rows)
    by_type = defaultdict(dict)
    for (t, d), x in daily.items():
        by_type[t][d] = x

    def pois(t, b, d):
        u = (
            int(
                hashlib.md5(f"{t}|{b}|{d}".encode()).hexdigest()[:12], 16
            )
            % 1_000_000
        )
        for k, thr in enumerate(_POIS_CDF):
            if u < thr:
                return k
        return 9

    for t, series in by_type.items():
        means = []
        for b in range(1, _BOOT_B + 1):
            swx = sum(pois(t, b, d) * x for d, x in series.items())
            sw = sum(pois(t, b, d) for d in series)
            if sw > 0:
                means.append(swx * 1000 // sw)
        if len(means) <= 1:
            assert t not in got
            continue
        r = got[t]
        assert r.n_reps == len(means)
        assert r.boot_mean_milli == sum(means) // len(means)
        assert (r.boot_min_milli, r.boot_max_milli) == (
            min(means), max(means),
        )
