"""DuckDB replay oracles for the trained-ANN queries.

PQ training (operators/pq.py) and the coarse k-means quantizer
(operators/similarity.py) are deliberately deterministic AND
integer-quantized: md5-ordered init, first-minimum/maximum assignment
with left-associated arithmetic chains, centroid updates as BIGINT
micro-unit sums (aggregation-order-free) floor-divided by counts. Every
step is therefore replayable in plain SQL bit-for-bit — so instead of
inlining driver-collected codebooks (which a static oracle string
cannot see), these generators RE-RUN the whole training inside DuckDB
as an unrolled CTE chain, the same trick `quality_classifier_train`'s
oracle uses for logistic GD. If any engine-side arithmetic drifts from
the replay, the value-hash comparison fails — training itself is under
the correctness gate, not just the final scan.

Three oracles compose from two shared chain builders:
- ``pq_replay_sql``    — PQ train → encode → ADC pool → exact rerank
- ``ivf_replay_sql``   — coarse k-means train → cell assign → probe →
  exact re-score
- ``ivfpq_replay_sql`` — BOTH trainings, then the IVF-PQ scan: probed
  cells only, ADC over the code table, exact rerank of the pool

Float discipline (shared with operators/pq.py / similarity.py):
- all element math in DOUBLE after an explicit cast from float32;
- sums are written as left-associated `t1 + t2 + …` chains — the same
  evaluation order Spark codegen, Python folds, and DuckDB use;
- `sqrt` is IEEE-correctly-rounded in every engine;
- round-to-integer of a bit-identical double is engine-safe (both
  engines see the same half-point cases), unlike round-to-d-decimals.
"""

from __future__ import annotations


def _j_table(m: int) -> str:
    return f"(SELECT range AS j FROM range({m}))"


def _chain(terms: list[str]) -> str:
    """SQL `t1 + t2 + …` parses left-associated — the identical add
    order of the Spark codegen chains and Python left folds."""
    return " + ".join(terms)


# ── PQ chain: sub rows → md5 init → iters × (assign, micro-update) →
#    final encode. Mirrors operators/pq.train_pq + encode_pq (codegen
#    scorer). Produces CTEs: sub, cb0..cb{iters}, a*, u*, enc. ────────


def _pq_chain_parts(m: int, k: int, dim: int, iters: int,
                    seed: int) -> tuple[list[str], str]:
    """Returns (parts, final_codebook_cte). ``enc`` ends up holding one
    (i, j, code) row per vector per subspace."""
    d = dim // m
    ecols = ", ".join(f"e{i}" for i in range(d))
    sub_cols = ", ".join(
        f"CAST(e.embedding[j.j * {d} + {i + 1}] AS DOUBLE) AS e{i}"
        for i in range(d)
    )
    parts = [f"""sub AS (
        SELECT e.vec_id AS i, j.j, {sub_cols}
        FROM embeddings e CROSS JOIN {_j_table(m)} j
    )"""]
    # init: first k sub-rows per subspace in md5(seed|j|i) order
    parts.append(f"""cb0 AS (
        SELECT j, row_number() OVER (
            PARTITION BY j
            ORDER BY md5(concat_ws('|', '{seed}', CAST(j AS VARCHAR),
                                   CAST(i AS VARCHAR)))
        ) - 1 AS code, {ecols}
        FROM sub
        QUALIFY code < {k}
    )""")
    d2 = _chain([
        f"(s.e{i} - c.e{i}) * (s.e{i} - c.e{i})" for i in range(d)
    ])

    def assign(name: str, cb: str) -> str:
        # first minimum wins; ties -> lowest code (the argmin rule of
        # pq._assign_code's struct-min)
        return f"""{name} AS (
        SELECT s.i, s.j, {", ".join(f"s.e{i}" for i in range(d))}, c.code
        FROM sub s JOIN {cb} c USING (j)
        QUALIFY row_number() OVER (
            PARTITION BY s.i, s.j ORDER BY {d2}, c.code) = 1
    )"""

    for t in range(iters):
        parts.append(assign(f"a{t}", f"cb{t}"))
        sums = ", ".join(
            f"CAST(sum(CAST(round(e{i} * 1e6) AS BIGINT)) AS BIGINT)"
            f" AS s{i}"
            for i in range(d)
        )
        parts.append(f"""u{t} AS (
        SELECT j, code, count(*) AS n, {sums}
        FROM a{t} GROUP BY j, code
    )""")
        upd = ", ".join(
            f"CASE WHEN u.n IS NULL THEN c.e{i}"
            f" ELSE floor(u.s{i} / u.n) / 1e6 END AS e{i}"
            for i in range(d)
        )
        parts.append(f"""cb{t + 1} AS (
        SELECT c.j, c.code, {upd}
        FROM cb{t} c LEFT JOIN u{t} u USING (j, code)
    )""")
    final = f"cb{iters}"
    parts.append(assign("enc", final))
    return parts, final


def _pq_adc_parts(m: int, dim: int, final_cb: str, probe_id: int,
                  enc_cte: str = "enc") -> list[str]:
    """ADC lookup tables for the probe + per-vector integer-micro ADC
    scores over ``enc_cte`` (mirrors adc_luts_micro + pq_topk's scan).
    Produces CTEs: psub, lut, adc."""
    d = dim // m
    psub_cols = ", ".join(
        f"CAST(p.embedding[j.j * {d} + {i + 1}] AS DOUBLE) AS p{i}"
        for i in range(d)
    )
    lut_d2 = _chain([
        f"(p.p{i} - c.e{i}) * (p.p{i} - c.e{i})" for i in range(d)
    ])
    return [
        f"""psub AS (
        SELECT j.j, {psub_cols}
        FROM embeddings p CROSS JOIN {_j_table(m)} j
        WHERE p.vec_id = {probe_id}
    )""",
        f"""lut AS (
        SELECT c.j, c.code,
               CAST(floor(({lut_d2}) * 1e6 + 0.5) AS BIGINT) AS micro
        FROM {final_cb} c JOIN psub p USING (j)
    )""",
        f"""adc AS (
        SELECT e.i AS vec_id, CAST(sum(l.micro) AS BIGINT) AS adc_micro
        FROM {enc_cte} e JOIN lut l USING (j, code)
        GROUP BY e.i
    )""",
    ]


def _rerank_parts(dim: int, probe_id: int, pool_cte: str) -> list[str]:
    """Exact-L2 rerank of ``pool_cte`` (vec_id rows) against the probe
    (mirrors the registered queries' V.l2_distance fold). Produces
    CTEs: pr, rr."""
    dist = _chain([
        f"(CAST(e.embedding[{i + 1}] AS DOUBLE) - pr.pv[{i + 1}])"
        f" * (CAST(e.embedding[{i + 1}] AS DOUBLE) - pr.pv[{i + 1}])"
        for i in range(dim)
    ])
    return [
        f"""pr AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
        FROM embeddings WHERE vec_id = {probe_id}
    )""",
        f"""rr AS (
        SELECT po.vec_id, sqrt({dist}) AS dist
        FROM {pool_cte} po
        JOIN embeddings e ON e.vec_id = po.vec_id
        CROSS JOIN pr
    )""",
    ]


_RERANK_SELECT = """
    SELECT vec_id, CAST(round(dist * 1e6) AS BIGINT) AS dist_micro
    FROM rr
    ORDER BY dist, vec_id
    LIMIT {topk}
    """


def pq_replay_sql(
    m: int = 16,
    k: int = 16,
    dim: int = 64,
    iters: int = 3,
    seed: int = 42,
    probe_id: int = 0,
    pool_min: int = 64,
    pool_frac: int = 5,
    topk: int = 10,
) -> str:
    """Oracle for ``similarity_pq_rerank_topk``: replays PQ training
    (init → ``iters`` Lloyd steps), encoding, the integer-micro ADC
    pool scan with ``k = max(pool_min, n // pool_frac)``, and the exact
    rerank — returns (vec_id, dist_micro)."""
    parts, final = _pq_chain_parts(m, k, dim, iters, seed)
    parts += _pq_adc_parts(m, dim, final, probe_id)
    parts.append(f"""pool AS (
        SELECT vec_id FROM adc
        QUALIFY row_number() OVER (ORDER BY adc_micro, vec_id)
            <= greatest({pool_min},
                        (SELECT count(*) // {pool_frac} FROM embeddings))
    )""")
    parts += _rerank_parts(dim, probe_id, "pool")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}{_RERANK_SELECT.format(topk=topk)}"""


# ── IVF chain: md5 init → iters × (cosine-argmax assign, micro-update)
#    → final norms + corpus assignment. Mirrors similarity.
#    kmeans_centroids + nearest_cell_col (codegen scorer). Produces
#    CTEs: v, cc0..cc{iters}, ccn*, as*, su*, ccf, cas. ───────────────


def _ivf_chain_parts(n_centroids: int, dim: int, iters: int,
                     seed: int) -> tuple[list[str], str]:
    """Returns (parts, dot_chain_template) where the template scores
    ``v s`` rows against ``ccf c`` rows — reusable for probe ranking.
    ``cas`` ends up holding (i, e*, cid) per corpus vector."""
    ecols = ", ".join(f"e{i}" for i in range(dim))
    v_cols = ", ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) AS e{i}" for i in range(dim)
    )
    parts = [f"""v AS (
        SELECT vec_id AS i, {v_cols} FROM embeddings
    )"""]
    parts.append(f"""cc0 AS (
        SELECT row_number() OVER (
            ORDER BY md5(concat('{seed}', CAST(i AS VARCHAR)))
        ) - 1 AS cid, {ecols}
        FROM v
        QUALIFY cid < {n_centroids}
    )""")
    norm_chain = _chain([f"e{i} * e{i}" for i in range(dim)])
    dot_vc = _chain([f"s.e{i} * c.e{i}" for i in range(dim)])

    def with_norm(cb: str, name: str) -> str:
        # `centroid_norm(c) or 1.0`: the zero-vector guard of the
        # codegen scorer
        return f"""{name} AS (
        SELECT *, CASE WHEN sqrt({norm_chain}) = 0 THEN 1.0
                       ELSE sqrt({norm_chain}) END AS nrm
        FROM {cb}
    )"""

    def assign(name: str, ccn: str) -> str:
        # cosine argmax; ties -> lowest cid (struct-min rule of
        # nearest_cell_col)
        return f"""{name} AS (
        SELECT s.i, {", ".join(f"s.e{i}" for i in range(dim))}, c.cid
        FROM v s CROSS JOIN {ccn} c
        QUALIFY row_number() OVER (
            PARTITION BY s.i ORDER BY ({dot_vc}) / c.nrm DESC, c.cid) = 1
    )"""

    for t in range(iters):
        parts.append(with_norm(f"cc{t}", f"ccn{t}"))
        parts.append(assign(f"as{t}", f"ccn{t}"))
        sums = ", ".join(
            f"CAST(sum(CAST(round(e{i} * 1e6) AS BIGINT)) AS BIGINT)"
            f" AS s{i}"
            for i in range(dim)
        )
        parts.append(f"""su{t} AS (
        SELECT cid, count(*) AS n, {sums} FROM as{t} GROUP BY cid
    )""")
        upd = ", ".join(
            f"CASE WHEN u.n IS NULL THEN c.e{i}"
            f" ELSE floor(u.s{i} / u.n) / 1e6 END AS e{i}"
            for i in range(dim)
        )
        parts.append(f"""cc{t + 1} AS (
        SELECT c.cid, {upd}
        FROM cc{t} c LEFT JOIN su{t} u USING (cid)
    )""")
    parts.append(with_norm(f"cc{iters}", "ccf"))
    parts.append(assign("cas", "ccf"))
    return parts, dot_vc


def _pcells_part(probe_ids: tuple[int, ...], n_probe: int,
                 dot_vc: str) -> str:
    """Per-probe top-``n_probe`` cell ranking over ``ccf`` (mirrors
    nearest_cells_col / nearest_cells_driver: cosine DESC, cid)."""
    ids = ", ".join(str(p) for p in probe_ids)
    return f"""pcells AS (
        SELECT s.i AS query_id, c.cid
        FROM v s CROSS JOIN ccf c
        WHERE s.i IN ({ids})
        QUALIFY row_number() OVER (
            PARTITION BY s.i
            ORDER BY ({dot_vc}) / c.nrm DESC, c.cid) <= {n_probe}
    )"""


def ivf_replay_sql(
    n_centroids: int = 8,
    dim: int = 64,
    iters: int = 2,
    seed: int = 42,
    probe_ids: tuple[int, ...] = (0, 1, 2),
    n_probe: int = 4,
    k: int = 5,
) -> str:
    """Oracle for ``similarity_ivf_topk``: replays coarse-quantizer
    training, corpus cell assignment, per-probe top-``n_probe`` cell
    ranking, and the probed-cell exact re-score — returns
    (query_id, vec_id, cos_sim, rank), ranked BEFORE the self-filter
    exactly as the registered query does (the self row consumes rank 1,
    so output ranks start at 2)."""
    parts, dot_vc = _ivf_chain_parts(n_centroids, dim, iters, seed)
    parts.append(_pcells_part(probe_ids, n_probe, dot_vc))
    # exact re-score of probed-cell members: cosine over the raw
    # vectors — dot / (norm_corpus * norm_probe), all left-fold chains
    dot_aq = _chain([f"a.e{i} * q.e{i}" for i in range(dim)])
    norm_a = _chain([f"a.e{i} * a.e{i}" for i in range(dim)])
    norm_q = _chain([f"q.e{i} * q.e{i}" for i in range(dim)])
    parts.append(f"""scored AS (
        SELECT pc.query_id, ca.i AS vec_id,
               round(({dot_aq}) / (sqrt({norm_a}) * sqrt({norm_q})), 4)
                   AS cos_sim
        FROM cas ca
        JOIN pcells pc USING (cid)
        JOIN v a ON a.i = ca.i
        JOIN v q ON q.i = pc.query_id
    )""")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT query_id, vec_id, cos_sim, rank FROM (
        SELECT query_id, vec_id, cos_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, vec_id) AS rank
        FROM scored
    )
    WHERE rank <= {k} AND query_id <> vec_id
    """


# ── PCA chain (all-but-the-top): exact-integer moments → covariance →
#    comps × (power iteration + deflation) → projection/residual.
#    Mirrors operators/pca.py (moment_stats + train_components +
#    project_abtt). ─────────────────────────────────────────────────────


def pca_replay_sql(dim: int = 64, comps: int = 2, iters: int = 24) -> str:
    """Oracle for ``embedding_pca_abtt``: replays the micro-unit moment
    aggregation, covariance construction, ``comps`` rounds of
    fixed-count power iteration with Hotelling deflation, and the
    centered projection + residual — returns
    (vec_id, pc1_micro…, resid_micro). Every double chain is
    left-associated to match the Python trainer's folds."""
    # AS MATERIALIZED on every multiply-referenced CTE: crow{c} feeds all
    # `iters` matvec steps and cov{c} feeds both the pivot and the next
    # deflation — inlined, the moment self-join would be re-evaluated
    # once per iteration.
    parts = [
        """q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS q
        FROM embeddings
    )""",
        f"""flat AS MATERIALIZED (
        SELECT q.vec_id, p.range AS pos, q.q[p.range + 1] AS v
        FROM q CROSS JOIN range({dim}) p
    )""",
        """s AS MATERIALIZED (
        SELECT pos, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
        FROM flat GROUP BY pos
    )""",
        """mean AS MATERIALIZED (
        SELECT pos, (CAST(s AS DOUBLE) / n) / 1e6 AS md FROM s
    )""",
        """mom AS MATERIALIZED (
        SELECT a.pos AS p1, b.pos AS p2,
               CAST(sum(a.v * b.v) AS BIGINT) AS m
        FROM flat a JOIN flat b USING (vec_id)
        GROUP BY a.pos, b.pos
    )""",
        """cov0 AS MATERIALIZED (
        SELECT m.p1, m.p2,
               (CAST(m.m AS DOUBLE) / s1.n) / 1e12 - ma.md * mb.md AS cv
        FROM mom m
        JOIN s s1 ON s1.pos = m.p1
        JOIN mean ma ON ma.pos = m.p1
        JOIN mean mb ON mb.pos = m.p2
    )""",
    ]
    for c in range(comps):
        parts.append(f"""crow{c} AS MATERIALIZED (
        SELECT p1, list(cv ORDER BY p2) AS cr FROM cov{c} GROUP BY p1
    )""")
        parts.append(f"""v{c}_0 AS MATERIALIZED (
        SELECT list_transform(range(1, {dim + 1}), x -> 0.125) AS vv
    )""")
        for t in range(iters):
            # list_reduce is a defined LEFT fold seeded with the first
            # element — the same association as _chain's `t1 + t2 + …`
            # and Python's left folds, so values stay bit-identical
            # while the SQL text shrinks ~15× (215 KB of unrolled
            # chains made DuckDB PLANNING alone take 16 s).
            matvec = (
                f"list_reduce([cr.cr[i + 1] * v.vv[i + 1] "
                f"for i in range(0, {dim})], (a, b) -> a + b)"
            )
            parts.append(f"""w{c}_{t} AS MATERIALIZED (
        SELECT cr.p1, {matvec} AS w
        FROM crow{c} cr CROSS JOIN v{c}_{t} v
    )""")
            parts.append(f"""wl{c}_{t} AS MATERIALIZED (
        SELECT list(w ORDER BY p1) AS wl FROM w{c}_{t}
    )""")
            nchain = (
                f"list_reduce([wl[i + 1] * wl[i + 1] "
                f"for i in range(0, {dim})], (a, b) -> a + b)"
            )
            parts.append(f"""nz{c}_{t} AS MATERIALIZED (
        SELECT wl, CASE WHEN sqrt({nchain}) = 0 THEN 1.0
                        ELSE sqrt({nchain}) END AS nrm
        FROM wl{c}_{t}
    )""")
            parts.append(f"""v{c}_{t + 1} AS MATERIALIZED (
        SELECT list_transform(wl, x -> x / nrm) AS vv, nrm
        FROM nz{c}_{t}
    )""")
        if c + 1 < comps:
            parts.append(f"""cov{c + 1} AS MATERIALIZED (
        SELECT c0.p1, c0.p2,
               c0.cv - (vf.nrm * vf.vv[c0.p1 + 1]) * vf.vv[c0.p2 + 1] AS cv
        FROM cov{c} c0 CROSS JOIN v{c}_{iters} vf
    )""")
    parts.append("""meanl AS MATERIALIZED (
        SELECT list(md ORDER BY pos) AS ml FROM mean
    )""")
    cterm = "(CAST(q.q[i + 1] AS DOUBLE) / 1e6 - m.ml[i + 1])"
    pchains = [
        f"list_reduce([{cterm} * v{c}.vv[i + 1] "
        f"for i in range(0, {dim})], (a, b) -> a + b)"
        for c in range(comps)
    ]
    csq = (
        f"list_reduce([{cterm} * {cterm} "
        f"for i in range(0, {dim})], (a, b) -> a + b)"
    )
    vjoins = " ".join(
        f"CROSS JOIN v{c}_{iters} v{c}" for c in range(comps)
    )
    pcols = ", ".join(f"{pchains[c]} AS p{c + 1}v" for c in range(comps))
    resid = "csq"
    for c in range(comps):
        resid = f"({resid} - p{c + 1}v * p{c + 1}v)"
    outs = ", ".join(
        f"CAST(round(p{c + 1}v * 1e6) AS BIGINT) AS pc{c + 1}_micro"
        for c in range(comps)
    )
    parts.append(f"""proj AS (
        SELECT q.vec_id, {pcols}, {csq} AS csq
        FROM q CROSS JOIN meanl m {vjoins}
    )""")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT vec_id, {outs},
           CAST(round(sqrt(greatest({resid}, 0.0)) * 1e6) AS BIGINT)
               AS resid_micro
    FROM proj
    """


def ivfpq_replay_sql(
    n_centroids: int = 8,
    m: int = 16,
    k_codes: int = 16,
    dim: int = 64,
    ivf_iters: int = 2,
    pq_iters: int = 3,
    seed: int = 42,
    probe_id: int = 0,
    n_probe: int = 4,
    pool_k: int = 64,
    topk: int = 10,
) -> str:
    """Oracle for ``similarity_ivfpq_topk``: BOTH trainings (the coarse
    quantizer and the PQ sub-quantizers), the IVF-PQ index (cell id +
    PQ codes per vector), the probed-cell ADC scan, and the exact
    rerank — the complete two-quantizer ANN path value-checked end to
    end. Returns (vec_id, dist_micro)."""
    ivf_parts, dot_vc = _ivf_chain_parts(n_centroids, dim, ivf_iters, seed)
    pq_parts, final_cb = _pq_chain_parts(m, k_codes, dim, pq_iters, seed)
    parts = ivf_parts + pq_parts
    parts.append(_pcells_part((probe_id,), n_probe, dot_vc))
    # IVF-PQ scan: only code rows of vectors whose cell is probed
    parts.append("""probed AS (
        SELECT e.i, e.j, e.code
        FROM enc e
        JOIN cas ca ON ca.i = e.i
        JOIN pcells pc ON pc.cid = ca.cid
    )""")
    parts += _pq_adc_parts(m, dim, final_cb, probe_id, enc_cte="probed")
    parts.append(f"""pool AS (
        SELECT vec_id FROM adc
        QUALIFY row_number() OVER (ORDER BY adc_micro, vec_id)
            <= {pool_k}
    )""")
    parts += _rerank_parts(dim, probe_id, "pool")
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}{_RERANK_SELECT.format(topk=topk)}"""


def mmr_replay_sql(
    probe_ids: tuple[int, ...] = (0, 1, 2),
    pool: int = 8,
    k: int = 4,
    dim: int = 64,
    lam_num: int = 7,
    lam_cmp: int = 3,
) -> str:
    """Oracle for ``retrieval_mmr_rerank``: replays the exact-integer
    greedy MMR selection (operators/mmr.py) as unrolled CTEs — pool by
    relevance rank, then k rounds of anti-join + max-sim + argmax. All
    dots are BIGINT over micro-unit coordinates, so every round's pick
    is bit-identical to the Spark side."""
    ids = ", ".join(str(i) for i in probe_ids)
    dot = (
        f"CAST(list_sum([{{a}}.{{ac}}[i+1] * {{b}}.{{bc}}[i+1] "
        f"for i in range(0, {dim})]) AS BIGINT)"
    )
    rel_dot = dot.format(a="e", ac="qv", b="p", bc="pv")
    sim_dot = dot.format(a="r", ac="cv", b="s", bc="cv")
    parts = [
        """q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qv
        FROM embeddings
    )""",
        f"""probes AS (
        SELECT vec_id AS query_id, qv AS pv FROM q WHERE vec_id IN ({ids})
    )""",
        f"""scored AS (
        SELECT p.query_id, e.vec_id AS cand_id, e.qv AS cv,
               {rel_dot} AS rel
        FROM q e CROSS JOIN probes p
        WHERE e.vec_id != p.query_id
    )""",
        f"""pool AS MATERIALIZED (
        SELECT query_id, cand_id, cv, rel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
            FROM scored
        ) WHERE rn <= {pool}
    )""",
        f"""sel1 AS (
        SELECT query_id, cand_id, cv, rel,
               {lam_num} * rel AS score, 1 AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
            FROM pool
        ) WHERE rn = 1
    )""",
        "acc1 AS (SELECT * FROM sel1)",
    ]
    for t in range(2, k + 1):
        p = t - 1
        parts.append(f"""rem{t} AS (
        SELECT pool.* FROM pool
        LEFT JOIN acc{p} a ON pool.query_id = a.query_id
                          AND pool.cand_id = a.cand_id
        WHERE a.cand_id IS NULL
    )""")
        parts.append(f"""ms{t} AS (
        SELECT r.query_id, r.cand_id, max({sim_dot}) AS maxsim
        FROM rem{t} r JOIN acc{p} s USING (query_id)
        GROUP BY 1, 2
    )""")
        parts.append(f"""sel{t} AS (
        SELECT query_id, cand_id, cv, rel, score, {t} AS rank FROM (
            SELECT r.query_id, r.cand_id, r.cv, r.rel,
                   {lam_num} * r.rel - {lam_cmp} * m.maxsim AS score,
                   row_number() OVER (
                       PARTITION BY r.query_id
                       ORDER BY {lam_num} * r.rel - {lam_cmp} * m.maxsim DESC,
                                r.cand_id) AS rn
            FROM rem{t} r JOIN ms{t} m
                ON r.query_id = m.query_id AND r.cand_id = m.cand_id
        ) WHERE rn = 1
    )""")
        parts.append(
            f"acc{t} AS (SELECT * FROM acc{p} UNION ALL SELECT * FROM sel{t})"
        )
    body = ",\n    ".join(parts)
    return f"""
    WITH {body}
    SELECT query_id, cand_id, CAST(rank AS INT) AS rank,
           CAST(rel AS BIGINT) AS rel, CAST(score AS BIGINT) AS score
    FROM acc{k}
    """
