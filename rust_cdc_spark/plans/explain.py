"""Physical-plan inspection helpers.

The scale contract of every operator in this engine is checkable from its
plan: filters reach the parquet scan, projections prune the read schema,
small dims broadcast, hot paths stay inside whole-stage codegen, and no
row-at-a-time Python UDF sneaks into an analytic query. These helpers
turn those properties into assertions (used by tests/test_plan_quality.py)
and quick REPL checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    try:
        return formatted_plan(df) if mode == "formatted" else df._jdf.queryExecution().toString()
    except Exception:
        # fallback: capture executedPlan string
        return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    text = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema clauses — what each scan actually reads (column
    pruning evidence)."""
    return re.findall(r"ReadSchema: (\S+)", plan_text(df))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count: formatted-plan detail headers ``(n) Exchange``
    (broadcast/reused exchanges excluded — they are not data shuffles)."""
    text = plan_text(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", text, re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df) or "BroadcastNestedLoopJoin" in plan_text(df)


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan contains any Python-side evaluation (row UDF,
    pandas UDF, mapInPandas) — forbidden in the analytic hot path,
    expected only in the multimodal codec stage."""
    text = plan_text(df)
    return bool(re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", text))


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count. AQE's formatted plan hides codegen
    stages until execution, so read the codegen-mode explain (which lists
    'Found N WholeStageCodegen subtrees')."""
    try:
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
        m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
        if m:
            return int(m.group(1))
    except Exception:
        pass
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_text(df))))


def uses_top_k(df: DataFrame) -> bool:
    """Global ORDER BY + LIMIT should plan as TakeOrderedAndProject
    (per-partition heaps), not a full sort."""
    return "TakeOrderedAndProject" in plan_text(df)


def executed_reuse_count(df: DataFrame) -> int:
    """ReusedExchange nodes in the EXECUTED adaptive plan. AQE inserts
    exchange reuse during execution, so this runs the query (collect on
    a small SF) and reads the final plan — the initial plan string
    always shows zero. Guards the shared-subtree designs (a dedup
    self-join whose signature computation must run once, not per
    side)."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "plan was not executed adaptively"
    return plan.count("ReusedExchange")


def global_windows(df: DataFrame) -> list[str]:
    """Every Window physical node with an EMPTY partitionSpec — the
    single-partition scale hazard (Spark funnels ALL rows through one
    task and warns ``WindowExec: No Partition Defined``). Walks the
    executed-plan tree through AQE wrapper nodes, ReusedExchange
    back-references, and subquery plans (scalar/IN/EXISTS subqueries
    hang off expressions, not ``children()``, so a global window hidden
    inside one would otherwise escape the gate). Returns the nodes'
    simpleStrings; [] means the plan has no global window."""
    out: list[str] = []
    seen: set[int] = set()  # ReusedExchange/ReusedSubquery form a DAG

    def walk(node):
        node_id = node.id()
        if node_id in seen:
            return
        seen.add(node_id)
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowGroupLimitExec") and (
            node.partitionSpec().isEmpty()
        ):
            out.append(f"{name}: {node.simpleString(200)}")
        # Subquery physical plans (SubqueryExec / SubqueryBroadcastExec
        # wrappers) are reachable only via QueryPlan.subqueries().
        subs = node.subqueries()
        for i in range(subs.size()):
            walk(subs.apply(i))
        if name == "AdaptiveSparkPlanExec":  # hides subtree from children()
            walk(node.inputPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name == "ReusedExchangeExec":  # leaf; real plan is .child()
            walk(node.child())
            return
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out
