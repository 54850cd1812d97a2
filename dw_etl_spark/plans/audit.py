"""First-class physical-plan auditing.

PLANS.md's audit loop, productized: every operator in this repo was
tuned by reading its executed plan — join strategies, exchange counts,
filter pushdown, scan width, bucketed-scan use — and the invariants
worth keeping are pinned as test assertions. ``plan_summary`` is that
reading, as data: call it on any DataFrame and assert on the result
instead of string-grepping ``explain`` output in every test.

Counters come from the EXECUTED plan string (post-AQE structure where
finalized), so what you assert is what runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_JOINS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def plan_string(df: DataFrame, formatted: bool = False) -> str:
    """The executed-plan string (or the formatted explain, which adds
    per-scan detail like ``Bucketed: true`` and ``PushedFilters``)."""
    qe = df._jdf.queryExecution()
    if formatted:
        return df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    return qe.executedPlan().toString()


def plan_summary(df: DataFrame, finalize: bool = False) -> dict:
    """Counters over the executed plan.

    Under AQE a plan is ``isFinalPlan=false`` until an action runs, and
    codegen regions / in-memory-relation internals are not yet printed;
    ``finalize=True`` runs a ``count()`` first so the summary reflects
    the ACTUAL final plan (AQE mutates the same plan object in place).
    Leave it off to audit cheaply / pre-execution.

    Keys:

    joins            — {join node name: count} (zero-count keys omitted)
    exchanges        — shuffle Exchange count (broadcast exchanges and
                       AQE shuffle reads excluded)
    broadcasts       — BroadcastExchange count
    scans            — FileScan/BatchScan count
    bucketed_scans   — scans the planner actually ran bucketed
    pushed_filters   — scans with a non-empty PushedFilters list
    wholestage_spans — WholeStageCodegen regions (wider = more of the
                       plan fused into generated code)
    sorts / windows / aggregates — node counts
    """
    if finalize:
        df.count()
    plain = plan_string(df)
    fmt = plan_string(df, formatted=True)
    joins = {j: plain.count(j) for j in _JOINS if plain.count(j)}
    return {
        "joins": joins,
        "exchanges": len(re.findall(r"Exchange (?:hash|range|Single)", plain)),
        "broadcasts": plain.count("BroadcastExchange"),
        "scans": len(re.findall(r"FileScan|BatchScan", plain)),
        "bucketed_scans": fmt.count("Bucketed: true"),
        "pushed_filters": len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
                if m.strip()
            ]
        ),
        # codegen region ids: "*(N)" in executed plans, "[codegen id : N]"
        # in formatted explain (the only form visible pre-execution
        # under AQE's isFinalPlan=false)
        "wholestage_spans": len(
            set(re.findall(r"\*\((\d+)\)", plain))
            | set(re.findall(r"codegen id : (\d+)", fmt))
        ),
        "sorts": len(re.findall(r"\bSort \[", plain)),
        "windows": plain.count("Window ["),
        "aggregates": plain.count("HashAggregate"),
    }


def logical_plan_size(df: DataFrame) -> int:
    """Length of the optimized LOGICAL plan string — the counter the
    plan-literal regression pins assert on.

    Data smuggled into the plan as literals (k-means centroids as
    column literals, one CASE branch per group, one map entry per
    partition offset) shows up here as growth proportional to a DATA
    dimension — the failure class that makes a query planner, not the
    executors, the bottleneck at scale. The engine's rule: anything
    sized by data rides as a broadcast relation (one plan node at any
    cardinality); a bounded literal (label lists, bin edges, bounded
    group CASE under ``max_literal_groups``) may inline. Pin the rule
    with ``assert logical_plan_size(big) < logical_plan_size(small) *
    slack`` while sweeping the data dimension — see
    ``test_ivf_topk_plan_stays_bounded_at_256_centroids`` and
    ``test_qcut_expr_plan_stays_bounded_at_high_group_count``.
    """
    return len(df._jdf.queryExecution().optimizedPlan().toString())
