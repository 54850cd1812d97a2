"""Regenerate the PLANS.md per-query plan-counter appendix table.

Builds every non-side-effecting gate query at sf0.01 and prints the
markdown rows from ``plans/audit.plan_summary`` (pre-action, same
convention as the appendix: lazily-shared persisted subtrees print per
consumer). The 7 write/DDL/tempdir builders are excluded exactly as in
``test_no_gate_query_plans_a_cartesian_product``.

Usage: python tools/plan_counters.py [sf_dir]
(default: $SPARK_GRAFT_TEST_SF, else /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

EXCLUDED = {
    "warehouse_roundtrip", "jdbc_roundtrip", "csv_roundtrip",
    "rest_indicators", "dbf_scan", "scd2_apply", "media_decode",
}

ABBREV = {
    "BroadcastHashJoin": "BHJ",
    "BroadcastNestedLoopJoin": "BNLJ",
    "SortMergeJoin": "SMJ",
    "ShuffledHashJoin": "SHJ",
    "CartesianProduct": "CARTESIAN",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01"
    )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from dw_etl_spark.plans.audit import plan_summary

    print("| query | joins | exchanges | broadcasts | scans | pushed |")
    print("|---|---|---|---|---|---|")
    for name, fn in e.queries().items():
        if name in EXCLUDED:
            continue
        s = plan_summary(fn(spark, sf_dir))
        joins = ", ".join(
            f"{ABBREV.get(k, k)}×{v}" for k, v in sorted(s["joins"].items())
        ) or "—"
        print(
            f"| {name} | {joins} | {s['exchanges']} | {s['broadcasts']} "
            f"| {s['scans']} | {s['pushed_filters']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
