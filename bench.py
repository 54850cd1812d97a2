"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). JVM/session startup is excluded (the baseline's
dominant fixed cost is pipeline wall-clock, BASELINE.md).

Noise control: every query runs k times ($SPARK_GRAFT_BENCH_K, default
3) in round-robin passes; ``queries`` reports the per-query MIN (the
noise-free estimate; comparable to earlier single-run rounds) and
``queries_median`` the median, so round-over-round deltas on untouched
queries can be told apart from single-run scheduler noise. ``value`` is
the sum of per-query mins; ``wall_clock_sec`` is the raw loop time.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import time

from pyspark.sql import functions as F

from dw_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(app_name="dw_etl_spark_bench")

    import __spark_entry__ as entrymod

    # warm the JVM (scheduler, codegen, shuffle machinery) with a tiny
    # unrelated job so the first timed query isn't charged for it
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # apples-to-apples with BASELINE.md's full-ETL wall clock: build the
    # whole star schema and load it through the warehouse sink (writes +
    # PK uniqueness + FK orphan validation), extract → warehouse on disk.
    # Measured FIRST (right after warmup): the headline baseline
    # comparison shouldn't inherit GC/block pressure from 3×54 query
    # executions (measured +40% when run last).
    import shutil
    import tempfile

    from dw_etl_spark.plans.star_schema import build_star_schema
    from dw_etl_spark.sinks.warehouse import (
        ForeignKey,
        ParquetWarehouse,
        TableSpec,
        load_star_schema,
    )

    pipeline_runs: list[float] = []
    for _ in range(k):
        wh_dir = tempfile.mkdtemp(prefix="dw_bench_wh_")
        t0 = time.perf_counter()
        star = build_star_schema(spark, sf_dir)
        specs = {
            name: TableSpec(name, primary_key=["Id"]) for name in star
        }
        specs["FACT_LineItem"].foreign_keys = [
            ForeignKey(["DateId"], "DIM_Date", ["Id"])
        ]
        load_star_schema(
            ParquetWarehouse(spark, wh_dir), star, specs, fact_name="FACT_LineItem"
        )
        pipeline_runs.append(time.perf_counter() - t0)
        shutil.rmtree(wh_dir, ignore_errors=True)

    runs: dict[str, list[float]] = {}
    t_all = time.perf_counter()
    qs = entrymod.queries()
    for _ in range(k):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.setdefault(name, []).append(time.perf_counter() - t0)
    wall_clock = round(time.perf_counter() - t_all, 3)
    timings = {name: round(min(ts), 3) for name, ts in runs.items()}
    medians = {name: round(statistics.median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "runs": k,
                "wall_clock_sec": wall_clock,
                "sf": sf,
                "pipeline_sec": round(min(pipeline_runs), 3),
                "pipeline_sec_median": round(
                    statistics.median(pipeline_runs), 3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
