"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). JVM/session startup is excluded (the baseline's
dominant fixed cost is pipeline wall-clock, BASELINE.md).

Noise control: every query runs k times ($SPARK_GRAFT_BENCH_K, default
3) in round-robin passes; ``queries`` reports the per-query MIN (the
noise-floor estimate) and ``queries_median`` the median. Min-of-k is
systematically <= a single run, so compare MEDIANS against the
single-run rounds (r1-r3) and either stat within the min-of-k rounds
(r4+). ``value`` is the sum of per-query mins; ``wall_clock_sec`` is
the raw loop time.

The JSON line is also written to ``bench_out.json`` next to this file:
the driver's stdout tail-capture truncated the (long) line in r4 and
lost the parsed per-query dict — the file artifact is always intact.
"""

from __future__ import annotations

import gc
import json
import os
import re
import statistics
import sys
import time

from pyspark.sql import functions as F

from dw_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))
    # optional comma-separated subset for targeted runs (scale sweeps);
    # empty/unset = the full suite. Unknown names fail loudly below.
    only = {
        q.strip()
        for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",")
        if q.strip()
    }
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # machine-state stamps (r14, VERDICT r13 next #5): BENCH_r13.json
    # showed a uniform ~1.3-1.45× inflation from unrelated load during
    # the driver session, identifiable only by cross-referencing the
    # idle closing runs. Stamping 1/5/15-min loadavg before and after
    # (plus the cpu count the averages are relative to) makes a
    # load-skewed artifact self-evident from the artifact alone:
    # loadavg_before substantially above ~0 on a machine that should be
    # idle means every number in the file carries scheduler noise.
    load_before = [round(x, 2) for x in os.getloadavg()]

    spark = get_spark(app_name="dw_etl_spark_bench")

    import __spark_entry__ as entrymod

    # warm the JVM (scheduler, codegen, shuffle machinery) with a tiny
    # unrelated job so the first timed query isn't charged for it
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    # warm the WRITE path too (parquet committer, observe-metrics
    # plumbing, the staged-swap rename machinery): pipeline run 0 was
    # paying ~7-20 s of one-time codegen/JIT that runs 1+ never see
    # (PLANS #9/#52). A 3-row staged load with a PK and an FK compiles
    # the same physical operators the real load uses, for pennies.
    # SPARK_GRAFT_WARM_WRITE=0 reverts to the cold-run-0 profile (A/B).
    if os.environ.get("SPARK_GRAFT_WARM_WRITE", "1") != "0":
        import shutil as _sh
        import tempfile as _tf

        from dw_etl_spark.sinks.warehouse import (
            ForeignKey as _FK,
            ParquetWarehouse as _PW,
            TableSpec as _TS,
            load_star_schema as _load,
        )

        _dim = spark.createDataFrame([(1, "a"), (2, "b")], "Id INT, V STRING")
        _fact = spark.createDataFrame([(1, 1), (2, 2), (3, 1)], "Id INT, DimId INT")
        _wd = _tf.mkdtemp(prefix="dw_bench_warm_")
        _load(
            _PW(spark, _wd),
            {"D": _dim, "F": _fact},
            {
                "D": _TS("D", primary_key=["Id"]),
                "F": _TS("F", primary_key=["Id"],
                         foreign_keys=[_FK(["DimId"], "D", ["Id"])]),
            },
            fact_name="F",
        )
        _sh.rmtree(_wd, ignore_errors=True)

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

    def _reset_cached_state() -> None:
        """Drop every pinned block between timed units (untimed).

        ``clearCache`` misses localCheckpoint blocks and the lazy
        ``persist()`` handles operators pin internally (add_unique_id's
        range-partitioned snapshot): drop Python refs, then unpersist
        every surviving RDD. Needed after PIPELINE runs too, not just
        between queries — at sf30 two back-to-back pipeline runs (K=2)
        left two 180M-row fact id snapshots pinned in the storage-
        protected half of the unified pool, and the first query's
        32-task stage OOM'd on an empty execution pool
        (UNABLE_TO_ACQUIRE_MEMORY ... got 0).
        """
        spark.catalog.clearCache()
        gc.collect()
        # blocking=True: the async form marks blocks for removal but
        # returns immediately, so at sf30 the next query's timed work
        # raced ~5 GB of doomed-but-present blocks for the storage-
        # protected half of the unified pool and OOM'd
        # (UNABLE_TO_ACQUIRE_MEMORY, topk_values after dim_indicator).
        # Waiting is untimed and makes the freed pool deterministic.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)

    # pipeline repeat count, defaults to k. Separate knob because the
    # scale rungs run queries at K=1 (each is minutes at sf30) but the
    # pipeline-repeat path is exactly where the sf30 K=2 OOM lived —
    # two back-to-back runs must stay green without costing a second
    # pass over all eight queries.
    pk = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_K", str(k))))
    pipeline_runs: list[float] = []
    for _ in range(pk):
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
        print(
            f"[bench] pipeline {pipeline_runs[-1]:.3f}s", file=sys.stderr, flush=True
        )
        shutil.rmtree(wh_dir, ignore_errors=True)
        _reset_cached_state()

    runs: dict[str, list[float]] = {}
    t_all = time.perf_counter()
    qs = entrymod.queries()
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_QUERIES unknown: {sorted(unknown)}")
        qs = {name: fn for name, fn in qs.items() if name in only}
    for _ in range(k):
        for name, fn in qs.items():
            # operators pin plan-shared frames with lazy persist();
            # the cache manager dedupes by canonicalized plan, so a
            # repeat run would silently reuse the previous run's cache
            # — clear (untimed) so every timed run pays its own
            # materializations and only WITHIN-query reuse counts.
            # (Without the ref-drop+unpersist, 3×50 queries of
            # localCheckpoint blocks pile up in the block manager and
            # tax later queries' GC — the r11 in-suite vs targeted
            # cosine_topk gap.)
            _reset_cached_state()
            # NOT here: a forced System.gc() per reset was A/B'd in
            # r13 (full suite, idle machine) and made the suite WORSE
            # (sum-of-min 97.3 vs 91.4, wall +53 s, pricing_summary
            # unchanged) — big-heap full GCs disturb more than the
            # settled heap buys. The r12 pricing_summary in-suite
            # jitter was machine load during the driver run, not a
            # reset/heap mechanism (isolated 0.60 s, suite-position
            # 0.72/0.82, idle full-suite 0.78/0.79 ≈ r11's 0.79).
            # progress to stderr (stdout stays the single JSON line):
            # a crash mid-suite names its query from the log alone —
            # the sf30 OOM cost a rerun just to learn which query died
            print(f"[bench] {name} ...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"[bench] {name} {dt:.3f}s", file=sys.stderr, flush=True)
            runs.setdefault(name, []).append(dt)
    wall_clock = round(time.perf_counter() - t_all, 3)
    timings = {name: round(min(ts), 3) for name, ts in runs.items()}
    medians = {name: round(statistics.median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)

    payload = json.dumps(
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
            # per-run list (r10, VERDICT r9 #1/#5): makes a first-runs-
            # heavy regression visible in the artifact itself — the
            # first run carries one-time codegen/JIT cost by design
            "pipeline_runs": [round(t, 3) for t in pipeline_runs],
            # self-diagnosis (r14): OS 1/5/15-min load averages before
            # and after, and the cpu count they're relative to — a
            # skewed artifact identifies itself
            "loadavg_before": load_before,
            "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            "cpu_count": os.cpu_count(),
        }
    )
    print(payload)
    # SPARK_GRAFT_BENCH_OUT: standing artifacts (BENCH_sf1.json, the
    # scale-regression diff target) write elsewhere without clobbering
    # the driver's bench_out.json
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    with open(out_path, "w") as f:
        f.write(payload + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
