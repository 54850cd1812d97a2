"""Per-job/per-stage profiler for declared queries (guide §1.1/§7.1).

The sandbox has no Spark UI, so this recreates the *Stages* view from
the event log: run one or more queries exactly like bench.py (construct
+ noop write, cache cleared between), with ``spark.eventLog.enabled``,
then parse the JSON event log into a per-query table of jobs and their
stages — wall clock, executor-time sum, input/shuffle-read/shuffle-write
bytes, records, and the stage's callsite (which operator built it).

Usage:  python tools/profile_query.py token_freq[,quality_filters,...]

Output: a readable report on stdout; the raw per-stage rows also land in
/tmp/profile_<query>.json for diffing.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dw_etl_spark.session import get_spark


def main() -> None:
    names = [q for q in (sys.argv[1] if len(sys.argv) > 1 else "").split(",") if q]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="dw_profile_evt_")
    spark = get_spark(
        app_name="dw_etl_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    # warm like bench.py so job 0 isn't charged for codegen warmup
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    def _reset() -> None:
        spark.catalog.clearCache()
        gc.collect()
        for rdd in sc._jsc.getPersistentRDDs().values():
            rdd.unpersist(True)

    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        _reset()
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        sc.setJobDescription(None)
        spans[name] = (t0 * 1000, t1 * 1000)
        print(f"[profile] {name}: {t1 - t0:.3f}s wall", file=sys.stderr)

    app_id = sc.applicationId
    spark.stop()

    # ---- parse the event log -------------------------------------------
    path = os.path.join(log_dir, app_id)
    if not os.path.exists(path):
        # Spark 4 writes rolling event-log DIRS (eventlog_v2_<appid>/)
        # or appends .inprogress/compression suffixes — take whatever
        # the session left, newest first, and descend one level if dir.
        cands = sorted(
            (os.path.join(log_dir, p) for p in os.listdir(log_dir)),
            key=os.path.getmtime,
            reverse=True,
        )
        path = cands[0]
        if os.path.isdir(path):
            inner = [
                os.path.join(path, p)
                for p in os.listdir(path)
                if p.startswith("events_")
            ]
            path = sorted(inner)[0]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stage_ids": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                    "end": None,
                }
                for s in ev.get("Stage Infos", []):
                    stages.setdefault(s["Stage ID"], {}).update(
                        {
                            "name": s.get("Stage Name", ""),
                            "details": (s.get("Details") or "").split("\n")[0],
                            "ntasks": s.get("Number of Tasks"),
                        }
                    )
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                d = stages.setdefault(sid, {})
                d["name"] = si.get("Stage Name", "")
                d["details"] = (si.get("Details") or "").split("\n")[0]
                d["ntasks"] = si.get("Number of Tasks")
                d["submit"] = si.get("Submission Time")
                d["complete"] = si.get("Completion Time")
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                d["exec_run_ms"] = acc.get("internal.metrics.executorRunTime", 0)
                d["cpu_ms"] = (
                    int(acc.get("internal.metrics.executorCpuTime", 0)) // 1_000_000
                )
                d["input_mb"] = round(
                    int(acc.get("internal.metrics.input.bytesRead", 0)) / 1e6, 1
                )
                d["sh_read_mb"] = round(
                    (
                        int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0))
                        + int(
                            acc.get(
                                "internal.metrics.shuffle.read.remoteBytesRead", 0
                            )
                        )
                    )
                    / 1e6,
                    1,
                )
                d["sh_write_mb"] = round(
                    int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0))
                    / 1e6,
                    1,
                )
                d["records_out"] = acc.get(
                    "internal.metrics.shuffle.write.recordsWritten", ""
                )

    for name in names:
        t0, t1 = spans[name]
        rows = []
        print(f"\n===== {name}  wall={((t1 - t0) / 1000):.3f}s =====")
        for jid in sorted(jobs):
            j = jobs[jid]
            if j["desc"] != f"PROFILE:{name}" or j["end"] is None:
                continue
            jdur = (j["end"] - j["start"]) / 1000
            done = [
                s
                for s in (stages.get(sid) for sid in j["stage_ids"])
                if s and s.get("complete")
            ]
            print(f"job {jid:3d}  {jdur:7.3f}s  stages={len(j['stage_ids'])}")
            for s in sorted(done, key=lambda s: -(s.get("exec_run_ms") or 0)):
                sdur = (s["complete"] - s["submit"]) / 1000 if s.get("submit") else -1
                line = (
                    f"    {sdur:7.3f}s wall {int(s.get('exec_run_ms') or 0)/1000:8.1f}s exec"
                    f" {int(s.get('cpu_ms') or 0)/1000:8.1f}s cpu {s.get('ntasks','?'):>4} tasks"
                    f" in={s.get('input_mb',0):>7} shR={s.get('sh_read_mb',0):>7}"
                    f" shW={s.get('sh_write_mb',0):>7}  {s.get('name','')}"
                    f"  | {s.get('details','')[:90]}"
                )
                print(line)
                rows.append({**s, "job": jid, "stage_wall_s": sdur})
        with open(f"/tmp/profile_{name}.json", "w") as f:
            json.dump(rows, f, indent=1, default=str)


if __name__ == "__main__":
    main()
