"""Structured Streaming tests: batch/stream plan equivalence and the
custom stateful first-seen dedup operator.

All streams read the real events parquet with trigger(availableNow)
— bounded, deterministic, no wall-clock dependence.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dw_etl_spark.sources.files import read_table
from dw_etl_spark.streaming import (
    first_seen_dedup,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


def _as_sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_windowed_counts_stream_equals_batch(spark):
    batch = read_table(spark, SF_SMOKE, "events")
    want = _as_sorted_rows(
        windowed_event_counts(batch, window="1 day"),
        ["window_start", "event_type", "n", "total_value"],
    )
    stream = read_events_stream(spark, SF_SMOKE)
    got_df = run_stream_to_memory(
        windowed_event_counts(stream, window="1 day", watermark="2 days"),
        name="win_counts",
    )
    got = _as_sorted_rows(got_df, ["window_start", "event_type", "n", "total_value"])
    assert got == want
    assert len(got) > 0


def test_sessionize_stream_equals_batch(spark):
    batch = read_table(spark, SF_SMOKE, "events")
    want = _as_sorted_rows(
        sessionize(batch, gap="30 minutes"),
        ["user_id", "session_start", "session_end", "n_events", "total_value"],
    )
    stream = read_events_stream(spark, SF_SMOKE)
    got_df = run_stream_to_memory(
        sessionize(stream, gap="30 minutes", watermark="2 days"),
        name="sessions",
    )
    got = _as_sorted_rows(
        got_df, ["user_id", "session_start", "session_end", "n_events", "total_value"]
    )
    assert got == want
    assert len(got) > 0


def test_session_end_is_last_event_plus_gap(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
         (1, "2024-01-01 12:00:00")],
        ["user_id", "ts_s"],
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), F.lit(1.0).alias("value"))
    rows = sessionize(df, gap="30 minutes").orderBy("session_start").collect()
    assert len(rows) == 2
    assert rows[0]["n_events"] == 2
    assert str(rows[0]["session_end"]) == "2024-01-01 10:40:00"
    assert rows[1]["n_events"] == 1


def test_interval_join_stream_equals_batch(spark):
    from dw_etl_spark.streaming.windows import interval_join

    batch = read_table(spark, SF_SMOKE, "events")
    purchases = batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = batch.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    want = _as_sorted_rows(
        interval_join(
            purchases, clicks, on="user_id", left_time="p_ts",
            right_time="c_ts", lower_seconds=3600, upper_seconds=0,
        ),
        ["p_id", "c_id"],
    )
    assert len(want) > 0

    s = read_events_stream(spark, SF_SMOKE)
    sp = (
        s.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 days")
    )
    sc = (
        s.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"))
        .withWatermark("c_ts", "2 days")
    )
    got_df = run_stream_to_memory(
        interval_join(
            sp, sc, on="user_id", left_time="p_ts",
            right_time="c_ts", lower_seconds=3600, upper_seconds=0,
        ),
        name="interval_join",
        output_mode="append",
    )
    assert _as_sorted_rows(got_df, ["p_id", "c_id"]) == want


def test_checkpointed_file_sink_recovery(spark, tmp_path):
    """Production sink path: parquet file sink + checkpoint. A restart
    with the same checkpoint must not duplicate output (exactly-once
    within the sink's commit protocol)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, SF_SMOKE)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n_events = read_table(spark, SF_SMOKE, "events").count()
    assert spark.read.parquet(out).count() == n_events
    # "restart": same checkpoint, no new source files → no new output
    run_once()
    assert spark.read.parquet(out).count() == n_events


def test_first_seen_dedup_stream(spark):
    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_type", "event_id", "value"
    )
    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    got = run_stream_to_memory(
        first_seen_dedup(stream, "event_type", out_schema),
        name="first_seen",
        output_mode="append",
    ).collect()
    types = [r["event_type"] for r in got]
    assert len(types) == len(set(types))  # exactly one row per key
    batch_types = {
        r[0]
        for r in read_table(spark, SF_SMOKE, "events").select("event_type").distinct().collect()
    }
    assert set(types) == batch_types


def test_scd2_stream_writer_incremental_dimension(spark, tmp_path):
    """foreachBatch SCD2 maintenance: stream attribute updates into a
    parquet dimension; versions open/close across epochs and a restart
    with the same checkpoint is a no-op (idempotent merge)."""
    import json

    from dw_etl_spark.operators.scd import scd2_current
    from dw_etl_spark.streaming.sinks import scd2_stream_writer

    src = tmp_path / "updates"
    src.mkdir()
    dim_path = str(tmp_path / "dim_country")
    ckpt = str(tmp_path / "ckpt")
    schema = "country string, gdp double, seen string"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "*.json")
            .json(str(src))
        )
        q = scd2_stream_writer(
            stream, spark, dim_path,
            key=["country"], attrs=["gdp"],
            checkpoint_dir=ckpt, effective_col="seen",
        )
        q.awaitTermination()

    # epoch 1: two brand-new keys (one with an in-batch duplicate —
    # latest by `seen` must win)
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"country": "PL", "gdp": 100.0, "seen": "2024-01-01"},
            {"country": "PL", "gdp": 105.0, "seen": "2024-02-01"},
            {"country": "DE", "gdp": 200.0, "seen": "2024-02-01"},
        ])
    )
    run()
    cur = {r["country"]: r["gdp"] for r in scd2_current(spark.read.parquet(dim_path)).collect()}
    assert cur == {"PL": 105.0, "DE": 200.0}

    # epoch 2: PL changes, DE unchanged
    (src / "b2.json").write_text(
        json.dumps({"country": "PL", "gdp": 110.0, "seen": "2024-06-01"})
        + "\n"
        + json.dumps({"country": "DE", "gdp": 200.0, "seen": "2024-06-01"})
    )
    run()
    dim = spark.read.parquet(dim_path)
    assert {r["country"]: r["gdp"] for r in scd2_current(dim).collect()} == {
        "PL": 110.0, "DE": 200.0,
    }
    closed_pl = dim.filter("country = 'PL' AND valid_to IS NOT NULL").collect()
    assert len(closed_pl) == 1 and str(closed_pl[0]["valid_to"]) == "2024-06-01"

    # restart with no new data: nothing changes (checkpoint + idempotence)
    before = sorted(map(tuple, dim.collect()))
    run()
    assert sorted(map(tuple, spark.read.parquet(dim_path).collect())) == before


def test_watermarked_dedup_suppresses_replayed_events(spark):
    from dw_etl_spark.streaming.stateful import watermarked_dedup

    # replay the whole feed twice in one bounded stream: the union is
    # two copies of every event_id, all within any sane watermark.
    base = read_events_stream(spark, SF_SMOKE).select("ts", "event_id", "value")
    doubled = base.union(base)
    got = run_stream_to_memory(
        watermarked_dedup(doubled, ["event_id"], "ts", "1 hour"),
        name="wm_dedup",
        output_mode="append",
    ).collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids))  # one survivor per event_id
    n_batch = read_table(spark, SF_SMOKE, "events").count()
    assert len(ids) == n_batch


def test_enrich_stream_equals_batch_join(spark):
    from dw_etl_spark.streaming.windows import enrich_stream

    events = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "user_id", "value"
    )
    # a tiny static dimension keyed on user_id
    dim = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("string"))
    )
    got = run_stream_to_memory(
        enrich_stream(events, dim, "user_id"),
        name="enriched",
        output_mode="append",
    )
    batch = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    ).join(dim, "user_id", "left")
    want = _as_sorted_rows(batch, ["event_id", "user_id", "segment"])
    assert _as_sorted_rows(got, ["event_id", "user_id", "segment"]) == want


def test_manifest_parquet_sink_two_phase_commit(spark, tmp_path):
    import glob
    import json
    import os

    from dw_etl_spark.streaming.sinks import ManifestParquetDataSource

    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "sink")
    os.makedirs(out, exist_ok=True)
    stream = read_events_stream(spark, SF_SMOKE).select(
        "event_id", "event_type", "value"
    )
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    manifests = sorted(glob.glob(os.path.join(out, "_manifest-*.json")))
    assert manifests  # every committed epoch is manifested
    manifested = 0
    for mf in manifests:
        meta = json.load(open(mf))
        for entry in meta["files"]:
            f = os.path.join(out, f"epoch={meta['batch']}", entry["file"])
            assert os.path.exists(f)
            manifested += entry["rows"]
    # nothing left uncommitted, and every event landed exactly once
    assert glob.glob(os.path.join(out, ".staging", "*")) == []
    n = read_table(spark, SF_SMOKE, "events").count()
    assert manifested == n
    back = spark.read.parquet(os.path.join(out, "epoch=*"))
    assert back.count() == n
    assert sorted(r["event_id"] for r in back.collect()) == sorted(
        r["event_id"]
        for r in read_table(spark, SF_SMOKE, "events").collect()
    )


def test_drift_monitor_stream_writer_flags_shifted_epoch(spark, tmp_path):
    """Two file-stream epochs against a pinned reference: the
    same-distribution epoch reads stable (KS small, PSI under the 0.25
    bar), the shifted epoch trips every detector (disjoint numeric
    support → KS=1, PSI deep in 'shifted'; new vocabulary → JSD up);
    n_rows lands per epoch and metrics are epoch-partitioned."""
    import json

    from dw_etl_spark.streaming.sinks import drift_monitor_stream_writer

    ref = spark.createDataFrame(
        [(f"alpha beta gamma tok{i % 7}", float(i % 100)) for i in range(400)],
        "text string, v double",
    )
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("text string, v double").json(str(src))
        q = drift_monitor_stream_writer(
            stream, ref, out, ckpt, text_col="text", numeric_col="v"
        )
        q.awaitTermination()

    # epoch 0: same generator → no drift
    (src / "e0.json").write_text(
        "\n".join(
            json.dumps({"text": f"alpha beta gamma tok{i % 7}", "v": float(i % 100)})
            for i in range(200)
        )
    )
    run()
    # epoch 1: disjoint numeric support + new vocabulary
    (src / "e1.json").write_text(
        "\n".join(
            json.dumps({"text": f"omega psi chi new{i % 5}", "v": 5000.0 + i})
            for i in range(200)
        )
    )
    run()

    rows = spark.read.parquet(out).collect()
    m = {}
    for r in rows:
        m.setdefault(int(r["epoch"]), {})[r["metric"]] = r["value"]
    assert set(m) == {0, 1}
    assert m[0]["n_rows"] == 200.0 and m[1]["n_rows"] == 200.0
    assert m[0]["ks"] < 0.1 and m[0]["psi"] < 0.25
    assert m[1]["ks"] == 1.0 and m[1]["psi"] > 1.0
    assert m[1]["jsd"] > m[0]["jsd"]


def _await_not_cached(df, timeout_s: float = 15.0) -> bool:
    """The termination listener fires on its own thread — poll."""
    import time

    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        lvl = df.storageLevel
        if not (lvl.useMemory or lvl.useDisk):
            return True
        time.sleep(0.2)
    return False


def test_drift_monitor_unpersists_reference_and_guards_empty_batch(
    spark, tmp_path
):
    """(a) The pinned reference is released when the query terminates —
    two sequential monitors on the same session never accumulate
    cached snapshots; (b) an all-empty micro-batch records ONLY
    n_rows=0 (no maximal-JSD artifact, no NULL-delta TypeError)."""
    import json

    from dw_etl_spark.streaming.sinks import drift_monitor_stream_writer

    ref = spark.createDataFrame(
        [(f"alpha beta tok{i % 5}", float(i % 50)) for i in range(100)],
        "text string, v double",
    )
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "metrics")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("text string, v double").json(
            str(src)
        )
        q = drift_monitor_stream_writer(
            stream, ref, out, ckpt, text_col="text", numeric_col="v"
        )
        q.awaitTermination()

    # epoch 0: an EMPTY file -> a zero-row micro-batch
    (src / "e0.json").write_text("")
    run()
    assert _await_not_cached(ref), "reference still pinned after stop"

    # epoch 1: real rows; the monitor re-persists and re-releases
    (src / "e1.json").write_text(
        "\n".join(
            json.dumps({"text": f"alpha beta tok{i % 5}", "v": float(i % 50)})
            for i in range(100)
        )
    )
    run()
    assert _await_not_cached(ref), "second monitor left the reference pinned"

    rows = spark.read.parquet(out).collect()
    m = {}
    for r in rows:
        m.setdefault(int(r["epoch"]), {})[r["metric"]] = r["value"]
    assert m[0] == {"n_rows": 0.0}  # empty epoch: no drift metrics
    assert m[1]["n_rows"] == 100.0
    assert {"jsd", "ks", "psi"} <= set(m[1])
    assert m[1]["ks"] < 0.1  # same generator as the reference


def test_cms_stream_writer_state_and_replay_safety(spark, tmp_path):
    """Streaming Count-Min maintenance (streaming/sinks.py): after the
    availableNow run, estimating from the persisted grid matches exact
    batch counts (low-cardinality keys vs width => no collisions), and
    re-applying an already-committed epoch is a no-op — CMS merge is a
    sum, so replay protection is the correctness property here, unlike
    the idempotent SCD2 merge."""
    from dw_etl_spark.operators.sketches import cms_estimate
    from dw_etl_spark.streaming.sinks import (
        cms_batch_applier,
        cms_stream_writer,
    )

    state = str(tmp_path / "cms_state")
    q = cms_stream_writer(
        read_events_stream(spark, SF_SMOKE).select("event_type"),
        state_dir=state,
        key_col="event_type",
        checkpoint_dir=str(tmp_path / "ckpt"),
        width=64,
        depth=3,
    )
    q.awaitTermination()

    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cells = spark.read.parquet(f"{state}/cells")
    items = spark.createDataFrame(
        [(k,) for k in exact], "event_type string"
    )
    est = {
        r["event_type"]: r["est"]
        for r in cms_estimate(cells, items, "event_type", 64, 3).collect()
    }
    assert est == exact

    # replay an epoch that is already in the committed set: state must
    # not change (grid cells identical, no double counting)
    epochs = [
        r["epoch"] for r in spark.read.parquet(f"{state}/epochs").collect()
    ]
    before = sorted(map(tuple, cells.collect()))
    batch = read_table(spark, SF_SMOKE, "events").select("event_type")
    cms_batch_applier(state, "event_type", 64, 3)(batch, epochs[0])
    after = sorted(
        map(tuple, spark.read.parquet(f"{state}/cells").collect())
    )
    assert after == before

    # a genuinely new epoch DOES merge (totals double)
    cms_batch_applier(state, "event_type", 64, 3)(batch, max(epochs) + 1)
    est2 = {
        r["event_type"]: r["est"]
        for r in cms_estimate(
            spark.read.parquet(f"{state}/cells"), items, "event_type", 64, 3
        ).collect()
    }
    assert est2 == {k: 2 * v for k, v in exact.items()}


def test_cms_applier_crash_recovery_never_loses_state(spark, tmp_path):
    """Round-9 advice fix: the CMS commit is a rename-aside swap, so a
    crash at EITHER point between the directory operations leaves the
    prior epochs' grid recoverable — the old rmtree-then-rename order
    had a window where the state directory did not exist and a replay
    silently rebuilt the grid from the current batch alone. Simulated
    crash states: (a) live renamed aside, staged not yet promoted;
    (b) staged promoted, aside copy not yet removed; (c) orphaned
    ``__staging`` beside a healthy live dir. In every case the next
    apply_batch recovers and the final estimates count BOTH epochs."""
    import shutil
    from pathlib import Path

    from dw_etl_spark.operators.sketches import cms_estimate
    from dw_etl_spark.streaming.sinks import cms_batch_applier

    batch = read_table(spark, SF_SMOKE, "events").select("event_type")
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    items = spark.createDataFrame([(k,) for k in exact], "event_type string")

    def estimates(state: str) -> dict:
        return {
            r["event_type"]: r["est"]
            for r in cms_estimate(
                spark.read.parquet(f"{state}/cells"),
                items,
                "event_type",
                64,
                3,
            ).collect()
        }

    for crash in ("mid_swap", "post_swap", "orphan_staging"):
        state = str(tmp_path / f"cms_{crash}")
        apply = cms_batch_applier(state, "event_type", 64, 3)
        apply(batch, 0)  # epoch 0 commits cleanly
        live, old = Path(state), Path(f"{state}__old")
        staging = Path(f"{state}__staging")
        if crash == "mid_swap":
            # crashed between rename(live→old) and rename(staging→live):
            # epoch 1's staged write exists, live is gone
            shutil.copytree(live, staging)
            live.rename(old)
        elif crash == "post_swap":
            # crashed after promote, before dropping the aside copy
            shutil.copytree(live, old)
        else:
            # crashed during the staging write itself
            shutil.copytree(live, staging)
        # the replayed epoch 1 must recover, then apply exactly once
        apply(batch, 1)
        assert estimates(state) == {k: 2 * v for k, v in exact.items()}, crash
        assert not old.exists() and not staging.exists()


def test_kmins_stream_writer_state_equals_one_shot_and_replay(spark, tmp_path):
    """Streaming k-mins maintenance: after the availableNow run the
    persisted sketch is BYTE-IDENTICAL to a one-shot batch sketch over
    the same rows (mergeable-state contract), replaying any batch is a
    no-op because the min-merge is idempotent (no watermark machinery
    to go wrong), and the state answers a corpus-overlap question
    against a batch-side sketch."""
    from dw_etl_spark.operators.sketches import (
        kmins_match_count,
        kmins_sketch,
    )
    from dw_etl_spark.streaming.sinks import (
        kmins_batch_applier,
        kmins_stream_writer,
    )

    K = 32
    state = str(tmp_path / "km_state")
    q = kmins_stream_writer(
        read_events_stream(spark, SF_SMOKE).select("user_id"),
        state_dir=state,
        key_col="user_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=K,
    )
    q.awaitTermination()

    events = read_table(spark, SF_SMOKE, "events")
    one_shot = kmins_sketch(events, "user_id", k=K).collect()[0]["kmins"]
    streamed = spark.read.parquet(f"{state}/kmins").collect()[0]["kmins"]
    assert streamed == one_shot

    # idempotent replay: re-applying the full corpus changes nothing
    kmins_batch_applier(state, "user_id", K)(events.select("user_id"), 999)
    assert (
        spark.read.parquet(f"{state}/kmins").collect()[0]["kmins"]
        == one_shot
    )

    # the persisted state is directly usable for overlap questions:
    # against a sketch of the SAME key set every coordinate matches
    batch_side = kmins_sketch(events, "user_id", k=K).collect()[0]["kmins"]
    df = spark.createDataFrame(
        [(streamed, batch_side)],
        "a array<string>, b array<string>",
    )
    assert df.select(kmins_match_count("a", "b").alias("m")).collect()[0][
        "m"
    ] == K
