"""Structured Streaming surface: event-time windowed aggregation and
gap sessionization over the ``events`` table.

The reference is batch-only (SURVEY.md §2.8 — no streaming anywhere),
so this module is a capability *extension*: the same transforms exposed
over both batch DataFrames and streams, the Spark-first way.

Design rules:
- Every streaming transform is written against a plain ``DataFrame``
  so the *identical function* runs in batch (oracle-checkable vs
  DuckDB) and in a ``readStream`` pipeline (watermark + incremental
  state). Tests run both and compare.
- Event time, not processing time: aggregations key on ``F.window(ts)``
  and late data is bounded with ``withWatermark`` — state is evictable,
  so a 100 TB/day stream holds hours of state, not days.
- Sessionization uses ``F.session_window`` (built-in gap sessions,
  JVM-side state store) rather than a custom stateful UDF; a custom
  ``applyInPandasWithState`` variant exists in ``stateful.py`` for the
  "operator Spark lacks" pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet, schema-matched to the
    batch reader (sources/files.py:read_table).

    ``readStream`` needs a user-declared schema (no inference on file
    streams), so the footer schema is taken from a zero-job batch read
    of the same file. That also absorbs the driver testdata's timestamp
    encoding: nanosecond parquet timestamps surface as long
    (``nanosAsLong``) and are rebuilt with the same ``div``-based
    expression as batch; microsecond timestamps pass through natively —
    either way stream and batch plans see identical ``ts`` values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stored = spark.read.parquet(path).schema  # footer only — no job
    raw = (
        spark.readStream.schema(stored)
        .option("maxFilesPerTrigger", "1")
        # file streams need a directory; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = stored["ts"].dataType
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(ts_type, T.TimestampNTZType):
        # watermarks need session-zoned TIMESTAMP, not NTZ; session tz
        # is UTC so the cast is value-preserving (same as read_table)
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation:
    (window_start, window_end, event_type, n, total_value).

    Batch and streaming share this exact plan; pass ``watermark`` only
    on a stream (bounds state: late rows beyond it are dropped).
    One shuffle on (window, event_type) with map-side partial
    aggregation — the canonical scalable shape.

    ``total_value`` CONTRACT (r12 breaking change, pinned here per
    ADVICE r12): ``value`` is treated as 2-decimal FIXED-POINT money —
    each row is cast to DECIMAL(18,2) (round-half-up to cents) BEFORE
    the sum, making the total exact and independent of partition/
    partial-agg order, then cast to double last. For money inputs this
    equals the r11 ``round(sum, 2)`` semantics exactly; for inputs
    with MORE than 2 meaningful decimals it differs from both the old
    behavior and a round-after-sum (per-row cents rounding is the
    point — order-independence requires fixing the precision before
    folding). Feed sub-cent-precision values through your own scaling
    (e.g. millicents as DECIMAL(18,5)) if per-row cents rounding is
    not acceptable.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    # total_value treats ``value`` as 2-decimal fixed-point money: the
    # sum is EXACT decimal (independent of partial-agg/partition order
    # — the r11 arithmetic-parity discipline), cast to double last.
    # Non-fixed-point inputs are rounded to cents BEFORE summing.
    return (
        src.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per user via the built-in ``session_window``:
    (user_id, session_start, session_end, n_events, total_value).

    A session extends while consecutive events arrive within ``gap``.
    Streaming state is per (user, open session) and merges on arrival;
    with a watermark, closed sessions emit and evict — bounded state at
    any corpus rate.

    ``total_value`` carries the same fixed-point-money contract as
    ``windowed_event_counts`` (per-row DECIMAL(18,2) cast before the
    exact decimal sum — see that docstring for the r12 breaking-change
    note and the sub-cent escape hatch).
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    # exact decimal money sum — same contract as windowed_event_counts
    return (
        src.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Time-interval equi-join: pair rows with matching ``on`` where
    ``right_time ∈ [left_time - lower, left_time + upper]``.

    Works identically on batch frames and on two streams — as a
    stream-stream join, Spark keeps each side buffered only for the
    interval bound (both sides must carry watermarks), so state is
    bounded by rate × interval, not by history.

    The matched right timestamp is exposed as ``matched_{right_time}``
    (internal join aliases never leak into the output schema).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in {on, right_time}
    ]
    matched_time = f"matched_{right_time}"
    r = right.select(
        F.col(on).alias("__rk"),
        F.col(right_time).alias(matched_time),
        *[F.col(c) for c in right_cols],
    )
    rt = F.col(matched_time)
    cond = (
        (F.col(on) == F.col("__rk"))
        & (rt >= F.col(left_time) - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rt <= F.col(left_time) + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.join(r, cond, "inner").drop("__rk")


def run_stream_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a streaming DataFrame to completion with
    ``trigger(availableNow)`` into an in-memory sink; returns the
    result table. Test/debug utility — production streams use a real
    sink + checkpoint dir.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a streaming fact feed against a
    batch dimension — the production pattern for attaching reference
    data (user profile, product, geo) to events in flight. The static
    side is explicitly ``broadcast`` so every micro-batch plans a
    stateless map-side hash join: no streaming state, no shuffle of
    the stream, and the dimension is re-resolved per micro-batch (a
    dimension table updated between batches is picked up on the next
    trigger — the cheap-and-cheerful SCD0; pair with ``scd2_stream_
    writer`` when history matters).

    ``how`` is 'left' (keep unmatched events) or 'inner'; right/full
    joins on the STATIC side are not supported by Spark for streams
    (they would need the stream's end to emit unmatched dim rows).
    """
    if how not in ("left", "inner"):
        raise ValueError("stream-static join supports how='left'|'inner'")
    cols = dim_cols or [c for c in dim.columns if c != on]
    d = dim.select(on, *cols)
    return stream.join(F.broadcast(d), on, how)
