"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Not in the reference either (SURVEY.md §2.3 notes their absence) — these
are capability extensions a time-series/feature-store workload needs,
implemented as compositions of existing DataFrame ops (option (a) of
the custom-operator ladder; no UDF, no mapPartitions).

``asof_join`` — for each left row (key, t), attach the latest right row
with the same key and t_right ≤ t (backward direction; DuckDB's native
``ASOF JOIN`` is the oracle).

Scale design — the union+window trick instead of a join:
  tag both sides, union, one window per key ordered by (t, side),
  ``last(right_payload, ignorenulls)`` carries the most recent right
  row forward to each left row. Cost = one shuffle of each side on the
  key (the same minimum any keyed join pays) + a linear in-partition
  scan. The naive alternative — theta-join on (key, t_r <= t) + top-1 —
  is a per-key quadratic blowup on exactly the hot keys that dominate
  a 100 TB feed. Skew in the key column is handled by AQE; a single
  degenerate key is bounded by that key's own row count, never by
  |left| x |right|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with t_right ≤ t_left per key.

    Output: all ``left`` columns + ``asof_<right_time>`` + the requested
    ``right_cols`` (prefixed ``asof_``); unmatched (or out-of-tolerance)
    rows keep NULLs — left-outer semantics, |output| == |left|.

    Right rows tied on (key, t_right) are resolved arbitrarily — dedupe
    the right side first if that matters (one groupBy, cheap relative
    to the join itself).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_time}
    ]
    payload = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # at equal t, right (side 0) sorts first so t_right == t_left matches
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "__m", F.last("__rv", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        t_dt = left.schema[left_time].dataType
        if isinstance(t_dt, (T.TimestampType, T.TimestampNTZType)):
            lag_ok = (
                F.unix_micros(F.col("__t")) - F.unix_micros(F.col("__m.__rt"))
            ) <= int(tolerance_seconds * 1_000_000)
        else:
            lag_ok = (F.col("__t") - F.col("__m.__rt")) <= F.lit(tolerance_seconds)
        matched = matched.withColumn(
            "__m", F.when(lag_ok, F.col("__m"))
        )

    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__rt").alias(f"asof_{right_time}"),
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols],
    )


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
    how: str = "inner",
) -> DataFrame:
    """Join facts to a bucket table on ``low <= value < high``.

    The ranges side is broadcast — a non-equi predicate against a
    broadcast table is a BroadcastNestedLoopJoin, linear in |facts| x
    |ranges| with |ranges| small and local (no shuffle of the fact
    side at all). For a large ranges side, pre-bin both sides to an
    equi-key instead (operators/bins.py) — never NLJ two big tables.
    """
    pred = (F.col(value_col) >= ranges[low_col]) & (F.col(value_col) < ranges[high_col])
    return facts.join(F.broadcast(ranges), pred, how)
