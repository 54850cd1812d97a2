"""Data-profiling operators (SURVEY.md §2.4 A9-A11, §3 EP3).

Reference: the offline profiler ``raw_analysis/main.py:41-122`` — per
column: dtype, null count, distinct count, describe-percentiles, top-10
values, string-length stats, IQR outlier counts; plus duplicate-row
count. Eager single-process pandas there; here one Spark job per
aggregate family, all map-side-combinable.

Scale notes:
- ``profile_columns`` computes ALL per-column scalar aggregates in ONE
  pass (a single ``agg`` with a flat expression list) — no per-column
  jobs, no shuffles beyond the final single-row reduce.
- Exact distinct counts shuffle per column; ``approx`` flips to HLL
  (``approx_count_distinct``) which stays map-side — the right call at
  100 TB (the reference's ``nunique`` is exact; both exposed).
- ``top_k_values`` and ``iqr_outliers`` are per-column passes (a
  groupBy and a filtered count respectively) — run them on the columns
  you care about, not the whole table, at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_row_count(df: DataFrame) -> int:
    """A9: rows minus distinct rows (reference raw_analysis/main.py:67-68)."""
    return df.count() - df.dropDuplicates().count()


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """A10: one row per column — count/nulls/distinct, min/max, and for
    string columns length stats (reference raw_analysis/main.py:61-99).

    Single aggregation pass; the wide single-row result is unpivoted
    driver-side via ``stack`` into (column, metric...) rows.
    """
    columns = columns or df.columns
    dtypes = dict(df.dtypes)
    exprs = []
    for c in columns:
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        exprs += [
            F.count(F.lit(1)).alias(f"{c}__count"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct.cast("long").alias(f"{c}__distinct"),
            # min/max on the native type, cast for display after — a
            # lexical min of numbers ("99" > "199") is not a profile
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            (
                F.min(F.length(c)) if dtypes[c] == "string" else F.lit(None).cast("int")
            ).alias(f"{c}__min_len"),
            (
                F.round(F.avg(F.length(c)), 2)
                if dtypes[c] == "string"
                else F.lit(None).cast("double")
            ).alias(f"{c}__avg_len"),
            (
                F.max(F.length(c)) if dtypes[c] == "string" else F.lit(None).cast("int")
            ).alias(f"{c}__max_len"),
        ]
    row = df.agg(*exprs)
    fields = ["count", "nulls", "distinct", "min", "max", "min_len", "avg_len", "max_len"]
    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}'")
        for f_ in fields:
            typ = {"count": "long", "nulls": "long", "distinct": "long",
                   "min_len": "int", "avg_len": "double", "max_len": "int"}.get(f_, "string")
            stack_args.append(f"cast(`{c}__{f_}` as {typ})")
    stack_expr = (
        f"stack({len(columns)}, {', '.join(stack_args)}) as "
        f"(col_name, n_rows, n_nulls, n_distinct, min_value, max_value, "
        f"min_length, avg_length, max_length)"
    )
    return row.select(F.expr(stack_expr))


def describe_numeric(
    df: DataFrame,
    columns: list[str],
    percentiles: list[float] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    exact: bool = True,
) -> DataFrame:
    """A10: describe-style numeric profile with the reference's extended
    percentiles (raw_analysis/main.py:75-82 uses [.01,.05,.95,.99]).

    One aggregation pass for ALL columns: each column contributes one
    ``percentile(col, array(...))`` plus count/mean/std/min/max; output
    is long-form (col_name, metric, value). ``exact=False`` switches to
    the sketch-based ``approx_percentile`` for the 100 TB path.
    """
    pct = "percentile" if exact else "approx_percentile"
    plist = ", ".join(str(p) for p in percentiles)
    exprs = []
    for c in columns:
        exprs += [
            F.count(F.col(c)).cast("double").alias(f"{c}__count"),
            F.avg(F.col(c)).alias(f"{c}__mean"),
            F.stddev(F.col(c)).alias(f"{c}__std"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
            F.expr(f"{pct}({c}, array({plist}))").alias(f"{c}__pcts"),
        ]
    row = df.agg(*exprs)
    pieces = []
    for c in columns:
        for m in ["count", "mean", "std", "min", "max"]:
            pieces.append(
                f"named_struct('col_name', '{c}', 'metric', '{m}', "
                f"'value', CAST(`{c}__{m}` AS DOUBLE))"
            )
        for i, p in enumerate(percentiles):
            pieces.append(
                f"named_struct('col_name', '{c}', 'metric', 'p{int(p * 100):02d}', "
                f"'value', CAST(`{c}__pcts`[{i}] AS DOUBLE))"
            )
    inline = f"inline(array({', '.join(pieces)}))"
    return row.select(F.expr(inline))


def top_k_values(df: DataFrame, column: str, k: int = 10) -> DataFrame:
    """A10/O2: top-k value counts (reference raw_analysis/main.py:95-96).

    Deterministic: ties broken by value. Aggregate-then-limit — the
    groupBy combines map-side, the sort sees only |distinct| rows.
    """
    return (
        df.groupBy(F.col(column).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc_nulls_last("value"))
        .limit(k)
    )


def iqr_outlier_count(
    df: DataFrame, column: str, factor: float = 1.5, exact: bool = True
) -> DataFrame:
    """A11: count values outside [q1 - f*IQR, q3 + f*IQR] (reference
    raw_analysis/main.py:84-93).

    ``exact`` uses ``percentile`` (full sort of the column — fine up to
    ~1e9 values); ``exact=False`` uses ``approx_percentile`` (constant
    memory sketch) for the 100 TB path.
    """
    pct = "percentile" if exact else "approx_percentile"
    q = df.agg(
        F.expr(f"{pct}({column}, 0.25)").alias("q1"),
        F.expr(f"{pct}({column}, 0.75)").alias("q3"),
    )
    # cross-join the 1-row quantile frame (broadcast) — one pass + reduce
    return (
        df.crossJoin(F.broadcast(q))
        .select(
            (
                (F.col(column) < F.col("q1") - factor * (F.col("q3") - F.col("q1")))
                | (F.col(column) > F.col("q3") + factor * (F.col("q3") - F.col("q1")))
            ).cast("long").alias("is_outlier")
        )
        .agg(F.sum("is_outlier").alias("n_outliers"))
    )
