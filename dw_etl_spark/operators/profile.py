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


def bracketed_exact_percentiles(
    df: DataFrame,
    columns: list[str],
    percentiles: list[float],
    accuracy: int | None = None,
) -> dict[str, list[float | None]]:
    """Exact interpolated percentiles in two narrow passes — the scale
    path for exact order statistics (the built-in ``percentile`` agg
    carries a per-partition value map: ~O(distinct) state per task and
    a giant final merge; 2.8× slower at 600k rows, unusable at 100 TB).

      pass 1 — count(col) + an approx_percentile sketch probed at
               p ± 3/accuracy: rank-error guarantees make [lo, hi] a
               certain bracket of both interpolation neighbors.
      pass 2a — per percentile: exact count(col < lo) (one flat agg).
      pass 2b — histogram of the in-bracket values: value → count via
               a melt + groupBy (NOT a raw collect_list — a tie-heavy
               column puts one value at many ranks, and collecting
               duplicates scales with row count; distinct values stay
               ≤ ~6·n/accuracy).
      driver — walk the cumulative histogram to the floor/ceil ranks,
               interpolate with the same lower + (upper-lower)·frac
               arithmetic as ``percentile``/DuckDB ``quantile_cont``
               (IEEE-identical).

    ``accuracy`` auto-scales as clamp(n/10⁴, 10⁴, 10⁶) so the collected
    histogram stays ~60k entries regardless of n (≤ ~50 MB at the cap).
    Falls back to the ``percentile`` agg if a bracket misses (cannot
    happen within the sketch's guarantees — pure defense).
    """
    import math

    def run_pass1(acc: int):
        eps = 3.0 / acc
        probes: list[float] = []
        for p in percentiles:
            probes += [max(0.0, p - eps), min(1.0, p + eps)]
        plist = ", ".join(repr(p) for p in probes)
        return df.agg(
            F.count(F.lit(1)).alias("__nrows"),
            *[F.count(F.col(c)).alias(f"{c}__n") for c in columns],
            *[
                F.expr(f"approx_percentile({c}, array({plist}), {acc})").alias(
                    f"{c}__b"
                )
                for c in columns
            ],
        ).first()

    # optimistic first sketch at the floor accuracy; re-sketch only when
    # the observed row count wants a tighter one (n > 1e8) — saves a
    # dedicated count pass in the common case
    acc = accuracy or 10_000
    pass1 = run_pass1(acc)
    if accuracy is None:
        needed = min(max(pass1["__nrows"] // 10_000, 10_000), 1_000_000)
        if needed > acc:
            acc = needed
            pass1 = run_pass1(acc)

    # pass 2a: exact below-bracket counts, one flat agg
    aggs = []
    bracket_conds: dict[str, object] = {}
    for c in columns:
        brackets = pass1[f"{c}__b"]
        if brackets is None:
            continue
        cond = None
        for i in range(len(percentiles)):
            lo, hi = brackets[2 * i], brackets[2 * i + 1]
            aggs.append(
                F.sum((F.col(c) < F.lit(lo)).cast("long")).alias(f"{c}__clo{i}")
            )
            in_bracket = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
            cond = in_bracket if cond is None else cond | in_bracket
        bracket_conds[c] = cond

    # pass 2b: in-bracket value histogram for all columns in one job
    def run_pass2b() -> dict[str, list[tuple[float, int]]]:
        out: dict[str, list[tuple[float, int]]] = {c: [] for c in columns}
        if not bracket_conds:
            return out
        melt = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("__col"),
                        F.when(bracket_conds[c], F.col(c).cast("double")).alias(
                            "__val"
                        ),
                    )
                    for c in bracket_conds
                ]
            )
        )
        for r in (
            df.select(melt.alias("m"))
            .select("m.__col", "m.__val")
            .filter(F.col("__val").isNotNull())
            .groupBy("__col", "__val")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .collect()
        ):
            out[r["__col"]].append((r["__val"], r["__cnt"]))
        for c in out:
            out[c].sort()
        return out

    # 2a and 2b both depend only on pass 1's brackets — two independent
    # jobs, submitted concurrently so their fixed latencies overlap
    # (r14, guide §2.6; this fit sits under describe_stats,
    # profile_metrics, approx_profile AND winsorize)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _ex:
        p2b_fut = _ex.submit(run_pass2b)
        pass2 = df.agg(*aggs).first() if aggs else None
        hist = p2b_fut.result()

    out: dict[str, list[float | None]] = {}
    for c in columns:
        n = pass1[f"{c}__n"]
        brackets = pass1[f"{c}__b"]
        vals: list[float | None] = []
        for i, p in enumerate(percentiles):
            if n == 0 or brackets is None:
                vals.append(None)
                continue
            h = (n - 1) * p
            fl, ce = math.floor(h), math.ceil(h)
            clo = pass2[f"{c}__clo{i}"] or 0
            lo, hi = brackets[2 * i], brackets[2 * i + 1]

            def value_at(rank: int) -> float | None:
                cum = clo
                for v, cnt in hist[c]:
                    if v < lo or v > hi:
                        continue
                    cum += cnt
                    if rank < cum:
                        return v
                return None

            vlo, vhi = value_at(fl), value_at(ce)
            if fl < clo or vlo is None or vhi is None:  # bracket miss
                exact = df.agg(
                    F.expr(f"percentile({c}, {p!r})").alias("v")
                ).first()["v"]
                vals.append(exact)
                continue
            vals.append(vlo + (vhi - vlo) * (h - fl))
        out[c] = vals
    return out


def describe_numeric(
    df: DataFrame,
    columns: list[str],
    percentiles: list[float] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
    exact: bool = True,
    mean_dec: str | None = None,
) -> DataFrame:
    """A10: describe-style numeric profile with the reference's extended
    percentiles (raw_analysis/main.py:75-82 uses [.01,.05,.95,.99]).

    One lazy aggregation pass for ALL columns' count/mean/std/min/max;
    ``exact=True`` computes percentiles via the two-pass
    ``bracketed_exact_percentiles`` (values land as literals in the
    output plan); ``exact=False`` keeps everything in one pass with the
    sketch-based ``approx_percentile`` for when approximate is fine.

    ``mean_dec`` (e.g. ``"decimal(18,2)"``): when the profiled columns
    are fixed-point (money, quantities), pass their decimal type and
    the mean is computed as an EXACT decimal sum cast to double over
    the count — one correctly-rounded division, independent of
    partial-aggregation order on any engine (the r11 sweep caught
    float avg() flipping a compared digit between Spark's tree
    aggregation and a sequential oracle at 6M rows). Default keeps the
    float ``avg`` for genuinely-continuous columns.
    """
    exprs = []
    for c in columns:
        mean_expr = (
            (F.sum(F.col(c).cast(mean_dec)).cast("double") / F.count(F.col(c)))
            if mean_dec
            else F.avg(F.col(c))
        )
        exprs += [
            F.count(F.col(c)).cast("double").alias(f"{c}__count"),
            mean_expr.alias(f"{c}__mean"),
            F.stddev(F.col(c)).alias(f"{c}__std"),
            F.min(F.col(c)).cast("double").alias(f"{c}__min"),
            F.max(F.col(c)).cast("double").alias(f"{c}__max"),
        ]
    if exact:
        pct_vals = bracketed_exact_percentiles(df, columns, list(percentiles))
    else:
        plist = ", ".join(str(p) for p in percentiles)
        for c in columns:
            exprs.append(
                F.expr(f"approx_percentile({c}, array({plist}))").alias(f"{c}__pcts")
            )
    row = df.agg(*exprs)
    pieces = []
    for c in columns:
        for m in ["count", "mean", "std", "min", "max"]:
            pieces.append(
                f"named_struct('col_name', '{c}', 'metric', '{m}', "
                f"'value', CAST(`{c}__{m}` AS DOUBLE))"
            )
        for i, p in enumerate(percentiles):
            if exact:
                v = pct_vals[c][i]
                lit = "CAST(NULL AS DOUBLE)" if v is None else f"CAST({v!r} AS DOUBLE)"
            else:
                lit = f"CAST(`{c}__pcts`[{i}] AS DOUBLE)"
            pieces.append(
                f"named_struct('col_name', '{c}', 'metric', 'p{int(p * 100):02d}', "
                f"'value', {lit})"
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
    df: DataFrame,
    column: str,
    factor: float = 1.5,
    exact: bool = True,
    fit_df: DataFrame | None = None,
) -> DataFrame:
    """A11: count values outside [q1 - f*IQR, q3 + f*IQR] (reference
    raw_analysis/main.py:84-93).

    ``exact=True`` gets q1/q3 from the two-pass
    ``bracketed_exact_percentiles`` (exact values, no per-task value
    maps — the 100 TB-safe exact path); ``exact=False`` uses the
    one-pass ``approx_percentile`` sketch when approximate is fine.
    Either way the outlier count itself is one narrow pass + reduce.

    ``fit_df``: an alternative frame holding the SAME rows for the
    eager percentile fit (r14) — e.g. an unspread scan whose narrow
    aggregates skip the small-scan fan-out exchange that ``df``'s
    consumers want; the exact fit is partitioning-independent, so the
    counted result is identical.
    """
    if exact:
        q1, q3 = bracketed_exact_percentiles(
            fit_df if fit_df is not None else df, [column], [0.25, 0.75]
        )[column]
        if q1 is None:
            return df.limit(0).agg(F.lit(0).cast("long").alias("n_outliers"))
        fence_lo = q1 - factor * (q3 - q1)
        fence_hi = q3 + factor * (q3 - q1)
        return df.select(
            (
                (F.col(column) < F.lit(fence_lo)) | (F.col(column) > F.lit(fence_hi))
            ).cast("long").alias("is_outlier")
        ).agg(F.sum("is_outlier").alias("n_outliers"))
    q = df.agg(
        F.expr(f"approx_percentile({column}, 0.25)").alias("q1"),
        F.expr(f"approx_percentile({column}, 0.75)").alias("q3"),
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


def winsorize(
    df: DataFrame,
    columns: list[str],
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Clip each column to its exact [p_lo, p_hi] percentile interval —
    outlier capping for numeric features before scaling/aggregation
    (the destructive complement of ``iqr_outlier_count``'s report).

    Bounds come from ``bracketed_exact_percentiles`` (two narrow
    passes, constant-memory tasks) and land as literals — the clip is a
    pure narrow map. NULLs pass through; an all-NULL column is
    returned unchanged.
    """
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError("need 0 <= p_lo < p_hi <= 1")
    bounds = bracketed_exact_percentiles(df, columns, [p_lo, p_hi])
    out = df
    for c in columns:
        lo, hi = bounds[c]
        if lo is None or hi is None:
            continue
        out = out.withColumn(
            c, F.least(F.greatest(F.col(c), F.lit(lo)), F.lit(hi))
        )
    return out


def standardize(
    df: DataFrame, columns: list[str], out_suffix: str = "_z"
) -> DataFrame:
    """Append z-scored copies (``<col>_z``, rounded to 6) of numeric
    columns: (x − mean)/stddev_samp, NULL when the column is constant
    or empty (no scale to divide by). One agg pass collects all
    means/stds (driver-side: 2·|columns| scalars); the scaling itself
    is a narrow map with literal coefficients — at 100 TB the data is
    touched twice, shuffled never.
    """
    aggs = []
    for c in columns:
        aggs += [F.avg(c).alias(f"__m_{c}"), F.stddev_samp(c).alias(f"__s_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = df
    for c in columns:
        m, s = row[f"__m_{c}"], row[f"__s_{c}"]
        if m is None or s is None or s == 0.0:
            out = out.withColumn(c + out_suffix, F.lit(None).cast("double"))
        else:
            out = out.withColumn(
                c + out_suffix,
                F.round((F.col(c) - F.lit(float(m))) / F.lit(float(s)), 6),
            )
    return out


def key_skew_profile(
    df: DataFrame, keys: list[str], k: int = 10
) -> DataFrame:
    """Pre-join skew diagnostic: the top-k heaviest key groups plus a
    'total' summary row — the measurement that decides between a plain
    shuffle join, ``scale.salted_join``, and AQE's skew-join handling
    BEFORE the 100 TB shuffle is launched, not after one straggler
    task has been running for an hour.

    Output (kind, key, n, frac, rows, distinct_keys):
      kind='key'   — top-k groups by count (n DESC, key ASC — total
                     order), with frac = n/rows.
      kind='total' — key='', n = max group count, frac = top-1 share,
                     plus the table row count and distinct key count.

    Rules of thumb the numbers feed: top-1 share >~ 1/shuffle-partitions
    means one task owns that key's whole group; max-group rows x row
    width >~ executor memory means salting (or AQE skew split) is
    mandatory. Scale shape: one key-count shuffle (map-side combined),
    then TakeOrdered for the top-k and a tiny agg for the summary —
    the profiled table streams through once. NULL key parts render as
    the sentinel '<null>' and count as a real group (joins drop them,
    but they still skew the shuffle write).
    """
    counts = (
        df.groupBy(
            F.concat_ws(
                "|",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
                    for c in keys
                ],
            ).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()  # consumed by top-k AND summary
    )
    total = counts.agg(
        F.sum("n").alias("rows"),
        F.max("n").alias("mx"),
        F.count(F.lit(1)).alias("dk"),
    )
    top = (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.lit("key").alias("kind"),
            "key",
            "n",
            F.round(F.col("n") / F.col("rows"), 6).alias("frac"),
            F.col("rows").cast("long").alias("rows"),
            F.col("dk").cast("long").alias("distinct_keys"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
    )
    summary = total.select(
        F.lit("total").alias("kind"),
        F.lit("").alias("key"),
        F.col("mx").alias("n"),
        F.round(F.col("mx") / F.col("rows"), 6).alias("frac"),
        F.col("rows").cast("long").alias("rows"),
        F.col("dk").cast("long").alias("distinct_keys"),
    )
    return top.unionByName(summary)
