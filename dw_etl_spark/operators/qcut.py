"""Per-group quantile bucketing (SURVEY.md §2.4 A8, §2.5 W3).

Reference: ``groupby('Year')[ind].transform(qcut(q=3, duplicates='drop'))``
labeled Low/Medium/High, collapsing to fewer labels when quantile edges
tie (transform.py:322-353).

Two engine variants, different tie semantics, both distributed:

- ``ntile_buckets`` — count-based n-tiles. Deterministic given a total
  order (pass a tiebreak column). NULL values keep a NULL bucket
  (pandas qcut propagates NaN). Implemented as *exact ntile arithmetic*
  over ``row_number``/``count`` windows rather than ``F.ntile`` so that
  (a) NULLs can be excluded without a filter→union plan split (a union
  per bucketed column would double the plan subtree each time — 2^k
  copies for k indicator columns), and (b) the integer formula is
  bit-identical across engines (DuckDB oracle parity). One shuffle on
  the group key; bucketing k columns = k in-partition sorts, zero extra
  exchanges.
- ``qcut_by_group`` — exact pandas ``qcut`` semantics (value-bin by
  interpolated quantile edges, ``duplicates='drop'`` label collapse,
  NaN propagation) via ``applyInPandas`` per group — Arrow-batched,
  used as the pandas-parity variant and tested against pandas itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_LABELS = ["Low", "Medium", "High"]


def _exact_ntile(rn: Column, cnt: Column, n: int) -> Column:
    """SQL-standard ntile(n) of row ``rn`` (1-based) among ``cnt`` rows.

    Bucket sizes: first ``cnt % n`` buckets get ``ceil(cnt/n)`` rows,
    the rest get ``floor(cnt/n)``. Pure integer arithmetic — identical
    in any engine, unit-tested against Spark's native ``ntile``.
    """
    base = F.floor(cnt / n)
    rem = cnt % n
    big = base + 1  # size of the first `rem` buckets
    boundary = rem * big  # rows living in big buckets
    return F.when(
        rn <= boundary, F.floor((rn - 1) / big) + 1
    ).otherwise(rem + F.floor((rn - boundary - 1) / F.greatest(base, F.lit(1))) + 1)


def ntile_buckets(
    df: DataFrame,
    group_by: list[str],
    value_col: str,
    n: int = 3,
    labels: list[str] | None = None,
    out_col: str | None = None,
    tiebreak: list[str | Column] | None = None,
) -> DataFrame:
    """Equal-count buckets per group; NULL values → NULL bucket.

    Ties at bucket boundaries split by (value, tiebreak) order — pass
    ``tiebreak`` for cross-engine determinism.
    """
    labels = labels or DEFAULT_LABELS[:n]
    out_col = out_col or f"{value_col}Bucket"
    val = F.col(value_col)
    # nulls sort last so non-null rows get rn ∈ 1..count(value)
    w_order = Window.partitionBy(*group_by).orderBy(
        val.asc_nulls_last(), *(tiebreak or [])
    )
    w_part = Window.partitionBy(*group_by)
    rn = F.row_number().over(w_order)
    cnt = F.count(val).over(w_part)
    tile = _exact_ntile(rn, cnt, n)
    label_map = F.element_at(
        F.create_map(*[F.lit(x) for i, lb in enumerate(labels, 1) for x in (i, lb)]),
        tile.cast("int"),
    )
    return df.withColumn(out_col, F.when(val.isNotNull(), label_map))


def _qcut_labels(n_bins: int, labels: list[str]) -> list[str]:
    """Label shrink rule when quantile edges collapse (reference
    transform.py:324-332): 3→Low/Medium/High, 2→Low/High, 1→Low."""
    if n_bins >= 3:
        return labels[:n_bins]
    if n_bins == 2:
        return [labels[0], labels[-1]]
    return [labels[0]]


def qcut_by_group(
    df: DataFrame,
    group_by: list[str],
    value_col: str,
    n: int = 3,
    labels: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Exact pandas-``qcut`` bucketing per group via ``applyInPandas``.

    Arrow-batched grouped map; per-group data fits one worker (the
    reference's groups are year-sized). Pandas-parity variant of
    ``ntile_buckets`` for callers needing bin-by-value semantics.
    """
    import pandas as pd

    labels = labels or DEFAULT_LABELS
    out_col = out_col or f"{value_col}Bucket"
    schema_out = T.StructType(
        [*df.schema.fields, T.StructField(out_col, T.StringType(), True)]
    )

    def bucketize(pdf: pd.DataFrame) -> pd.DataFrame:
        series = pdf[value_col]
        try:
            binned, edges = pd.qcut(
                series, q=n, retbins=True, duplicates="drop", labels=None
            )
            n_bins = len(edges) - 1
            if n_bins <= 0:
                pdf[out_col] = None
                return pdf
            lbs = _qcut_labels(n_bins, labels)
            pdf[out_col] = binned.cat.rename_categories(lbs).astype(str)
            pdf.loc[series.isna(), out_col] = None
        except (ValueError, IndexError):
            pdf[out_col] = None
        return pdf

    return df.groupBy(*group_by).applyInPandas(bucketize, schema=schema_out)
