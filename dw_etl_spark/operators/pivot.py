"""Pivot: long → wide (SURVEY.md §2.4 A4).

Reference: ``pivot_table(index=[...], columns=INDICATORCODE,
values=VALUE)`` with implicit ``aggfunc='mean'`` (transform.py:265-267).

Scale notes:
- Explicit pivot values are REQUIRED here (the reference's 5 indicator
  codes are known a priori): without them Spark runs an extra
  distinct-collect job over the pivot column before planning. With them,
  the pivot compiles to a single hash aggregate with one ``avg(CASE WHEN
  pivot_col = v THEN value END)`` per value — one shuffle on the group
  keys, map-side partial aggregation, no row explosion.
- Output column order is the ``values`` list order (deterministic), and
  rows carry no implicit order — the caller adds ``orderBy`` before
  surrogate-id assignment (pandas pivot_table sorts its index; see
  operators/keys.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: list[str],
    pivot_col: str,
    value_col: str,
    values: list[str],
    agg: str | Column = "avg",
    names: dict[str, str] | None = None,
) -> DataFrame:
    """Group by ``index``, pivot ``pivot_col`` into one column per entry
    of ``values``, aggregating ``value_col`` with ``agg`` (default mean,
    matching pandas ``pivot_table``). ``names`` optionally renames the
    pivoted columns (reference renames indicator codes to warehouse
    names, transform.py:288-299).

    ``agg`` may also be a full aggregate Column expression (r11) — e.g.
    an exact fixed-point mean ``sum(cents)/100.0/count(cents)`` whose
    integer sum is independent of partial-aggregation order, where a
    float ``avg`` is not (the sf1 sweep caught 1-ulp averages flipping
    the round-to-6 gate compare exactly on a .5 boundary).
    """
    agg_expr = getattr(F, agg)(value_col) if isinstance(agg, str) else agg
    wide = df.groupBy(*index).pivot(pivot_col, values).agg(agg_expr)
    if names:
        wide = wide.withColumnsRenamed(names)
    return wide
