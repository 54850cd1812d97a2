"""Deduplication operators (SURVEY.md §2.4 A2/A3).

Reference: ``drop_duplicates(subset=[...])`` keep-first at
transform.py:182-184 (expeditions by Id) and :374 (dim_date by
Year/Season). pandas keep-first depends on input row order; a
distributed engine has no implicit order, so the engine makes the
order explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: list[str],
    order_by: list[str | Column] | None = None,
) -> DataFrame:
    """Keep one row per key group.

    With ``order_by``: deterministic keep-first — ``row_number() == 1``
    over ``partitionBy(keys).orderBy(order_by)``. This is the semantic
    equivalent of pandas keep-first when ``order_by`` reproduces the
    source order (e.g. a file line number or event id).

    Without ``order_by``: plain ``dropDuplicates(keys)`` — one shuffle,
    arbitrary survivor. Cheaper (partial aggregation map-side); use when
    any survivor is acceptable.

    Scale: one hash shuffle on ``keys`` either way; the window variant
    additionally sorts within partitions. No global sort, no skew beyond
    the key distribution (AQE skew-join handling applies).
    """
    if order_by is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
