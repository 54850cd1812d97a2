"""Projection / rename operators (SURVEY.md §2.2 P1/P2/P6).

Reference: column subsets + bulk renames at transform.py:73-107,
164-180, 209-223, 276-299. In Spark both are a single ``select`` with
aliases — Catalyst column-prunes all the way into the parquet scan, so
a 3-column projection of an 85-column table reads 3 columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def project_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Select + rename in one pass: ``{source_col: target_name}``.

    Preserves mapping order (dict insertion order = output column order,
    matching the reference's explicit column lists).
    """
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])
