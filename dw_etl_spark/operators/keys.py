"""Surrogate-key operators (SURVEY.md §2.7 F7).

Reference: contiguous 1-based Ids assigned by row order
(``insert(0, 'Id', range(1, n+1))`` — transform.py:129, 301, 376).
pandas inherits file/pivot order; a distributed engine must pin an
explicit deterministic ordering.

Two variants with different scale profiles:

- ``add_sequential_id`` — exact contiguous ids via a global
  ``row_number()`` window. A global window is a single-partition sort:
  fine for dimension tables (what the reference assigns ids to — all
  <100k rows), documented anti-pattern for facts at 100 TB.
- ``add_unique_id`` — scalable: sort by the key columns (range
  partitioner keeps it distributed), then per-partition offsets computed
  from partition row-counts (one tiny driver collect of <num_partitions>
  longs — the classic zipWithIndex trick, expressed DataFrame-side).
  Ids are contiguous 1..n and deterministic given the ordering, with no
  single-partition bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add_sequential_id(
    df: DataFrame,
    order_by: list[str | Column],
    id_col: str = "Id",
) -> DataFrame:
    """Contiguous 1-based id in one global window (dimension-sized inputs)."""
    w = Window.orderBy(*order_by)
    cols = [F.row_number().over(w).cast("long").alias(id_col), *df.columns]
    return df.select(*cols)


def add_unique_id(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "Id",
) -> DataFrame:
    """Contiguous deterministic ids without a single-partition shuffle.

    ``repartitionByRange`` + in-partition sort gives a total order across
    partitions; ``spark_partition_id`` + per-partition ``row_number`` +
    a broadcast map of cumulative offsets yields the global id. The only
    driver-side data is one row-count per partition.
    """
    parted = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*order_by)
    with_rn = with_pid.withColumn("__rn", F.row_number().over(w))

    counts = (
        with_pid.groupBy("__pid").count().orderBy("__pid").collect()
    )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["__pid"]] = acc
        acc += row["count"]
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("__pid"),
    )
    return (
        with_rn.withColumn(id_col, (offset_col + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn")
        .select(id_col, *df.columns)
    )
