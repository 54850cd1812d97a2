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
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous deterministic ids without a single-partition shuffle.

    ``repartitionByRange`` + in-partition sort gives a total order
    across partitions; per-partition ``row_number`` plus a cumulative
    offset per partition yields the global id.

    Correctness hinges on every consumer seeing ONE materialized
    partitioning: ``spark_partition_id`` is non-deterministic, and the
    offset computation and the id assignment each trigger their own
    physical planning of the range exchange — under AQE the two can
    coalesce to *different* partitionings, so offsets from one get
    applied to pids of another and the ids silently corrupt (observed
    at 600k rows: ids up to 600115 with duplicates, 12.8k order
    inversions). The fix is to pin the partitioned+sorted frame
    with ``persist()`` — pids are baked into the cached blocks, every
    branch reads the same snapshot, and a recompute after eviction
    regenerates identical partitions (range boundaries are part of the
    cached plan's lineage). The cache is the standard price of stable
    distributed id assignment; at warehouse scale use MEMORY_AND_DISK
    (spills, never recomputes divergently) and ``unpersist()`` after
    the ids are consumed.

    The running-sum window over the count rows is "global" but sees one
    row per partition, not per data row — microscopic at any scale.
    """
    from pyspark import StorageLevel

    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    parted = df.repartitionByRange(int(n_parts), *order_by).sortWithinPartitions(
        *order_by
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    with_rn = with_pid.withColumn("__rn", F.row_number().over(w))

    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        )
        .select("__pid", "__offset")
    )
    return (
        with_rn.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__offset") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__offset")
        .select(id_col, *df.columns)
    )
