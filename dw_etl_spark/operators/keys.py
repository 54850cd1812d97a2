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
    pin_input: bool = False,
) -> DataFrame:
    """Contiguous deterministic ids without a single-partition shuffle.

    ``repartitionByRange`` + in-partition sort gives a total order
    across partitions; the in-partition row offset plus a cumulative
    offset per partition yields the global id.

    Correctness hinges on every consumer seeing ONE materialized
    partitioning: partition ids are non-deterministic, and the offset
    computation and the id assignment each trigger their own physical
    planning of the range exchange — under AQE the two can coalesce to
    *different* partitionings, so offsets from one get applied to pids
    of another and the ids silently corrupt (observed at 600k rows:
    ids up to 600115 with duplicates, 12.8k order inversions). The fix
    is to pin the partitioned+sorted frame with ``persist()`` — pids
    are baked into the cached blocks, every branch reads the same
    snapshot, and a recompute after eviction regenerates identical
    partitions (range boundaries are part of the cached plan's
    lineage). The cache is the standard price of stable distributed id
    assignment; ``unpersist()`` after the ids are consumed.

    r14 optimization (guide §2.4 — remove shuffles outright): the
    in-partition row number comes from ``monotonically_increasing_id``
    evaluated directly on the pinned range-sorted snapshot (pid in the
    upper bits, 0-based row offset in the lower 33 — the documented
    layout), NOT from a ``row_number`` window partitioned by pid. The
    window form hash-shuffled the FULL data a second time (Exchange on
    __pid) and re-sorted it; the mid form is a narrow projection on
    the cached blocks, whose row order the cache pins. Before/after at
    sf0.1 fact (600k rows): id-assignment overhead 3.5 s → ~1.3 s,
    plan loses one full-data Exchange + one sort. The 33-bit row field
    caps partitions at 2^33 rows — 8.6e9 rows per partition, far past
    any sane partition sizing.

    ``pin_input=True`` additionally persists the INPUT before the
    range exchange: the range partitioner's reservoir-sampling pass
    otherwise recomputes the upstream lineage once more just to pick
    boundaries. A/B at sf0.1 (guide §1.1): for the fact (scan +
    broadcast join upstream) the pin LOSES — cache write+read of the
    full rows costs more than the columnar re-scan (4.1 s vs 2.8 s);
    for the windowed indicator chain it is a wash. Default False —
    opt in only when the upstream is provably more expensive than one
    full-table cache round-trip (e.g. feeding ids from a multi-join).

    The running-sum window over the count rows is "global" but sees one
    row per partition, not per data row — microscopic at any scale.
    """
    from pyspark import StorageLevel

    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    src = (
        df.persist(StorageLevel.MEMORY_AND_DISK) if pin_input else df
    )
    parted = src.repartitionByRange(int(n_parts), *order_by).sortWithinPartitions(
        *order_by
    )
    mask = (1 << 33) - 1
    snap = parted.withColumn(
        "__mid", F.monotonically_increasing_id()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pid_of = F.shiftrightunsigned(F.col("__mid"), 33)

    w_off = (
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        snap.groupBy(pid_of.alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        )
        .select("__pid", "__offset")
    )
    out = (
        snap.withColumn("__pid", pid_of)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (
                F.col("__offset")
                + F.col("__mid").bitwiseAND(F.lit(mask))
                + F.lit(1)
            ).cast("long"),
        )
        .drop("__pid", "__mid", "__offset")
        .select(id_col, *df.columns)
    )
    # r15 (guide §2.6): expose the pinned snapshot so an orchestrator
    # that must WAIT before consuming this frame (load_star_schema's
    # fact write queues behind its FK-parent dims) can materialize the
    # expensive part — the range exchange + sort + cache write — from a
    # concurrent thread while it waits. Plain Python attribute on the
    # DataFrame wrapper: callers that transform the frame further
    # simply lose the handle (getattr default), nothing depends on it.
    out._dw_id_pin = snap
    return out
