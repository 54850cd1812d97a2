"""Scale-out utilities: skew salting and bucketed (shuffle-free) joins.

Nothing here changes query *semantics* — these are physical-plan levers
for the 100 TB regime, with equality-to-naive-plan tests:

  salted_join              — defuse a hot join key by salting the big
                             side and replicating the other side
  two_phase_count_distinct — per-key exact distinct counts without a
                             single hot reducer per key
  write_bucketed           — persist both sides of a recurring join
                             bucketed on the key; subsequent joins have
                             NO Exchange (verified by plan assertion in
                             tests/test_scale.py)
  build_bloom /            — broadcast-Bloom prefilter for incremental
  bloom_prefilter_anti_join  ingest dedup: definitely-new rows skip the
                             anti-join shuffle entirely; only Bloom hits
                             are verified exactly (zero false negatives
                             by construction — equality to the naive
                             left_anti plan is tested)
  zorder_by                — Morton-curve clustering so parquet min/max
                             stats prune on EVERY listed dimension, not
                             just a lexicographic sort's leading column
  rebalance_for_write      — AQE REBALANCE before a sink so files come
                             out advisory-sized (no small-file debris,
                             no magic repartition number to re-tune)
  compact_parquet          — maintenance rewrite of an append-heavy
                             parquet dataset back to advisory-sized
                             files (stage + atomic swap)
  file_zone_map            — per-file min/max/null/row stats via the
                             ``_metadata`` column: the queryable index
                             behind file-level data skipping
  read_pruned              — range read that opens only the files whose
                             zone-map interval overlaps the predicate
                             (row-equal to the naive full-scan filter)

When to reach for which:
- First line of defense is AQE (enabled in session.py): it splits skewed
  sort-merge partitions at runtime. Salting is for when one *logical*
  key is so hot a single key's rows exceed an executor (AQE can split a
  partition, not a key-group that must meet its join partner).
- Bucketing pays one up-front shuffled write, then every later join or
  aggregation on the bucket key is exchange-free — the right trade for
  fact tables joined repeatedly on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's key distribution is skewed.

    The big side gets a deterministic pseudo-random salt in [0, n_salts)
    (hash of the whole row — no RNG, so retried tasks salt identically);
    the other side is replicated n_salts times via a literal explode.
    The join key becomes (key, salt): one hot key now spreads over
    n_salts reducers. Replication multiplies the other side — use for
    medium-sized right sides; a truly small side should just broadcast.

    Only join types where the replicated side never emits unmatched
    rows are semantics-preserving: inner/left/left_semi/left_anti.
    right/full outer would emit each unmatched ``other`` row n_salts
    times — rejected.
    """
    safe = {"inner", "left", "left_outer", "leftouter",
            "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of the "
            f"replicated side; use one of {sorted(safe)} or an unsalted join"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(o, on=[*on, "__salt"], how=how).drop("__salt")


def two_phase_count_distinct(
    df: DataFrame,
    group_keys: list[str],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct count as dedup-then-count.

    ``countDistinct`` per key collects all values of a key on one
    reducer; phase 1 here deduplicates (key, value) pairs — a shuffle
    whose key-space is the *pair*, so a hot key's values spread over
    many reducers — and phase 2 counts tiny deduped rows per key.

    NULL handling matches ``countDistinct``: counting ``value_col``
    (not ``count(1)``) skips the (key, NULL) dedup row, while still
    emitting a 0 row for keys whose values are all NULL.
    """
    deduped = df.select(*group_keys, value_col).distinct()
    return deduped.groupBy(*group_keys).agg(
        F.count(value_col).cast("long").alias(out_col)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: list[str],
    n_buckets: int = 32,
    sort_keys: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) catalog table.

    Both sides of a recurring join written with the same (keys,
    n_buckets) co-locate matching rows in matching files: Catalyst
    plans the join with zero Exchange and (if sorted) zero Sort.
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_keys)
    )
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


# --------------------------------------------------- bloom prefilter dedup

def _bloom_indices(keys, num_bits: int, num_hashes: int):
    """k bit indices per int64 key, fully vectorized (numpy uint64
    splitmix64 finalizer per hash seed — no per-row Python)."""
    import numpy as np

    h = keys.astype(np.uint64)
    out = []
    with np.errstate(over="ignore"):
        for seed in range(num_hashes):
            x = h + np.uint64(
                (0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF
            )
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            out.append((x % np.uint64(num_bits)).astype(np.int64))
    return out


def build_bloom(
    df: DataFrame, key_col: str, num_bits: int, num_hashes: int = 5
) -> bytes:
    """Bloom filter over an int64 key column, built distributed: each
    partition sets bits into its own byte array (one Arrow-batched
    pass, numpy-vectorized), the driver ORs the per-partition arrays.
    Driver traffic is num_partitions × num_bits/8 bytes — size
    ``num_bits`` for the seen-set cardinality (~ -n·ln(p)/ln(2)² bits
    for false-positive rate p), not for the corpus text.
    """
    import numpy as np

    nbytes = (num_bits + 7) // 8

    def per_partition(batches):
        import pandas as pd

        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            # NULL keys never enter the filter: an anti-join's NULL key
            # matches nothing, so it must not shadow key 0
            keys = pdf[key_col].dropna().to_numpy(dtype=np.int64)
            for idx in _bloom_indices(keys, num_bits, num_hashes):
                np.bitwise_or.at(bits, idx // 8, np.uint8(1) << (idx % 8).astype(np.uint8))
        yield pd.DataFrame({"bloom": [bits.tobytes()]})

    parts = df.select(key_col).mapInPandas(per_partition, "bloom binary").collect()
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        acc |= np.frombuffer(row["bloom"], dtype=np.uint8)
    return acc.tobytes()


def bloom_prefilter_anti_join(
    new_df: DataFrame,
    seen_df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Incremental-ingest dedup: rows of ``new_df`` whose ``key_col``
    is not already in ``seen_df``, with a broadcast Bloom filter doing
    the heavy lifting.

    The naive ``left_anti`` join shuffles BOTH the batch and the whole
    seen corpus every ingest. Here the seen keys aggregate into one
    Bloom bitset (one narrow pass, no shuffle), which is broadcast and
    probed in a vectorized Arrow pass over the batch:

      - misses are DEFINITELY new (Bloom has no false negatives) —
        they bypass the join entirely;
      - hits are *candidates*: with ``exact=True`` (default) only they
        meet the seen side in a ``left_anti`` join, so the shuffled
        batch side shrinks to ~|true dups| + p·|batch|; with
        ``exact=False`` hits are simply dropped — the approximate mode
        loses ~p of genuinely-new rows (p = Bloom false-positive rate)
        but needs NO join at all, the right trade when the seen side
        is too large to shuffle per ingest and recall is negotiable.

    Exact mode is plan-equal in semantics to the naive anti-join
    (tested row-for-row in tests/test_scale.py).
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    bloom = build_bloom(seen_df, key_col, num_bits, num_hashes)
    spark = new_df.sparkSession
    bloom_bc = spark.sparkContext.broadcast(bloom)
    # copy the field list — StructType.add would mutate the frame's
    # cached schema object and corrupt new_df.columns
    schema = StructType(
        list(new_df.schema.fields) + [StructField("__maybe_seen", BooleanType())]
    )

    def probe(batches):
        import numpy as np

        bits = np.frombuffer(bloom_bc.value, dtype=np.uint8)
        for pdf in batches:
            # a NULL key matches nothing in a left_anti — definitely new
            notnull = pdf[key_col].notna().to_numpy()
            keys = pdf[key_col].fillna(0).to_numpy(dtype=np.int64)
            hit = notnull.copy()
            for idx in _bloom_indices(keys, num_bits, num_hashes):
                hit &= (bits[idx // 8] >> (idx % 8).astype(np.uint8)) & 1 == 1
            out = pdf.copy()
            out["__maybe_seen"] = hit
            yield out

    probed = new_df.mapInPandas(probe, schema)
    if not exact:
        return probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    # pinned: the fresh and candidates branches both consume this frame
    # — without the pin the Arrow probe (and the upstream batch scan)
    # would execute twice
    probed = probed.persist()
    fresh = probed.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    candidates = probed.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified = candidates.join(
        seen_df.select(key_col).distinct(), key_col, "left_anti"
    )
    return fresh.unionByName(verified)


# ------------------------------------------------------- z-order clustering

def zorder_key(bucket_cols: list, bits: int = 12):
    """Interleave the bits of per-column buckets (Morton/Z-curve).
    ``bucket_cols`` are int columns already scaled to [0, 2^bits).
    Pure JVM bit arithmetic — ncols × bits shift/or terms, codegen'd.

    The interleaved key must fit a signed long: Java's ``<<`` masks the
    shift count mod 64, so shifts ≥ 63 would silently wrap high bits
    onto low ones (and flip the sign) — rejected instead."""
    n = len(bucket_cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder key needs {n * bits} bits but a signed long holds 63; "
            f"use bits <= {63 // n} for {n} columns"
        )
    z = F.lit(0).cast("long")
    for i, b in enumerate(bucket_cols):
        for k in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b.cast("long"), k).bitwiseAND(F.lit(1)),
                    k * n + i,
                )
            )
    return z


def zorder_by(
    df: DataFrame, cols: list[str], bits: int = 12, num_partitions: int | None = None
) -> DataFrame:
    """Cluster rows along a Z-curve over ``cols`` so that EVERY listed
    column has narrow per-file min/max ranges after writing — the
    data-skipping layout for tables filtered on several independent
    dimensions (a lexicographic sort gives locality only to its leading
    column). Equivalent to lakehouse OPTIMIZE ZORDER, expressed as:
    min/max-scale each column to a ``bits``-bit bucket (one tiny agg
    pass for the bounds), interleave the bucket bits into a Morton key,
    then range-partition + sort on it — the standard distributed sort,
    no single-reducer stage. NULLs land in bucket 0 (cluster together).

    Write the result with ``maxRecordsPerFile`` / per-partition files;
    parquet footer min/max stats then prune on any filtered dimension
    (demonstrated in tests/test_scale.py against a 1-d sort).
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        span = (mx - mn) if (mn is not None and mx is not None and mx > mn) else 1.0
        scaled = F.floor(
            (F.col(c).cast("double") - F.lit(mn if mn is not None else 0.0))
            / F.lit(span)
            * F.lit(top)
        )
        buckets.append(
            F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)), F.lit(0))
        )
    out = df.withColumn("__z", zorder_key(buckets, bits))
    parts = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(parts, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def rebalance_for_write(df: DataFrame, partition_cols: list[str] | None = None) -> DataFrame:
    """AQE REBALANCE before a write: sizes output partitions to
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` at runtime —
    splitting skewed partitions AND coalescing tiny ones — so a sink
    emits evenly-sized files instead of one-file-per-shuffle-partition
    debris. With ``partition_cols`` the rebalance keys on them, which
    co-locates rows of one output partition (``partitionBy`` writes
    then emit few large files per directory rather than
    num-tasks × num-partitions small ones).

    Unlike ``repartition(n)`` there is no magic number to re-tune as
    the data grows — AQE picks the split from observed sizes. The hint
    is a no-op outside AQE (enabled by default in session.py).
    """
    if partition_cols:
        return df.hint("rebalance", *partition_cols)
    return df.hint("rebalance")


def compact_parquet(
    spark, path: str, partition_cols: list[str] | None = None
) -> tuple[int, int]:
    """Rewrite a parquet dataset's small-file debris into advisory-
    sized files: read → AQE REBALANCE → overwrite. The maintenance
    pass a long-lived ingest table needs after many incremental
    appends (every micro-batch/ingest leaves its own file tail).
    Returns (files_before, files_after).

    The rewrite stages into a sibling directory and swaps via rename —
    reading and overwriting the same path in one job would delete the
    input out from under the scan. With ``partition_cols`` the dataset
    is re-partitioned by those directories (dynamic overwrite
    semantics are unnecessary — the whole dataset is rewritten).

    Scale caveat: the swap is atomic only where directory rename is
    (HDFS, POSIX). On object stores (S3/GCS) rename is copy+delete —
    there, compact into a NEW versioned prefix and flip whatever
    pointer readers resolve (catalog entry, symlink manifest); doing
    in-place swaps on an object store is how table formats earn their
    keep, not something a path-level utility can promise.
    """
    import glob
    import os
    import shutil

    def count_files(p: str) -> int:
        return len(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))

    before = count_files(path)
    staged = path.rstrip("/") + "__compacting"
    df = rebalance_for_write(spark.read.parquet(path), partition_cols)
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staged)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)
    return before, count_files(path)


def file_zone_map(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file zone map (min/max/null-count/row-count per column) for
    a file-backed DataFrame — the queryable face of the statistics
    ``zorder_by`` lays files out to sharpen.

    ``df`` must come straight from a file scan (``spark.read.parquet``
    etc.) so the ``_metadata`` hidden column resolves. Output: one row
    per file — (file_path, file, n_rows, <c>_min, <c>_max, <c>_nulls
    per requested column). The aggregation's shuffle output is
    #files-sized, and because a scan partition never spans files the
    partial aggs collapse per-file map-side: at 100 TB the wide plan
    traffic is file-count rows, not data. Use it to audit clustering
    quality (overlapping ranges = poor pruning), drive compaction
    decisions, or back ``read_pruned``'s file skipping.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.count_if(F.col(c).isNull()).alias(f"{c}_nulls"),
        ]
    return (
        df.select(F.col("_metadata.file_path").alias("file_path"), *cols)
        .groupBy("file_path")
        .agg(*aggs)
        .withColumn(
            "file", F.regexp_extract(F.col("file_path"), r"([^/]+)$", 1)
        )
    )


def read_pruned(
    spark, path: str, col: str, lo, hi
) -> DataFrame:
    """Range-filtered read that opens ONLY the files whose zone-map
    interval overlaps [lo, hi] — explicit file skipping on a column
    that is NOT a directory-partition key.

    Parquet scans already do row-group-level min/max skipping, but
    they still LIST and OPEN every file (footer reads dominate on
    object stores with many files). This plans a #files-sized zone-map
    job, prunes the listing driver-side, then reads the survivors with
    the residual filter (so results equal the naive full-scan filter —
    pytest-pinned). An all-null file has NULL min/max and is skipped:
    correct for a range predicate, which no NULL row satisfies.

    Scale notes: the driver holds one path string per surviving file —
    fine to ~10⁶ files; beyond that persist the zone map as a table
    and join it against the scan's file list instead. For a column you
    ALWAYS filter on, prefer directory partitioning (free pruning, no
    extra job); this is for secondary columns — ideally z-ordered so
    per-file ranges are tight.
    """
    zm = file_zone_map(spark.read.parquet(path), [col])
    rows = zm.select("file_path", f"{col}_min", f"{col}_max").collect()
    keep = [
        r["file_path"]
        for r in rows
        if r[f"{col}_min"] is not None
        and r[f"{col}_max"] >= lo
        and r[f"{col}_min"] <= hi
    ]
    pred = F.col(col).between(lo, hi)
    if not keep:  # schema-preserving empty frame
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*keep).filter(pred)


def save_zone_map(df: DataFrame, cols: list[str], table: str) -> None:
    """Persist ``file_zone_map`` output as a catalog table — the
    amortized form: compute the per-file stats once after each write/
    compaction instead of on every pruned read, and enable the
    join-based pruning path (``read_pruned_via_table``) whose driver
    footprint is zero file paths."""
    file_zone_map(df, cols).write.mode("overwrite").saveAsTable(table)


def read_pruned_via_table(
    spark, path: str, col: str, lo, hi, zone_map_table: str
) -> DataFrame:
    """``read_pruned`` against a PERSISTED zone map, with the file
    pruning expressed as a plan-side semi-join on
    ``_metadata.file_path`` instead of a driver-collected path list —
    the >10⁶-files shape the ``read_pruned`` docstring points at.

    The overlap predicate filters the zone-map table distributed; the
    survivors broadcast (one path string per surviving file) into a
    left-semi hash join against the scan's hidden ``_metadata``
    column, so the driver never materializes a single path and the
    frame stays valid however many files survive. Trade vs
    ``read_pruned``: the scan still lists and opens every footer (the
    join is row-level, not listing-level), so this prunes DECODE work
    and join/shuffle input, not file opens — when the surviving list
    is known-small, ``read_pruned``'s literal path list is the
    stronger prune; at unbounded file counts it is the one that still
    runs. Results are row-identical to the naive filter either way
    (pytest-pinned against ``read_pruned`` and the full scan).

    The zone map is a snapshot: files written to ``path`` after
    ``save_zone_map`` are absent from it and would be silently
    unpruned-but-also-unmatched (semi-join drops them) — refresh the
    table after every write/compaction of ``path``.
    """
    keep = (
        spark.table(zone_map_table)
        .filter(
            F.col(f"{col}_min").isNotNull()
            & (F.col(f"{col}_max") >= lo)
            & (F.col(f"{col}_min") <= hi)
        )
        .select("file_path")
    )
    scan = spark.read.parquet(path)
    return (
        scan.withColumn("__zm_fp", F.col("_metadata.file_path"))
        .join(
            F.broadcast(keep.withColumnRenamed("file_path", "__zm_fp")),
            "__zm_fp",
            "left_semi",
        )
        .drop("__zm_fp")
        .filter(F.col(col).between(lo, hi))
    )
