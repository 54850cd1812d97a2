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
