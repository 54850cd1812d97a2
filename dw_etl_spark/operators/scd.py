"""Slowly-changing-dimension maintenance (Type 2).

The reference builds its country×year enrichment dimension from scratch
every run (SURVEY.md §1.1 calls it "a slowly-changing enrichment
dimension"; transform.py:256-356 recomputes it wholesale). A warehouse
engine also needs the *incremental* form: apply a batch of updated
attribute rows to a versioned dimension, closing superseded versions
and opening new ones — SCD Type 2.

Implementation is one full-outer-shaped pass, no row-at-a-time logic:

  1. current versions ⟕ updates on the natural key (broadcast if the
     update batch is dim-sized — it usually is).
  2. A version is *superseded* when an update exists with different
     attribute values → close it (valid_to = batch effective date).
  3. New/changed keys open a new version (valid_from = effective date,
     valid_to = NULL).
  4. Unchanged and historical rows pass through untouched.

One shuffle on the natural key at most; with a broadcast update batch,
zero shuffles of the dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"


def _dedup_updates(u: DataFrame, key_cols: list[str], attr_cols: list[str]) -> DataFrame:
    """One row per natural key, deterministically: smallest attr tuple
    wins (NULLs first). ``dropDuplicates`` keeps a partition-order-
    dependent row, so a replayed batch carrying CONFLICTING duplicate
    keys could land different attribute values run-to-run — this
    ranked dedup makes the pick a pure function of the data. Ties
    beyond (key, attrs) are byte-identical rows, so any pick is the
    same row."""
    if not attr_cols:
        return u.dropDuplicates(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(a).asc_nulls_first() for a in attr_cols]
    )
    return (
        u.withColumn("__dedup_rn", F.row_number().over(w))
        .filter(F.col("__dedup_rn") == 1)
        .drop("__dedup_rn")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: list[str],
    attrs: list[str],
    effective: str,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Apply ``updates`` (natural key + attrs) to a versioned ``dim``
    (key + attrs + valid_from/valid_to) as SCD Type 2.

    ``effective`` is the batch effective date (ISO string). Returns the
    new full dimension state: historical rows untouched, superseded
    current rows closed at ``effective``, new versions opened. A key
    whose versions are all closed (soft-deleted) is *revived*: exactly
    one new version opens from the update.

    ``updates`` must be unique per natural key — duplicate keys in one
    batch have no well-defined version order. Deterministically
    deduplicated here (smallest attr tuple wins, see
    ``_dedup_updates``) so retried batches produce identical output;
    pre-dedup with a real tiebreaker if the batch may carry genuine
    duplicates.
    """
    eff = F.lit(effective).cast("date")
    u = _dedup_updates(
        updates.select(
            *[F.col(k).alias(f"__u_{k}") for k in key],
            *[F.col(a).alias(f"__u_{a}") for a in attrs],
        ),
        [f"__u_{k}" for k in key],
        [f"__u_{a}" for a in attrs],
    )
    if broadcast_updates:
        u = F.broadcast(u)

    cond = None
    for k in key:
        clause = dim[k].eqNullSafe(F.col(f"__u_{k}"))
        cond = clause if cond is None else cond & clause

    joined = dim.join(u, cond, "full_outer")

    changed = None
    for a in attrs:
        diff = ~F.col(a).eqNullSafe(F.col(f"__u_{a}"))
        changed = diff if changed is None else changed | diff

    is_current = F.col(VALID_TO).isNull() & F.col(VALID_FROM).isNotNull()
    has_update = F.col(f"__u_{key[0]}").isNotNull()
    is_existing = F.col(key[0]).isNotNull() | F.col(VALID_FROM).isNotNull()

    # per-key flags: does the key have a current (open) version, and a
    # deterministic pick of one row per key for the revive case. The
    # window partitions on the same key the join shuffled on (or on the
    # broadcast output) — no extra wide shuffle of the dimension.
    w_key = Window.partitionBy(
        *[F.coalesce(F.col(k), F.col(f"__u_{k}")) for k in key]
    )
    key_has_current = (
        F.max(F.when(is_existing & is_current, F.lit(1)).otherwise(F.lit(0)))
        .over(w_key)
    )
    pick_one = F.row_number().over(
        w_key.orderBy(
            F.col(VALID_TO).desc_nulls_last(), F.col(VALID_FROM).desc_nulls_last()
        )
    )
    joined = joined.withColumn("__has_cur", key_has_current).withColumn(
        "__pick", pick_one
    )

    # existing rows: close current versions whose attrs changed
    existing = joined.filter(is_existing).select(
        *key,
        *attrs,
        VALID_FROM,
        F.when(
            is_current & has_update & changed, eff
        ).otherwise(F.col(VALID_TO)).alias(VALID_TO),
    )
    # opened versions: brand-new keys, changed attrs on a current row,
    # or a revived key (update on a key with no current version — fire
    # on exactly one of its joined rows)
    opened = (
        joined.filter(
            has_update
            & (
                ~is_existing
                | (is_current & changed)
                | ((F.col("__has_cur") == 0) & (F.col("__pick") == 1))
            )
        )
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in key],
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            eff.alias(VALID_FROM),
            F.lit(None).cast("date").alias(VALID_TO),
        )
    )
    return existing.unionByName(opened)


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current version of every key (valid_to IS NULL)."""
    return dim.filter(F.col(VALID_TO).isNull())


def scd1_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: list[str],
    attrs: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """SCD Type 1 (overwrite-in-place upsert): the MERGE complement of
    ``scd2_apply`` for dimensions that keep no history — an update row
    replaces the current attributes of its key; a new key inserts.
    Non-attr columns of ``dim`` (surrogate ids, audit fields) are
    preserved on update, NULL on brand-new keys (assign ids downstream
    via ``keys.add_unique_id`` over the inserts).

    Shape: one left join dim⟕updates (broadcast when the batch is
    small — zero shuffles of the dimension) + an anti-join for the
    inserts. Update batches are deduplicated per key exactly like
    ``scd2_apply`` so a replayed batch is idempotent: re-applying
    yields a byte-identical dimension.
    """
    u = _dedup_updates(
        updates.select(
            *[F.col(k).alias(f"__u_{k}") for k in key],
            *[F.col(a).alias(f"__u_{a}") for a in attrs],
        ),
        [f"__u_{k}" for k in key],
        [f"__u_{a}" for a in attrs],
    ).withColumn(
        "__u_hit", F.lit(True)  # NULL-key-safe match indicator
    )
    if broadcast_updates:
        u = F.broadcast(u)
    cond = [F.col(k).eqNullSafe(F.col(f"__u_{k}")) for k in key]
    other_cols = [c for c in dim.columns if c not in key + attrs]
    updated = dim.join(u, cond, "left").select(
        *key,
        *[
            F.when(F.col("__u_hit"), F.col(f"__u_{a}"))
            .otherwise(F.col(a))
            .alias(a)
            for a in attrs
        ],
        *other_cols,
    )
    inserts = (
        u.join(
            dim.select(*[F.col(k).alias(f"__d_{k}") for k in key]),
            [
                F.col(f"__u_{k}").eqNullSafe(F.col(f"__d_{k}"))
                for k in key
            ],
            "left_anti",
        )
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in key],
            *[F.col(f"__u_{a}").alias(a) for a in attrs],
            *[F.lit(None).cast(dim.schema[c].dataType).alias(c) for c in other_cols],
        )
    )
    return updated.unionByName(inserts)
