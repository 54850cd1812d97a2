"""Deterministic sampling and dataset splits (training-data extension).

A training-data pipeline needs reproducible sampling: the same document
must land in the same split on every run, on any engine, at any
parallelism — which rules out RNG-based ``df.sample`` (seed-stable only
within one Spark version/partitioning). Hash-based assignment gives
run-, engine- and partition-independent splits:

    bucket(id) = md5-hash(salt|id) mod B        (B = 10_000)

- Pure narrow map — no shuffle, no RNG state, pushdown-friendly.
- The md5 formulation is the same portable pattern as
  ``functions.text.stable_hash64`` — the DuckDB oracle reproduces it
  bit-for-bit, so sampling queries sit in the hard correctness gate.
- Changing ``salt`` draws an independent sample; keeping it pins the
  assignment forever (the property that makes eval sets stable across
  corpus re-crawls).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(col: Column | str, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 10000) from md5(salt|value)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "split"
) -> DataFrame:
    """Keep ~``fraction`` of rows, stable across runs/engines."""
    return df.filter(hash_bucket(id_col, salt) < int(round(fraction * BUCKETS)))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, val, test) by contiguous bucket ranges — disjoint and
    exhaustive, stable under corpus growth (a new id never moves an
    existing id's split)."""
    b = hash_bucket(id_col, salt)
    v = int(round(val_fraction * BUCKETS))
    t = int(round(test_fraction * BUCKETS))
    val = df.filter(b < v)
    test = df.filter((b >= v) & (b < v + t))
    train = df.filter(b >= v + t)
    return train, val, test


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    salt: str = "weight",
) -> DataFrame:
    """Per-row deterministic Bernoulli keep with probability
    ``weight_col`` (clamped to [0, 1]) — quality-weighted corpus
    downsampling without RNG: row kept iff its stable hash bucket falls
    under ``weight·B``. The same row with the same weight survives on
    every run/engine/partitioning; raising a row's weight can only flip
    it from dropped to kept (threshold monotonicity), so re-scoring a
    corpus never churns the kept set randomly.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    threshold = F.round(
        F.greatest(F.least(w, F.lit(1.0)), F.lit(0.0)) * BUCKETS, 0
    )
    return df.filter(hash_bucket(id_col, salt) < threshold)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "split",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    languages, keep all rare ones). ``fractions`` maps stratum value →
    keep fraction; unlisted strata use ``default_fraction``.
    """
    b = hash_bucket(id_col, salt)
    thresholds = F.lit(int(round(default_fraction * BUCKETS)))
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col).eqNullSafe(F.lit(value))
        thr = F.lit(int(round(frac * BUCKETS)))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    threshold = expr.otherwise(thresholds) if expr is not None else thresholds
    return df.filter(b < threshold)


def deterministic_shuffle(
    df: DataFrame, id_col: str, salt: str = "shuffle", num_partitions: int | None = None
) -> DataFrame:
    """Reproducible global shuffle for training-order randomization:
    rows come back ordered by md5(salt|id) — the same permutation on
    every run, engine, and input partitioning (RNG-based ``orderBy(
    rand(seed))`` is none of those). Change ``salt`` per epoch to draw
    a fresh permutation.

    Scale shape: one ``repartitionByRange`` + in-partition sort on the
    hash key — the standard distributed sort, no single-reducer stage;
    the hash key is uniform by construction so the range partitions
    balance even when ids are dense/sequential. Write the result with
    ``maxRecordsPerFile`` to get fixed-size shuffled training shards.

    The key is the 60-bit ``stable_hash64`` of (salt|id) — one md5
    digest per row with a 2⁶⁰ keyspace, so collisions (which would
    fall back to id order and leave adjacent crawl docs adjacent) stay
    negligible at corpus scale.
    """
    from dw_etl_spark.functions.text import stable_hash64

    key = stable_hash64(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    out = df.withColumn("__shuffle_key", key)
    parts = num_partitions or out.sparkSession.sparkContext.defaultParallelism
    return (
        out.repartitionByRange(parts, "__shuffle_key")
        .sortWithinPartitions("__shuffle_key", id_col)
        .drop("__shuffle_key")
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    per_group: int,
    salt: str = "quota",
    num_shards: int | None = None,
) -> DataFrame:
    """Keep at most ``per_group`` rows per group, chosen by hash rank —
    the deterministic form of per-source capping ("no more than N docs
    per domain"). Ranking by md5(salt|id) instead of id makes the kept
    subset an unbiased draw (id order usually encodes crawl order);
    same rows survive on every run/engine/partitioning, and a growing
    group only ever swaps members in/out at the hash boundary, never
    reshuffles wholesale.

    One shuffle keyed on the group (the ranking window). Skew:
    ``num_shards=S`` turns it into a two-phase top-N so a single
    monster group no longer serializes one task — phase 1 ranks within
    (group, hash-shard) and caps each shard at ``per_group`` (S
    parallel tasks per group, each seeing ~1/S of it), phase 2
    re-ranks the ≤ S·per_group survivors exactly. The global
    top-``per_group`` rows of a group each have shard-rank ≤ their
    group rank, so phase 1 can never evict a true survivor — the
    salted result is row-identical to the unsalted one (pytest-pinned
    by hash-oracle equality). Default ``None`` keeps the single-window
    plan (right when groups are known-bounded).
    """
    from dw_etl_spark.functions.text import stable_hash64

    key = stable_hash64(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    if num_shards is not None and num_shards > 1:
        shard = F.pmod(
            stable_hash64(
                F.concat(F.lit(salt + "#shard|"), F.col(id_col).cast("string"))
            ),
            F.lit(num_shards),
        )
        w1 = Window.partitionBy(group_col, "__qshard").orderBy(
            key.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("__qshard", shard)
            .withColumn("__qr1", F.row_number().over(w1))
            .filter(F.col("__qr1") <= per_group)
            .drop("__qshard", "__qr1")
        )
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= per_group)
        .drop("__qr")
    )


def mix_corpora(
    df: DataFrame,
    group_col: str,
    id_col: str,
    target_fractions: dict[str, float],
    weight_col: str | Column | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture sampling: downsample each source so
    the kept corpus approaches ``target_fractions`` (source → share of
    the total, summing to ≤ 1) — the "mixture weights" step of
    pretraining-data assembly, measured in rows or, with
    ``weight_col`` (e.g. a token count), in that weight.

    For each source g with current share p_g and target share t_g the
    keep rate is r_g = min(1, (t_g/p_g) · r*), where r* is chosen so
    the most over-demanded source caps at rate 1 (no upsampling: this
    engine never duplicates rows — express epoch-level oversampling in
    the training loader). Rates land as per-row hash-Bernoulli keeps
    (``weighted_sample`` semantics), so the output is reproducible and
    growth-stable, and the achieved mixture concentrates around the
    target by the law of large numbers rather than exact truncation —
    the standard trade for a single narrow pass.

    Scale shape: one aggregation for per-source totals (collected —
    #sources rows), then a pure narrow filter; unlisted sources get
    rate 0.
    """
    from dw_etl_spark.functions.text import stable_hash64  # noqa: F401 (parity w/ quota)

    w = (
        (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
        if weight_col is not None
        else F.lit(1.0)
    )
    totals = {
        r["g"]: float(r["w"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sum(w.cast("double")).alias("w"))
        .collect()
    }
    grand = sum(totals.values())
    if grand <= 0:
        return df.filter(F.lit(False))
    # r* caps the most over-demanded listed source at keep-rate 1
    demands = {
        g: (target_fractions[g] / (totals[g] / grand))
        for g in target_fractions
        if g in totals and totals[g] > 0 and target_fractions[g] > 0
    }
    if not demands:
        return df.filter(F.lit(False))
    r_star = 1.0 / max(demands.values())
    rates = {g: min(1.0, d * r_star) for g, d in demands.items()}
    b = hash_bucket(id_col, salt)
    expr = None
    for g, rate in sorted(rates.items()):
        cond = F.col(group_col).eqNullSafe(F.lit(g))
        # HALF_UP, not Python's banker's round: SQL engines round half
        # away from zero, and the DuckDB oracle twin recomputes these
        # thresholds — the two must agree at an exact .5
        thr = F.lit(int(math.floor(rate * BUCKETS + 0.5)))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    threshold = expr.otherwise(F.lit(0))
    return df.filter(b < threshold)


def temperature_fractions(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    weight_col: str | Column | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixture targets: source g with corpus share
    p_g gets target t_g = p_g^alpha / Σ_h p_h^alpha — the multilingual
    pretraining recipe (alpha=1 keeps natural proportions, alpha→0
    approaches uniform; alpha≈0.3–0.7 is the usual band). One
    aggregation (#sources rows collected); normalization sums in
    sorted-key order so the dict is run-deterministic. Feed the result
    to ``mix_corpora``, or use ``temperature_mix`` below, which skips
    the normalization entirely (it cancels in the keep-rate
    arithmetic) for exact cross-engine replayability."""
    w = (
        (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
        if weight_col is not None
        else F.lit(1.0)
    )
    totals = {
        r["g"]: float(r["w"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sum(w.cast("double")).alias("w"))
        .collect()
        if r["w"] and r["w"] > 0
    }
    grand = sum(totals[g] for g in sorted(totals))
    if grand <= 0:
        return {}
    powed = {
        g: math.sqrt(v / grand) if alpha == 0.5 else (v / grand) ** alpha
        for g, v in totals.items()
    }
    z = sum(powed[g] for g in sorted(powed))
    return {g: powed[g] / z for g in sorted(powed)}


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    weight_col: str | Column | None = None,
    salt: str = "temp",
) -> DataFrame:
    """Deterministic temperature sampling in one pass: downsample each
    source so kept mass ∝ (source mass)^alpha, without upsampling —
    the rarest source survives whole and everything larger is
    hash-Bernoulli-thinned toward it.

    The keep rate is computed DIRECTLY as r_g = (w_min / w_g)^(1-alpha)
    (analytically the ``mix_corpora`` rate for the temperature targets:
    expected kept mass = w_g · r_g ∝ w_g^alpha). Two properties fall
    out of this form:

    - no normalization constant enters the floating-point path, and at
      the default alpha=0.5 the whole rate is division + sqrt — BOTH
      IEEE-754 correctly-rounded ops — so an independent engine (the
      DuckDB oracle twin) replays the thresholds bit-exactly. General
      alpha uses ``pow`` (not correctly rounded; a cross-library ULP
      can in principle flip a row sitting exactly on a bucket
      boundary — ~1e-12 probability per source).
    - r_g ≤ 1 by construction (w_min ≤ w_g): this engine never
      duplicates rows; express epoch-level oversampling in the
      training loader.

    Scale shape: one aggregation for per-source totals (#sources rows
    collected), then a pure narrow hash-threshold filter — same as
    ``mix_corpora``; unweighted groups drop out."""
    w = (
        (F.col(weight_col) if isinstance(weight_col, str) else weight_col)
        if weight_col is not None
        else F.lit(1.0)
    )
    totals = {
        r["g"]: float(r["w"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.sum(w.cast("double")).alias("w"))
        .collect()
        if r["w"] and r["w"] > 0
    }
    if not totals:
        return df.filter(F.lit(False))
    w_min = min(totals.values())
    b = hash_bucket(id_col, salt)
    expr = None
    for g in sorted(totals):
        ratio = w_min / totals[g]
        rate = math.sqrt(ratio) if alpha == 0.5 else ratio ** (1.0 - alpha)
        # HALF_UP to match the SQL twin (see mix_corpora)
        thr = F.lit(int(math.floor(rate * BUCKETS + 0.5)))
        cond = F.col(group_col).eqNullSafe(F.lit(g))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    return df.filter(b < expr.otherwise(F.lit(0)))


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame | None = None,
    components: DataFrame | None = None,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "csplit",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split unit is the
    NEAR-DUP CLUSTER, not the document. Splitting by doc id lets two
    near-duplicates straddle train and eval — the classic silent
    eval-contamination leak (the reason Lee et al. 2022 deduplicate
    across splits); here every document inherits its connected
    component's split, so a near-dup pair can never be separated.

    Pass either ``pairs`` (near-dup edges, e.g. ``minhash_lsh_pairs``
    output — components are derived) or a precomputed ``components``
    frame (id, component) to share one CC labeling across consumers.
    Docs absent from ``components`` are their own singleton cluster.
    The component id is hash-bucketed with the SAME contiguous-range
    rule as ``train_val_test_split`` (deterministic, engine-portable,
    stable under corpus growth: a new near-dup edge can move a doc
    BETWEEN splits only by merging its cluster — exactly the point).

    Output: the input columns + ``component`` + ``split`` ('train' /
    'val' / 'test'). Cost: one left join against the components frame
    (pairs-participants only — typically far smaller than the corpus)
    plus a narrow map; no extra shuffle beyond the join.
    """
    if (pairs is None) == (components is None):
        raise ValueError("pass exactly one of pairs= or components=")
    if components is None:
        from dw_etl_spark.operators.graph import connected_components

        components = connected_components(pairs)
    comp = components.select(
        F.col("id").alias("__cid"), F.col("component").alias("__comp_in")
    )
    labeled = df.join(comp, df[id_col] == comp["__cid"], "left").select(
        *[df[c] for c in df.columns],
        F.coalesce(F.col("__comp_in"), df[id_col]).alias("component"),
    )
    b = hash_bucket("component", salt)
    v = int(round(val_fraction * BUCKETS))
    t = int(round(test_fraction * BUCKETS))
    split = (
        F.when(b < v, F.lit("val"))
        .when(b < v + t, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return labeled.select("*", split.alias("split"))
