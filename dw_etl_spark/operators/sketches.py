"""Mergeable cardinality sketches for incremental pipelines.

An ingest job that lands 100 TB in daily increments cannot afford to
rescan history to answer "how many distinct users/urls/docs so far?".
Datasketches HLL (built into Spark as ``hll_sketch_agg`` /
``hll_union_agg``) makes the distinct-count *state* a first-class,
persistable value: each increment emits a few-KB binary sketch per
group, and any later query unions sketches instead of rescanning rows.

Union is an idempotent, commutative, associative merge of register
maxima, so estimates are independent of how increments are grouped,
ordered, or partitioned — re-merging yesterday's rollup with today's
delta gives byte-identical state to one pass over everything
(pytest-pinned). Contrast ``approx_count_distinct``, which emits only
the final number: accurate per run but not composable across runs.

No DuckDB oracle for HLL — that sketch binary is library-specific
state, not a relational value (the estimate is cross-checked against
exact distinct counts within the configured relative error instead).
The quantile sample and the Count-Min grid below ARE plain relational
values, and both replay closed-form in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^12 registers ≈ 1.6 % relative standard error, ~4 KB per sketch
DEFAULT_LG_K = 12


def distinct_sketch(
    df: DataFrame,
    key: str,
    by: list[str] | None = None,
    lg_k: int = DEFAULT_LG_K,
    out_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``key``'s distinct values — the unit of
    incremental state. One shuffle keyed on ``by`` with map-side
    partial sketches, so per-group traffic is sketch-sized (KBs), not
    row-sized; NULL keys are ignored (matching ``count(DISTINCT)``).
    Persist the output per increment (e.g. partitioned by ingest date).
    """
    gb = df.groupBy(*(by or []))
    return gb.agg(F.hll_sketch_agg(key, F.lit(lg_k)).alias(out_col))


def merge_distinct_sketches(
    df: DataFrame,
    by: list[str] | None = None,
    sketch_col: str = "sketch",
    out_col: str = "approx_distinct",
    keep_sketch: bool = False,
) -> DataFrame:
    """Union sketches (optionally regrouped by coarser keys) and
    estimate: (by..., approx_distinct[, sketch]). ``keep_sketch=True``
    carries the merged state forward for the NEXT increment — the
    rollup itself stays mergeable, which is the whole point.
    """
    gb = df.groupBy(*(by or []))
    merged = F.hll_union_agg(sketch_col, F.lit(True)).alias("__m")
    out = gb.agg(merged).select(
        *(by or []),
        F.hll_sketch_estimate("__m").alias(out_col),
        *([F.col("__m").alias(sketch_col)] if keep_sketch else []),
    )
    return out


# --------------------------------------------------- quantile sketches

def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    by: list[str] | None = None,
    k: int = 1024,
    salt: str = "qsk",
) -> DataFrame:
    """Mergeable, DETERMINISTIC quantile state: per group, the ``k``
    rows with the smallest ``md5(salt|id)`` rank, packed as one
    sorted array of (rank, value) structs — the bottom-k (KMV-style)
    row sample, applied to quantiles.

    Why this construction instead of KLL/t-digest: those compact with
    randomness (KLL) or order-dependent clustering (t-digest), so
    incremental state depends on how the data was batched. Bottom-k by
    a content hash is a pure FUNCTION OF THE ROW SET — the bottom-k of
    a union equals the bottom-k of the parts' bottom-ks, exactly and
    deterministically, so re-merging yesterday's sketch with today's
    delta gives byte-identical state to one pass over everything
    (pytest-pinned, the same contract as the HLL family above). The
    hash ranks rows independently of their values, so the kept rows
    are a uniform row sample: quantile error is the standard sampling
    bound O(√(q(1-q)/k)) ≈ 1.6 % at k=1024, q=0.5.

    One shuffle keyed on ``by``; per-group state is k structs (~16 KB
    at k=1024), carried in ONE array column so increments persist as
    ordinary parquet rows. ``n_rows`` rides along (exact, summable).

    Memory shape AND parallelism (r14, guide §2.5): the bottom-k filter
    is TWO-LEVEL. A single ``row_number`` window partitioned by ``by``
    alone puts each whole group in one task — with 3 groups, 3 tasks
    sort the entire table while the rest of the cluster idles (the
    classic low-cardinality window skew; at 100 TB each task would
    sort tens of TB). Instead, level 1 buckets every group by a
    deterministic row-hash salt (``pmod(xxhash64(id), nb)`` — never
    ``rand()``, which re-draws under task retry, SPARK-38388) and
    keeps each bucket's bottom-k with balanced parallel sorts; level 2
    re-ranks the ≤ k·nb survivors per group — microscopic. Bottom-k of
    a union == bottom-k of the parts' bottom-ks, so the kept set is
    IDENTICAL for any bucket count (pinned by the merge-invariance
    test); ``nb`` only shapes parallelism. The exact group count rides
    along as the sum of per-bucket counts over one representative row
    per bucket (``__rn1 == 1``) — no second pass, no count join. Both
    windows sort-spill to disk; only survivors reach the packing agg.
    """
    from pyspark.sql import Window

    gb = [*(by or [])]
    from dw_etl_spark.functions.text import stable_hash64

    rank = stable_hash64(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    # scale-adaptive salt width: one bucket per shuffle partition is
    # enough to spread the level-1 sorts; the result is nb-invariant.
    # Parsed defensively (r15, ADVICE r14): deployments can set the
    # conf non-numerically (e.g. "auto"), and a 0/negative value would
    # make the pmod salt degenerate — fall back to defaultParallelism.
    try:
        nb = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    except ValueError:
        nb = 0
    if nb < 1:
        nb = max(1, df.sparkSession.sparkContext.defaultParallelism)
    w1 = Window.partitionBy(*gb, "__b").orderBy(
        F.col("__r").asc(), F.col(id_col).asc()
    )
    tagged = (
        df.select(
            *gb,
            F.col(id_col),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__r", rank)
        .withColumn("__b", F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)))
        .withColumn(
            "__nb",
            F.count(F.lit(1)).over(Window.partitionBy(*gb, "__b")),
        )
        .withColumn("__rn1", F.row_number().over(w1))
    )
    pre = tagged.filter(F.col("__rn1") <= k)
    # level 2 lives INSIDE the packing agg (sort + slice over ≤ k·nb
    # survivors — the merge_quantile_sketches shape) instead of a
    # second row_number window: no second exchange, no full re-sort.
    # The id rides the sort struct so rank ties keep the exact
    # (rank, id) order of the one-window form, then is projected away.
    return pre.groupBy(*gb).agg(
        # outer array_sort (r15, ADVICE r14): the inner sort orders by
        # (r, id) with the id then projected away — on a rank tie
        # (64-bit hash collision) the emitted (r, v) layout could
        # diverge from merge_quantile_sketches' (r, v) comparator;
        # re-sorting the projected pairs pins the byte-identical
        # merge-invariance contract in the collision case too (k-sized
        # array, negligible cost)
        F.array_sort(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__r").alias("r"),
                                F.col(id_col).alias("i"),
                                F.col("__v").alias("v"),
                            )
                        )
                    ),
                    1,
                    k,
                ),
                lambda x: F.struct(x["r"].alias("r"), x["v"].alias("v")),
            )
        ).alias("qsketch"),
        F.sum(
            F.when(F.col("__rn1") == 1, F.col("__nb"))
        ).alias("n_rows"),
    )


def merge_quantile_sketches(
    df: DataFrame,
    by: list[str] | None = None,
    k: int = 1024,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Union sketch rows (optionally regrouped by coarser keys) into
    one sketch per group: concatenate the pair arrays, re-sort, keep
    the global bottom-k — the exact merge (see ``quantile_sketch``).
    ``n_rows`` sums exactly."""
    gb = [*(by or [])]
    return (
        df.groupBy(*gb)
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list(sketch_col))), 1, k
            ).alias(sketch_col),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def estimate_quantiles(
    df: DataFrame,
    qs: list[float],
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Append ``q_<q>`` columns per sketch row: linear-interpolated
    (numpy-convention) quantiles of the sampled values — pure JVM
    array expressions over the k-sized state, no extra pass over
    data. Empty sketches yield NULLs."""
    vals = F.array_sort(
        F.transform(F.col(sketch_col), lambda p: p["v"])
    )
    n = F.size(vals)
    out = df
    for q in qs:
        pos = (n - 1) * F.lit(float(q))
        lo = F.floor(pos).cast("int")
        hi = F.ceil(pos).cast("int")
        frac = pos - lo.cast("double")
        est = (
            F.element_at(vals, lo + 1)
            + (F.element_at(vals, hi + 1) - F.element_at(vals, lo + 1)) * frac
        )
        name = f"q_{str(q).replace('.', '_')}"
        out = out.withColumn(
            name, F.when(n > 0, est).otherwise(F.lit(None).cast("double"))
        )
    return out


def psi_from_sketches(
    ref: DataFrame,
    cur: DataFrame,
    by: list[str] | None = None,
    n_bins: int = 10,
    eps: float = 1e-6,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Population Stability Index straight from two persisted quantile
    sketches — the INCREMENTAL drift check: once each ingest lands a
    ``quantile_sketch`` row per group, any two snapshots compare
    without rescanning either corpus (``operators.drift.psi`` is the
    exact-pass sibling; this is its sketch-state form, with the usual
    bottom-k sampling error on both proportions).

    Bin edges are the reference sketch's sample deciles
    (numpy-convention lerp, matching ``estimate_quantiles``); each
    side's bin proportions come from its own sample; the PSI formula
    and the ``eps`` floor match ``drift.psi``. Everything is array
    expressions over two k-sized state columns joined on ``by`` —
    no corpus pass, no shuffle beyond the tiny sketch-row join.

    Output: one row per group — (by..., psi, n_ref, n_cur); groups
    present on only one side are dropped (nothing to compare). A
    constant reference column collapses its deciles onto one value —
    the degenerate interior bins are empty on both sides and floor at
    ``eps``, contributing ~0 (``drift.psi`` instead dedups the edges;
    same verdict, different bin count).

    Plan note: the sorted samples, the edge array, and each side's
    per-value bin index are materialized as intermediate COLUMNS, and
    every downstream expression references them by name. Inlining them
    instead (each bin filter re-embedding the full lerp-interpolation
    tree) multiplied the expression 10×-per-side and pushed the task
    binary past 11 MB — the same plan-bomb class as the r4 IVF
    literals / r5 qcut CASE, just in expression-tree form.
    """
    gb = [*(by or [])]

    j = (
        ref.select(
            *gb,
            F.col(sketch_col).alias("__rsk"),
            F.col("n_rows").alias("n_ref"),
        )
        .join(
            cur.select(
                *gb,
                F.col(sketch_col).alias("__csk"),
                F.col("n_rows").alias("n_cur"),
            ),
            gb if gb else None,
            "inner",
        )
        if gb
        else ref.select(
            F.col(sketch_col).alias("__rsk"), F.col("n_rows").alias("n_ref")
        ).crossJoin(
            cur.select(
                F.col(sketch_col).alias("__csk"),
                F.col("n_rows").alias("n_cur"),
            )
        )
    )

    rvals = F.col("__rv")
    n = F.size(rvals)

    def edge(q: float):
        # numpy-convention lerp between the two straddling sample
        # ranks, matching estimate_quantiles
        pos = (n - 1) * F.lit(q)
        lo = F.floor(pos).cast("int")
        hi = F.ceil(pos).cast("int")
        frac = pos - lo.cast("double")
        return (
            F.element_at(rvals, lo + 1)
            + (F.element_at(rvals, hi + 1) - F.element_at(rvals, lo + 1))
            * frac
        )

    # bin index of v = #{edges e : v > e} — open outer bins, the same
    # unrolled shape as drift.psi's bin_of, here folded over the
    # edge COLUMN so the tree stays one aggregate deep
    def bin_of(vals_col):
        return F.transform(
            vals_col,
            lambda v: F.aggregate(
                F.col("__edges"),
                F.lit(0),
                lambda s, e: s + F.when(v > e, 1).otherwise(0),
            ),
        )

    j = (
        j.withColumn(
            "__rv", F.array_sort(F.transform("__rsk", lambda p: p["v"]))
        )
        .withColumn(
            "__cv", F.array_sort(F.transform("__csk", lambda p: p["v"]))
        )
        .withColumn(
            "__edges", F.array(*[edge(i / n_bins) for i in range(1, n_bins)])
        )
        .withColumn("__rbin", bin_of(F.col("__rv")))
        .withColumn("__cbin", bin_of(F.col("__cv")))
    )

    def eq(i: int):
        # NOT `lambda b, i=i: ...` — F.filter sees a 2-arg callable and
        # passes the ELEMENT INDEX as the second argument, silently
        # clobbering the bound default
        return lambda b: b == F.lit(i)

    def props(bin_col: str):
        total = F.size(F.col(bin_col))
        return F.array(
            *[
                F.greatest(
                    F.size(F.filter(F.col(bin_col), eq(i))).cast("double")
                    / F.greatest(total, F.lit(1)),
                    F.lit(eps),
                )
                for i in range(n_bins)
            ]
        )

    terms = F.zip_with(
        props("__cbin"), props("__rbin"), lambda b, a: (b - a) * F.log(b / a)
    )
    out = j.select(
        *gb,
        F.round(F.aggregate(terms, F.lit(0.0), lambda s, t: s + t), 6).alias(
            "psi"
        ),
        "n_ref",
        "n_cur",
    )
    return out


# -------------------------------------------------- count-min sketches

#: 4 rows x 2048 cols: point-estimate error <= 2e/2048 of the total
#: count with prob 1 - e^-4 — a ~64 KB frequency summary of any corpus
CMS_DEFAULT_WIDTH = 2048
CMS_DEFAULT_DEPTH = 4


def _cms_bucket(key: F.Column, d: int, width: int) -> F.Column:
    """Row-``d`` bucket of a key: md5-salted, so the ``depth`` hash
    functions are independent AND the grid is engine-portable (the
    DuckDB twin replays the exact cells — unlike HLL, CMS state is a
    plain relational value)."""
    from dw_etl_spark.functions.text import stable_hash64

    return F.pmod(
        stable_hash64(F.concat(F.lit(f"cms{d}:"), key.cast("string"))),
        F.lit(width),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = CMS_DEFAULT_WIDTH,
    depth: int = CMS_DEFAULT_DEPTH,
    weight_col: str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch of ``key_col``'s frequency distribution:
    sparse (by..., d, b, c) cell counts, the third mergeable-state
    sketch alongside HLL (distinct) and the quantile sample — this one
    answers "how often does X occur?" without keeping a row per
    distinct key.

    One narrow pass: each row explodes to ``depth`` (d, bucket) cells
    (``depth`` md5s per row, bounded), then ONE map-side-combined
    aggregate on the (d, b) key — at most depth·width rows out
    regardless of corpus size, so per-increment state is KBs and the
    shuffle carries partial cells, not rows. NULL keys are skipped.
    ``weight_col`` aggregates a measure instead of occurrences (e.g.
    token counts per domain). Estimates from ``cms_estimate`` are
    biased UP only (collisions add, never subtract): guaranteed
    ``est >= true``, with ``est - true <= 2e/width · total`` at
    probability ``1 - exp(-depth)`` — size the grid off the tracked
    total, which rides along in every cell row's lineage.
    """
    key = F.col(key_col)
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    cells = (
        df.filter(key.isNotNull())
        .select(
            *(by or []),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("int").alias("d"),
                            _cms_bucket(key, d, width).alias("b"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("__cell"),
            w.alias("__w"),
        )
        .groupBy(*(by or []), F.col("__cell.d").alias("d"), F.col("__cell.b").alias("b"))
        .agg(F.sum("__w").alias("c"))
    )
    return cells


def cms_merge(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge CMS states cell-wise: union + sum, idempotent under
    regrouping — merging daily sketches gives the identical grid to
    one pass over the union (pytest-pinned, same contract as the HLL
    and quantile merges). Grids must share (width, depth, by)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*(by or []), "d", "b").agg(F.sum("c").alias("c"))


def cms_estimate(
    cells: DataFrame,
    items: DataFrame,
    key_col: str,
    width: int = CMS_DEFAULT_WIDTH,
    depth: int = CMS_DEFAULT_DEPTH,
    out_col: str = "est",
) -> DataFrame:
    """Point-estimate the count of each item: min over the ``depth``
    rows of the item's cells (the count-MIN), 0 if any cell is
    untouched. The grid is <= depth·width rows — broadcast — so
    estimating any number of items is a map-side join + one
    item-keyed aggregate; the corpus is never rescanned.
    """
    key = F.col(key_col)
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        _cms_bucket(key, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select("*", F.col("__cell.d").alias("d"), F.col("__cell.b").alias("b"))
    other = [c for c in items.columns if c != key_col]
    return (
        probes.join(F.broadcast(cells), ["d", "b"], "left")
        .groupBy(key_col, *other)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias(out_col))
    )


# ------------------------------------------------ k-mins (KMV) sketches

#: 64 coordinates: distinct-estimate relative SE ~ 1/sqrt(62) ~ 13 %,
#: Jaccard SE ~ sqrt(J(1-J)/64); state is 64 fixed-width hex strings
KMINS_DEFAULT_K = 64

#: numeric value of a 14-hex-digit prefix's denominator (16^14) — the
#: min-hash fraction is prefix_int / 16^14 in [0, 1). 14 digits = 56
#: bits, so a sum of k <= 128 prefixes stays under int64 max even when
#: a group holds very few distinct keys (each min then approaches the
#: full 2^56 range): 128 * (2^56 - 1) < 2^63 - 1. 15 digits (60 bits)
#: silently wrapped the BIGINT sum for groups with < ~k/8 distincts
#: (r10 advice fix) — Spark's non-ANSI sum wraps where DuckDB's
#: promotes to HUGEINT, so small groups returned negative estimates
#: AND diverged from the oracle twin.
_KMINS_SCALE = 16 ** 14


def _km_hash(key: F.Column, i: int) -> F.Column:
    """Coordinate-``i`` hash of a key: md5 under a per-coordinate salt.
    md5 hex is fixed-width lowercase, so LEXICOGRAPHIC min == numeric
    min — the sketch state stays a plain string and the DuckDB twin
    replays it with ``min(md5(...))`` verbatim."""
    return F.md5(F.concat(F.lit(f"km{i}:"), key.cast("string")))


def kmins_sketch(
    df: DataFrame,
    key_col: str,
    k: int = KMINS_DEFAULT_K,
    by: list[str] | None = None,
    out_col: str = "kmins",
) -> DataFrame:
    """K-mins (KMV-family) distinct sketch: per group, coordinate ``i``
    holds min over rows of ``md5('km{i}:' || key)`` — the classic
    k-independent-min-hash signature (Broder 1997; Bar-Yossef et al.
    2002 for the distinct estimator).

    Why a second distinct sketch next to HLL: element-wise min is the
    merge, and EQUALITY of coordinates across two sketches estimates
    Jaccard — so two corpus snapshots' overlap (union, intersection,
    containment) falls out of two KB-sized states without ever joining
    the corpora. HLL unions but cannot intersect; this can.

    One aggregation pass (k ``min`` exprs, map-side combined, all JVM
    codegen — the shuffle carries k strings per group, not rows). NULL
    keys are ignored. Unlike HLL's opaque binary, the state is a plain
    ``array<string>`` — it persists as parquet and replays closed-form
    in DuckDB, so the gate pins the sketch itself.

    ``k`` is capped at 128: the estimator sums k 56-bit prefixes in a
    BIGINT, which is overflow-proof exactly up to 128 coordinates.
    """
    if k > 128:
        raise ValueError(
            f"kmins k={k} exceeds 128 — the 56-bit prefix sum in "
            "kmins_distinct_est is only overflow-proof for k <= 128"
        )
    key = F.col(key_col)
    gb = df.filter(key.isNotNull()).groupBy(*(by or []))
    agg = gb.agg(*[F.min(_km_hash(key, i)).alias(f"__m{i}") for i in range(k)])
    return agg.select(
        *(by or []),
        F.array(*[F.col(f"__m{i}") for i in range(k)]).alias(out_col),
    )


def merge_kmins(
    df: DataFrame,
    k: int = KMINS_DEFAULT_K,
    by: list[str] | None = None,
    sketch_col: str = "kmins",
) -> DataFrame:
    """Merge k-mins states coordinate-wise (element-wise min across
    rows): idempotent, commutative, associative — increment grouping
    and order don't matter, same contract as the HLL/quantile/CMS
    merges. One aggregation pass over sketch rows (KBs each)."""
    gb = df.groupBy(*(by or []))
    agg = gb.agg(
        *[
            F.min(F.element_at(F.col(sketch_col), i + 1)).alias(f"__m{i}")
            for i in range(k)
        ]
    )
    return agg.select(
        *(by or []),
        F.array(*[F.col(f"__m{i}") for i in range(k)]).alias(sketch_col),
    )


def _kmins_frac_sum(sketch: F.Column) -> F.Column:
    """Exact integer sum of the 14-hex-digit prefixes — BIGINT addition
    is order-independent, so the later double division is bit-identical
    across engines (summing doubles would not be). 14 digits keeps the
    sum overflow-free for any input up to k=128 (see _KMINS_SCALE)."""
    return F.aggregate(
        F.transform(
            sketch, lambda x: F.conv(F.substring(x, 1, 14), 16, 10).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmins_distinct_est(sketch: F.Column | str, k: int = KMINS_DEFAULT_K) -> F.Column:
    """Distinct-count estimate: n-hat = (k-1) * 16^14 / sum(prefix_int)
    — the unbiased rate estimator for the exponential approximation of
    coordinate minima (sum of k mins ~ Gamma(k, 1/n)); relative SE
    ~ 1/sqrt(k-2). The numerator is ONE pre-folded double literal so
    the replay does a single identical division."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    num = float((k - 1) * _KMINS_SCALE)
    return F.lit(num) / _kmins_frac_sum(c).cast("double")


def kmins_match_count(a: F.Column | str, b: F.Column | str) -> F.Column:
    """Number of coordinates where two sketches agree — the MinHash
    collision count; matches/k is the unbiased Jaccard estimator."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def _sketch_join_key(sketch: F.Column) -> F.Column:
    """Constant 1 derived FROM the sketch data (least(1, len(min_0))):
    a literal join key between two 1-row aggregates constant-folds the
    condition away and plans a BroadcastNestedLoopJoin; a data-derived
    key is opaque to the optimizer and plans a plain BroadcastHashJoin
    (same trick as the csv-quarantine zip in ``__spark_entry__``)."""
    return F.least(F.lit(1), F.length(F.element_at(sketch, 1)))


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    key_col: str,
    k: int = KMINS_DEFAULT_K,
    by: list[str] | None = None,
) -> DataFrame:
    """Overlap profile of two corpus snapshots from their k-mins
    sketches alone: one row (per ``by`` group when given) —

      est_a, est_b        distinct estimates per side
      est_union           estimate of the merged (element-wise min) state
      jaccard             matches / k
      est_intersection    jaccard * est_union (inclusion via MinHash)
      containment_a_in_b  est_intersection / est_a ("how much of A is
                          already in B" — the dedup-planning number)

    Cost: one aggregation pass per side (never a join of the corpora).
    Ungrouped, the two 1-row sketch frames combine on a key derived
    from sketch data (a broadcast hash join — a literal key would fold
    to a cartesian); grouped, they inner-join on the ``by`` keys, so
    only groups present on BOTH sides report (a group absent from one
    side has no overlap question to answer). The production shape is
    ``by=['lang']`` / ``by=['source']``: per-slice "how much of today's
    crawl is already in the lake?" from two sketch-rows-per-slice
    states. At 100 TB sketch each side once, persist the KB-sized
    state, and answer every later overlap question from state alone.
    """
    if by:
        sa = kmins_sketch(df_a, key_col, k=k, by=by).withColumnRenamed(
            "kmins", "__a"
        )
        sb = kmins_sketch(df_b, key_col, k=k, by=by).withColumnRenamed(
            "kmins", "__b"
        )
        both = sa.join(sb, by)
        head: list = list(by)
    else:
        sa = kmins_sketch(df_a, key_col, k=k).select(
            F.col("kmins").alias("__a")
        ).select(_sketch_join_key(F.col("__a")).alias("__j"), "__a")
        sb = kmins_sketch(df_b, key_col, k=k).select(
            F.col("kmins").alias("__b")
        ).select(_sketch_join_key(F.col("__b")).alias("__j"), "__b")
        both = sa.join(F.broadcast(sb), "__j")
        head = []
    merged = F.zip_with(F.col("__a"), F.col("__b"), lambda x, y: F.least(x, y))
    jac = (
        kmins_match_count(F.col("__a"), F.col("__b")).cast("double")
        / F.lit(float(k))
    )
    est_u = kmins_distinct_est(merged, k)
    return both.select(
        *head,
        kmins_distinct_est(F.col("__a"), k).alias("est_a"),
        kmins_distinct_est(F.col("__b"), k).alias("est_b"),
        est_u.alias("est_union"),
        jac.alias("jaccard"),
        (jac * est_u).alias("est_intersection"),
        ((jac * est_u) / kmins_distinct_est(F.col("__a"), k)).alias(
            "containment_a_in_b"
        ),
    )
