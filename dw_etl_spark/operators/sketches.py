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

No DuckDB oracle — the sketch binary is library-specific state, not a
relational value (the estimate is cross-checked against exact distinct
counts within the configured relative error instead).
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

    Memory shape: the bottom-k filter is a ``row_number`` WINDOW over
    the group (Spark's sort-based window spills to disk), NOT a
    ``collect_list`` of the whole group — a billion-row group never
    materializes in one aggregation buffer; only the ≤ k survivors
    reach the packing agg.
    """
    from pyspark.sql import Window

    gb = [*(by or [])]
    from dw_etl_spark.functions.text import stable_hash64

    rank = stable_hash64(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*gb).orderBy(
        F.col("__r").asc(), F.col(id_col).asc()
    )
    tagged = (
        df.select(
            *gb,
            F.col(id_col),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__r", rank)
        .withColumn("__n", F.count(F.lit(1)).over(
            Window.partitionBy(*gb)
        ))
        .withColumn("__rn", F.row_number().over(w))
    )
    kept = tagged.filter(F.col("__rn") <= k)
    return kept.groupBy(*gb).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("__r").alias("r"), F.col("__v").alias("v"))
            )
        ).alias("qsketch"),
        F.max("__n").alias("n_rows"),
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
