"""Distribution-drift monitoring between corpus snapshots.

A recurring ingest wants to know when the data CHANGED: a crawl source
shifts domains, a schema upstream starts emitting garbage, a locale
mix drifts. Two exact, engine-portable detectors:

  token_shift   — lexical drift: per-token probability delta between
                  two text corpora over the union vocabulary, plus the
                  Jensen-Shannon divergence as the headline scalar
                  (symmetric, bounded [0, ln 2], defined even for
                  disjoint vocabularies — unlike raw KL).
  ks_statistic  — numeric drift: the exact two-sample
                  Kolmogorov-Smirnov D = max |F_a(x) − F_b(x)|,
                  evaluated at every distinct value of either side.
  psi           — numeric drift with per-region attribution: the
                  Population Stability Index over reference-decile
                  bins, the production monitoring standard.

Scale shape: token_shift is two token-count shuffles + a full outer
join on the token (vocabulary-sized, never corpus-sized rows past the
counts); ks_statistic is one (value, side)-count shuffle + one
range-sort for the running CDFs — the standard distributed sort, no
single-reducer pass; psi is two narrow binning passes + bin-count
shuffles. All deterministic closed-form arithmetic,
DuckDB-parity-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import tokens


def _token_probs(df: DataFrame, text_col: str, side: str) -> DataFrame:
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("s"))
    return counts.crossJoin(F.broadcast(total)).select(
        "token", (F.col("c") / F.col("s")).alias(f"p_{side}")
    )


def token_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Top-k drifted tokens by |p_a − p_b| plus one 'total' row
    carrying the corpus-level JS divergence.

    Output (kind, token, p_a, p_b, delta): kind='token' rows rank the
    movers (delta DESC, token ASC — total order); the kind='total' row
    has token='', p_a=p_b=NULL and delta=JSD rounded to 6. A token
    absent from one side contributes p=0 there (the JS mixture keeps
    every term finite).
    """
    pa = _token_probs(df_a, text_col, "a")
    pb = _token_probs(df_b, text_col, "b")
    joined = (
        pa.join(pb, "token", "full_outer")
        .select(
            "token",
            F.coalesce("p_a", F.lit(0.0)).alias("p_a"),
            F.coalesce("p_b", F.lit(0.0)).alias("p_b"),
        )
        .localCheckpoint(eager=False)  # consumed by movers AND the JSD agg
    )
    m = (F.col("p_a") + F.col("p_b")) / 2
    term = F.when(
        F.col("p_a") > 0, F.col("p_a") * F.log(F.col("p_a") / m) / 2
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("p_b") > 0, F.col("p_b") * F.log(F.col("p_b") / m) / 2
    ).otherwise(F.lit(0.0))
    jsd = joined.agg(F.round(F.sum(term), 6).alias("delta")).select(
        F.lit("total").alias("kind"),
        F.lit("").alias("token"),
        F.lit(None).cast("double").alias("p_a"),
        F.lit(None).cast("double").alias("p_b"),
        "delta",
    )
    # top-k via orderBy().limit(k): Spark plans TakeOrderedAndProject —
    # per-partition heaps + a k-row driver merge, never the
    # single-reducer sort an unpartitioned row_number window costs over
    # the full union vocabulary (delta DESC, token ASC is still a total
    # order, so the kept set is deterministic)
    movers = (
        joined.select(
            F.lit("token").alias("kind"),
            "token",
            F.round("p_a", 6).alias("p_a"),
            F.round("p_b", 6).alias("p_b"),
            F.round(F.abs(F.col("p_a") - F.col("p_b")), 6).alias("delta"),
        )
        .orderBy(F.desc("delta"), F.asc("token"))
        .limit(k)
    )
    return movers.unionByName(jsd)


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    num_partitions: int | None = None,
) -> float:
    """Exact two-sample KS statistic over a numeric column (NULLs
    excluded). Computed at every distinct value of either sample via
    running counts, so ties and disjoint supports are handled exactly;
    returns 0.0 when either side is empty (no evidence of drift).

    The running CDFs use the same two-phase prefix-sum shape as
    ``pack_into_shards`` — range partition on the value, per-partition
    running sums, per-partition totals broadcast as offsets — never an
    unpartitioned global-order window (a single-reducer sort over the
    distinct values). The eager pin freezes the range partitioning so
    the offsets job and the max job read one snapshot (PLANS.md #4).
    """
    a = df_a.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    b = df_b.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    na, nb = a.count(), b.count()
    if na == 0 or nb == 0:
        return 0.0
    counts = (
        a.groupBy("v").agg(F.count(F.lit(1)).alias("ca"))
        .join(
            b.groupBy("v").agg(F.count(F.lit(1)).alias("cb")),
            "v",
            "full_outer",
        )
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    parts = (
        num_partitions
        or counts.sparkSession.sparkContext.defaultParallelism
    )
    ranged = (
        counts.repartitionByRange(parts, "v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: (int(r["ta"]), int(r["tb"]))
        for r in ranged.groupBy("__pid")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .collect()
    }
    off_rows, run_a, run_b = [], 0, 0
    for pid in sorted(totals):
        off_rows.append((pid, run_a, run_b))
        run_a += totals[pid][0]
        run_b += totals[pid][1]
    # offsets ride in as ONE broadcast #partitions-row frame, not as
    # per-partition create_map literals — at a 32k-task parallelism
    # the literal map is an O(parts) plan-size bomb (same failure
    # class as plan-literal IVF centroids / group-CASE qcut); the
    # join form is the shape pack_into_shards already uses
    offsets = ranged.sparkSession.createDataFrame(
        off_rows, "__pid int, __oa long, __ob long"
    )
    w = Window.partitionBy("__pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = (
        ranged.join(F.broadcast(offsets), "__pid")
        .select(
            F.abs(
                (F.sum("ca").over(w) + F.col("__oa")) / F.lit(float(na))
                - (F.sum("cb").over(w) + F.col("__ob")) / F.lit(float(nb))
            ).alias("d")
        )
        .agg(F.max("d").alias("ks"))
    )
    out = float(d.collect()[0]["ks"])
    ranged.unpersist()
    return out


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    edges: list[float] | None = None,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index over a numeric column — the
    production drift scalar between a reference snapshot (``df_a``)
    and a current one (``df_b``):

        PSI = Σ_bins (p_b − p_a) · ln(p_b / p_a)

    with proportions floored at ``eps`` so empty bins stay finite (the
    standard industry convention; <0.1 stable, 0.1–0.25 drifting,
    >0.25 shifted). Complements ``ks_statistic`` (exact, but one
    number with no per-region attribution): PSI's per-bin terms say
    WHERE the mass moved.

    ``edges`` are the interior bin edges; when omitted they come from
    the REFERENCE side's exact deciles (``percentile`` — exact-rank,
    engine-portable), which is the textbook setup: bins hold ~equal
    reference mass, so current-side imbalance is pure drift signal.
    Rows outside the edges fall into the open first/last bins; NULLs
    are excluded.

    Output: one row per bin (bin, lo, hi, p_a, p_b, psi_term, all
    rounded to 6) plus a ('total', NULL, NULL, NULL, NULL, PSI) row —
    the same tall sectioned shape as ``token_shift``. Scale: two
    narrow binning passes + two bin-keyed count shuffles (bin count
    rows); the edges, when derived, are one ``percentile`` agg over
    the reference — never a sort of either corpus.
    """
    a = df_a.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    b = df_b.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    if edges is None:
        qs = ", ".join(repr(i / n_bins) for i in range(1, n_bins))
        got = a.agg(
            F.expr(f"percentile(v, array({qs}))").alias("e")
        ).collect()[0]["e"]
        edges = [] if got is None else [float(x) for x in got]
    # dedup (constant columns collapse edges) while preserving order
    edges = sorted(set(edges))

    def bin_of(v):
        # bucket = #{edges e : v > e} — same unrolled-comparison shape
        # as qcut_by_group_expr's fallback, fully codegen'd
        idx = F.lit(0)
        for e in edges:
            idx = idx + F.when(v > F.lit(e), 1).otherwise(0)
        return idx

    def binned(df, side):
        return (
            df.select(bin_of(F.col("v")).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    na, nb = a.count(), b.count()
    if na == 0 or nb == 0:
        spark = df_a.sparkSession
        return spark.createDataFrame(
            [],
            "bin string, lo double, hi double, p_a double, p_b double, "
            "psi_term double",
        )
    # materialize every bin 0..len(edges) so empty bins get the eps
    # floor on BOTH sides (a missing row would silently drop its term)
    spark = df_a.sparkSession
    all_bins = spark.createDataFrame(
        [
            (
                i,
                edges[i - 1] if i > 0 else None,
                edges[i] if i < len(edges) else None,
            )
            for i in range(len(edges) + 1)
        ],
        "bin int, lo double, hi double",
    )
    joined = (
        all_bins.join(binned(a, "a"), "bin", "left")
        .join(binned(b, "b"), "bin", "left")
        .select(
            "bin",
            "lo",
            "hi",
            F.greatest(
                F.coalesce(F.col("c_a"), F.lit(0)) / F.lit(float(na)),
                F.lit(eps),
            ).alias("p_a"),
            F.greatest(
                F.coalesce(F.col("c_b"), F.lit(0)) / F.lit(float(nb)),
                F.lit(eps),
            ).alias("p_b"),
        )
        .withColumn(
            "psi_term",
            (F.col("p_b") - F.col("p_a")) * F.log(F.col("p_b") / F.col("p_a")),
        )
        .localCheckpoint(eager=False)  # rows AND the total both read it
    )
    rows = joined.select(
        F.col("bin").cast("string").alias("bin"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round("psi_term", 6).alias("psi_term"),
    )
    total = joined.agg(F.round(F.sum("psi_term"), 6).alias("psi_term")).select(
        F.lit("total").alias("bin"),
        F.lit(None).cast("double").alias("lo"),
        F.lit(None).cast("double").alias("hi"),
        F.lit(None).cast("double").alias("p_a"),
        F.lit(None).cast("double").alias("p_b"),
        "psi_term",
    )
    return rows.unionByName(total)
