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
        .persist()  # consumed by movers AND the JSD agg (lazy cache: a
        # lazy localCheckpoint still physical-plans eagerly at build)
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


def ks_statistic_df(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample KS statistic as a LAZY one-row frame
    ``(ks double)`` — zero driver actions, so callers can union it
    into a larger report plan and pay one materialization for the
    whole report (the ``describe_stats`` gate row does exactly that).
    ``ks_statistic`` is the eager float wrapper.

    Same exact semantics as the float form: evaluated at every
    distinct value of either sample via running counts (ties and
    disjoint supports exact), 0.0 when either side is empty — the
    empty-side divisions go through ``try_divide`` (NULL, not an
    ANSI divide-by-zero error) and the final max coalesces to 0.0.

    The running CDFs use the same two-phase prefix-sum shape as
    ``pack_into_shards`` — range partition on the value, per-partition
    running sums, per-partition totals turned into offsets — never an
    unpartitioned global-order window OVER THE DATA (the only
    unpartitioned window here runs over the #partitions-row totals
    frame, which is bounded by ``num_partitions``). The offsets and
    grand totals ride back in as broadcast joins, keeping the plan
    O(1) in both data size and partition count; the lazy pin on the
    ranged frame makes the totals branch and the CDF branch read one
    snapshot inside the single materialization.
    """
    a = df_a.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    b = df_b.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
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
        # range partitioning samples its child to fit bounds — cache
        # so the sample pass materializes the join once and the real
        # shuffle re-reads it (persist, not localCheckpoint: the lazy
        # checkpoint's toRdd would run the sampling at BUILD time)
        .persist()
    )
    parts = (
        num_partitions
        or counts.sparkSession.sparkContext.defaultParallelism
    )
    ranged = (
        counts.repartitionByRange(parts, "v")
        .withColumn("__pid", F.spark_partition_id())
        .persist()  # totals AND CDF read one snapshot
    )
    totals = ranged.groupBy("__pid").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    # prefix-sum the per-partition totals into offsets: the window is
    # unpartitioned but runs over ≤ num_partitions rows — bounded by a
    # parameter, not by data (the data-sized windows stay __pid-local)
    woff = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("ta").over(woff), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("tb").over(woff), F.lit(0)).alias("__ob"),
    )
    grand = totals.agg(
        F.sum("ta").cast("double").alias("__na"),
        F.sum("tb").cast("double").alias("__nb"),
    )
    w = Window.partitionBy("__pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(grand))
        .select(
            F.abs(
                F.try_divide(F.sum("ca").over(w) + F.col("__oa"), F.col("__na"))
                - F.try_divide(
                    F.sum("cb").over(w) + F.col("__ob"), F.col("__nb")
                )
            ).alias("d")
        )
        .agg(F.coalesce(F.max("d"), F.lit(0.0)).alias("ks"))
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    num_partitions: int | None = None,
) -> float:
    """Eager float form of ``ks_statistic_df`` (see there for the plan
    shape): one materialization, 0.0 when either side is empty."""
    return float(
        ks_statistic_df(df_a, df_b, col, num_partitions).first()["ks"]
    )


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
    the reference — never a sort of either corpus. The side totals
    ride in as a lazy broadcast 1-row frame (an empty side nulls its
    proportions and the output collapses to the empty frame), so the
    ONLY eager step is the optional edge fit — the returned frame can
    union into a larger report plan for a single materialization.
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
    # side totals as a lazy broadcast 1-row frame; a zero side leaves
    # its proportions NULL (the when-guard, not a divide error) and the
    # NULL-filter below collapses the output to the documented empty
    # frame — no eager count round-trips
    tot = (
        a.agg(F.count(F.lit(1)).alias("__na"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("__nb")))
    )

    def prop(c: str, n: str):
        return F.when(
            F.col(n) > 0,
            F.greatest(
                F.try_divide(F.coalesce(F.col(c), F.lit(0)), F.col(n)),
                F.lit(eps),
            ),
        )

    joined = (
        all_bins.join(binned(a, "a"), "bin", "left")
        .join(binned(b, "b"), "bin", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "lo",
            "hi",
            prop("c_a", "__na").alias("p_a"),
            prop("c_b", "__nb").alias("p_b"),
        )
        .filter(F.col("p_a").isNotNull() & F.col("p_b").isNotNull())
        .withColumn(
            "psi_term",
            (F.col("p_b") - F.col("p_a")) * F.log(F.col("p_b") / F.col("p_a")),
        )
        .persist()  # rows AND the total both read it
    )
    rows = joined.select(
        F.col("bin").cast("string").alias("bin"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round("p_a", 6).alias("p_a"),
        F.round("p_b", 6).alias("p_b"),
        F.round("psi_term", 6).alias("psi_term"),
    )
    total = (
        joined.agg(F.round(F.sum("psi_term"), 6).alias("psi_term"))
        .filter(F.col("psi_term").isNotNull())  # empty input → no row
        .select(
            F.lit("total").alias("bin"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
            F.lit(None).cast("double").alias("p_a"),
            F.lit(None).cast("double").alias("p_b"),
            "psi_term",
        )
    )
    return rows.unionByName(total)
