"""Corpus-level language-model scoring (training-data extension).

CCNet-style quality signal: score each document by the negative mean
log-probability of its tokens under a unigram LM fitted on the corpus
itself. Well-formed prose tokens have typical corpus frequencies →
low perplexity; gibberish, boilerplate glyph soup and wrong-language
fragments sit in the tail. (CCNet uses a KenLM 5-gram trained on
Wikipedia; the unigram-on-self variant needs no external model and
keeps the exact-oracle property — swap in external n-gram probs via
the same join shape when a reference LM is available.)

Scale shape: one shuffle keyed on the token for the count table, a
broadcast single-row total, one token-keyed join of the exploded
corpus against the probability table (hot tokens are AQE skew-join
territory), and a doc-keyed aggregation. No driver materialization of
the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import tokens_of


def unigram_logppl(
    df: DataFrame, text_col: str, id_col: str, out_col: str = "logppl"
) -> DataFrame:
    """(id, logppl): −mean ln p(token) per doc, p from corpus counts.

    Every token of the corpus is in the fitted vocabulary by
    construction, so no OOV smoothing is needed; documents with zero
    tokens get NULL. Rounded to 4 decimals (per-doc averages of ~1e2
    doubles — far inside cross-engine float-summation tolerance).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens_of(df, text_col)).alias("t"),
    )
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("s"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "t", F.log(F.col("c").cast("double") / F.col("s")).alias("lp")
    )
    per_doc = (
        toks.join(probs, "t")
        .groupBy("id")
        .agg(F.round(-F.avg("lp"), 4).alias(out_col))
    )
    return df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")


def bigram_logppl(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "logppl2",
    lam: float = 0.75,
) -> DataFrame:
    """(id, logppl2): −mean ln p(tok | prev) per doc under an
    interpolated bigram LM fitted on the corpus itself —
    p(b|a) = λ·c(a,b)/c(a,·) + (1−λ)·c(b)/N.

    The unigram back-off makes every probability positive (an unseen
    CONTEXT cannot occur — contexts come from the corpus — and the
    unigram term covers any pair), so no other smoothing is needed.
    Sharper than ``unigram_logppl`` at catching scrambled/templated
    text whose token *set* is ordinary but whose token *order* is not.
    Documents with fewer than two tokens get NULL.

    Scale shape: bigrams via a shifted-slice ``zip_with`` (no
    posexplode self-join); two count shuffles — (a,b) pairs and the
    context marginal derived FROM the pair table (one source of truth,
    which the DuckDB twin replays exactly) — then token-keyed joins
    back onto the exploded corpus (hot contexts are AQE skew-join
    territory) and a doc-keyed mean. Rounded to 4 like the unigram
    path.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_of(df, text_col).alias("ts")
    )
    bi = toks.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c2 = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("a").agg(F.sum("c2").alias("c1"))
    uni = (
        df.select(F.explode(tokens_of(df, text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = uni.agg(F.sum("cu").alias("s"))
    lp = F.log(
        F.lit(lam) * F.col("c2").cast("double") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("cu").cast("double") / F.col("s")
    )
    per_doc = (
        bi.join(c2, ["a", "b"])
        .join(ctx, "a")
        .join(uni, F.col("b") == F.col("t"))
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(F.round(-F.avg(lp), 4).alias(out_col))
    )
    return df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")


def kn_bigram_logppl(
    df: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str = "logppl_kn",
    discount: float = 0.75,
) -> DataFrame:
    """(id, logppl_kn): −mean ln p_KN(tok | prev) under an interpolated
    Kneser-Ney bigram LM fitted on the corpus itself — the smoothing
    CCNet's KenLM models actually use, one order down:

        p_KN(b|a) = max(c(a,b) − D, 0)/c(a,·)
                    + D·N1+(a,·)/c(a,·) · N1+(·,b)/N1+(·,·)

    The continuation probability N1+(·,b)/N1+(·,·) ranks tokens by how
    many DISTINCT contexts they follow, not raw frequency — the
    classic "San Francisco" fix: 'Francisco' is frequent but
    continuation-poor, so templated/boilerplate collocations score
    differently than under the raw-count interpolation of
    ``bigram_logppl``. Scoring the fitting corpus itself keeps every
    probability positive (every scored pair exists, so N1+(·,b) ≥ 1
    and c(a,·) ≥ 1); docs with fewer than two tokens get NULL.

    Scale shape mirrors ``bigram_logppl``: every statistic (context
    totals, distinct-continuation counts, distinct-history counts,
    bigram-type total) derives from the ONE (a, b, c2) pair table —
    one extra groupBy over pair TYPES per statistic, never a second
    corpus pass — then token-keyed joins back onto the exploded pairs
    and a doc-keyed mean, rounded to 4.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_of(df, text_col).alias("ts")
    )
    bi = toks.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c2 = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    c2 = c2.persist()  # 4 statistics read it
    ctx = c2.groupBy("a").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1a")
    )
    cont = c2.groupBy("b").agg(F.count(F.lit(1)).alias("n1b"))
    types = c2.agg(F.count(F.lit(1)).alias("tt"))
    d = F.lit(float(discount))
    lp = F.log(
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1a") / F.col("c1") * F.col("n1b") / F.col("tt")
    )
    per_doc = (
        bi.join(c2, ["a", "b"])
        .join(ctx, "a")
        .join(cont, "b")
        .crossJoin(F.broadcast(types))
        .groupBy("id")
        .agg(F.round(-F.avg(lp), 4).alias(out_col))
    )
    return df.select(F.col(id_col).alias("id")).join(per_doc, "id", "left")


def lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lam: float = 0.75,
    discount: float = 0.75,
) -> DataFrame:
    """(id, logppl, logppl2, logppl_kn): all three scorers of this
    module in ONE fused lineage (r14, guide §1.2 step 1 / §2.3 —
    don't recompute shared statistics, shuffle fewer bytes).

    Calling ``unigram_logppl`` + ``bigram_logppl`` + ``kn_bigram_logppl``
    separately pays the shared statistics repeatedly: the (a, b) pair
    explode and its groupBy-(a,b) count shuffle run twice (bigram + KN),
    the token-frequency table twice (unigram counts + bigram back-off),
    and the pair-keyed join chain + doc-keyed mean three times. Here
    every statistic is computed once — one token explode feeding one
    (t, c) count table, one pair explode feeding one (a, b, c2) table
    (both lazily pinned for their two consumers), ONE pair-keyed join
    chain carrying both bigram formulas, and two doc-keyed means
    instead of three. Formulas, rounding (4) and null semantics are
    exactly the single-scorer ones (pinned by
    ``test_lm_scores_fused_equals_separate_scorers``); only partial-
    aggregation order can differ, which the per-doc round(4) already
    absorbs by the module's documented tolerance.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_of(df, text_col).alias("ts")
    )
    tok = toks.select("id", F.explode("ts").alias("t"))
    counts = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("cu"))
    ).localCheckpoint(eager=False)  # unigram probs + bigram back-off
    total = counts.agg(F.sum("cu").alias("s"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "t", F.log(F.col("cu").cast("double") / F.col("s")).alias("lp")
    )
    per_doc1 = (
        tok.join(probs, "t")
        .groupBy("id")
        .agg(F.round(-F.avg("lp"), 4).alias("logppl"))
    )
    bi = toks.select(
        "id",
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice(F.col("ts"), 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c2 = (
        bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    ).localCheckpoint(eager=False)  # 4 statistics + the scoring join
    ctx = c2.groupBy("a").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1a")
    )
    cont = c2.groupBy("b").agg(F.count(F.lit(1)).alias("n1b"))
    types = c2.agg(F.count(F.lit(1)).alias("tt"))
    d = F.lit(float(discount))
    lp2 = F.log(
        F.lit(lam) * F.col("c2").cast("double") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("cu").cast("double") / F.col("s")
    )
    lp_kn = F.log(
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + d * F.col("n1a") / F.col("c1") * F.col("n1b") / F.col("tt")
    )
    per_doc2 = (
        bi.join(c2, ["a", "b"])
        .join(ctx, "a")
        .join(cont, "b")
        .join(counts, F.col("b") == F.col("t"))
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(types))
        .groupBy("id")
        .agg(
            F.round(-F.avg(lp2), 4).alias("logppl2"),
            F.round(-F.avg(lp_kn), 4).alias("logppl_kn"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc1, "id", "left")
        .join(per_doc2, "id", "left")
    )


def ccnet_ppl_buckets(
    scored: DataFrame,
    score_col: str = "logppl_kn",
    group_by: list[str] | None = None,
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): within
    each language, split documents into equal-thirds by LM perplexity —
    'head' (lowest perplexity ≈ cleanest), 'middle', 'tail'. CCNet
    trains on head+middle and drops or down-weights tail; this returns
    the labeled frame and leaves the keep policy to the caller.

    Pure composition: any of this module's scorers (CCNet itself uses
    KenLM ≈ ``kn_bigram_logppl`` one order down) + the per-group
    value-quantile bucketer ``qcut.qcut_by_group_expr`` (exact-rank
    tercile edges per language, right-closed bins, duplicates-drop
    label collapse — so a language whose scores are constant gets NULL
    buckets, not a lie). Scale shape is the bucketer's: per-language
    edges from one capped-histogram pass or a grouped percentile agg —
    never a per-language global sort, which is the naive ntile
    formulation's skew bomb (one language IS most of a crawl).
    """
    from dw_etl_spark.operators.qcut import qcut_by_group_expr

    return qcut_by_group_expr(
        scored,
        group_by or ["lang"],
        score_col,
        n=3,
        labels=list(labels),
        out_col=out_col,
    )
