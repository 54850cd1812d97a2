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

from dw_etl_spark.functions.text import tokens


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
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
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
