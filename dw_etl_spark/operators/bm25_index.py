"""Persisted incremental BM25 index: build once, query many.

``ir.bm25_topk`` re-tokenizes and re-aggregates the WHOLE corpus every
call — right for a one-shot decontamination sweep, wrong for the
standing retrieval service a training pipeline runs ("given any new
benchmark, which corpus docs are closest?") or for targeted data
selection against a growing crawl. This module makes the BM25 state a
persisted, bucketed catalog table pair plus an append-only stats log:

  build_bm25_index  — one ``bm25_postings`` pass over the seed corpus,
                      writing (term, id, tf, dl) bucketed+sorted on
                      term, per-term document frequencies bucketed on
                      term, and a one-row (n_docs, dl_sum) stats
                      increment.
  query_bm25_index  — score a query batch: only the queries are
                      tokenized; the distinct query-term list (small by
                      contract — eval sets, seed prompts) becomes an
                      ``isin`` literal filter on the postings scan, so
                      BUCKET PRUNING skips every file holding no query
                      term — scan work scales with the query terms'
                      buckets, not the corpus. df/stats aggregate
                      bucket-aligned (df) or from the tiny stats log.
  merge_into_bm25_index — append a new batch's postings, per-batch df
                      partials and a stats increment under the stored
                      bucket spec: the index grows without rewriting
                      history; df and avgdl are exact because they are
                      summed across increments at query time (a few
                      rows per term / per increment — never stale).
  compact_bm25_index — after many merges, rewrite the small-file piles
                      and collapse the df/stats partials (crash-safe
                      rename-aside swap; results pinned unchanged).

Equality contract (pytest-pinned): querying the index — seed-built or
seed+merge — returns exactly what ``bm25_topk`` returns on the
concatenated corpus with the same parameters: same idf from the summed
df/stats, same tf normalization from the denormalized dl, same
round-to-6-then-rank ordering.

Batch ids must be disjoint from indexed ids (the module never dedups;
re-adding a doc double-counts it, same contract as the neardup index's
append-only tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import tokens
from dw_etl_spark.operators.ir import bm25_postings
from dw_etl_spark.operators.neardup_index import _check_name


def _stats_increment(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(F.size(tokens(text_col)).cast("long").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("dl_sum")
    )


def build_bm25_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    n_buckets: int = 32,
) -> None:
    """Materialize ``{name}_postings`` / ``{name}_df`` / ``{name}_stats``
    / ``{name}_meta``. Postings are bucketed AND sorted on term so a
    pruned scan reads runs, not scattered rows; df partials share the
    bucket spec so the query-time df sum is exchange-free."""
    _check_name(name)
    spark = df.sparkSession
    postings = bm25_postings(df, text_col, id_col)
    (
        postings.write.mode("overwrite")
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .saveAsTable(f"{name}_postings")
    )
    (
        spark.table(f"{name}_postings")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .write.mode("overwrite")
        .bucketBy(n_buckets, "term")
        .saveAsTable(f"{name}_df")
    )
    _stats_increment(df, text_col).write.mode("overwrite").saveAsTable(
        f"{name}_stats"
    )
    spark.createDataFrame(
        [(int(n_buckets),)], "n_buckets int"
    ).write.mode("overwrite").saveAsTable(f"{name}_meta")


def merge_into_bm25_index(
    batch: DataFrame, text_col: str, id_col: str, name: str
) -> None:
    """Append a batch: postings under the stored bucket spec, a
    per-batch df partial (summed at query time — df over increments is
    exact, not approximated), and a stats increment row."""
    _check_name(name)
    spark = batch.sparkSession
    n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]
    postings = bm25_postings(batch, text_col, id_col)
    (
        postings.write.mode("append")
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .saveAsTable(f"{name}_postings")
    )
    (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .write.mode("append")
        .bucketBy(n_buckets, "term")
        .saveAsTable(f"{name}_df")
    )
    _stats_increment(batch, text_col).write.mode("append").saveAsTable(
        f"{name}_stats"
    )


def drop_bm25_index(spark: SparkSession, name: str) -> None:
    """Drop the four index tables (managed — data included)."""
    _check_name(name)
    for suffix in ("_postings", "_df", "_stats", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")


def query_bm25_index(
    queries: DataFrame,
    name: str,
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 1.0,
    max_query_terms: int = 100_000,
) -> DataFrame:
    """(query_id, id, score, rank): the k best-indexed docs per query,
    scored and ordered exactly as ``ir.bm25_topk`` (Lucene idf from the
    summed increments, round(score,6) before ranking).

    The distinct query-term list is collected to the driver (bounded
    by ``max_query_terms`` — queries are eval sets and seed prompts,
    not corpora; exceeding the cap raises rather than silently
    degrading) and pushed into the postings scan as an ``isin``
    literal predicate: Spark prunes whole buckets that contain no
    query term, so the dominant cost scales with matched terms' bucket
    files, not the index. df and the doc stats aggregate from the
    partials tables (term-bucket-aligned / increment-row-sized).
    """
    _check_name(name)
    spark = queries.sparkSession
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode_outer(tokens(query_text_col)).alias("term"),
        )
        .filter(F.col("term").isNotNull())
        .distinct()
    )
    term_list = [
        r["term"]
        for r in qterms.select("term").distinct().limit(max_query_terms + 1).collect()
    ]
    if len(term_list) > max_query_terms:
        raise ValueError(
            f"query batch has more than {max_query_terms} distinct terms; "
            "raise max_query_terms explicitly if this is intended"
        )
    stats = spark.table(f"{name}_stats").agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("dl_sum") / F.sum("n_docs")).alias("avgdl"),
    )
    dft = (
        spark.table(f"{name}_df")
        .filter(F.col("term").isin(term_list))
        .groupBy("term")
        .agg(F.sum("df_t").alias("df_t"))
    )
    qdf = dft.join(F.broadcast(qterms), "term").crossJoin(
        F.broadcast(stats.select("n_docs"))
    )
    if max_df_frac < 1.0:
        qdf = qdf.filter(F.col("df_t") <= F.lit(max_df_frac) * F.col("n_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    qdf = qdf.select("term", "query_id", idf.alias("idf"))
    postings = spark.table(f"{name}_postings").filter(
        F.col("term").isin(term_list)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("query_id", "id")
        .agg(F.round(F.sum(F.col("idf") * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )


def compact_bm25_index(spark: SparkSession, name: str) -> tuple[int, int]:
    """Rewrite the index tables after many merges: postings collapse
    from one-file-per-bucket-per-merge to a near-minimal file count
    (the sorted-write task layout can split a bucket across a couple
    of files — still bucket-correct, just not always exactly one), the
    df partials are SUMMED to one row per term (query-time
    merge-on-read cost returns to zero), the stats log to one row.
    Same crash-safe rename-aside swap as
    ``neardup_index.compact_neardup_index``: live → ``__old``, staged
    → live, drop ``__old`` — no step destroys state before its
    replacement exists; the instant between renames can surface a
    transient table-not-found to concurrent queries, never lost data.
    Returns (files_before, files_after) over the two bucketed tables.
    """
    _check_name(name)
    n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]

    def count_files(table: str) -> int:
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(loc)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return sum(
            1
            for st in fs.listStatus(hpath)
            if st.isFile()
            and not st.getPath().getName().startswith(("_", "."))
        )

    bucketed = [f"{name}_postings", f"{name}_df"]
    before = sum(count_files(t) for t in bucketed)

    def swap(table: str, staged_df, sort: bool) -> None:
        staged, backup = f"{table}__compact", f"{table}__old"
        spark.sql(f"DROP TABLE IF EXISTS {staged}")
        spark.sql(f"DROP TABLE IF EXISTS {backup}")
        w = staged_df.repartition(n_buckets, "term").write.mode("overwrite")
        w = w.bucketBy(n_buckets, "term")
        if sort:
            w = w.sortBy("term")
        w.saveAsTable(staged)
        spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
        spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")
        spark.sql(f"DROP TABLE {backup}")

    swap(f"{name}_postings", spark.table(f"{name}_postings"), sort=True)
    swap(
        f"{name}_df",
        spark.table(f"{name}_df")
        .groupBy("term")
        .agg(F.sum("df_t").alias("df_t")),
        sort=False,
    )
    stats = spark.table(f"{name}_stats").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("dl_sum").alias("dl_sum")
    )
    staged, backup = f"{name}_stats__compact", f"{name}_stats__old"
    spark.sql(f"DROP TABLE IF EXISTS {staged}")
    spark.sql(f"DROP TABLE IF EXISTS {backup}")
    stats.write.mode("overwrite").saveAsTable(staged)
    spark.sql(f"ALTER TABLE {name}_stats RENAME TO {backup}")
    spark.sql(f"ALTER TABLE {staged} RENAME TO {name}_stats")
    spark.sql(f"DROP TABLE {backup}")
    return before, sum(count_files(t) for t in bucketed)
