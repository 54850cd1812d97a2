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

Merge commit protocol (append-only tables can't do a three-table
transaction, so visibility is the transaction): every postings/df row
carries an attempt-scoped ``batch_tag``; the one-row ``_stats`` append
— LAST of the three — is the COMMIT MARKER, and queries read only rows
whose tag appears in ``_stats``. A crash between the appends leaves
orphan postings/df rows that no query ever sees (re-running the merge
writes a fresh attempt tag; compaction drops orphans for good), and
re-running an already-committed ``batch_id`` is a no-op — exactly-once
per batch id on plain parquet tables. This is the same
commit-by-snapshot-log idea a table format (Iceberg/Delta) provides
natively; swap the tables onto one and the tag column disappears.

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

from dw_etl_spark.functions.text import tokens_of
from dw_etl_spark.operators._commit_protocol import (
    check_name as _check_name,
    count_data_files,
    drop_catalog_tables,
    index_writer,
    read_table_any,
    recover_table_swap,
    swap_in,
)
from dw_etl_spark.operators.ir import bm25_postings

TABLE_SUFFIXES = ("_postings", "_df", "_stats", "_meta")
_SWAP_SUFFIXES = tuple(
    f"{s}{t}" for s in ("_postings", "_df", "_stats") for t in ("__stage", "__old")
)

# The tag compaction rewrites every surviving row under. It is ALWAYS
# visible — not gated on appearing in ``_stats`` like per-batch tags —
# because rows carrying it can only reach a LIVE table through a
# completed, leased ``swap_in`` whose staged table was built from the
# then-committed corpus. That closes the r13 cross-table crash window
# (ADVICE r14): a crash between the postings swap and the stats swap
# used to leave postings holding only compacted rows while ``_stats``
# still named the old per-batch tags, so the committed-tags filter
# returned empty forever and no per-table recovery could repair it
# (both renames had completed). With the OR-visibility rule every
# crash point reads a complete corpus exactly once: before the
# postings swap the old tags are visible; after it the compacted rows
# are; df/stats follow the same rule table by table, and totals agree
# because each swap's staged content is row-equivalent to the visible
# rows it replaces.
COMPACTED_TAG = "compacted@0"


def _visible(committed_tags: list[str]):
    """Visibility predicate for postings/df rows: committed per-batch
    tags (named by a ``_stats`` row) OR the always-visible compacted
    tag — see ``COMPACTED_TAG``."""
    return F.col("batch_tag").isin(committed_tags) | (
        F.col("batch_tag") == COMPACTED_TAG
    )


def _refresh(spark: SparkSession, name: str) -> None:
    """Invalidate this session's cached file listings for the index
    tables. Spark caches a table's relation (with its file index) PER
    SESSION — an append from another session or a ``foreachBatch``
    micro-batch clone lands on disk but stays invisible to a session
    that read the table earlier (caught live: the streaming maintainer
    wrote two epochs that the outer session's query could not see).
    Every reader entry point refreshes first; the cost is a re-listing,
    which a standing index that other writers grow needs anyway."""
    for suffix in ("_postings", "_df", "_stats"):
        try:
            spark.catalog.refreshTable(f"{name}{suffix}")
        except Exception:
            pass  # table may not exist yet (first build)


def _stats_increment(
    batch: DataFrame, name: str, batch_id: str, batch_tag: str
) -> DataFrame:
    """One (n_docs, dl_sum, batch_id, batch_tag) commit row. dl_sum
    comes from the postings ALREADY WRITTEN under this attempt's tag —
    a pruned (id, dl, batch_tag) columnar read-back, never a second
    tokenize of the batch text (the 100 TB double-scan ir.bm25_topk
    also avoids, see its stats derivation). n_docs counts the batch
    frame itself (no text touched), so zero-token docs still count
    toward avgdl's denominator exactly as ``ir.bm25_topk`` counts
    them."""
    spark = batch.sparkSession
    n = batch.agg(F.count(F.lit(1)).alias("n_docs"))
    dl = (
        spark.table(f"{name}_postings")
        .filter(F.col("batch_tag") == batch_tag)
        .select("id", "dl")
        .distinct()
        .agg(F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("dl_sum"))
    )
    return n.crossJoin(dl).select(
        "n_docs",
        "dl_sum",
        F.lit(batch_id).alias("batch_id"),
        F.lit(batch_tag).alias("batch_tag"),
    )


def _append_increment(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    n_buckets: int,
    batch_id: str,
    batch_tag: str,
    mode: str,
) -> None:
    """The shared postings → df → stats(commit) append sequence of
    build and merge. The stats row is written LAST: it is the commit
    marker that makes this attempt's tag visible to queries."""
    spark = batch.sparkSession
    postings = bm25_postings(batch, text_col, id_col).withColumn(
        "batch_tag", F.lit(batch_tag)
    )
    # repartition to the bucket spec BEFORE the bucketed write: the
    # task layout then matches the bucket layout, so each increment
    # lands as one file per bucket instead of tasks×buckets shards
    # (same rule compact_bm25_index applies on rewrite); n_buckets is
    # the corpus-sized parallelism knob, so this never under-splits a
    # properly-sized index
    (
        postings.repartition(n_buckets, "term")
        .write.mode(mode)
        .bucketBy(n_buckets, "term")
        .sortBy("term")
        .saveAsTable(f"{name}_postings")
    )
    (
        spark.table(f"{name}_postings")
        .filter(F.col("batch_tag") == batch_tag)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_t"))
        .withColumn("batch_tag", F.lit(batch_tag))
        .repartition(n_buckets, "term")
        .write.mode(mode)
        .bucketBy(n_buckets, "term")
        .saveAsTable(f"{name}_df")
    )
    _stats_increment(batch, name, batch_id, batch_tag).write.mode(
        mode
    ).saveAsTable(f"{name}_stats")


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
    bucket spec so the query-time df sum is exchange-free. A build is
    mode='overwrite' throughout — a crashed build is simply re-run
    (the merge commit protocol protects INCREMENTS, not the initial
    build)."""
    _check_name(name)
    spark = df.sparkSession
    with index_writer(spark, name):
        # meta first: a committed stats row must never exist before the
        # bucket spec queries need to interpret it
        spark.createDataFrame(
            [(int(n_buckets),)], "n_buckets int"
        ).write.mode("overwrite").saveAsTable(f"{name}_meta")
        _append_increment(
            df, text_col, id_col, name, n_buckets,
            batch_id="seed", batch_tag="seed@0", mode="overwrite",
        )


def merge_into_bm25_index(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    batch_id: str | None = None,
) -> bool:
    """Append a batch: postings under the stored bucket spec, a
    per-batch df partial (summed at query time — df over increments is
    exact, not approximated), and LAST the one-row stats increment
    that COMMITS the batch (see the module docstring's commit
    protocol). Returns True if the batch was applied, False if
    ``batch_id`` was already committed (replay → no-op).

    Pass a stable ``batch_id`` (crawl snapshot id, ingest date) to get
    exactly-once semantics across re-runs and crash replays. With the
    default auto-id (``merge-<n_committed>``) a crash mid-merge is
    still safe — the orphan rows carry an attempt tag no stats row
    names, so queries never see them and the re-run re-applies cleanly
    — but a re-run AFTER the commit landed counts as a new batch
    (auto-ids can't recognize content).

    Holds the writer lock+lease for the whole read-check-append
    sequence (r13, ``_commit_protocol``): a second process attempting
    maintenance on the same physical index fails loud
    (``ConcurrentWriterError``) instead of interleaving with a
    compaction swap."""
    import uuid

    _check_name(name)
    spark = batch.sparkSession
    with index_writer(spark, name):
        for t in ("_postings", "_df", "_stats"):
            recover_table_swap(spark, f"{name}{t}")
        _refresh(spark, name)
        n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]
        committed = [
            r["batch_id"]
            for r in spark.table(f"{name}_stats").select("batch_id").collect()
        ]
        if batch_id is None:
            batch_id = f"merge-{len(committed)}"
        if batch_id in committed:
            return False
        # attempt-scoped physical tag: a crashed earlier attempt of this
        # same batch_id left rows under a DIFFERENT tag, so the read-backs
        # (df partial, dl_sum) never double-count its orphans
        batch_tag = f"{batch_id}@{uuid.uuid4().hex[:8]}"
        _append_increment(
            batch, text_col, id_col, name, n_buckets,
            batch_id=batch_id, batch_tag=batch_tag, mode="append",
        )
    return True


def drop_bm25_index(spark: SparkSession, name: str) -> None:
    """Drop the four index tables (managed — data included). Stale
    table directories left by a PREVIOUS session are swept too —
    without that, the dead session's location blocks ``saveAsTable``
    with LOCATION_ALREADY_EXISTS (caught live: the gate's correctness
    and bench sessions run back-to-back against one working
    directory; see ``_commit_protocol.drop_catalog_tables``). Swap
    leftovers and the writer lease are swept too."""
    drop_catalog_tables(spark, name, TABLE_SUFFIXES + _SWAP_SUFFIXES)


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
    _refresh(spark, name)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode_outer(tokens_of(queries, query_text_col)).alias("term"),
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
    # visibility = the commit protocol: only rows whose attempt tag a
    # stats row names exist; orphans of crashed merges are filtered out
    # here (increment-count-sized literal list — no extra shuffle, and
    # it doesn't disturb the term-bucket pruning predicate)
    stats_tbl = read_table_any(spark, f"{name}_stats")
    committed_tags = [
        r["batch_tag"] for r in stats_tbl.select("batch_tag").collect()
    ]
    stats = stats_tbl.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("dl_sum") / F.sum("n_docs")).alias("avgdl"),
    )
    dft = (
        read_table_any(spark, f"{name}_df")
        .filter(F.col("term").isin(term_list) & _visible(committed_tags))
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
    postings = read_table_any(spark, f"{name}_postings").filter(
        F.col("term").isin(term_list) & _visible(committed_tags)
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
    Orphan rows of crashed merges (attempt tags no stats row names —
    invisible to queries, see the module commit protocol) are DROPPED
    here for good; the rewritten rows carry the ALWAYS-VISIBLE
    ``COMPACTED_TAG`` (r14 — see its comment: per-table swaps can't do
    a three-table transaction, so visibility must not depend on the
    ``_stats`` swap landing; a crash between the postings swap and the
    stats swap used to blank the index permanently). Uses the shared
    crash-safe rename-aside ``_commit_protocol.swap_in`` (stage → live
    via ``__old``) under the writer lock+lease: no step destroys state
    before its replacement exists, a crashed swap is readable through
    ``read_table_any`` and repaired by the next leased writer, a crash
    BETWEEN the three swaps reads complete (pytest-pinned for both
    inter-swap windows), and a SECOND process attempting maintenance
    fails loud. Returns (files_before, files_after) over the two
    bucketed tables.
    """
    _check_name(name)
    with index_writer(spark, name):
        for t in ("_postings", "_df", "_stats"):
            recover_table_swap(spark, f"{name}{t}")
        _refresh(spark, name)
        n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]
        committed_tags = [
            r["batch_tag"]
            for r in spark.table(f"{name}_stats").select("batch_tag").collect()
        ]
        bucketed = [f"{name}_postings", f"{name}_df"]
        before = sum(count_data_files(spark, t) for t in bucketed)
        tag = F.lit(COMPACTED_TAG).alias("batch_tag")

        def bucketed_writer(staged_df, sort: bool):
            def write(t):
                w = staged_df.repartition(n_buckets, "term").write.mode(
                    "overwrite"
                ).bucketBy(n_buckets, "term")
                if sort:
                    w = w.sortBy("term")
                w.saveAsTable(t)

            return write

        swap_in(
            spark,
            f"{name}_postings",
            bucketed_writer(
                spark.table(f"{name}_postings")
                .filter(_visible(committed_tags))
                .select("id", "term", "tf", "dl", tag),
                sort=True,
            ),
        )
        swap_in(
            spark,
            f"{name}_df",
            bucketed_writer(
                spark.table(f"{name}_df")
                .filter(_visible(committed_tags))
                .groupBy("term")
                .agg(F.sum("df_t").alias("df_t"))
                .select("term", "df_t", tag),
                sort=False,
            ),
        )
        stats = spark.table(f"{name}_stats").agg(
            F.sum("n_docs").alias("n_docs"), F.sum("dl_sum").alias("dl_sum")
        ).select(
            "n_docs",
            "dl_sum",
            F.lit("compacted").alias("batch_id"),
            tag,
        )
        swap_in(
            spark,
            f"{name}_stats",
            lambda t: stats.write.mode("overwrite").saveAsTable(t),
        )
        return before, sum(count_data_files(spark, t) for t in bucketed)
