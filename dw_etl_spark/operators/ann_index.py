"""Persisted incremental int8-IVF ANN index: build once, probe many.

``int8_ivf_topk`` re-quantizes, re-assigns, and re-shuffles the WHOLE
corpus every call — right for a one-shot near-dup/retrieval sweep,
wrong for the standing similarity service a training pipeline runs
("given any new eval/seed batch, which corpus vectors are closest?")
against a growing 100 TB embedding lake. This module freezes the
quantized-IVF state into a persisted, bucketed catalog table set — the
embedding-side completion of the neardup/BM25 incremental-index story:

  build_ann_index   — one pass over the seed corpus: quantize to int8
                      codes (absmax — direction-preserving, so cosine
                      needs no scale column), train the deterministic
                      md5-sample centroids IN CODE SPACE, assign every
                      code its top-1 centroid, and write the codes
                      bucketed on ``cid`` plus tiny centroid/meta/log
                      tables.
  query_ann_index   — probe a NEW batch: only the batch is quantized
                      and routed; its nprobe centroid ids become an
                      ``isin`` literal on the codes scan, so BUCKET
                      PRUNING skips every file holding no probed
                      cluster — scan work scales with nprobe/n_lists
                      of the corpus, not the corpus.
  merge_into_ann_index — quantize + assign a new batch against the
                      STORED centroids and append under the bucket
                      spec: the index grows without rewriting history,
                      and tomorrow's probes see today's vectors.
  refit_ann_index   — after the corpus has grown/drifted, retrain the
                      centroids over ALL committed codes and reassign
                      (crash-safe rename-aside swap, same protocol as
                      ``compact_bm25_index``); also collapses the
                      merge log and drops crashed-merge orphans.

Merge commit protocol (two append-only tables can't be updated in one
transaction, so visibility is the transaction — the exact
``bm25_index`` design): every appended code row carries an
attempt-scoped ``batch_tag``; the one-row ``_log`` append — written
LAST — is the COMMIT MARKER, and queries read only rows whose tag the
log names. A crash mid-merge leaves orphan code rows no query ever
sees (refit drops them for good); re-running a committed ``batch_id``
is a no-op — exactly-once per batch id on plain parquet tables.

Equality contract (pytest-pinned): probing the index — seed-built or
seed+merge — returns exactly what ``int8_ivf_topk`` returns over the
concatenated corpus with ``centroids=ann_index_centroids(...)``: same
absmax codes, same code-space routing, same BIGINT-exact
``int8_cosine``, same round-to-6-then-(score DESC, id ASC) ranking.

Centroid staleness is the designed trade: merged batches route through
the SEED-trained centroids (exactly like every published IVF system —
FAISS adds to a frozen coarse quantizer), so recall degrades only as
far as the data distribution drifts from the seed sample, and
``refit_ann_index`` is the periodic repair. The alternative — moving
centroids on every merge — would silently re-route HISTORY (old codes
assigned under old centroids) and break the equality contract.

Ids must be disjoint across build/merge batches (the module never
dedups — same contract as the neardup and BM25 indexes).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dw_etl_spark.operators.neardup_index import _check_name, drop_catalog_tables
from dw_etl_spark.operators.similarity import (
    _centroid_frame,
    _codes_as_double,
    _ranked_centroids,
    int8_cosine,
    ivf_centroids,
    quantize_int8,
)

TABLE_SUFFIXES = ("_codes", "_centroids", "_log", "_meta")


def _refresh(spark: SparkSession, name: str) -> None:
    """Invalidate this session's cached file listings for the index
    tables — appends from another session (or a foreachBatch
    micro-batch clone) are invisible to a session that read the table
    earlier otherwise (the ``bm25_index._refresh`` lesson, caught live
    with the streaming maintainer)."""
    for suffix in TABLE_SUFFIXES:
        try:
            spark.catalog.refreshTable(f"{name}{suffix}")
        except Exception:
            pass  # table may not exist yet (first build)


def _codes_frame(
    df: DataFrame, vec_col: str, id_col: str, codes_col: str | None
) -> DataFrame:
    """(id, q): int8 code arrays, quantizing inline unless the caller
    already stores codes (``codes_col`` — the production path: the
    float column never leaves the lake)."""
    q = F.col(codes_col) if codes_col else quantize_int8(F.col(vec_col))["q"]
    return df.select(F.col(id_col).alias("id"), q.alias("q"))


def _assign(codes: DataFrame, cents_df: DataFrame) -> DataFrame:
    """(id, q, cid): each code routed to its top-1 code-space centroid
    via the broadcast one-row centroid frame — the identical ranking
    rule ``int8_ivf_topk`` applies, which is what keeps the equality
    contract exact."""
    return codes.crossJoin(F.broadcast(cents_df)).select(
        "id",
        "q",
        F.element_at(
            _ranked_centroids(_codes_as_double(F.col("q")), F.col("__cents")), 1
        )["cid"].alias("cid"),
    )


def _write_codes(assigned: DataFrame, name: str, n_buckets: int, tag: str,
                 mode: str) -> None:
    # repartition to the bucket spec BEFORE the bucketed write so each
    # increment lands as one file per touched bucket, not tasks×buckets
    # shards (the bm25 _append_increment rule)
    (
        assigned.withColumn("batch_tag", F.lit(tag))
        .repartition(n_buckets, "cid")
        .write.mode(mode)
        .bucketBy(n_buckets, "cid")
        .saveAsTable(f"{name}_codes")
    )


def _log_row(spark: SparkSession, batch_id: str, tag: str, n_rows: int):
    return spark.createDataFrame(
        [(batch_id, tag, int(n_rows))],
        "batch_id string, batch_tag string, n_rows long",
    )


def build_ann_index(
    corpus: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_buckets: int = 8,
    codes_col: str | None = None,
) -> None:
    """Materialize ``{name}_codes`` / ``{name}_centroids`` /
    ``{name}_log`` / ``{name}_meta`` from the seed corpus. Centroids
    are the deterministic md5-rank sample (``ivf_centroids``) over the
    CODE arrays — no RNG, so a rebuild from the same corpus is
    bit-identical and the DuckDB oracle can replay it.

    Scale shape: one quantization pass (pinned via lazy
    localCheckpoint so centroid training and assignment share the
    materialized codes), one k-row ordered-limit collect, one
    bucket-spec shuffle for the write. ``n_buckets`` is the standing
    parallelism/pruning knob — size it to the corpus, not the batch
    (buckets hold whole inverted lists; nprobe pruning reads
    ~nprobe/n_centroids of the files when n_buckets == n_centroids)."""
    _check_name(name)
    spark = corpus.sparkSession
    codes = _codes_frame(corpus, vec_col, id_col, codes_col).localCheckpoint(
        eager=False
    )
    cents = ivf_centroids(
        codes.select("id", _codes_as_double(F.col("q")).alias("__cv")),
        "__cv",
        "id",
        n_centroids,
    )
    tag = "seed@0"
    _write_codes(
        _assign(codes, _centroid_frame(spark, cents)), name, n_buckets, tag,
        mode="overwrite",
    )
    spark.createDataFrame(
        [(int(cid), [float(x) for x in vec], float(norm)) for cid, vec, norm in cents],
        "cid int, vec array<double>, norm double",
    ).write.mode("overwrite").saveAsTable(f"{name}_centroids")
    _log_row(spark, "seed", tag, codes.count()).write.mode("overwrite").saveAsTable(
        f"{name}_log"
    )
    spark.createDataFrame(
        [(int(n_buckets),)], "n_buckets int"
    ).write.mode("overwrite").saveAsTable(f"{name}_meta")


def drop_ann_index(spark: SparkSession, name: str) -> None:
    """Drop the four index tables (managed — data included), sweeping
    stale directories a dead session left behind."""
    drop_catalog_tables(spark, name, TABLE_SUFFIXES)


def ann_index_centroids(
    spark: SparkSession, name: str
) -> list[tuple[int, list[float], float]]:
    """The stored centroid set in ``ivf_centroids``' [(cid, vec, norm)]
    form — pass to ``int8_ivf_topk(centroids=...)`` to reproduce index
    results from raw frames (the equality-contract accessor)."""
    _check_name(name)
    _refresh(spark, name)
    return [
        (int(r["cid"]), [float(x) for x in r["vec"]], float(r["norm"]))
        for r in spark.table(f"{name}_centroids").orderBy("cid").collect()
    ]


def _committed_tags(spark: SparkSession, name: str) -> list[str]:
    return [
        r["batch_tag"]
        for r in spark.table(f"{name}_log").select("batch_tag").collect()
    ]


def query_ann_index(
    queries: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
    codes_col: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim): top-k indexed neighbors of
    each query row under quantized cosine, probing ``nprobe`` inverted
    lists per query.

    Plan shape: only the batch is quantized/routed (pinned with a lazy
    localCheckpoint so routing and scoring share one quantization);
    the union of probed cids — at most n_centroids ints — becomes an
    ``isin`` literal on the codes scan, so bucket pruning skips every
    unprobed file (``SelectedBucketsCount`` plan-asserted in tests);
    the probe side is broadcast onto the pruned lists. Work scales
    with the batch and the probed fraction, never the history."""
    _check_name(name)
    spark = queries.sparkSession
    _refresh(spark, name)
    qcodes = _codes_frame(queries, vec_col, id_col, codes_col).localCheckpoint(
        eager=False
    )
    cents_df = _centroid_frame(spark, ann_index_centroids(spark, name))
    routed = qcodes.crossJoin(F.broadcast(cents_df)).select(
        F.col("id").alias("query_id"),
        F.col("q").alias("qq"),
        F.explode(
            F.transform(
                F.slice(
                    _ranked_centroids(_codes_as_double(F.col("q")), F.col("__cents")),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    ).localCheckpoint(eager=False)
    # bounded collect: ≤ n_centroids ints — the pruning literal
    probed = [int(r["cid"]) for r in routed.select("cid").distinct().collect()]
    lists = (
        spark.table(f"{name}_codes")
        .filter(F.col("cid").isin(probed))
        .filter(F.col("batch_tag").isin(_committed_tags(spark, name)))
        .select(F.col("id").alias("neighbor_id"), F.col("q").alias("cq"), "cid")
    )
    scored = (
        lists.join(F.broadcast(routed), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(int8_cosine(F.col("qq"), F.col("cq")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_into_ann_index(
    batch: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_id: str | None = None,
    codes_col: str | None = None,
) -> bool:
    """Append a batch: quantize, assign against the STORED centroids,
    write the code rows under the stored bucket spec, and LAST the
    one-row log increment that COMMITS the batch. Returns True if
    applied, False if ``batch_id`` was already committed (replay →
    no-op). Pass a stable ``batch_id`` (ingest date, crawl snapshot)
    for exactly-once across re-runs; the default auto-id is still
    crash-safe (orphans invisible) but can't recognize content."""
    _check_name(name)
    spark = batch.sparkSession
    _refresh(spark, name)
    n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]
    committed = [
        r["batch_id"] for r in spark.table(f"{name}_log").select("batch_id").collect()
    ]
    if batch_id is None:
        batch_id = f"merge-{len(committed)}"
    if batch_id in committed:
        return False
    # attempt-scoped physical tag: a crashed earlier attempt of this
    # batch_id left rows under a DIFFERENT tag — never double-counted
    tag = f"{batch_id}@{uuid.uuid4().hex[:8]}"
    codes = _codes_frame(batch, vec_col, id_col, codes_col).localCheckpoint(
        eager=False
    )
    assigned = _assign(codes, _centroid_frame(spark, ann_index_centroids(spark, name)))
    _write_codes(assigned, name, n_buckets, tag, mode="append")
    _log_row(spark, batch_id, tag, codes.count()).write.mode("append").saveAsTable(
        f"{name}_log"
    )
    return True


def refit_ann_index(
    spark: SparkSession, name: str, n_centroids: int | None = None
) -> tuple[int, int]:
    """Retrain the coarse quantizer over ALL committed codes and
    reassign every code row — the periodic repair for centroid
    staleness after many merges (and the only step that moves
    history). Crashed-merge orphan rows are dropped for good; the log
    collapses to one row. Crash-safe rename-aside swap per table
    (live → ``__old``, staged → live, drop ``__old``): no step
    destroys state before its replacement exists. Returns
    (n_centroids, n_code_rows)."""
    _check_name(name)
    _refresh(spark, name)
    n_buckets = spark.table(f"{name}_meta").collect()[0]["n_buckets"]
    if n_centroids is None:
        n_centroids = spark.table(f"{name}_centroids").count()
    committed = (
        spark.table(f"{name}_codes")
        .filter(F.col("batch_tag").isin(_committed_tags(spark, name)))
        .select("id", "q")
        .localCheckpoint(eager=False)
    )
    cents = ivf_centroids(
        committed.select("id", _codes_as_double(F.col("q")).alias("__cv")),
        "__cv",
        "id",
        n_centroids,
    )
    n_rows = committed.count()

    def swap(table: str, write) -> None:
        staged, backup = f"{table}__refit", f"{table}__old"
        spark.sql(f"DROP TABLE IF EXISTS {staged}")
        spark.sql(f"DROP TABLE IF EXISTS {backup}")
        write(staged)
        spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
        spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")
        spark.sql(f"DROP TABLE {backup}")

    tag = "refit@0"
    assigned = _assign(committed, _centroid_frame(spark, cents))
    swap(
        f"{name}_codes",
        lambda t: (
            assigned.withColumn("batch_tag", F.lit(tag))
            .repartition(n_buckets, "cid")
            .write.mode("overwrite")
            .bucketBy(n_buckets, "cid")
            .saveAsTable(t)
        ),
    )
    cent_rows = [
        (int(cid), [float(x) for x in vec], float(norm)) for cid, vec, norm in cents
    ]
    swap(
        f"{name}_centroids",
        lambda t: spark.createDataFrame(
            cent_rows, "cid int, vec array<double>, norm double"
        ).write.mode("overwrite").saveAsTable(t),
    )
    swap(
        f"{name}_log",
        lambda t: _log_row(spark, "refit", tag, n_rows)
        .write.mode("overwrite")
        .saveAsTable(t),
    )
    return len(cents), n_rows
