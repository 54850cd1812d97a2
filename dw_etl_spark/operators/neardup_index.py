"""Persisted incremental MinHash-LSH near-dup index.

``minhash_lsh_pairs`` re-shingles and re-shuffles the WHOLE corpus
every run — right for a one-shot dedup, wrong for an ingest pipeline
that receives daily batches against a 100 TB history. This module
makes the LSH state a persisted, bucketed catalog table pair:

  build_neardup_index   — one full pass over the seed corpus, writing
                          (id, band, key) bucket keys bucketed on
                          (band, key) and the exact shingle sets
                          bucketed on id, plus a one-row params table.
  query_neardup_index   — probe a NEW batch: only the batch is
                          shingled/hashed/shuffled; both index-side
                          joins read bucket-aligned files with NO
                          Exchange (plan-asserted in tests). Work
                          scales with the batch, not the history.
  merge_into_neardup_index — append the (now deduped) batch into the
                          index tables, keeping the bucket layout, so
                          tomorrow's batch sees today's docs.

Writers (build/merge/compact) hold the shared in-process lock plus the
on-disk ``writer_lease`` (r13, ``_commit_protocol``): two processes
maintaining one physical index fail loud instead of interleaving.
Readers resolve a mid-compaction crash by reading the surviving swap
side (``read_table_any``) without mutating catalog state.

Equality contract (pytest-pinned): querying a batch against the index
returns exactly the corpus↔batch pairs that ``minhash_lsh_pairs``
finds on the concatenated corpus — same bands, same keys, same exact-
Jaccard verification, just with the corpus side precomputed.

Pair it with ``scale.bloom_prefilter_anti_join`` over exact
fingerprints for the exact-dup layer of the same incremental story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dw_etl_spark.operators._commit_protocol import (
    check_name as _check_name,  # re-exported: historical import site
    count_data_files,
    drop_catalog_tables,  # noqa: F401  (re-exported: historical import site)
    index_writer,
    read_table_any,
    recover_table_swap,
    swap_in,
)
from dw_etl_spark.operators.scale import write_bucketed
from dw_etl_spark.operators.text_dedup import (
    _jaccard,
    _shingles,
    band_keys,
    minhash_signatures,
)

TABLE_SUFFIXES = ("_bands", "_shingles", "_meta")
_SWAP_SUFFIXES = tuple(
    f"{s}{t}" for s in ("_bands", "_shingles") for t in ("__stage", "__old")
)


def _shingled(df: DataFrame, text_col: str, id_col: str, n: int, shingle: str):
    return df.select(
        F.col(id_col).alias("id"), _shingles(df, text_col, n, shingle).alias("sh")
    )


def build_neardup_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    shingle: str = "word",
    n_buckets: int = 32,
) -> None:
    """Materialize the index tables ``{name}_bands`` / ``{name}_shingles``
    / ``{name}_meta``. The LSH parameters are frozen into the meta table
    — queries and merges read them back, so probe-side hashing can
    never drift from what is stored."""
    _check_name(name)
    spark = df.sparkSession
    with index_writer(spark, name):
        sig = minhash_signatures(df, text_col, id_col, n, num_hashes, shingle)
        write_bucketed(
            band_keys(sig, num_hashes, bands),
            f"{name}_bands",
            ["band", "key"],
            n_buckets,
        )
        write_bucketed(
            _shingled(df, text_col, id_col, n, shingle),
            f"{name}_shingles",
            ["id"],
            n_buckets,
        )
        spark.createDataFrame(
            [(int(n), int(num_hashes), int(bands), shingle, int(n_buckets))],
            "n int, num_hashes int, bands int, shingle string, n_buckets int",
        ).write.mode("overwrite").saveAsTable(f"{name}_meta")


def drop_neardup_index(spark: SparkSession, name: str) -> None:
    """Drop the three index tables (managed tables — data included;
    stale cross-session locations and swap leftovers swept too — see
    ``_commit_protocol.drop_catalog_tables``)."""
    drop_catalog_tables(spark, name, TABLE_SUFFIXES + _SWAP_SUFFIXES)


def _params(spark: SparkSession, name: str):
    """Read the index params AND invalidate this session's cached file
    listings for the index tables first: table relations are cached
    PER SESSION, so an append from another session (or a foreachBatch
    micro-batch clone — the streaming maintainer) lands on disk but
    stays invisible to a session that read the table earlier. Every
    query/merge/compact entry point routes through here."""
    _check_name(name)
    for suffix in ("_bands", "_shingles"):
        try:
            spark.catalog.refreshTable(f"{name}{suffix}")
        except Exception:
            pass  # not built yet
    return spark.table(f"{name}_meta").collect()[0]


def query_neardup_index(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    name: str,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """(index_id, batch_id, jaccard): every indexed doc within
    ``min_jaccard`` of a batch doc. Batch ids need not be disjoint
    from index ids — self-matches (same id) are excluded.

    Plan shape: the batch (small side) is shingled, hashed, and
    repartitioned to the index's bucket layout; the ``_bands`` and
    ``_shingles`` scans join bucket-aligned with no index-side
    Exchange. Candidates are distinct (band,key) collisions; exact
    Jaccard verification then reads only the colliding index rows.
    """
    spark = batch.sparkSession
    p = _params(spark, name)
    sig = minhash_signatures(
        batch, text_col, id_col, p["n"], p["num_hashes"], p["shingle"]
    ).localCheckpoint(eager=False)
    probe = band_keys(sig, p["num_hashes"], p["bands"]).withColumnsRenamed(
        {"id": "batch_id"}
    )
    idx = read_table_any(spark, f"{name}_bands").withColumnsRenamed(
        {"id": "index_id"}
    )
    cands = (
        idx.join(probe.repartition(p["n_buckets"], "band", "key"), ["band", "key"])
        .filter(F.col("index_id") != F.col("batch_id"))
        .select("index_id", "batch_id")
        .distinct()
    )
    idx_sh = read_table_any(spark, f"{name}_shingles").withColumnsRenamed(
        {"id": "index_id", "sh": "sh_i"}
    )
    batch_sh = _shingled(
        batch, text_col, id_col, p["n"], p["shingle"]
    ).withColumnsRenamed({"id": "batch_id", "sh": "sh_b"})
    return (
        cands.join(batch_sh, "batch_id")
        .repartition(p["n_buckets"], "index_id")
        .join(idx_sh, "index_id")
        .select(
            "index_id",
            "batch_id",
            _jaccard(F.col("sh_i"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def merge_into_neardup_index(
    batch: DataFrame, text_col: str, id_col: str, name: str
) -> None:
    """Append the batch's bucket keys and shingles under the stored
    parameters/bucket spec — the index grows without rewriting
    history. Dedup the batch first (``query_neardup_index`` + your
    keep rule); the index itself never drops rows. Holds the writer
    lock+lease: a concurrent maintainer in another process fails loud
    rather than interleaving appends with a compaction swap."""
    spark = batch.sparkSession
    with index_writer(spark, name):
        for t in ("_bands", "_shingles"):
            recover_table_swap(spark, f"{name}{t}")
        p = _params(spark, name)
        sig = minhash_signatures(
            batch, text_col, id_col, p["n"], p["num_hashes"], p["shingle"]
        )
        (
            band_keys(sig, p["num_hashes"], p["bands"])
            .write.mode("append")
            .bucketBy(p["n_buckets"], "band", "key")
            .saveAsTable(f"{name}_bands")
        )
        (
            _shingled(batch, text_col, id_col, p["n"], p["shingle"])
            .write.mode("append")
            .bucketBy(p["n_buckets"], "id")
            .saveAsTable(f"{name}_shingles")
        )


def compact_neardup_index(spark: SparkSession, name: str) -> tuple[int, int]:
    """Rewrite the index tables to one file per bucket, preserving the
    bucket layout. Every ``merge_into_neardup_index`` appends its own
    file per bucket, so after many epochs each bucket is a pile of
    small files and probe-side scans pay per-file open cost — the
    bucketed-table analogue of ``scale.compact_parquet`` (which cannot
    be used here: a plain rewrite would drop the bucket metadata the
    exchange-free probe depends on).

    Staging: each table is rewritten under ``{table}__stage`` with the
    SAME (keys, n_buckets) spec, then swapped in via the shared
    rename-aside ``swap_in`` (live → ``__old``, staged → live, drop
    ``__old``). No step destroys state before its replacement is in
    place; a crash at ANY point — including between the two renames —
    is resolved by readers through ``read_table_any`` (non-mutating)
    and repaired by the next leased writer's ``recover_table_swap``.
    Runs under the writer lock+lease. Returns (files_before,
    files_after) data-file counts summed over both tables, via the
    Hadoop FileSystem API so the diagnostic works on HDFS/S3
    locations, not just ``file:`` ones.
    """
    with index_writer(spark, name):
        for t in ("_bands", "_shingles"):
            recover_table_swap(spark, f"{name}{t}")
        p = _params(spark, name)
        specs = {
            f"{name}_bands": ["band", "key"],
            f"{name}_shingles": ["id"],
        }
        before = sum(count_data_files(spark, t) for t in specs)
        for table, keys in specs.items():
            df = spark.table(table).repartition(p["n_buckets"], *keys)
            swap_in(
                spark,
                table,
                lambda t, df=df, keys=keys: (
                    df.write.mode("overwrite")
                    .bucketBy(p["n_buckets"], *keys)
                    .saveAsTable(t)
                ),
            )
        return before, sum(count_data_files(spark, t) for t in specs)
