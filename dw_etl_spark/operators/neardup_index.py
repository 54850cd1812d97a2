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

from dw_etl_spark.operators.scale import write_bucketed
from dw_etl_spark.operators.text_dedup import (
    _jaccard,
    _shingles,
    band_keys,
    minhash_signatures,
)


def _check_name(name: str) -> str:
    """Index names become catalog identifiers inside DDL strings —
    restrict to plain identifiers so a stray quote/semicolon cannot
    reach ``spark.sql``."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(
            f"index name must be a plain SQL identifier, got {name!r}"
        )
    return name


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


def drop_catalog_tables(
    spark: SparkSession, name: str, suffixes: tuple[str, ...]
) -> None:
    """DROP TABLE each ``{name}{suffix}`` AND sweep any stale managed
    location left by a PREVIOUS session: a dead session's table is
    invisible to this session's fresh in-memory catalog (the DROP
    no-ops) but its directory survives under the warehouse dir, and a
    later ``saveAsTable`` fails with LOCATION_ALREADY_EXISTS. Shared by
    every persisted-index family (near-dup, BM25)."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    _check_name(name)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
    wh_path = Path(wh.path) if wh.path else None
    for suffix in suffixes:
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
        if wh_path is not None:
            stale = wh_path / f"{name}{suffix}"
            if stale.exists():
                shutil.rmtree(stale, ignore_errors=True)


def drop_neardup_index(spark: SparkSession, name: str) -> None:
    """Drop the three index tables (managed tables — data included;
    stale cross-session locations swept too — see
    ``drop_catalog_tables``)."""
    drop_catalog_tables(spark, name, ("_bands", "_shingles", "_meta"))


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
    idx = spark.table(f"{name}_bands").withColumnsRenamed({"id": "index_id"})
    cands = (
        idx.join(probe.repartition(p["n_buckets"], "band", "key"), ["band", "key"])
        .filter(F.col("index_id") != F.col("batch_id"))
        .select("index_id", "batch_id")
        .distinct()
    )
    idx_sh = spark.table(f"{name}_shingles").withColumnsRenamed(
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
    keep rule); the index itself never drops rows."""
    spark = batch.sparkSession
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

    Staging: each table is rewritten under ``{name}__compact`` with
    the SAME (keys, n_buckets) spec, then swapped in via a
    rename-aside sequence: live → ``__old``, staged → live, drop
    ``__old``. No step destroys state before its replacement is in
    place, so a crash at ANY point is recoverable (either the live
    name still resolves, or the previous table survives under
    ``{table}__old`` and one ``ALTER TABLE RENAME`` restores it). The
    swap is NOT atomic — a concurrent query resolving the name in the
    instant between the two renames sees a transient table-not-found
    and should retry; what it can never see is lost data or a
    half-written table. Returns (files_before, files_after) data-file
    counts summed over both tables, computed through the Hadoop
    FileSystem API so the diagnostic works on HDFS/S3 locations, not
    just ``file:`` ones.
    """
    p = _params(spark, name)

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

    specs = {
        f"{name}_bands": ["band", "key"],
        f"{name}_shingles": ["id"],
    }
    before = sum(count_files(t) for t in specs)
    for table, keys in specs.items():
        staged, backup = f"{table}__compact", f"{table}__old"
        spark.sql(f"DROP TABLE IF EXISTS {staged}")
        spark.sql(f"DROP TABLE IF EXISTS {backup}")
        df = spark.table(table).repartition(p["n_buckets"], *keys)
        (
            df.write.mode("overwrite")
            .bucketBy(p["n_buckets"], *keys)
            .saveAsTable(staged)
        )
        spark.sql(f"ALTER TABLE {table} RENAME TO {backup}")
        spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")
        spark.sql(f"DROP TABLE {backup}")
    return before, sum(count_files(t) for t in specs)
