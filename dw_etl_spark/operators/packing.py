"""Token-budget shard packing (training-data extension).

An LLM training pipeline lays documents out as one long token stream
and cuts it into fixed-size shards/sequences. Assigning each document
its (shard, offset) in that stream is a global *prefix sum* over a
deterministic document order — the same two-phase trick as
``keys.add_unique_id`` (range partition → in-partition running sums →
per-partition totals broadcast as offsets), generalized from row counts
to token sums, so the layout of a 100 TB corpus never sorts on a single
partition.

Semantics are contiguous-stream: a document may straddle a shard
boundary (exactly how concatenate-then-chunk training pipelines split
sequences). Boundary-respecting greedy packing is inherently
sequential state; callers that need it can filter
``shard_offset + n_tokens <= shard_tokens`` and reflow the remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_into_shards(
    df: DataFrame,
    token_col: str,
    order_by: list[str],
    shard_tokens: int,
    num_partitions: int | None = None,
    pinned_out: list | None = None,
) -> DataFrame:
    """Append ``prefix_tokens``, ``shard_id``, ``shard_offset``:
    the document's exclusive token prefix-sum in ``order_by`` order,
    the shard it starts in (``prefix // shard_tokens``, exact integer
    ``div`` — no double-precision detour, so the layout stays exact
    past 2^53 total tokens), and its starting offset inside that shard
    (``prefix % shard_tokens``).

    Deterministic for any input partitioning given a total ``order_by``
    (tested); the persist pin is the same AQE-snapshot requirement as
    ``add_unique_id`` (see keys.py — two separately-planned consumers
    of one range exchange can otherwise see different partitionings).
    As there, the cache is the price of stable distributed layout:
    ``unpersist()`` it once the output is consumed. Pass a list as
    ``pinned_out`` to receive the pinned frame for caller-managed
    cleanup (``pinned_out[0].unpersist()``); otherwise the pin lives
    until the session drops it.
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    from pyspark import StorageLevel

    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"
    )
    parted = df.repartitionByRange(int(n_parts), *order_by).sortWithinPartitions(
        *order_by
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if pinned_out is not None:
        pinned_out.append(with_pid)
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_run = with_pid.withColumn(
        "__run", F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long")
    )

    # one row per partition — the "global" window is microscopic
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.sum(token_col).alias("__tok"))
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__tok").over(w_off), F.lit(0)).cast("long"),
        )
        .select("__pid", "__offset")
    )
    prefix = F.col("__offset") + F.col("__run")
    return (
        with_run.join(F.broadcast(offsets), "__pid")
        .withColumn("prefix_tokens", prefix)
        .withColumn(
            "shard_id",
            F.expr(f"prefix_tokens div {int(shard_tokens)}").cast("long"),
        )
        .withColumn("shard_offset", (prefix % F.lit(shard_tokens)).cast("long"))
        .drop("__pid", "__run", "__offset")
        .select(*df.columns, "prefix_tokens", "shard_id", "shard_offset")
    )


def write_training_shards(
    df,
    path: str,
    order_col: str,
    records_per_file: int = 100_000,
    salt: str = "shuffle",
    num_partitions: int | None = None,
) -> None:
    """Materialize a training-ready corpus delivery: rows in a
    reproducible shuffled order (``deterministic_shuffle`` — same
    permutation every run/engine/partitioning), cut into size-bounded
    parquet shards via ``maxRecordsPerFile``. The loader can then
    stream shards sequentially and still see a well-mixed corpus.

    Scale shape: one range-partitioned sort (the shuffle) and a plain
    sharded write — no driver materialization, no single-reducer stage.
    """
    from dw_etl_spark.operators.sampling import deterministic_shuffle

    shuffled = deterministic_shuffle(
        df, order_col, salt=salt, num_partitions=num_partitions
    )
    (
        shuffled.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(path)
    )


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str,
    key_col: str,
    members: dict[str, str],
    shard_name: str = "shard-{:06d}.tar",
) -> None:
    """Export samples as WebDataset-convention tar shards: one
    ``shard-NNNNNN.tar`` per distinct ``shard_col`` value, each sample
    a group of members named ``{key}.{ext}`` — the layout
    sequential-read training loaders (WebDataset et al.) consume
    directly, with multimodal payloads (``binary`` columns) and
    metadata (string/JSON columns) side by side.

    ``members`` maps member EXTENSION → source column; ``binary``
    columns are written verbatim, strings as UTF-8. Rows with a NULL
    member column skip that member (sparse modalities); a NULL key or
    shard raises — silent drops would corrupt the sample/shard
    accounting.

    Scale shape: hash-repartition on ``shard_col`` puts each shard's
    rows on exactly one task; ``sortWithinPartitions(shard, key)``
    plus zeroed tar metadata (mtime/uid/gid) makes every shard
    BYTE-deterministic for any input partitioning (pytest-pinned by
    file hash). A task may own several shards (hash collisions are
    fine — one open handle per shard, sequential writes); a shard is
    never split across tasks.

    Shared-FS sink contract: shard files are written with plain
    ``open()``, so ``out_dir`` must be a POSIX path visible to EVERY
    executor (local dir in local mode; NFS/FUSE mount on a cluster —
    the standard WebDataset serving arrangement). Object stores need
    a FUSE gateway or a post-hoc upload step. Pair with
    ``pack_into_shards`` (token budgets) or ``ntile``-style row
    budgets to assign ``shard_col``.
    """
    import io
    import os
    import tarfile

    cols = [shard_col, key_col] + list(members.values())
    exts = dict(members)

    def _write_partition(rows) -> None:
        handles: dict[int, tarfile.TarFile] = {}
        try:
            for row in rows:
                sid, key = row[shard_col], row[key_col]
                if sid is None or key is None:
                    raise ValueError(
                        f"NULL {shard_col!r}/{key_col!r} in tar export"
                    )
                sid = int(sid)
                tar = handles.get(sid)
                if tar is None:
                    tar = tarfile.open(
                        os.path.join(out_dir, shard_name.format(sid)), "w"
                    )
                    handles[sid] = tar
                for ext, col in exts.items():
                    data = row[col]
                    if data is None:
                        continue
                    if isinstance(data, str):
                        data = data.encode("utf-8")
                    else:
                        data = bytes(data)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # determinism: no wall-clock in bytes
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
        finally:
            for tar in handles.values():
                tar.close()

    os.makedirs(out_dir, exist_ok=True)
    (
        df.select(*cols)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col)
        .foreachPartition(_write_partition)
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 512,
    overlap: int = 0,
    out_col: str = "chunk",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk): each document's token stream
    cut into windows of ``chunk_tokens`` with ``overlap`` tokens
    carried between consecutive chunks — the per-document
    context-window prep that precedes ``pack_into_shards``'s
    cross-document stream layout.

    Start positions step by ``chunk_tokens − overlap``; a start past
    the first is emitted only while it still contributes ≥ 1 UNSEEN
    token (no trailing chunk that is pure overlap). The final chunk
    may be short; an empty doc yields no chunks. chunk_id is the
    0-based window ordinal, so (id, chunk_id) is a total key and the
    output is engine/partition-independent.

    Scale shape: one narrow map — starts are built per row with
    ``sequence``/``filter`` and exploded; no shuffle, no UDF. Output
    rows ≈ n_tokens/(chunk_tokens−overlap) per doc.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    from dw_etl_spark.functions.text import tokens

    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("ts"))
    starts = F.filter(
        F.when(
            F.size("ts") > 0,
            F.sequence(
                F.lit(0),
                F.greatest(F.size("ts") - 1, F.lit(0)),
                F.lit(stride),
            ),
        ).otherwise(F.array().cast("array<int>")),
        lambda s: (s == 0) | (s + F.lit(overlap) < F.size("ts")),
    )
    return toks.select(
        "id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("ts"), s + F.lit(1), F.lit(chunk_tokens)),
            )
        ).alias("chunk_id", "__ct"),
    ).select(
        "id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("__ct").cast("long").alias("n_tokens"),
        F.array_join("__ct", " ").alias(out_col),
    )


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str,
    key_col: str,
    tokens_col: str,
    dtype: str = "uint16",
    shard_name: str = "tokens-{:06d}",
) -> None:
    """Export tokenized documents as flat binary token shards — the
    memmap-ready layout pretraining loaders index directly (the
    ``.bin`` + ``.idx`` convention): per distinct ``shard_col`` value,
    ``tokens-NNNNNN.bin`` holds every document's token ids
    concatenated in key order as little-endian ``dtype``, and
    ``tokens-NNNNNN.idx.json`` maps each document to its
    (token offset, token count) — so a loader seeks, never parses.

    ``dtype`` is 'uint16' (vocab < 65,536 — the common case) or
    'uint32'; an id outside the dtype's range RAISES (a silent
    wraparound would corrupt training data undetectably). NULL
    shard/key raises; a NULL token array is an empty document (indexed
    with length 0).

    Scale shape — same contract as ``write_tar_shards``: one
    hash-repartition on ``shard_col`` lands each shard on exactly one
    task, ``sortWithinPartitions(shard, key)`` + no wall-clock
    metadata makes every .bin and .idx.json BYTE-deterministic under
    any input partitioning (pytest-pinned by file hash); a task may
    own several shards, a shard never splits.

    Shared-FS sink contract: shard files are written with plain
    ``open()``, so ``out_dir`` must be a POSIX path visible to EVERY
    executor (local dir in local mode; NFS/FUSE mount on a cluster).
    Object stores need a FUSE gateway or a post-hoc upload step. Pair
    with ``pack_into_shards`` to assign token-budgeted ``shard_col``."""
    import json
    import os
    import struct as _struct

    if dtype not in ("uint16", "uint32"):
        raise ValueError(f"dtype: {dtype!r}")
    fmt, limit = ("<H", 1 << 16) if dtype == "uint16" else ("<I", 1 << 32)

    def _write_partition(rows) -> None:
        handles: dict[int, tuple] = {}  # sid -> (bin fh, index list, [pos])
        try:
            for row in rows:
                sid, key = row[shard_col], row[key_col]
                if sid is None or key is None:
                    raise ValueError(
                        f"NULL {shard_col!r}/{key_col!r} in token export"
                    )
                sid = int(sid)
                ent = handles.get(sid)
                if ent is None:
                    fh = open(
                        os.path.join(out_dir, shard_name.format(sid) + ".bin"),
                        "wb",
                    )
                    ent = (fh, [], [0])
                    handles[sid] = ent
                fh, index, pos = ent
                toks = row[tokens_col] or []
                buf = bytearray()
                for t in toks:
                    t = int(t)
                    if not (0 <= t < limit):
                        raise ValueError(
                            f"token id {t} outside {dtype} range"
                        )
                    buf += _struct.pack(fmt, t)
                fh.write(bytes(buf))
                index.append([str(key), pos[0], len(toks)])
                pos[0] += len(toks)
        finally:
            for sid, (fh, index, pos) in handles.items():
                fh.close()
                meta = {
                    "dtype": dtype,
                    "total_tokens": pos[0],
                    "documents": index,
                }
                with open(
                    os.path.join(
                        out_dir, shard_name.format(sid) + ".idx.json"
                    ),
                    "w",
                ) as jf:
                    json.dump(meta, jf, separators=(",", ":"), sort_keys=True)

    os.makedirs(out_dir, exist_ok=True)
    (
        df.select(shard_col, key_col, tokens_col)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, key_col)
        .foreachPartition(_write_partition)
    )


def bin_pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str,
    seq_len: int,
    num_groups: int | None = None,
) -> DataFrame:
    """Pack documents into fixed-length training sequences WITHOUT
    splitting documents: (input columns) + (pack_group, bin_id,
    bin_offset), where each bin's token sum is <= ``seq_len`` and
    ``bin_offset`` is the document's token start inside its bin.
    Best-fit-decreasing (the sequence-packing analysis of Krell et al.
    2021 — BFD reaches ~99+% of optimal occupancy on natural length
    distributions) against ``pack_into_shards``'s concat-and-split
    layout, which wastes nothing but cuts documents at shard
    boundaries; use THIS when truncation-at-boundary is the thing you
    are avoiding (instruction tuning, long-context curation) and
    accept the small padding tail instead.

    Scale shape: documents are hashed into ``num_groups`` independent
    packing groups (md5 on the id — deterministic under any input
    partitioning), and BFD runs per group in one ``applyInPandas``
    pass over (id, n_tokens) pairs ONLY — text never moves; join the
    assignment back on the id. Bin ids are globally unique
    (group * 2^32 + local). Packing quality is per-group (BFD is
    near-optimal within each group, and groups are content-uniform by
    hashing, so the global padding fraction matches single-machine BFD
    to within noise — asserted in tests). A document longer than
    ``seq_len`` raises: chunk first (``chunk_documents``).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    import pandas as pd

    from dw_etl_spark.functions.text import stable_hash64

    spark = df.sparkSession
    if num_groups is None:
        num_groups = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    lens = df.select(
        F.col(id_col).alias("__id"),
        F.col(token_col).cast("long").alias("__n"),
        F.pmod(
            stable_hash64(F.col(id_col).cast("string")), F.lit(num_groups)
        ).alias("pack_group"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = int(pdf["pack_group"].iloc[0])
        items = sorted(
            zip(pdf["__id"], pdf["__n"]), key=lambda t: (-t[1], t[0])
        )
        bins: list[int] = []  # remaining capacity per local bin
        out = []
        for rid, n in items:
            n = int(n)
            if n > seq_len:
                raise ValueError(
                    f"doc {rid!r} has {n} tokens > seq_len {seq_len}; "
                    "chunk_documents first"
                )
            # best fit: the fullest bin that still fits
            best, best_rem = -1, seq_len + 1
            for j, rem in enumerate(bins):
                if n <= rem < best_rem:
                    best, best_rem = j, rem
            if best < 0:
                bins.append(seq_len)
                best = len(bins) - 1
            out.append(
                {
                    "__id": rid,
                    "pack_group": grp,
                    "bin_id": grp * (1 << 32) + best,
                    "bin_offset": seq_len - bins[best],
                }
            )
            bins[best] -= n
        return pd.DataFrame(
            out, columns=["__id", "pack_group", "bin_id", "bin_offset"]
        )

    assigned = lens.groupBy("pack_group").applyInPandas(
        pack,
        "__id " + dict(lens.dtypes)["__id"]
        + ", pack_group int, bin_id long, bin_offset long",
    )
    return df.join(
        assigned.withColumnsRenamed({"__id": id_col}), id_col
    )


def packing_efficiency(
    packed: DataFrame, token_col: str, seq_len: int
) -> DataFrame:
    """One-row summary of a ``bin_pack_sequences`` result:
    (n_docs, n_bins, total_tokens, capacity, padding_frac) — the
    padding fraction is the number a packing change is judged by
    (naive one-doc-per-sequence on natural corpora wastes 40-80%;
    BFD typically < a few %). Rounded to 6."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum(F.col(token_col).cast("long")).alias("total_tokens"),
    ).select(
        "n_docs",
        "n_bins",
        "total_tokens",
        (F.col("n_bins") * F.lit(seq_len)).alias("capacity"),
        F.round(
            1.0 - F.col("total_tokens") / (F.col("n_bins") * F.lit(seq_len)),
            6,
        ).alias("padding_frac"),
    )
