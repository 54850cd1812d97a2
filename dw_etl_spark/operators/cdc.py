"""Content-defined chunking (CDC) and chunk-level dedup statistics.

Fixed-size blocks break under insertion: one added byte shifts every
later block boundary and ALL downstream block hashes change, so
block-level dedup finds nothing. CDC (Muthitacharoen et al., LBFS,
SOSP 2001; the gear-hash formulation popularized by FastCDC, Xia et
al., USENIX ATC 2016) places boundaries where a rolling hash of the
last W bytes hits a mask condition — boundaries are a function of
LOCAL content, so an edit disturbs only the chunk it lands in (O(1)
chunks change, the rest re-align). This is the storage-dedup view of
corpus redundancy, and in a training-data pipeline it catches
BLOCK-level duplication that document-level fingerprints miss (a page
quoting half of another page) at a coarser, much cheaper granularity
than the character-exact ``exact_substr`` tier.

Operators:

  cdc_chunks       — (id, chunk_idx, start, size, chunk_hash) per doc:
                     deterministic gear-hash boundaries with
                     min/avg/max size control, md5 chunk fingerprints.
  chunk_dup_stats  — per-doc block-level duplication mass: the byte
                     fraction sitting in chunks that also occur in
                     OTHER docs (any-overlap view) and in chunks that
                     occur in an EARLIER doc (keep-first view — the
                     dedup decision number).

Scale shape: chunking is per-document pure Python over Arrow batches
(``mapInPandas``, zero shuffle — the codecs/readability/exact_substr
contract), emitting ~bytes/avg_size rows per doc. The cross-doc half
is ONE groupBy on the chunk hash (map-side combined) plus a doc-keyed
aggregation — never doc×doc. The gear table and fingerprints are
md5-derived, so chunk identity is engine- and partitioning-independent
(pytest pins determinism under repartition, the partition invariant,
and the O(1)-edit re-alignment property that justifies CDC at all).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 256-entry gear table: byte → 64-bit mixing constant, md5-derived so
#: any engine (or a test reimplementation) reproduces it without an RNG.
_GEAR = [
    int(hashlib.md5(f"gear{b}".encode()).hexdigest()[:16], 16)
    for b in range(256)
]
_MASK64 = (1 << 64) - 1


def _boundaries(data: bytes, min_size: int, avg_size: int, max_size: int):
    """Chunk end offsets (exclusive) for one document. Gear rolling
    hash: h = (h << 1 + gear[byte]) mod 2^64; a boundary is declared at
    the first position >= min_size where the top log2(avg_size) bits of
    h are all zero, or at max_size regardless. The last chunk may be
    shorter than min_size (end of data)."""
    bits = max(1, (avg_size - 1).bit_length())
    mask = ((1 << bits) - 1) << (64 - bits)
    out = []
    n = len(data)
    start = 0
    h = 0
    i = 0
    while i < n:
        h = ((h << 1) + _GEAR[data[i]]) & _MASK64
        i += 1
        size = i - start
        if size >= max_size or (size >= min_size and (h & mask) == 0):
            out.append(i)
            start = i
            h = 0
    if start < n:
        out.append(n)
    return out


CDC_SCHEMA = (
    "id string, chunk_idx int, start long, size long, chunk_hash string"
)


def cdc_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    min_size: int = 32,
    avg_size: int = 128,
    max_size: int = 512,
) -> DataFrame:
    """Content-defined chunks of a text column (UTF-8 bytes):
    (id, chunk_idx, start, size, chunk_hash), offsets/sizes in BYTES,
    chunks partitioning the document exactly (contiguous, exhaustive).
    ``avg_size`` is the expected chunk size (boundary probability
    2^-log2(avg)); ``min_size``/``max_size`` clamp the tails. Chunk
    identity is the md5 hex of the chunk bytes."""
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    import pandas as pd

    src = df.select(
        df[id_col].cast("string").alias("id"), df[text_col].alias("text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                start = 0
                for idx, end in enumerate(
                    _boundaries(data, min_size, avg_size, max_size)
                ):
                    out.append(
                        {
                            "id": rid,
                            "chunk_idx": idx,
                            "start": start,
                            "size": end - start,
                            "chunk_hash": hashlib.md5(
                                data[start:end]
                            ).hexdigest(),
                        }
                    )
                    start = end
            yield pd.DataFrame(
                out,
                columns=["id", "chunk_idx", "start", "size", "chunk_hash"],
            )

    return src.mapInPandas(run, CDC_SCHEMA)


def chunk_dup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    min_size: int = 32,
    avg_size: int = 128,
    max_size: int = 512,
) -> DataFrame:
    """Per-doc block-level duplication mass over CDC chunks:
    (id, n_bytes, n_chunks, shared_bytes, shared_byte_frac,
    dup_bytes, dup_byte_frac) where ``shared_*`` counts bytes in
    chunks whose hash occurs in at least one OTHER document (symmetric
    redundancy view) and ``dup_*`` counts bytes in chunks whose hash
    occurs in a LOWER-id document (keep-first — what block-level dedup
    would drop). Ids must sort meaningfully for the keep-first view
    (ingest order). Fractions rounded to 6.

    One chunk-hash-keyed window pass over the chunk table — chunk
    multiplicity INSIDE a doc does not make the doc its own duplicate
    (the other-doc tests compare against distinct OTHER doc ids)."""
    chunks = cdc_chunks(df, text_col, id_col, min_size, avg_size, max_size)
    # numeric id for the keep-first order when the source id is numeric
    w = Window.partitionBy("chunk_hash")
    cid = F.col("id").cast("long")
    marked = chunks.select(
        "id",
        "size",
        (F.count(F.lit(1)).over(w) > F.count(F.lit(1)).over(
            Window.partitionBy("chunk_hash", "id")
        )).alias("__shared"),
        (F.min(cid).over(w) < cid).alias("__dup"),
    )
    return (
        marked.groupBy("id")
        .agg(
            F.sum("size").alias("n_bytes"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__shared"), F.col("size")).otherwise(0)).alias(
                "shared_bytes"
            ),
            F.sum(F.when(F.col("__dup"), F.col("size")).otherwise(0)).alias(
                "dup_bytes"
            ),
        )
        .select(
            "id",
            "n_bytes",
            "n_chunks",
            "shared_bytes",
            F.round(
                F.col("shared_bytes") / F.greatest("n_bytes", F.lit(1)), 6
            ).alias("shared_byte_frac"),
            "dup_bytes",
            F.round(
                F.col("dup_bytes") / F.greatest("n_bytes", F.lit(1)), 6
            ).alias("dup_byte_frac"),
        )
    )
