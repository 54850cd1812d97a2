"""Content-defined chunking (operators/cdc.py): partition invariants,
determinism, the shift-resistance property that justifies CDC over
fixed blocks, and the chunk-level dedup statistics."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from dw_etl_spark.operators.cdc import cdc_chunks, chunk_dup_stats


def _text(seed: int, n_words: int) -> str:
    rng = random.Random(seed)
    vocab = [f"w{i:03d}" for i in range(80)]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


def test_chunks_partition_document_and_respect_bounds(spark):
    """Chunks are contiguous, exhaustive, byte-exact; every chunk is
    <= max_size and every non-final chunk >= min_size; hashes are the
    md5 of the exact byte slice; the result is identical under a
    different partitioning."""
    rows = [(i, _text(i, 40 * (i + 1))) for i in range(6)] + [
        (6, ""), (7, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, "text", min_size=16, avg_size=64, max_size=256)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["id"], []).append(r)
    texts = dict(rows)
    assert set(by_doc) == {str(i) for i in range(8) if texts[i] != ""}
    for rid, chs in by_doc.items():
        data = texts[int(rid)].encode()
        chs.sort(key=lambda r: r["chunk_idx"])
        pos = 0
        for j, c in enumerate(chs):
            assert c["chunk_idx"] == j and c["start"] == pos
            assert c["size"] <= 256
            if j < len(chs) - 1:
                assert c["size"] >= 16
            piece = data[pos:pos + c["size"]]
            assert c["chunk_hash"] == hashlib.md5(piece).hexdigest()
            pos += c["size"]
        assert pos == len(data)

    again = sorted(
        map(
            tuple,
            cdc_chunks(
                df.repartition(7), "text", min_size=16, avg_size=64,
                max_size=256,
            ).collect(),
        )
    )
    assert again == sorted(map(tuple, out.collect()))


def test_single_byte_edit_disturbs_o1_chunks(spark):
    """THE CDC property: inserting one byte near the start of a
    document changes only the chunk it lands in (and possibly its
    successor) — the remaining boundaries re-align on content, so the
    chunk-hash overlap with the original stays near-total. A
    fixed-size blocker would lose every block after the edit."""
    base = _text(42, 800)
    edited = base[:100] + "X" + base[100:]
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = cdc_chunks(df, "text", min_size=16, avg_size=64, max_size=256)
    hashes = {"1": [], "2": []}
    for r in out.collect():
        hashes[r["id"]].append(r["chunk_hash"])
    a, b = set(hashes["1"]), set(hashes["2"])
    n = len(hashes["1"])
    assert n >= 20  # the fixture is long enough to mean something
    # the cascade can cross a couple of max-size-forced cuts around the
    # edit before the next NATURAL boundary re-aligns it — still O(1)
    # in the document length, which is the property (a fixed-size
    # blocker loses EVERY block after the edit, ~n of them)
    assert len(a - b) <= 6, (len(a - b), n)
    assert len(b - a) <= 6
    assert len(a & b) >= 0.7 * n


def test_chunk_dup_stats_keep_first_and_shared_views(spark):
    """Planted block duplication: B embeds a large middle slice of A,
    C is an exact copy of A. Keep-first: A owes nothing, B's dup mass
    is the embedded slice (within chunk-boundary slack), C is ~100%
    duplicate. The symmetric shared view marks A too."""
    a = _text(7, 900)
    mid = a[1000:3000]
    b = _text(8, 120) + " " + mid + " " + _text(9, 120)
    rows = [(1, a), (2, b), (3, a)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r["id"]: r
        for r in chunk_dup_stats(
            df, "text", min_size=16, avg_size=64, max_size=256
        ).collect()
    }
    assert stats["1"]["dup_bytes"] == 0
    assert stats["1"]["shared_byte_frac"] > 0.3  # slice + full copy
    assert stats["2"]["dup_byte_frac"] > 0.4, stats["2"]
    assert stats["2"]["dup_byte_frac"] < 0.95
    assert stats["3"]["dup_byte_frac"] == 1.0
    for rid, text in (("1", a), ("2", b), ("3", a)):
        assert stats[rid]["n_bytes"] == len(text.encode())
