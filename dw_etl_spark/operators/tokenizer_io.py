"""Tokenizer artifacts: persist trained BPE/unigram state as tables.

``train_bpe`` / ``train_unigram`` return driver-side state (an ordered
merge list, a piece→probability dict). A training-data pipeline trains
a tokenizer ONCE on a sampled slice, then applies it from every later
job — token counting for packing budgets, shard export, vocab-coverage
monitoring — so the state needs a durable, engine-neutral form. These
helpers write it as plain parquet through the DataFrame writer (one
file, rank/piece-ordered, so reruns are byte-stable and any engine —
or a human — can read the artifact), and load it back into exactly the
structure the encoders take. Round-trip equality is pytest-pinned:
encoding with a loaded artifact matches encoding with the trained
state, row for row.

Artifacts are tiny (vocab-sized — KBs to a few MB): the coalesce(1)
write is deliberate, not a scale hazard; the data plane never touches
these paths except via the broadcast the encoders already do.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def save_bpe_merges(
    spark: SparkSession, merges: list[tuple[str, str]], path: str
) -> None:
    """Write the ordered merge table as parquet (rank, left, right) —
    rank preserves trainer priority (earlier = applied first)."""
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
    df.coalesce(1).sortWithinPartitions("rank").write.mode(
        "overwrite"
    ).parquet(path)


def load_bpe_merges(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """Read a merge table back into ``bpe_encode``'s input shape."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def save_unigram_vocab(
    spark: SparkSession, vocab: dict[str, float], path: str
) -> None:
    """Write the piece vocabulary as parquet (piece, prob),
    piece-ordered for byte-stable reruns."""
    df = spark.createDataFrame(
        sorted(vocab.items()), "piece string, prob double"
    )
    df.coalesce(1).sortWithinPartitions("piece").write.mode(
        "overwrite"
    ).parquet(path)


def load_unigram_vocab(spark: SparkSession, path: str) -> dict[str, float]:
    """Read a piece vocabulary back into ``unigram_encode``'s input
    shape."""
    return {
        r["piece"]: r["prob"]
        for r in spark.read.parquet(path).collect()
    }
