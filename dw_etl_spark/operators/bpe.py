"""Byte-pair encoding: train merges and apply them at corpus scale.

The engine's ``text_features`` counts BPE-ish regex subwords — fine as
a heuristic, but a training pipeline tokenizing 100 TB needs the REAL
algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"): learn a merge table once, then apply it
deterministically everywhere.

Scale shape — the insight that makes BPE tractable distributed:

- Both training and encoding are functions of the WORD-FREQUENCY
  table, not the corpus. One corpus-sized tokenize+count shuffle
  reduces 100 TB of text to a vocabulary-sized frame; everything
  after is vocab-sized.
- ``train_bpe`` collects that (pruned, capped) table driver-side and
  runs the classic greedy loop there — the original algorithm is a
  loop over the word-freq dict, and a 100 TB corpus's PRUNED vocab
  (min_freq floor + top-max_words cap, both standard in production
  trainers) fits a driver. The cap is a guarded contract, not a
  silent truncation: busting it raises.
- ``bpe_encode`` encodes each DISTINCT word once (Arrow-batched
  ``mapInPandas`` over the distinct-word frame — Python cost is
  O(|vocab|), never O(corpus)), then a broadcast join fans the
  word→pieces map back onto the exploded corpus and per-doc
  reassembly is one sorted collect_list. No per-row Python on the
  corpus-sized path.

Determinism: merge selection tie-breaks (count DESC, pair ASC) and
encoding is a pure function of (word, merges) — same corpus, same
params, same merge table, on any partitioning (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import tokens

END = "</w>"  # end-of-word marker, per the original formulation


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges greedily: repeatedly merge the best-ranked adjacent
    pair. Pure function; the sequential oracle in tests is this exact
    loop run against merges learned by the reference algorithm."""
    pieces = list(word) + [END]
    while len(pieces) > 1:
        best, best_rank = None, None
        for i in range(len(pieces) - 1):
            r = ranks.get((pieces[i], pieces[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        pieces = (
            pieces[:best]
            + [pieces[best] + pieces[best + 1]]
            + pieces[best + 2 :]
        )
    return pieces


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table (earlier = higher priority).

    The word-frequency table is pruned by ``min_freq`` and capped at
    the ``max_words`` most frequent words (ties broken by word) before
    the driver-side loop — the standard trainer diet. Exceeding
    ``max_words`` BEFORE the cap is applied is fine (that is what the
    cap is for); the collect itself is bounded by it.
    """
    rows = (
        _word_freqs(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(r["word"]) + [END]): int(r["freq"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for pieces, freq in vocab.items():
            for i in range(len(pieces) - 1):
                p = (pieces[i], pieces[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for pieces, freq in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == best[0]
                    and pieces[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens): each doc's whitespace words
    BPE-encoded in order, concatenated into one subword array.

    Plan: distinct words → Arrow-batched per-word encode (the ONLY
    Python, O(|distinct words|)) → broadcast word→pieces map joined
    onto the posexploded corpus → per-doc ordered reassembly
    (collect_list of (pos, pieces), sorted, flattened). Docs with no
    tokens yield an empty array.
    """
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    spark = df.sparkSession
    ranks_bc = spark.sparkContext.broadcast(ranks)

    words = df.select(F.explode(tokens(text_col)).alias("word")).distinct()

    def encode(batches):
        r = ranks_bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [_encode_word(w, r) for w in pdf["word"]],
                }
            )

    pieces = words.mapInPandas(encode, "word string, pieces array<string>")
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(tokens(text_col)).alias("pos", "word"),
    )
    assembled = (
        exploded.join(F.broadcast(pieces), "word", "left")
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "pos",
                                F.coalesce(
                                    "pieces", F.array().cast("array<string>")
                                ).alias("pieces"),
                            )
                        )
                    ),
                    lambda s: s["pieces"],
                )
            ).alias(out_col)
        )
    )
    return assembled.select(
        "id", out_col, F.size(out_col).cast("long").alias(f"n_{out_col}")
    )
