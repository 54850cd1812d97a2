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
  runs the greedy merge loop there — the original algorithm is a
  loop over the word-freq dict, and a 100 TB corpus's PRUNED vocab
  (min_freq floor + top-max_words cap, both standard in production
  trainers) fits a driver. The cap is a DETERMINISTIC truncation
  (freq DESC, word ASC — total order), not an error: exceeding it
  just trains on the top-``max_words`` table, which is what every
  production trainer does. The driver loop itself is the
  incremental-pair-statistics variant (heap-selected best pair,
  count updates touching only words that contain the merged pair) —
  O(corpus-vocab edits), not O(num_merges x |vocab|) rescans — and
  is property-pinned merge-for-merge equal to the naive textbook
  loop.
- ``bpe_encode`` encodes each DISTINCT word once (Arrow-batched
  ``mapInPandas`` over the distinct-word frame — Python cost is
  O(|vocab|), never O(corpus)), then the word→pieces map joins back
  onto the exploded corpus and per-doc reassembly is one sorted
  collect_list. The map-join side is BROADCAST only when the
  distinct-word count is under ``max_broadcast_words`` — a raw web
  corpus's distinct "words" (URLs, typos, hashes) can reach 10⁸⁺
  and a forced broadcast hint would remove Spark's ability to fall
  back; above the gate the hint is dropped and AQE picks the join
  strategy. No per-row Python on the corpus-sized path.

Determinism: merge selection tie-breaks (count DESC, pair ASC) and
encoding is a pure function of (word, merges) — same corpus, same
params, same merge table, on any partitioning (pytest-pinned).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

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


def _merge_pieces(
    pieces: list[str], a: str, b: str, merged: str
) -> list[str]:
    out, i = [], 0
    while i < len(pieces):
        if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(pieces[i])
            i += 1
    return out


def learn_merges(
    word_freqs: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The driver-side greedy loop over a (word, freq) table —
    incremental-pair-statistics formulation of Sennrich's algorithm.

    Instead of rescanning the whole vocabulary per merge (O(num_merges
    x |vocab| x word-len) — days at 32k merges x 1M words), it keeps:

      pair_counts — live occurrence-weighted counts per adjacent pair,
      pair_words  — pair -> indices of words that (may) contain it
                    (stale entries tolerated; containment re-checked),
      heap        — lazy-deletion max-heap of (-count, pair): every
                    count change pushes a fresh entry, pops discard
                    entries whose stored count no longer matches.

    Per merge only the words actually containing the chosen pair are
    re-pieced, and only their pairs' counts move — total work is
    bounded by the edits the merges cause, not merges x vocab.
    Selection is exactly the textbook rule (max count, then
    lexicographically smallest pair; stop below count 2), and the
    merge table is property-pinned equal to the naive loop.

    Distinct words map to distinct piece tuples (pieces concatenate
    back to word+END), so per-word bookkeeping never needs the
    re-aggregation step the dict-keyed naive loop performs.
    """
    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in word_freqs:
        words.append(list(w) + [END])
        freqs.append(int(f))

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (pieces, f) in enumerate(zip(words, freqs)):
        for p in zip(pieces, pieces[1:]):
            pair_counts[p] += f
            pair_words[p].add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:
                best = p
                break
        if best is None or pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        for wi in sorted(pair_words.pop(best, ())):
            pieces = words[wi]
            # stale-set tolerance: the word may no longer contain the
            # pair adjacently; subtract-then-re-add only when it does
            if not any(
                pieces[i] == best[0] and pieces[i + 1] == best[1]
                for i in range(len(pieces) - 1)
            ):
                continue
            f = freqs[wi]
            for p in zip(pieces, pieces[1:]):
                pair_counts[p] -= f
                touched.add(p)
            new_pieces = _merge_pieces(pieces, best[0], best[1], merged)
            for p in zip(new_pieces, new_pieces[1:]):
                pair_counts[p] += f
                pair_words[p].add(wi)
                touched.add(p)
            words[wi] = new_pieces
        for p in touched:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p))
    return merges


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
    cap is for); the collect itself is bounded by it. The loop is the
    incremental-pair-stats variant (see ``learn_merges``).
    """
    rows = (
        _word_freqs(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return learn_merges(
        [(r["word"], int(r["freq"])) for r in rows], num_merges
    )


def apply_word_encoder(
    df: DataFrame,
    text_col: str,
    encode_word_fn,
    model_state,
    id_col: str = "doc_id",
    out_col: str = "tokens",
    max_broadcast_words: int = 1_000_000,
) -> DataFrame:
    """Shared corpus-encode plan for subword tokenizers (BPE merges,
    unigram-LM Viterbi, or any pure ``(word, state) -> pieces``
    function): distinct words (pinned once — the count probe and the
    join read one snapshot, no second corpus scan) → Arrow-batched
    per-word encode (the ONLY Python, O(|distinct words|)) →
    word→pieces map joined onto the posexploded corpus → per-doc
    ordered reassembly (collect_list of (pos, pieces), sorted,
    flattened). Docs with no tokens yield an empty array.

    ``model_state`` is broadcast via the SparkContext (one copy per
    executor, not per task); ``encode_word_fn(word, state)`` must be a
    pure function of its arguments.

    ``max_broadcast_words`` gates the join strategy: at or under the
    threshold the map side gets an explicit broadcast hint; above it
    the hint is dropped and the plain equi-join runs (AQE picks the
    physical strategy) — encoding sees the corpus's RAW distinct-word
    set (no min_freq/max_words diet), which at 100 TB can exceed any
    broadcastable size, and a forced hint would OOM instead of
    degrading. Same guard family as ``joins.fuzzy_top1_join``'s
    ``max_left_distinct`` and the group-count gate in
    ``qcut_by_group_expr``. Both paths are pytest-pinned row-equal.
    """
    import pandas as pd

    spark = df.sparkSession
    state_bc = spark.sparkContext.broadcast(model_state)

    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_words = words.count()

    def encode(batches):
        state = state_bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "pieces": [
                        encode_word_fn(w, state) for w in pdf["word"]
                    ],
                }
            )

    pieces = words.mapInPandas(encode, "word string, pieces array<string>")
    if n_words <= max_broadcast_words:
        pieces = F.broadcast(pieces)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(tokens(text_col)).alias("pos", "word"),
    )
    assembled = (
        exploded.join(pieces, "word", "left")
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


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    max_broadcast_words: int = 1_000_000,
) -> DataFrame:
    """(id, bpe_tokens, n_bpe_tokens): each doc's whitespace words
    BPE-encoded in order, concatenated into one subword array — the
    shared ``apply_word_encoder`` plan with the merge-rank table as
    the broadcast state (see that docstring for the plan and the
    broadcast gate)."""
    ranks = {p: i for i, p in enumerate(merges)}
    return apply_word_encoder(
        df,
        text_col,
        _encode_word,
        ranks,
        id_col=id_col,
        out_col=out_col,
        max_broadcast_words=max_broadcast_words,
    )
