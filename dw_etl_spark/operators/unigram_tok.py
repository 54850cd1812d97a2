"""Unigram-LM subword tokenizer: EM training + Viterbi encoding at
corpus scale (Kudo 2018, "Subword Regularization" — the SentencePiece
``unigram`` model, the other production tokenizer family besides BPE).

Where BPE greedily COMPOSES a vocabulary bottom-up (operators/bpe.py),
the unigram model PRUNES one top-down: seed with every frequent
substring, fit piece probabilities so the corpus likelihood under
"each word = independent piece sequence" is maximal (EM over the
segmentation lattice), and repeatedly drop the pieces whose removal
costs the least likelihood until the target vocabulary size remains.
Encoding a word is then the Viterbi best path through its lattice.

Scale shape — identical to BPE's, and for the same reason:

- Training is a function of the WORD-FREQUENCY table, not the corpus:
  one tokenize+count shuffle reduces 100 TB to a vocabulary-sized
  frame, pruned by ``min_freq`` and deterministically capped at
  ``max_words`` (freq DESC, word ASC) before the driver-side EM loop —
  the same trainer diet as ``train_bpe``, and what SentencePiece
  itself does (it trains on a sentence sample, not the crawl).
- The EM loop is driver Python over that capped table: E-step =
  forward-backward over each distinct word's lattice (expected piece
  counts, occurrence-weighted), M-step = renormalize. Work is
  O(words × len² × EM-rounds) on a bounded table — and each word
  computed ONCE regardless of its corpus frequency.
- Pruning uses the standard implementable loss approximation: a
  piece's removal cost ≈ its expected count × (its log-prob minus the
  log-prob of re-segmenting the piece's own string by the REMAINING
  vocabulary, via Viterbi). Single-character pieces are never pruned
  (closure: every word stays encodable).
- ``unigram_encode`` rides the shared ``apply_word_encoder`` plan
  (bpe.py): Arrow-batched Viterbi over DISTINCT words only, broadcast-
  gated map join back onto the corpus — no per-row Python on the
  corpus-sized path, no unbounded broadcast.

Determinism: seed selection, EM arithmetic and pruning order are pure
functions of the (sorted) word-frequency table; ties in pruning break
by (loss, piece) and Viterbi ties by earlier split point. pytest pins
the EM invariant (corpus log-likelihood is non-decreasing across
iterations), encode↔vocab closure (pieces concatenate back to the
word), and partition-independence of the distributed encode.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame

from dw_etl_spark.operators.bpe import _word_freqs, apply_word_encoder

_NEG_INF = float("-inf")


def _seed_pieces(
    word_freqs: list[tuple[str, int]],
    seed_size: int,
    max_piece_len: int,
) -> dict[str, float]:
    """Initial vocabulary: every substring up to ``max_piece_len``
    scored by occurrence-weighted frequency; the top ``seed_size``
    multi-char pieces plus ALL single characters (closure). Initial
    probabilities ∝ score."""
    counts: dict[str, int] = defaultdict(int)
    chars: set[str] = set()
    for w, f in word_freqs:
        n = len(w)
        for i in range(n):
            chars.add(w[i])
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                counts[w[i:j]] += f
    multi = sorted(
        ((s, c) for s, c in counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(seed_size - len(chars), 0)]
    vocab = {s: float(c) for s, c in multi}
    for ch in chars:
        vocab[ch] = float(counts[ch])
    total = sum(vocab[s] for s in sorted(vocab))
    return {s: v / total for s, v in vocab.items()}


def _forward_backward(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[float, dict[str, float]]:
    """One word's E-step: (log-likelihood, piece → expected count)
    under the lattice of all segmentations, probabilities from
    ``logp``. Log-domain forward/backward with logaddexp folds."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = _NEG_INF
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is None or alpha[i] == _NEG_INF:
                continue
            term = alpha[i] + lp
            acc = term if acc == _NEG_INF else (
                max(acc, term) + math.log1p(math.exp(-abs(acc - term)))
            )
        alpha[j] = acc
    if alpha[n] == _NEG_INF:
        return _NEG_INF, {}
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == _NEG_INF:
                continue
            term = lp + beta[j]
            acc = term if acc == _NEG_INF else (
                max(acc, term) + math.log1p(math.exp(-abs(acc - term)))
            )
        beta[i] = acc
    z = alpha[n]
    expected: dict[str, float] = defaultdict(float)
    for i in range(n):
        if alpha[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == _NEG_INF:
                continue
            expected[word[i:j]] += math.exp(alpha[i] + lp + beta[j] - z)
    return z, expected


def _viterbi(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[float, list[str]]:
    """Best segmentation (log-prob, pieces); ties break toward the
    EARLIER split point (deterministic). Unreachable → (-inf, [])."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is None or best[i] == _NEG_INF:
                continue
            cand = best[i] + lp
            if cand > best[j]:
                best[j], back[j] = cand, i
    if best[n] == _NEG_INF:
        return _NEG_INF, []
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return best[n], pieces


def em_pass(
    word_freqs: list[tuple[str, int]],
    probs: dict[str, float],
    max_piece_len: int = 8,
) -> tuple[dict[str, float], float]:
    """One EM iteration over the table: E = forward-backward expected
    piece counts (occurrence-weighted), M = renormalize. Returns
    (new probs, corpus log-likelihood of the INPUT probs). The EM
    guarantee — likelihood non-decreasing across calls — is
    property-pinned in tests."""
    logp = {s: math.log(p) for s, p in probs.items() if p > 0}
    tot_ll = 0.0
    counts: dict[str, float] = defaultdict(float)
    for w, f in word_freqs:
        ll, exp = _forward_backward(w, logp, max_piece_len)
        if ll == _NEG_INF:
            continue
        tot_ll += f * ll
        for s, c in exp.items():
            counts[s] += f * c
    total = sum(counts[s] for s in sorted(counts))
    if total <= 0:
        return probs, tot_ll
    return {s: counts.get(s, 0.0) / total for s in probs}, tot_ll


def em_unigram(
    word_freqs: list[tuple[str, int]],
    vocab_size: int,
    seed_size: int = 8192,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """The driver-side train loop over a (word, freq) table: seed →
    [EM ×``em_rounds`` → prune ``prune_frac`` of the excess] until
    ``vocab_size`` pieces remain → final EM. Returns piece → prob.
    Single characters are never pruned. Deterministic (see module
    docstring)."""
    vocab = _seed_pieces(word_freqs, seed_size, max_piece_len)

    while True:
        for _ in range(em_rounds):
            vocab, _ll = em_pass(word_freqs, vocab, max_piece_len)
        n_prunable = sum(1 for s in vocab if len(s) > 1)
        n_chars = len(vocab) - n_prunable
        target_multi = max(vocab_size - n_chars, 0)
        if n_prunable <= target_multi:
            break
        # loss of removing s ≈ E[count_s] · (logp(s) − logp of
        # re-segmenting s by the rest); counts from one more E-step
        logp = {s: math.log(p) for s, p in vocab.items() if p > 0}
        counts: dict[str, float] = defaultdict(float)
        for w, f in word_freqs:
            _ll, exp = _forward_backward(w, logp, max_piece_len)
            for s, c in exp.items():
                counts[s] += f * c
        losses: list[tuple[float, str]] = []
        for s in vocab:
            if len(s) == 1:
                continue
            lp_s = logp.get(s, _NEG_INF)
            alt = dict(logp)
            alt.pop(s, None)
            lp_alt, _ = _viterbi(s, alt, max_piece_len)
            losses.append((counts.get(s, 0.0) * (lp_s - lp_alt), s))
        losses.sort(key=lambda t: (t[0], t[1]))
        n_drop = min(
            max(int(math.ceil(n_prunable * prune_frac)), 1),
            n_prunable - target_multi,
        )
        dropped = {s for _loss, s in losses[:n_drop]}
        kept = {s: p for s, p in vocab.items() if s not in dropped}
        total = sum(kept[s] for s in sorted(kept))
        vocab = {s: p / total for s, p in kept.items()}
    vocab, _ll = em_pass(word_freqs, vocab, max_piece_len)
    return vocab


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    seed_size: int = 8192,
    max_piece_len: int = 8,
    em_rounds: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary (piece → probability) from
    the corpus. Same table diet as ``train_bpe``: the word-frequency
    table is pruned by ``min_freq`` and deterministically capped at
    the ``max_words`` most frequent words before the driver loop."""
    from pyspark.sql import functions as F

    rows = (
        _word_freqs(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return em_unigram(
        [(r["word"], int(r["freq"])) for r in rows],
        vocab_size,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
        em_rounds=em_rounds,
        prune_frac=prune_frac,
    )


def _viterbi_encode_word(word: str, state) -> list[str]:
    logp, max_piece_len = state
    _score, pieces = _viterbi(word, logp, max_piece_len)
    if pieces:
        return pieces
    # OOV characters (absent from training): per-char fallback, the
    # standard <unk>-free byte/char fallback policy
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        best_j, best = i + 1, None
        for j in range(min(i + max_piece_len, n), i, -1):
            if word[i:j] in logp:
                best_j, best = j, word[i:j]
                break
        out.append(best if best is not None else word[i : i + 1])
        i = best_j
    return out


def unigram_encode(
    df: DataFrame,
    text_col: str,
    vocab: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "uni_tokens",
    max_piece_len: int = 8,
    max_broadcast_words: int = 1_000_000,
) -> DataFrame:
    """(id, uni_tokens, n_uni_tokens): per-doc Viterbi-best piece
    sequence — the shared ``apply_word_encoder`` plan (Arrow-batched
    over DISTINCT words, broadcast-gated map join; see bpe.py) with
    the (log-prob table, max piece length) pair as broadcast state.
    Words containing characters outside the vocabulary fall back to
    greedy longest-match with per-char passthrough."""
    logp = {s: math.log(p) for s, p in vocab.items() if p > 0}
    return apply_word_encoder(
        df,
        text_col,
        _viterbi_encode_word,
        (logp, max_piece_len),
        id_col=id_col,
        out_col=out_col,
        max_broadcast_words=max_broadcast_words,
    )
