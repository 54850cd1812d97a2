"""Exact repeated-substring analysis per document via suffix automata
— the sub-window tier of ExactSubstr dedup.

``text_dedup.remove_repeated_spans`` (word/char fixed windows) is the
cross-doc-scalable compromise; its documented gap is repeats SHORTER
than the window. This module closes the intra-document half of that
gap exactly: a suffix automaton (Blumer et al. 1985; the O(n) online
construction as in Crochemore/Hancart, widely published) indexes every
substring of a document in linear time, which yields

- the longest repeated substring (classic SAM application: deepest
  state with >= 2 occurrences),
- for every end position, the longest repeated suffix — so the exact
  character mass sitting inside ANY repeat of length >= ``min_len``,
- the longest suffix with an EARLIER occurrence (first-end-position
  tracking), which is precisely the "this text already appeared
  before in this document" mask ExactSubstr-style dedup drops
  (keep-first semantics, overlaps allowed — the Lee et al. 2022
  "Deduplicating Training Data Makes Language Models Better"
  convention).

Cross-document ExactSubstr (a corpus-global suffix structure) remains
out of scope by design — that is a disk-backed suffix-array build, not
a Spark operator; across documents the banded MinHash/fixed-window
family handles it. Documented, not hidden.

Scale shape: per-document pure Python (dict-transition automaton,
O(chars) states) over Arrow batches — ``mapInPandas``, no shuffle,
embarrassingly parallel, the same contract as the codecs and the
readability tier. Memory per task is one document's automaton
(~O(2n) states); cap pathological documents with ``max_chars``
(longer docs are analyzed on their prefix and flagged).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def _sam_build(s: str) -> list[dict]:
    """Suffix automaton of ``s``: states with ``len``, ``link``,
    ``next`` transitions, ``first_end`` (minimal end position of this
    state's substrings, 0-based inclusive) and ``occ`` (number of
    occurrences, propagated over the suffix-link tree)."""
    states = [
        {"len": 0, "link": -1, "next": {}, "first_end": -1, "occ": 0}
    ]
    last = 0
    for i, ch in enumerate(s):
        cur = len(states)
        states.append(
            {"len": i + 1, "link": -1, "next": {}, "first_end": i, "occ": 1}
        )
        p = last
        while p != -1 and ch not in states[p]["next"]:
            states[p]["next"][ch] = cur
            p = states[p]["link"]
        if p == -1:
            states[cur]["link"] = 0
        else:
            q = states[p]["next"][ch]
            if states[p]["len"] + 1 == states[q]["len"]:
                states[cur]["link"] = q
            else:
                clone = len(states)
                states.append(
                    {
                        "len": states[p]["len"] + 1,
                        "link": states[q]["link"],
                        "next": dict(states[q]["next"]),
                        "first_end": states[q]["first_end"],
                        "occ": 0,  # clones hold no primary occurrence
                    }
                )
                while p != -1 and states[p]["next"].get(ch) == q:
                    states[p]["next"][ch] = clone
                    p = states[p]["link"]
                states[q]["link"] = clone
                states[cur]["link"] = clone
        last = cur
    # occurrence counts: sum primaries up the suffix-link tree
    # (children before parents = any order of decreasing len)
    for idx in sorted(range(1, len(states)), key=lambda i: -states[i]["len"]):
        link = states[idx]["link"]
        if link > 0:
            states[link]["occ"] += states[idx]["occ"]
        # first_end of a parent is the min over its class members
        if link >= 0 and states[idx]["first_end"] != -1:
            fe, pfe = states[idx]["first_end"], states[link]["first_end"]
            if pfe == -1 or fe < pfe:
                states[link]["first_end"] = fe
    return states


def _repeat_profile(s: str, min_len: int) -> tuple[int, float, float]:
    """(longest repeated substring length, char fraction inside any
    >= min_len repeat, char fraction duplicating EARLIER text) for one
    string. Empty/short strings → zeros."""
    n = len(s)
    if n == 0:
        return 0, 0.0, 0.0
    st = _sam_build(s)
    lrs = max(
        (x["len"] for x in st if x["occ"] >= 2), default=0
    )

    # walk s through its own automaton; at end position j the current
    # (state, length) names the whole prefix — shrink via suffix links
    # to the deepest state that (a) occurs >= 2 times, or (b) first
    # occurred strictly earlier, reading off the two repeat lengths.
    rep_mask_until = -1
    dup_mask_until = -1
    rep_chars = 0
    dup_chars = 0
    v, length = 0, 0
    for j, ch in enumerate(s):
        v = st[v]["next"][ch]
        length = min(length + 1, st[v]["len"])

        # (a) longest repeated suffix (occurs >= 2 anywhere)
        u, ul = v, length
        while u > 0 and st[u]["occ"] < 2:
            u = st[u]["link"]
            ul = st[u]["len"]
        if ul >= min_len:
            start = j - ul + 1
            lo = max(start, rep_mask_until + 1)
            if j >= lo:
                rep_chars += j - lo + 1
                rep_mask_until = j
        # (b) longest suffix whose first occurrence ended earlier
        u, ul = v, length
        while u > 0 and st[u]["first_end"] >= j:
            u = st[u]["link"]
            ul = st[u]["len"]
        if ul >= min_len:
            start = j - ul + 1
            lo = max(start, dup_mask_until + 1)
            if j >= lo:
                dup_chars += j - lo + 1
                dup_mask_until = j
    return lrs, rep_chars / n, dup_chars / n


def _dedup_earlier(s: str, min_len: int) -> str:
    """Drop every maximal span duplicating earlier in-document text
    (length >= min_len), keeping first occurrences — the intra-doc
    ExactSubstr cut. Returns the cleaned string."""
    n = len(s)
    if n == 0:
        return s
    st = _sam_build(s)
    drop = bytearray(n)
    mask_until = -1
    v, length = 0, 0
    for j, ch in enumerate(s):
        v = st[v]["next"][ch]
        length = min(length + 1, st[v]["len"])
        u, ul = v, length
        while u > 0 and st[u]["first_end"] >= j:
            u = st[u]["link"]
            ul = st[u]["len"]
        if ul >= min_len:
            lo = max(j - ul + 1, mask_until + 1)
            for k in range(lo, j + 1):
                drop[k] = 1
            mask_until = max(mask_until, j)
    return "".join(c for c, d in zip(s, drop) if not d)


def _round6(x: float) -> float:
    """Round half-AWAY-from-zero at 6 decimals on the shortest decimal
    repr — the semantics of Spark ``F.round`` and DuckDB ``round``.
    Python's builtin ``round`` is banker's (half-to-even) on the binary
    value, which disagrees on exact ties like 41/128 = 0.3203125; every
    cross-engine float surface in the package rounds THIS way."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


EXACT_SUBSTR_SCHEMA = (
    "id string, n_chars long, lrs_len long, repeat_char_frac double, "
    "dup_char_frac double, truncated boolean"
)


def exact_substr_stats(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    min_len: int = 20,
    max_chars: int = 200_000,
) -> DataFrame:
    """Per-doc exact repeat diagnostics: (id, n_chars, lrs_len,
    repeat_char_frac, dup_char_frac, truncated).

    - ``lrs_len`` — longest substring occurring >= 2 times;
    - ``repeat_char_frac`` — fraction of characters inside ANY repeat
      of length >= ``min_len`` (every occurrence counted);
    - ``dup_char_frac`` — fraction duplicating EARLIER text (what
      ``exact_substr_dedup`` would remove);
    - documents beyond ``max_chars`` are profiled on the prefix and
      flagged ``truncated`` (automaton memory stays bounded).

    Rounded to 6 like every cross-engine float surface."""
    import pandas as pd

    src = df.select(
        df[id_col].cast("string").alias("id"), df[text_col].alias("text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                t = text or ""
                truncated = len(t) > max_chars
                t = t[:max_chars]
                lrs, rep, dup = _repeat_profile(t, min_len)
                out.append(
                    {
                        "id": rid,
                        "n_chars": len(t),
                        "lrs_len": lrs,
                        "repeat_char_frac": _round6(rep),
                        "dup_char_frac": _round6(dup),
                        "truncated": truncated,
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(run, EXACT_SUBSTR_SCHEMA)


def exact_substr_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    min_len: int = 50,
    max_chars: int = 200_000,
    out_col: str = "cleaned",
) -> DataFrame:
    """(id, cleaned, n_removed_chars): intra-document ExactSubstr cut
    — every span of >= ``min_len`` characters that already appeared
    earlier in the SAME document is removed (keep-first; overlapping
    repeats collapse to the first copy). The cross-document case is
    handled by the fixed-window + MinHash family (module docstring).
    Text beyond ``max_chars`` passes through uncut."""
    import pandas as pd

    src = df.select(
        df[id_col].cast("string").alias("id"), df[text_col].alias("text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, text in zip(pdf["id"], pdf["text"]):
                t = text or ""
                head, tail = t[:max_chars], t[max_chars:]
                cleaned = _dedup_earlier(head, min_len) + tail
                out.append(
                    {
                        "id": rid,
                        out_col: cleaned,
                        "n_removed_chars": len(t) - len(cleaned),
                    }
                )
            yield pd.DataFrame(out)

    return src.mapInPandas(
        run, f"id string, {out_col} string, n_removed_chars long"
    )
