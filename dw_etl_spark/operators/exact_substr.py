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

CROSS-document ExactSubstr (r9) is the second half: Lee et al. 2022
find every substring of length >= ``min_len`` shared by two corpus
documents via a corpus-global suffix array; ``cross_doc_repeats``
computes the same maximal-match set at the Spark-relational maximum
with SEED-AND-EXTEND — hash every ``min_len``-char window (the seed
grams), equi-join seeds across documents, and merge runs of
consecutive seed hits on the same alignment diagonal back into
arbitrary-length maximal matches. A maximal common substring of
length M >= L contributes exactly the M-L+1 consecutive seed
positions of one diagonal, so run-merging reconstructs (start_a,
start_b, M) EXACTLY — pytest-pinned against a brute-force
all-maximal-matches DP oracle. ``cross_doc_dup_stats`` and
``cross_doc_dedup`` layer the keep-first policy on top (spans of the
LATER doc duplicating any earlier doc are measured / cut), matching
the paper's dedup convention.

Scale shape, cross-doc tier: seeds are one row per character position
(the same cardinality a suffix array indexes — this tier is
intrinsically the heavy one; run it after the cheap JVM prefilters
and the banded MinHash family have shrunk the corpus). One shuffle on
the seed fingerprint; ultra-common grams are capped by
``max_gram_occ`` BEFORE the pair join (a gram occurring k times makes
k² pair rows — the cap is the skew lever, same role as the LSH
hot-bucket cap); extension is one (id_a, id_b, diag)-keyed window —
no all-pairs doc join anywhere. Seed hashing is the portable 60-bit
md5 lane, so the DuckDB oracle replays the whole pipeline closed-form.

Scale shape, intra-doc tier: per-document pure Python
(dict-transition automaton, O(chars) states) over Arrow batches —
``mapInPandas``, no shuffle, embarrassingly parallel, the same
contract as the codecs and the readability tier. Memory per task is
one document's automaton (~O(2n) states); cap pathological documents
with ``max_chars`` (longer docs are analyzed on their prefix and
flagged).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import stable_hash64


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


# ---------------------------------------------- cross-document tier (r9)

def _seed_grams(
    df: DataFrame, text_col: str, id_col: str, min_len: int
) -> DataFrame:
    """(id, pos, fp): the 60-bit md5 fingerprint of every ``min_len``-
    char window of every document (0-based ``pos``). Docs shorter than
    ``min_len`` contribute nothing. One row per character position —
    the suffix-array cardinality; everything downstream reduces it."""
    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be >= 2")
    t = F.col("__t")
    n = F.length(t)
    fps = F.when(
        n >= L,
        F.transform(
            F.sequence(F.lit(1), n - L + 1),
            lambda i: stable_hash64(t.substr(i, F.lit(L))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).select("id", F.posexplode(fps).alias("pos", "fp"))


def cross_doc_repeats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
    max_gram_occ: int = 256,
    winnow: int = 1,
    emit: str = "spans",
) -> DataFrame:
    """Cross-document repeated substrings of length >= ``min_len``:
    rows (id_a, id_b, pos_a, pos_b, length), id_a < id_b, positions
    0-based.

    ``winnow=1`` (default): EXACT — one row per pair of occurrences,
    the Lee et al. 2022 all-maximal-matches set, seed-and-extend
    instead of a suffix array (module docstring). A substring
    occurring in k docs yields all C(k,2) pairs, and repeated
    occurrences within a pair yield one row per alignment —
    pytest-pinned against an O(n·m) DP oracle.

    ``winnow=w > 1``: the SAMPLED detection tier for corpus scale —
    winnowing/minimizers (Schleimer et al. 2003, the MOSS scheme):
    per document, from every window of ``w`` consecutive seed grams
    only the (fp, pos)-minimal gram survives, so only ~2/(w+1) of the
    positions enter the shuffle and the pair join — THE cost lever at
    100 TB, where one row per character is the honest but heavy exact
    price. Identical text regions pick identical relative minimizers,
    so every true match of length >= min_len + w - 1 is GUARANTEED to
    surface (shorter matches may be missed); within a match,
    consecutive picks are <= w apart, so diagonal islands merge with
    gap tolerance w. Reported rows are then CANDIDATE SPANS: every
    seed inside them is a true min_len-char match, but a span may
    bridge two same-diagonal matches separated by < w chars and its
    length may under-cover a match's tail (sample, not extend).
    Feed them to a per-pair exact verifier (or straight to the
    keep-first span cut, which is conservative either way).

    ``max_gram_occ`` drops (surviving) seed grams occurring more than
    that many times in the corpus BEFORE the pair join (quadratic skew
    lever). A dropped hot gram can split or shorten matches that
    contain it — at the default the cap only fires on degenerate
    boilerplate; set it high enough for the corpus's honest repeat
    multiplicity. 60-bit seed hashes make false matches ~1e-9-rare;
    verify against the text if that ever matters.

    ``emit='seeds'`` returns the raw aligned seed hits (length =
    min_len, one row per matching gram pair) instead of merged spans
    — the input ``verify_cross_doc_candidates`` wants: extending every
    seed recovers the EXACT maximal match around it, so
    winnowed-detect → seed-emit → verify is exact for every match >=
    min_len + winnow - 1 at the sampled shuffle cost (pinned)."""
    if winnow < 1:
        raise ValueError("winnow must be >= 1")
    if emit not in ("spans", "seeds"):
        raise ValueError(f"emit: {emit!r}")
    seeds = _seed_grams(df, text_col, id_col, min_len)
    if winnow > 1:
        # Pick(s) = (fp,pos)-min of the w grams starting at this row's
        # position (struct min = lexicographic = leftmost tie-break;
        # truncated tail windows keep the doc edge sampled). A position
        # survives iff SOME window containing it picked it — read off
        # the trailing w picks, no self-join.
        fwd = (
            Window.partitionBy("id")
            .orderBy("pos")
            .rowsBetween(0, winnow - 1)
        )
        trail = (
            Window.partitionBy("id")
            .orderBy("pos")
            .rowsBetween(-(winnow - 1), 0)
        )
        seeds = (
            seeds.withColumn(
                "__pick", F.min(F.struct("fp", "pos")).over(fwd)["pos"]
            )
            .withColumn(
                "__sel",
                F.array_contains(
                    F.collect_list("__pick").over(trail), F.col("pos")
                ),
            )
            .filter("__sel")
            .select("id", "pos", "fp")
        )
    occ_w = Window.partitionBy("fp")
    seeds = seeds.withColumn("__occ", F.count(F.lit(1)).over(occ_w)).filter(
        F.col("__occ") <= int(max_gram_occ)
    )
    a = seeds.select(
        F.col("id").alias("id_a"), F.col("pos").alias("pos_a"), "fp"
    )
    b = seeds.select(
        F.col("id").alias("id_b"), F.col("pos").alias("pos_b"), "fp"
    )
    hits = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "pos_a",
            "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("__diag"),
        )
    )
    if emit == "seeds":
        L = int(min_len)
        return hits.select(
            "id_a", "id_b", "pos_a", "pos_b", F.lit(L).alias("length")
        )
    # runs of near-consecutive seed positions on one diagonal == one
    # (maximal, when winnow=1) match: island-number by gaps in pos_a,
    # then collapse each island. Winnowed picks inside a shared region
    # are <= winnow apart, hence the gap tolerance.
    run_w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    gap = F.when(
        F.col("pos_a") - F.lag("pos_a").over(run_w) <= int(winnow), F.lit(0)
    ).otherwise(F.lit(1))
    runs = hits.withColumn(
        "__isl", F.sum(gap).over(run_w)
    )
    L = int(min_len)
    return (
        runs.groupBy("id_a", "id_b", "__diag", "__isl")
        .agg(
            F.min("pos_a").alias("pos_a"),
            F.min("pos_b").alias("pos_b"),
            (F.max("pos_a") - F.min("pos_a") + L).alias("length"),
        )
        .select("id_a", "id_b", "pos_a", "pos_b", "length")
    )


def _merged_later_spans(rep: DataFrame) -> DataFrame:
    """(id, start, end): per doc, the UNION of [pos_b, pos_b+length)
    spans where it repeats an EARLIER doc (id_b side of the id_a<id_b
    pairs — keep-first), overlapping/adjacent spans merged by the
    running-max interval sweep."""
    spans = rep.select(
        F.col("id_b").alias("id"),
        F.col("pos_b").alias("s"),
        (F.col("pos_b") + F.col("length")).alias("e"),
    )
    w = Window.partitionBy("id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        spans.withColumn("__grp", F.sum(opens).over(w))
        .groupBy("id", "__grp")
        .agg(F.min("s").alias("start"), F.max("e").alias("end"))
        .select("id", "start", "end")
    )


def cross_doc_dup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
    max_gram_occ: int = 256,
) -> DataFrame:
    """Per-doc cross-document duplication mass under keep-first
    semantics: (id, n_chars, xdup_chars, xdup_char_frac) where
    xdup_chars counts characters inside ANY >= ``min_len`` span that
    already occurs in an earlier-id document (merged spans, each char
    once; the first-occurrence doc carries zero). The corpus-level
    twin of ``exact_substr_stats``'s dup_char_frac; fraction rounded
    to 6 like every cross-engine float surface."""
    rep = cross_doc_repeats(df, text_col, id_col, min_len, max_gram_occ)
    covered = (
        _merged_later_spans(rep)
        .groupBy("id")
        .agg(F.sum(F.col("end") - F.col("start")).alias("xdup_chars"))
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.length(F.col(text_col)).cast("long").alias("n_chars"),
        )
        .join(covered, "id", "left")
        .select(
            "id",
            "n_chars",
            F.coalesce("xdup_chars", F.lit(0)).cast("long").alias(
                "xdup_chars"
            ),
            F.round(
                F.coalesce("xdup_chars", F.lit(0))
                / F.greatest("n_chars", F.lit(1)),
                6,
            ).alias("xdup_char_frac"),
        )
    )


def cross_doc_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 50,
    max_gram_occ: int = 256,
    out_col: str = "cleaned",
) -> DataFrame:
    """(id, cleaned, n_removed_chars): the corpus-level ExactSubstr CUT
    — every span of >= ``min_len`` chars that also occurs in an
    EARLIER-id document is removed from the later one (keep-first;
    overlapping spans merge before cutting, so each char is removed
    once). First-occurrence docs pass through byte-identical. The
    cutting itself is a JVM ``aggregate`` over each doc's sorted span
    list (span count is bounded by n_chars/min_len — driver never sees
    text), composing with the intra-doc ``exact_substr_dedup`` for the
    full Lee et al. treatment."""
    rep = cross_doc_repeats(df, text_col, id_col, min_len, max_gram_occ)
    span_lists = (
        _merged_later_spans(rep)
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("start", "end"))
            ).alias("__spans")
        )
    )
    src = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).join(span_lists, "id", "left")
    t = F.col("__t")
    # fold the sorted spans: acc = (chars kept so far, cursor); each
    # span appends the gap before it and advances the cursor past it
    folded = F.aggregate(
        F.coalesce(
            "__spans",
            F.array().cast("array<struct<start:bigint,end:bigint>>"),
        ),
        F.struct(
            F.lit("").alias("acc"), F.lit(0).cast("bigint").alias("cur")
        ),
        lambda st, sp: F.struct(
            F.concat(
                st["acc"],
                t.substr(
                    (st["cur"] + 1).cast("int"),
                    (sp["start"] - st["cur"]).cast("int"),
                ),
            ).alias("acc"),
            sp["end"].alias("cur"),
        ),
        lambda st: F.concat(
            st["acc"], t.substr((st["cur"] + 1).cast("int"), F.length(t))
        ),
    )
    return src.select(
        "id",
        folded.alias(out_col),
        (F.length(t) - F.length(folded)).cast("long").alias(
            "n_removed_chars"
        ),
    )


def verify_cross_doc_candidates(
    df: DataFrame,
    seeds: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Exact per-pair verification/extension of winnowed candidates:
    (id_a, id_b, pos_a, pos_b, length) MAXIMAL matches, each the full
    diagonal extension of a candidate seed against the actual text —
    the second half of the sampled cross-doc ExactSubstr stack:

        cross_doc_repeats(winnow=w, emit='seeds')  →  this

    equals the EXACT mode restricted to matches >= min_len + w - 1
    (every such match contains a winnowed seed; extending any seed of
    a match recovers the whole match; duplicates from multiple seeds
    of one match collapse on the extended coordinates) — pinned.
    Shorter matches a lucky sample surfaced come out exact too.

    Scale shape: candidates group per (id_a, id_b) pair (collect_list
    of the pair's seed offsets — bounded by the pair's shared mass),
    the two texts join in id-keyed (the text moves ONLY for flagged
    pairs — candidate pairs are rare by construction), and the
    extension walks O(match length) characters per seed inside one
    Arrow batch. No corpus-wide work beyond the two id joins."""
    import pandas as pd
    from typing import Iterator

    grouped = (
        seeds.groupBy("id_a", "id_b")
        .agg(
            F.collect_list(F.struct("pos_a", "pos_b")).alias("__seeds")
        )
    )
    texts = df.select(
        F.col(id_col).alias("__tid"), F.col(text_col).alias("__text")
    )
    joined = (
        grouped.join(texts, grouped["id_a"] == texts["__tid"])
        .drop("__tid")
        .withColumnRenamed("__text", "__text_a")
        .join(texts, grouped["id_b"] == texts["__tid"])
        .drop("__tid")
        .withColumnRenamed("__text", "__text_b")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ia, ib, sds, ta, tb in zip(
                pdf["id_a"], pdf["id_b"], pdf["__seeds"],
                pdf["__text_a"], pdf["__text_b"],
            ):
                ta = ta or ""
                tb = tb or ""
                found = set()
                for s in sds:
                    pa, pb = int(s["pos_a"]), int(s["pos_b"])
                    lo_a, lo_b = pa, pb
                    while lo_a > 0 and lo_b > 0 and ta[lo_a - 1] == tb[lo_b - 1]:
                        lo_a -= 1
                        lo_b -= 1
                    hi_a, hi_b = pa, pb
                    na, nb = len(ta), len(tb)
                    while hi_a < na and hi_b < nb and ta[hi_a] == tb[hi_b]:
                        hi_a += 1
                        hi_b += 1
                    found.add((lo_a, lo_b, hi_a - lo_a))
                for (qa, qb, ln) in found:
                    out.append(
                        {
                            "id_a": ia,
                            "id_b": ib,
                            "pos_a": qa,
                            "pos_b": qb,
                            "length": ln,
                        }
                    )
            yield pd.DataFrame(
                out, columns=["id_a", "id_b", "pos_a", "pos_b", "length"]
            )

    id_t = dict(seeds.dtypes)["id_a"]
    return joined.mapInPandas(
        run,
        f"id_a {id_t}, id_b {id_t}, pos_a long, pos_b long, length long",
    ).distinct()
