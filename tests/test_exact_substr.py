"""Suffix-automaton exact-repeat analysis (operators/exact_substr.py)
— the intra-document sub-window tier of ExactSubstr dedup. The pure
profile is pinned against a quadratic brute force; the Spark wrappers
get row-stability, truncation and partition-invariance coverage."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dw_etl_spark.operators.exact_substr import (
    _dedup_earlier,
    _repeat_profile,
    exact_substr_dedup,
    exact_substr_stats,
)


def _brute(s: str, min_len: int):
    """Quadratic reference: overlap-aware occurrence tests via
    find/find-after-first (str.count is non-overlapping and WRONG for
    period-style repeats like 'bbbb')."""
    n = len(s)
    lrs = 0
    for l in range(n, 0, -1):
        if any(
            s.find(s[a:a + l], s.find(s[a:a + l]) + 1) != -1
            for a in range(n - l + 1)
        ):
            lrs = l
            break
    rep = [False] * n
    dup = [False] * n
    for j in range(n):
        for l in range(min(j + 1, n), min_len - 1, -1):
            sub = s[j - l + 1:j + 1]
            if s.find(sub, s.find(sub) + 1) != -1:
                for k in range(j - l + 1, j + 1):
                    rep[k] = True
                break
        for l in range(min(j + 1, n), min_len - 1, -1):
            if s.find(s[j - l + 1:j + 1]) < j - l + 1:
                for k in range(j - l + 1, j + 1):
                    dup[k] = True
                break
    return lrs, (sum(rep) / n if n else 0.0), (sum(dup) / n if n else 0.0)


def test_repeat_profile_matches_quadratic_brute_force():
    rng = random.Random(17)
    for _ in range(250):
        s = "".join(
            rng.choice("abc") for _ in range(rng.randint(0, 40))
        )
        ml = rng.randint(1, 5)
        got = _repeat_profile(s, ml)
        exp = _brute(s, ml)
        assert got[0] == exp[0], (s, ml)
        assert abs(got[1] - exp[1]) < 1e-12, (s, ml)
        assert abs(got[2] - exp[2]) < 1e-12, (s, ml)


def test_dedup_keeps_first_occurrence():
    s = "hello world. " * 5 + "unique tail"
    assert _dedup_earlier(s, 10) == "hello world. unique tail"
    # below threshold: untouched
    assert _dedup_earlier("ab ab ab", 10) == "ab ab ab"
    assert _dedup_earlier("", 5) == ""
    # the repeat the fixed-window operator misses: SHORT period inside
    # a long run is caught exactly — and under the overlap-allowed
    # convention a uniform run collapses to its first character (every
    # later suffix duplicates the overlapping earlier copy)
    assert _dedup_earlier("x" * 100, 10) == "x"


def test_stats_distributed(spark):
    boiler = "subscribe to our newsletter today. "
    rows = [
        (1, "completely unique text with no internal repetition here"),
        (2, boiler * 6 + "actual content of the page"),
        (3, None),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r
        for r in exact_substr_stats(df, "text", min_len=20).collect()
    }
    assert len(out) == 4
    assert out["2"]["lrs_len"] >= len(boiler) * 5 - 1
    assert out["2"]["repeat_char_frac"] > 0.8
    assert out["2"]["dup_char_frac"] > 0.6
    assert out["1"]["dup_char_frac"] == 0.0
    assert out["3"]["n_chars"] == 0 and out["3"]["lrs_len"] == 0
    assert not out["2"]["truncated"]

    # truncation flag + bounded automaton
    big = spark.createDataFrame([(9, "ab" * 600)], "doc_id long, text string")
    r = exact_substr_stats(big, "text", min_len=5, max_chars=100).collect()[0]
    assert r["truncated"] and r["n_chars"] == 100

    # partition invariance
    a = sorted(
        exact_substr_stats(df, "text", min_len=20).collect(),
        key=lambda r: r["id"],
    )
    b = sorted(
        exact_substr_stats(df.repartition(5), "text", min_len=20).collect(),
        key=lambda r: r["id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_dedup_distributed_and_removal_accounting(spark):
    boiler = "all rights reserved worldwide. "
    df = spark.createDataFrame(
        [(1, boiler * 4 + "body"), (2, "clean doc body")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r for r in exact_substr_dedup(df, "text", min_len=20).collect()
    }
    assert out["1"]["cleaned"].startswith(boiler)
    assert len(out["1"]["cleaned"]) < len(boiler) * 2 + 10
    assert out["1"]["n_removed_chars"] == (
        len(boiler) * 4 + 4 - len(out["1"]["cleaned"])
    )
    assert out["2"]["cleaned"] == "clean doc body"
    assert out["2"]["n_removed_chars"] == 0


def test_round6_half_away_from_zero_matches_sql_engines():
    """41/128 = 0.3203125 is an exact binary tie: Python's builtin
    round gives 0.320312 (banker's) while Spark F.round and DuckDB
    round give 0.320313 — the gate surface must use the SQL-engine
    convention (caught live: doc 0 of the sf0.001 sam fixture)."""
    from dw_etl_spark.operators.exact_substr import _round6

    assert _round6(41 / 128) == 0.320313
    assert round(41 / 128, 6) == 0.320312  # the trap this guards
    assert _round6(0.0466666666) == 0.046667
    assert _round6(0.0) == 0.0


# ---------------------------------------------- cross-document tier (r9)

def _brute_maximal_matches(a: str, b: str, L: int) -> set[tuple]:
    """All maximal common substrings of length >= L between a and b:
    (pos_a, pos_b, length) with full right extension and left-maximal
    start — the Lee et al. match set, O(n·m) DP."""
    n, m = len(a), len(b)
    ext = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if a[i] == b[j]:
                ext[i][j] = ext[i + 1][j + 1] + 1
    out = set()
    for i in range(n):
        for j in range(m):
            ln = ext[i][j]
            if ln >= L and (i == 0 or j == 0 or a[i - 1] != b[j - 1]):
                out.add((i, j, ln))
    return out


def _xdoc_corpus():
    shared = "the quick brown fox jumps over the lazy dog"
    return [
        (1, "alpha " + shared + " omega"),
        (2, "start " + shared + " middle " + shared + " end"),
        (3, "unrelated text with no long overlap at all here"),
        (4, shared[:25] + " broken " + shared[20:]),
    ]


def test_cross_doc_repeats_equal_brute_force_dp(spark):
    """``cross_doc_repeats`` must return EXACTLY the brute-force set of
    maximal cross-doc matches >= min_len for every doc pair — including
    a doc pair where one side holds TWO occurrences (two diagonals) and
    a pair overlapping through partially-shared fragments."""
    from dw_etl_spark.operators.exact_substr import cross_doc_repeats

    rows = _xdoc_corpus()
    L = 10
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["pos_a"], r["pos_b"], r["length"])
        for r in cross_doc_repeats(
            df, "text", "doc_id", min_len=L, max_gram_occ=1000
        ).collect()
    }
    want = set()
    texts = dict(rows)
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            for (pa, pb, ln) in _brute_maximal_matches(
                texts[ia], texts[ib], L
            ):
                want.add((ia, ib, pa, pb, ln))
    assert got == want
    # sanity on the fixture itself: multi-occurrence + length > L cases
    assert any(r[0] == 1 and r[1] == 2 for r in want)
    assert len({r[3] for r in want if (r[0], r[1]) == (1, 2)}) == 2
    assert any(r[4] > L for r in want)


def test_cross_doc_repeats_min_len_boundary(spark):
    """A shared substring of length exactly min_len appears; one char
    shorter disappears."""
    from dw_etl_spark.operators.exact_substr import cross_doc_repeats

    df = spark.createDataFrame(
        [(1, "xxABCDEFGHyy"), (2, "ppABCDEFGHqq"), (3, "mmABCDEFGnn")],
        "doc_id long, text string",
    )
    got = cross_doc_repeats(df, "text", "doc_id", min_len=8).collect()
    pairs = {(r["id_a"], r["id_b"]): r["length"] for r in got}
    assert pairs == {(1, 2): 8}  # doc 3 shares only 7 chars


def test_cross_doc_hot_gram_cap_drops_boilerplate(spark):
    """max_gram_occ fires on a gram occurring in every doc: with the
    cap below the occurrence count the boilerplate match disappears
    (documented skew lever), with a high cap it is found."""
    from dw_etl_spark.operators.exact_substr import cross_doc_repeats

    boiler = "COPYRIGHT NOTICE 2024"
    df = spark.createDataFrame(
        [(i, f"doc {i} body " + boiler) for i in range(6)],
        "doc_id long, text string",
    )
    full = cross_doc_repeats(df, "text", "doc_id", min_len=len(boiler))
    assert full.count() == 15  # C(6,2)
    capped = cross_doc_repeats(
        df, "text", "doc_id", min_len=len(boiler), max_gram_occ=3
    )
    assert capped.count() == 0


def test_cross_doc_dup_stats_keep_first_merged_coverage(spark):
    """xdup_chars counts each later-doc char once even under
    overlapping matches from SEVERAL earlier docs, and the
    first-occurrence doc scores zero."""
    from dw_etl_spark.operators.exact_substr import cross_doc_dup_stats

    rows = _xdoc_corpus()
    L = 10
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r
        for r in cross_doc_dup_stats(
            df, "text", "doc_id", min_len=L, max_gram_occ=1000
        ).collect()
    }
    texts = dict(rows)
    ids = sorted(texts)
    for rid in ids:
        covered = set()
        for earlier in ids:
            if earlier >= rid:
                break
            for (pa, pb, ln) in _brute_maximal_matches(
                texts[earlier], texts[rid], L
            ):
                covered.update(range(pb, pb + ln))
        r = got[rid]
        assert r["n_chars"] == len(texts[rid])
        assert r["xdup_chars"] == len(covered), rid
    assert got[1]["xdup_chars"] == 0  # first occurrence keeps all
    assert got[2]["xdup_chars"] > 0


def test_cross_doc_dedup_cuts_later_docs_only(spark):
    """The cut equals the python reference cut (merge spans, splice),
    composes to zero removal on the first-occurrence doc, and reports
    exact removal accounting."""
    from dw_etl_spark.operators.exact_substr import cross_doc_dedup

    rows = _xdoc_corpus()
    L = 10
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: r
        for r in cross_doc_dedup(
            df, "text", "doc_id", min_len=L, max_gram_occ=1000
        ).collect()
    }
    texts = dict(rows)
    ids = sorted(texts)
    for rid in ids:
        covered = set()
        for earlier in ids:
            if earlier >= rid:
                break
            for (pa, pb, ln) in _brute_maximal_matches(
                texts[earlier], texts[rid], L
            ):
                covered.update(range(pb, pb + ln))
        want = "".join(
            c for k, c in enumerate(texts[rid]) if k not in covered
        )
        assert got[rid]["cleaned"] == want, rid
        assert got[rid]["n_removed_chars"] == len(covered)
    assert got[1]["cleaned"] == texts[1]


def test_winnowed_cross_doc_guarantee_and_soundness(spark):
    """winnow=w sampling: (a) GUARANTEE — every brute-force maximal
    match of length >= min_len + w - 1 surfaces as a reported span on
    its diagonal whose seeds lie inside the match; (b) SOUNDNESS —
    every reported span's endpoint seeds are true min_len-char
    matches (direct substring equality); (c) the sampling actually
    thins the seed set (~2/(w+1) of positions); (d) w=1 reproduces
    the exact mode verbatim."""
    from dw_etl_spark.operators.exact_substr import (
        _seed_grams,
        cross_doc_repeats,
    )

    rows = _xdoc_corpus()
    texts = dict(rows)
    L, w = 8, 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = cross_doc_repeats(
        df, "text", "doc_id", min_len=L, max_gram_occ=10_000, winnow=w
    ).collect()

    # (b) soundness: both endpoint seeds of each span match exactly
    for r in rep:
        a, b = texts[r["id_a"]], texts[r["id_b"]]
        assert a[r["pos_a"]:r["pos_a"] + L] == b[r["pos_b"]:r["pos_b"] + L]
        ea, eb = r["pos_a"] + r["length"] - L, r["pos_b"] + r["length"] - L
        assert a[ea:ea + L] == b[eb:eb + L]
        assert r["length"] >= L

    # (a) coverage of long-enough true matches
    ids = sorted(texts)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            for (pa, pb, ln) in _brute_maximal_matches(
                texts[ia], texts[ib], L
            ):
                if ln < L + w - 1:
                    continue
                hit = [
                    r
                    for r in rep
                    if r["id_a"] == ia
                    and r["id_b"] == ib
                    and r["pos_a"] - r["pos_b"] == pa - pb
                    and pa <= r["pos_a"]
                    and r["pos_a"] + r["length"] <= pa + ln + w  # inside-ish
                ]
                assert hit, (ia, ib, pa, pb, ln)

    # (c) the shuffle really shrinks
    n_all = _seed_grams(df, "text", "doc_id", L).count()
    # replicate the internal sampling by running with a huge occ cap
    # and counting distinct surviving seeds via the exact internals:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    seeds = _seed_grams(df, "text", "doc_id", L)
    fwd = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    trail = Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    n_kept = (
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
        .count()
    )
    assert n_kept < 0.62 * n_all, (n_kept, n_all)

    # (d) winnow=1 is byte-identical to the exact mode
    exact = sorted(
        map(
            tuple,
            cross_doc_repeats(
                df, "text", "doc_id", min_len=L, max_gram_occ=10_000
            ).collect(),
        )
    )
    one = sorted(
        map(
            tuple,
            cross_doc_repeats(
                df, "text", "doc_id", min_len=L, max_gram_occ=10_000,
                winnow=1,
            ).collect(),
        )
    )
    assert exact == one


def test_winnowed_detect_plus_verify_equals_exact(spark):
    """The sampled stack closes exactly: winnow=w seed emission +
    per-pair diagonal extension returns (a) EVERY exact-mode maximal
    match of length >= min_len + w - 1, (b) nothing that is not an
    exact-mode match — at the sampled shuffle cost."""
    from dw_etl_spark.operators.exact_substr import (
        cross_doc_repeats,
        verify_cross_doc_candidates,
    )

    rows = _xdoc_corpus()
    L, w = 8, 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seeds = cross_doc_repeats(
        df, "text", "doc_id", min_len=L, max_gram_occ=10_000,
        winnow=w, emit="seeds",
    )
    verified = {
        (r["id_a"], r["id_b"], r["pos_a"], r["pos_b"], r["length"])
        for r in verify_cross_doc_candidates(
            df, seeds, "text", "doc_id"
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"], r["pos_a"], r["pos_b"], r["length"])
        for r in cross_doc_repeats(
            df, "text", "doc_id", min_len=L, max_gram_occ=10_000
        ).collect()
    }
    long_exact = {m for m in exact if m[4] >= L + w - 1}
    assert long_exact, "fixture must contain long matches"
    assert long_exact <= verified          # (a) nothing long is missed
    assert verified <= exact               # (b) everything is real
