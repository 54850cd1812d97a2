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
