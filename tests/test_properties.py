"""Property-based tests (hypothesis) for the semantically tricky
operators — randomized inputs against independent implementations
(pandas, native Spark, exact math)."""

from __future__ import annotations

import math

import hypothesis.strategies as st
import pandas as pd
from hypothesis import HealthCheck, given, settings
from pyspark.sql import Window
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ------------------------------------------------- interpolation vs pandas

@st.composite
def grouped_series(draw):
    n_groups = draw(st.integers(1, 3))
    out = []
    for g in range(n_groups):
        n = draw(st.integers(1, 8))
        vals = draw(
            st.lists(
                st.one_of(st.none(), st.integers(-100, 100).map(float)),
                min_size=n, max_size=n,
            )
        )
        out += [(g, i, v) for i, v in enumerate(vals)]
    return out


@SLOW
@given(rows=grouped_series())
def test_interpolate_matches_pandas(spark, rows):
    from dw_etl_spark.operators.interpolate import interpolate_by_group

    df = spark.createDataFrame(rows, "g int, t int, v double")
    got = {
        (r["g"], r["t"]): r["v"]
        for r in interpolate_by_group(df, ["g"], "t", ["v"]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["g", "t", "v"]).sort_values(["g", "t"])
    pdf["v"] = pdf.groupby("g")["v"].transform(lambda s: s.interpolate())
    for _, row in pdf.iterrows():
        want = row["v"]
        have = got[(row["g"], row["t"])]
        if pd.isna(want):
            assert have is None, (row["g"], row["t"], have)
        else:
            assert have is not None and math.isclose(have, want, abs_tol=1e-9)


# ------------------------------------------------- exact ntile vs native

@SLOW
@given(
    n=st.integers(1, 40),
    buckets=st.integers(1, 7),
)
def test_exact_ntile_matches_native(spark, n, buckets):
    from dw_etl_spark.operators.qcut import _exact_ntile

    df = spark.range(1, n + 1).withColumnRenamed("id", "rn")
    w = Window.orderBy("rn")
    got = df.select(
        "rn",
        _exact_ntile(F.col("rn"), F.lit(n), buckets).cast("int").alias("mine"),
        F.ntile(buckets).over(w).alias("native"),
    ).collect()
    for r in got:
        assert r["mine"] == r["native"], (n, buckets, r["rn"])


# ------------------------------------------------- asof join vs merge_asof

@st.composite
def asof_frames(draw):
    lts = draw(st.lists(st.integers(0, 50), min_size=1, max_size=10, unique=True))
    rts = draw(st.lists(st.integers(0, 50), min_size=0, max_size=10, unique=True))
    return lts, rts


@SLOW
@given(frames=asof_frames())
def test_asof_matches_pandas_merge_asof(spark, frames):
    from dw_etl_spark.operators.temporal_joins import asof_join

    lts, rts = frames
    left = spark.createDataFrame([("k", t) for t in lts], ["key", "t"])
    right = spark.createDataFrame(
        [("k", t, float(t) * 2) for t in rts],
        ["key", "t", "val"],
    ) if rts else spark.createDataFrame([], "key string, t long, val double")
    got = {
        r["t"]: (r["asof_t"], r["asof_val"])
        for r in asof_join(
            left, right, on=["key"], left_time="t", right_time="t"
        ).collect()
    }
    if not rts:
        assert all(v == (None, None) for v in got.values())
        return
    lpd = pd.DataFrame({"key": "k", "t": sorted(lts)})
    rpd = pd.DataFrame({"key": "k", "t": sorted(rts), "val": [t * 2.0 for t in sorted(rts)]})
    want = pd.merge_asof(lpd, rpd, on="t", by="key", direction="backward")
    for _, row in want.iterrows():
        at, av = got[row["t"]]
        if pd.isna(row["val"]):
            assert at is None and av is None
        else:
            assert av == row["val"]


# ------------------------------------------------- minhash estimates jaccard

@SLOW
@given(seed=st.integers(0, 10_000))
def test_minhash_signature_agreement_tracks_jaccard(spark, seed):
    """Fraction of agreeing minhash lanes ≈ true shingle Jaccard."""
    import random

    from dw_etl_spark.functions.text import word_ngrams
    from dw_etl_spark.operators.text_dedup import minhash_signatures

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    base = [rng.choice(vocab) for _ in range(40)]
    # mutate a suffix: controlled overlap
    k = rng.randint(0, 20)
    other = base[:-k] + [rng.choice(vocab) for _ in range(k)] if k else list(base)
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))], ["doc_id", "text"]
    )
    n_h = 32
    sig = {
        r["id"]: [r[f"m{j}"] for j in range(n_h)]
        for r in minhash_signatures(df, "text", "doc_id", n=2, num_hashes=n_h).collect()
    }
    agree = sum(a == b for a, b in zip(sig[1], sig[2])) / n_h
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", word_ngrams("text", 2).alias("sh")).collect()
    }
    inter = len(sh[1] & sh[2])
    union = len(sh[1] | sh[2]) or 1
    true_j = inter / union
    # 32 lanes → binomial std ≤ 0.09; allow 4 sigma
    assert abs(agree - true_j) <= 0.36, (agree, true_j)
