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
    # all-None draws give an object-dtype column; Series.interpolate on
    # object dtype is deprecated (FutureWarning, removal planned) — the
    # oracle column is semantically float64, so pin the dtype up front
    pdf["v"] = pdf["v"].astype("float64")
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


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.one_of(
                st.none(),
                # heavy-tie pool so duplicate quantile edges actually occur
                st.sampled_from([1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 13.0]),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_qcut_expr_matches_duckdb_quantile_cont(spark, rows):
    """Property: the JVM-expression qcut follows exact-rank
    (quantile_cont) semantics on random grouped data — ties, all-null
    groups, singleton groups, duplicate-edge collapse and all. The
    reference computes edges with DuckDB and assigns bins in plain
    python. (pandas qcut is NOT the reference here: its
    percentile/100 round-trip shifts edges at exactly-integral ranks
    by 1 ulp — see test_qcut_tie_rank_ulp_divergence.)"""
    import duckdb
    import pandas as pd

    from dw_etl_spark.operators.qcut import _qcut_labels, qcut_by_group_expr

    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g string, v double, rid int"
    )
    got = {
        r["rid"]: r["b"]
        for r in qcut_by_group_expr(df, ["g"], "v", n=3, out_col="b").collect()
    }

    pdf = pd.DataFrame(rows, columns=["g", "v"]).assign(rid=range(len(rows)))
    con = duckdb.connect()
    con.register("t", pdf)
    edges = {
        r[0]: [r[1], r[2], r[3], r[4]]
        for r in con.execute(
            "SELECT g, quantile_cont(v, 0.0), quantile_cont(v, 1.0/3.0), "
            "quantile_cont(v, 2.0/3.0), quantile_cont(v, 1.0) "
            "FROM t WHERE v IS NOT NULL GROUP BY g"
        ).fetchall()
    }
    want = {}
    for _, row in pdf.iterrows():
        g, v, rid = row["g"], row["v"], row["rid"]
        if pd.isna(v) or g not in edges or edges[g][0] is None:
            want[rid] = None
            continue
        uniq = sorted(set(edges[g]))
        k = len(uniq) - 1
        if k < 1:
            want[rid] = None
            continue
        lbs = _qcut_labels(k, ["Low", "Medium", "High"])
        inner = uniq[1:-1]
        label = lbs[-1]
        for e, lb in zip(inner, lbs[:-1]):
            if v <= e:
                label = lb
                break
        want[rid] = label
    assert got == want


# ------------------------------------------------- shard packing vs oracle

@st.composite
def token_streams(draw):
    n = draw(st.integers(1, 40))
    # adversarial mix: zero-token docs, tiny docs, and huge docs that
    # straddle many shard boundaries
    toks = draw(
        st.lists(
            st.one_of(
                st.just(0),
                st.integers(0, 7),
                st.integers(500, 5000),
            ),
            min_size=n, max_size=n,
        )
    )
    shard_tokens = draw(st.sampled_from([1, 64, 512]))
    num_partitions = draw(st.sampled_from([1, 3, 7]))
    return toks, shard_tokens, num_partitions


@SLOW
@given(token_streams())
def test_pack_into_shards_matches_sequential_oracle(spark, stream):
    """The distributed two-phase prefix sum must equal the trivially
    sequential layout for any token mix, shard size and partitioning."""
    from dw_etl_spark.operators.packing import pack_into_shards

    toks, shard_tokens, num_partitions = stream
    rows = [(i, t) for i, t in enumerate(toks)]

    # sequential oracle: running sum in doc order
    expect, run = {}, 0
    for i, t in rows:
        expect[i] = (run, run // shard_tokens, run % shard_tokens)
        run += t

    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(4)
    pins: list = []
    got = {
        r["doc_id"]: (r["prefix_tokens"], r["shard_id"], r["shard_offset"])
        for r in pack_into_shards(
            df, "n_tokens", ["doc_id"], shard_tokens,
            num_partitions=num_partitions, pinned_out=pins,
        ).collect()
    }
    for p in pins:
        p.unpersist()
    assert got == expect


# ------------------------------------------------- contamination vs oracle

@st.composite
def contamination_corpora(draw):
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    def doc():
        k = draw(st.integers(0, 6))
        return " ".join(draw(st.sampled_from(vocab)) for _ in range(k))
    corpus = [(i, doc()) for i in range(draw(st.integers(1, 12)))]
    eval_set = [(100 + i, doc()) for i in range(draw(st.integers(1, 4)))]
    n = draw(st.sampled_from([2, 3]))
    return corpus, eval_set, n


@SLOW
@given(contamination_corpora())
def test_contamination_flags_match_python_oracle(spark, case):
    """Shared-distinct-shingle counts must equal a brute-force Python
    implementation for any corpus/eval mix, incl. empty and short docs."""
    from dw_etl_spark.operators.text_dedup import contamination_flags

    corpus, eval_set, n = case

    def grams(text):
        toks = text.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set().union(*(grams(t) for _, t in eval_set)) if eval_set else set()
    expect = {
        i: len(grams(t) & eval_grams) for i, t in corpus
    }

    cdf = spark.createDataFrame(corpus, ["doc_id", "text"])
    edf = spark.createDataFrame(eval_set, ["doc_id", "text"])
    got = {
        r["id"]: r["n_shared_grams"]
        for r in contamination_flags(cdf, edf, "text", "doc_id", n=n).collect()
    }
    assert got == expect


# ------------------------------------------------- line dedup vs oracle

@st.composite
def line_corpora(draw):
    vocab = ["shared header", "nav bar", "body %d", "footer", "  ", ""]
    docs = []
    for i in range(draw(st.integers(1, 10))):
        n = draw(st.integers(0, 6))
        lines = []
        for _ in range(n):
            pick = draw(st.sampled_from(vocab))
            lines.append(pick % i if "%d" in pick else pick)
        docs.append((i, "\n".join(lines)))
    min_docs = draw(st.sampled_from([2, 3]))
    return docs, min_docs


def _round_half_up(x, nd):
    # Spark's F.round is HALF_UP; Python round() is banker's — a .5 at
    # the 4th decimal would make exact-equality comparison flaky
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(10) ** -nd
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _line_oracle(docs, min_docs):
    from collections import defaultdict

    by_line = defaultdict(set)
    for i, text in docs:
        for ln in text.split("\n"):
            if ln.strip():
                by_line[ln.strip()].add(i)
    stats, cleaned = {}, {}
    for i, text in docs:
        lines = text.split("\n")
        dup = [ln for ln in lines
               if ln.strip() and len(by_line[ln.strip()]) >= min_docs]
        total = sum(len(ln) for ln in lines)
        stats[i] = (
            len(lines),
            len(dup),
            _round_half_up(sum(len(ln) for ln in dup) / total, 4)
            if total
            else 0.0,
        )
        cleaned[i] = "\n".join(
            ln for ln in lines
            if not (ln.strip() and len(by_line[ln.strip()]) >= min_docs)
        )
    return stats, cleaned


@SLOW
@given(line_corpora())
def test_line_dedup_matches_sequential_oracle(spark, corpus):
    from dw_etl_spark.operators.text_dedup import (
        duplicate_line_stats,
        remove_duplicate_lines,
    )

    docs, min_docs = corpus
    want_stats, want_clean = _line_oracle(docs, min_docs)
    df = spark.createDataFrame(docs, ["doc_id", "text"]).repartition(3)
    got_stats = {
        r["id"]: (r["n_lines"], r["n_dup_lines"], r["dup_line_char_frac"])
        for r in duplicate_line_stats(df, "text", "doc_id", min_docs).collect()
    }
    assert got_stats == want_stats
    got_clean = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_lines(df, "text", "doc_id", min_docs).collect()
    }
    assert got_clean == want_clean


@st.composite
def chunk_cases(draw):
    n_docs = draw(st.integers(1, 6))
    docs = draw(
        st.lists(
            st.lists(
                st.text(alphabet="abcdefg", min_size=1, max_size=4),
                min_size=0,
                max_size=40,
            ),
            min_size=n_docs,
            max_size=n_docs,
        )
    )
    chunk = draw(st.integers(2, 12))
    overlap = draw(st.integers(0, chunk - 1))
    return docs, chunk, overlap


@SLOW
@given(chunk_cases())
def test_chunk_documents_matches_sequential_oracle(spark, case):
    """Any doc/chunk/overlap mix must equal the obvious sequential
    chunker: starts step by (chunk−overlap), a non-first start is kept
    only while it contributes an unseen token."""
    from dw_etl_spark.operators.packing import chunk_documents

    docs, chunk, overlap = case
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r["id"], r["chunk_id"], r["n_tokens"], r["chunk"])
        for r in chunk_documents(
            df, "text", "doc_id", chunk_tokens=chunk, overlap=overlap
        ).collect()
    )

    want = []
    stride = chunk - overlap
    for i, toks in enumerate(docs):
        cid = 0
        for s in range(0, len(toks), stride):
            if s > 0 and s + overlap >= len(toks):
                continue
            piece = toks[s : s + chunk]
            want.append((i, cid, len(piece), " ".join(piece)))
            cid += 1
    assert got == sorted(want)


@SLOW
@given(st.integers(2, 40), st.floats(0.05, 1.0), st.integers(2, 8))
def test_semantic_dedup_threshold_monotone(spark, n, thresh, k):
    """Raising the cosine threshold can only shrink the pair set, and
    every reported pair carries a cosine >= the threshold."""
    import random

    from dw_etl_spark.operators.similarity import semantic_dedup_pairs

    rng = random.Random(n * 1000 + k)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(n)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    lo = semantic_dedup_pairs(df, threshold=thresh * 0.5, n_centroids=k).collect()
    hi = semantic_dedup_pairs(df, threshold=thresh, n_centroids=k).collect()
    lo_set = {(r["id_a"], r["id_b"]) for r in lo}
    hi_set = {(r["id_a"], r["id_b"]) for r in hi}
    assert hi_set <= lo_set
    assert all(r["cos_sim"] >= thresh for r in hi)


# ------------------------------------------------- drift under adversarial partitioning

_DRIFT = settings(
    max_examples=24,  # ≥20 seeds: the add_unique_id AQE hazard (PLANS.md
    # note 4) was only caught by exactly this kind of partitioning sweep
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_DRIFT
@given(seed=st.integers(0, 1_000_000))
def test_ks_statistic_partition_independent_matches_bisect(spark, seed):
    """Exact two-sample KS vs a sequential bisect oracle, under
    randomized sizes, heavy ties, NULLs, and adversarial input/range
    partition counts — the two-phase prefix-sum must be invariant to
    all of them."""
    import bisect
    import random

    from dw_etl_spark.operators.drift import ks_statistic

    rng = random.Random(seed)
    support = [float(x) for x in range(rng.randint(2, 8))]  # heavy ties
    va = [rng.choice(support) for _ in range(rng.randint(1, 60))]
    vb = [rng.choice(support) for _ in range(rng.randint(1, 60))]
    a = spark.createDataFrame(
        [(v,) for v in va] + [(None,)] * rng.randint(0, 3), "v double"
    ).repartition(rng.randint(1, 9))
    b = spark.createDataFrame(
        [(v,) for v in vb] + [(None,)] * rng.randint(0, 3), "v double"
    ).repartition(rng.randint(1, 9))
    got = ks_statistic(a, b, "v", num_partitions=rng.randint(1, 7))

    sa, sb = sorted(va), sorted(vb)
    want = max(
        abs(
            bisect.bisect_right(sa, x) / len(sa)
            - bisect.bisect_right(sb, x) / len(sb)
        )
        for x in set(va) | set(vb)
    )
    assert math.isclose(got, want, abs_tol=1e-12), (got, want, seed)


@_DRIFT
@given(seed=st.integers(0, 1_000_000))
def test_token_shift_partition_independent_matches_counter(spark, seed):
    """token_shift vs a sequential Counter oracle under randomized
    corpora and input partitionings; k is set above the vocabulary so
    every union-vocab token must come back with exact probabilities,
    and the JSD total must match the closed form."""
    import random
    from collections import Counter

    from dw_etl_spark.operators.drift import token_shift

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]

    def corpus(n):
        return [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))
            for _ in range(n)
        ]

    ta, tb = corpus(rng.randint(1, 25)), corpus(rng.randint(1, 25))
    a = spark.createDataFrame([(t,) for t in ta], "text string").repartition(
        rng.randint(1, 7)
    )
    b = spark.createDataFrame([(t,) for t in tb], "text string").repartition(
        rng.randint(1, 7)
    )
    rows = token_shift(a, b, "text", k=10_000).collect()

    ca = Counter(w for t in ta for w in t.split())
    cb = Counter(w for t in tb for w in t.split())
    na, nb = sum(ca.values()), sum(cb.values())
    union = set(ca) | set(cb)
    got_tokens = {r["token"]: r for r in rows if r["kind"] == "token"}
    assert set(got_tokens) == union
    jsd = 0.0
    for w in union:
        pa, pb = ca[w] / na, cb[w] / nb
        r = got_tokens[w]
        assert math.isclose(r["p_a"], pa, abs_tol=1e-6), (w, seed)
        assert math.isclose(r["p_b"], pb, abs_tol=1e-6), (w, seed)
        assert math.isclose(r["delta"], abs(pa - pb), abs_tol=1e-6), (w, seed)
        m = (pa + pb) / 2
        jsd += (pa * math.log(pa / m) / 2 if pa else 0.0) + (
            pb * math.log(pb / m) / 2 if pb else 0.0
        )
    total = [r for r in rows if r["kind"] == "total"]
    assert len(total) == 1
    assert math.isclose(total[0]["delta"], jsd, abs_tol=1e-6), seed


# ------------------------------------------------- BPE invariants

@SLOW
@given(seed=st.integers(0, 100_000))
def test_bpe_roundtrip_and_training_consistency(spark, seed):
    """Random corpora: (a) merges are deterministic across input
    partitionings; (b) every encoded word concatenates back to
    word+</w>; (c) encoding a TRAINING word with the learned ranks
    reproduces the trainer's own final segmentation (the classic BPE
    apply/train consistency invariant)."""
    import random

    from dw_etl_spark.operators.bpe import (
        END,
        _encode_word,
        train_bpe,
    )

    rng = random.Random(seed)
    alphabet = "abcdef"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(rng.randint(3, 12))
    ]
    rows = [(w,) for w in words for _ in range(rng.randint(1, 4))]
    df = spark.createDataFrame(rows, "text string")
    n_merges = rng.randint(1, 8)
    merges = train_bpe(df, "text", num_merges=n_merges, min_freq=1)
    assert merges == train_bpe(
        df.repartition(5), "text", num_merges=n_merges, min_freq=1
    )
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(words):
        assert "".join(_encode_word(w, ranks)) == w + END

    # trainer-side final segmentation, replayed sequentially
    vocab = {w: list(w) + [END] for w in set(words)}
    for a, b in merges:
        for w, pieces in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            vocab[w] = out
    for w, want in vocab.items():
        assert _encode_word(w, ranks) == want, (seed, w)


@_DRIFT
@given(seed=st.integers(0, 1_000_000))
def test_psi_partition_independent_matches_numpy(spark, seed):
    """PSI vs a sequential numpy replay (lerp percentiles ≡ Spark
    `percentile`), under random sizes, ties, explicit-vs-derived
    edges, and adversarial partitionings."""
    import math
    import math as m
    import random

    from dw_etl_spark.operators.drift import psi

    rng = random.Random(seed)
    support = [float(x) for x in range(rng.randint(3, 10))]
    va = [rng.choice(support) for _ in range(rng.randint(5, 80))]
    vb = [rng.choice(support) for _ in range(rng.randint(5, 80))]
    n_bins = rng.randint(2, 6)
    a = spark.createDataFrame([(v,) for v in va], "v double").repartition(
        rng.randint(1, 7)
    )
    b = spark.createDataFrame([(v,) for v in vb], "v double").repartition(
        rng.randint(1, 7)
    )
    explicit = rng.random() < 0.5
    edges = (
        sorted({rng.choice(support) for _ in range(n_bins)})
        if explicit
        else None
    )
    got = {
        r["bin"]: r
        for r in psi(a, b, "v", edges=edges, n_bins=n_bins).collect()
    }

    # direct-fraction exact-rank lerp, NOT np.percentile: numpy's
    # x100/:100 percentage round-trip lands 1 ulp off (np.percentile
    # gave 4.0000000000000036 where percentile(v, 2/3) is exactly 4.0
    # — the same divergence qcut.py documents for pandas), and a data
    # point sitting exactly on the edge then flips bins
    def lerp_q(vals, q):
        sv = sorted(vals)
        h = (len(sv) - 1) * q
        fl = math.floor(h)
        hi = min(fl + 1, len(sv) - 1)
        return sv[fl] + (sv[hi] - sv[fl]) * (h - fl)

    eo = (
        sorted(set(edges))
        if explicit
        else sorted({lerp_q(va, i / n_bins) for i in range(1, n_bins)})
    )
    def bin_of(v):
        return sum(v > e for e in eo)

    terms = []
    for i in range(len(eo) + 1):
        pa = max(sum(bin_of(v) == i for v in va) / len(va), 1e-6)
        pb = max(sum(bin_of(v) == i for v in vb) / len(vb), 1e-6)
        terms.append((i, pa, pb, (pb - pa) * m.log(pb / pa)))
    for i, pa, pb, t in terms:
        r = got[str(i)]
        assert m.isclose(r["p_a"], pa, abs_tol=1e-6), (seed, i)
        assert m.isclose(r["p_b"], pb, abs_tol=1e-6), (seed, i)
        assert m.isclose(r["psi_term"], t, abs_tol=1e-6), (seed, i)
    assert m.isclose(
        got["total"]["psi_term"], sum(t for *_, t in terms), abs_tol=1e-5
    ), seed


# ----------------------------- cross-doc ExactSubstr vs brute-force DP

@st.composite
def xdoc_corpus(draw):
    """Small corpora over a 3-letter alphabet (forced repeats) with a
    couple of planted shared substrings, so every draw exercises both
    accidental and deliberate cross-doc matches."""
    n_docs = draw(st.integers(2, 5))
    alpha = "abc"
    docs = []
    for i in range(n_docs):
        n = draw(st.integers(0, 24))
        docs.append(
            "".join(draw(st.sampled_from(alpha)) for _ in range(n))
        )
    if n_docs >= 2 and len(docs[0]) >= 6:
        # plant a shared slice into doc 1 at a drawn offset
        piece = docs[0][: draw(st.integers(4, min(10, len(docs[0]))))]
        pos = draw(st.integers(0, len(docs[1])))
        docs[1] = docs[1][:pos] + piece + docs[1][pos:]
    return docs


@SLOW
@given(xdoc_corpus(), st.integers(3, 6))
def test_cross_doc_repeats_matches_dp_on_random_corpora(spark, docs, L):
    """Property pin: the distributed seed-and-extend tier returns
    EXACTLY the brute-force all-maximal-matches set for every doc pair
    at every min_len — including overlap, multiplicity, and empty
    docs."""
    from dw_etl_spark.operators.exact_substr import cross_doc_repeats
    from tests.test_exact_substr import _brute_maximal_matches

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["pos_a"], r["pos_b"], r["length"])
        for r in cross_doc_repeats(
            df, "text", "doc_id", min_len=L, max_gram_occ=10_000
        ).collect()
    }
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            for (pa, pb, ln) in _brute_maximal_matches(docs[a], docs[b], L):
                want.add((a, b, pa, pb, ln))
    assert got == want
