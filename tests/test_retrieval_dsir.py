"""BM25 retrieval (operators/ir.bm25_topk) and DSIR data selection
(operators/dsir) — semantics, determinism, and scale-shape pins."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dw_etl_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_dist,
)
from dw_etl_spark.operators.ir import bm25_topk


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a fast auburn fox leaps above a sleepy hound"),
        (3, "quantum chromodynamics lattice gauge theory"),
        (4, "the dog sat on the mat with the dog"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_self_retrieval_ranks_source_first(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(101, "quantum chromodynamics lattice")], "query_id long, text string"
    )
    out = bm25_topk(docs, queries, "text", "doc_id", k=3).collect()
    assert out[0]["id"] == 3 and out[0]["rank"] == 1
    # no other doc shares any query term -> doc 3 is the only hit
    assert len(out) == 1


def test_bm25_matches_hand_computed_okapi(spark):
    """One shared term ('fox', df=2, N=5): score must equal the
    closed-form Lucene-BM25 value for each containing doc."""
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(7, "fox")], "query_id long, text string"
    )
    out = {
        r["id"]: r["score"]
        for r in bm25_topk(docs, queries, "text", "doc_id", k=5).collect()
    }
    n, avgdl = 5, (9 + 9 + 5 + 9 + 0) / 5
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)) * idf, 6)

    assert out == {1: pytest.approx(s(1, 9)), 2: pytest.approx(s(1, 9))}


def test_bm25_k_cap_and_rounded_rank_determinism(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "the dog fox"), (2, "a hound")], "query_id long, text string"
    )
    out = bm25_topk(docs, queries, "text", "doc_id", k=2)
    per_q = (
        out.groupBy("query_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r["n"] <= 2 for r in per_q)
    a = sorted(map(tuple, out.collect()))
    b2 = sorted(map(tuple, out.repartition(7).collect()))
    assert a == b2  # partition-independent


def test_bm25_max_df_frac_drops_stop_terms(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "the")], "query_id long, text string"
    )
    # 'the' appears in 2/5 docs; a 0.2 cap removes it entirely
    out = bm25_topk(docs, queries, "text", "doc_id", k=5, max_df_frac=0.2)
    assert out.count() == 0


def test_hashed_dist_is_smoothed_probability(spark):
    docs = _corpus(spark)
    dist = hashed_ngram_dist(docs, "text", buckets=32).collect()
    assert len(dist) == 32
    total = sum(math.exp(r["log_p"]) for r in dist)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(math.isfinite(r["log_p"]) for r in dist)


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs sharing the target's vocabulary must outscore disjoint
    ones; the empty doc scores exactly 0 with 0 features."""
    docs = _corpus(spark)
    target = spark.createDataFrame(
        [(900, "quantum gauge theory lattice chromodynamics quantum")],
        "doc_id long, text string",
    )
    w = {
        r["id"]: (r["n_feats"], r["log_weight"])
        for r in dsir_weights(docs, target, "text", "doc_id", buckets=64).collect()
    }
    assert w[5] == (0, 0.0)
    assert w[1][0] == 9 + 8  # unigrams + bigrams
    # doc 3 is drawn from the target's vocab; 1/2/4 share nothing with it
    assert w[3][1] > max(w[1][1], w[2][1], w[4][1])


def test_dsir_select_quota_and_determinism(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("doc_id") % 2 == 1)
    kept = dsir_select(docs, target, "text", "doc_id", quota=3, buckets=64)
    rows = kept.collect()
    assert len(rows) == 3
    again = dsir_select(
        docs.repartition(5), target, "text", "doc_id", quota=3, buckets=64
    ).collect()
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again)


def test_dsir_select_no_gumbel_is_hard_topk(spark):
    docs = _corpus(spark)
    target = spark.createDataFrame(
        [(900, "quantum gauge theory lattice chromodynamics")],
        "doc_id long, text string",
    )
    kept = dsir_select(
        docs, target, "text", "doc_id", quota=1, buckets=64, gumbel=False
    ).collect()
    assert [r["id"] for r in kept] == [3]


def test_bm25_and_dsir_plans_have_no_cartesian(spark):
    """Scale-shape pin: only broadcast exchanges beyond the keyed
    shuffles — the 1-row stats crossJoin must plan as BroadcastNestedLoop
    over a single row, and nothing else may go nested-loop."""
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, "fox dog")], "query_id long, text string"
    )
    plan = bm25_topk(docs, queries, "text", "doc_id", k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    target = docs.filter(F.col("doc_id") % 2 == 1)
    plan2 = dsir_weights(docs, target, "text", "doc_id", buckets=16)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2


def test_dsir_state_incremental_equals_one_shot(spark, tmp_path):
    """Persisted DSIR state (operators/dsir.py): scoring a batch from
    state built on the full corpora equals ``dsir_weights`` restricted
    to that batch, AND state built on half the raw corpus then merged
    with the other half gives the identical result — bucket-cell
    counts sum exactly, so incremental == one-shot, the same contract
    as the sketch/index families."""
    from dw_etl_spark.operators.dsir import (
        build_dsir_state,
        dsir_weights,
        dsir_weights_from_state,
        merge_into_dsir_state,
    )
    from dw_etl_spark.sources.files import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    raw = docs.filter(F.col("doc_id") < 300)
    target = raw.filter(F.col("doc_id") % 7 == 0)
    batch = raw.filter(F.col("doc_id") % 5 == 0)

    want = sorted(
        map(
            tuple,
            dsir_weights(raw, target, "text", "doc_id", buckets=64)
            .join(batch.select(F.col("doc_id").alias("id")), "id")
            .collect(),
        )
    )

    one_shot = str(tmp_path / "state_full")
    build_dsir_state(raw, target, "text", one_shot, buckets=64)
    got = sorted(
        map(
            tuple,
            dsir_weights_from_state(batch, "text", "doc_id", one_shot).collect(),
        )
    )
    assert got == want

    merged = str(tmp_path / "state_inc")
    build_dsir_state(
        raw.filter(F.col("doc_id") % 2 == 0), target, "text", merged, buckets=64
    )
    merge_into_dsir_state(
        merged, raw_batch=raw.filter(F.col("doc_id") % 2 == 1)
    )
    got_inc = sorted(
        map(
            tuple,
            dsir_weights_from_state(batch, "text", "doc_id", merged).collect(),
        )
    )
    assert got_inc == want


def test_retrieve_rerank_equals_numpy_rerank_of_bm25_candidates(spark):
    """Two-stage retrieval (operators/ir.retrieve_rerank): the output
    is exactly the numpy cosine re-rank of the BM25 top-m candidate
    set — stage 2 never leaves the candidates, rank is (rounded cosine
    DESC, id ASC), bm25 scores ride through unchanged."""
    import math

    from dw_etl_spark.functions.text import tokens as sql_tokens
    from dw_etl_spark.operators.ir import bm25_topk, retrieve_rerank
    from dw_etl_spark.sources.files import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    emb = read_table(spark, SF_SMOKE, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    queries = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(sql_tokens("text"), 1, 6), " ").alias("text"),
    )
    qemb = emb.join(
        queries.select(F.col("query_id").alias("doc_id")), "doc_id"
    ).select(F.col("doc_id").alias("query_id"), "embedding")

    k, m = 3, 10
    got = sorted(
        map(
            tuple,
            retrieve_rerank(
                corpus, queries, emb, qemb, "text", "doc_id", k=k, m=m
            ).collect(),
        )
    )
    assert got, "fixture must produce candidates"

    # independent re-rank: bm25 candidates -> driver-side cosine
    cand = bm25_topk(corpus, queries, "text", "doc_id", k=m).collect()
    vecs = {r["doc_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6) if na > 0 and nb > 0 else 0.0

    want = []
    by_q = {}
    for r in cand:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        if qid not in vecs:
            continue
        scored = [
            (qid, r["id"], r["score"], cos(vecs[qid], vecs[r["id"]]))
            for r in rows
            if r["id"] in vecs
        ]
        scored.sort(key=lambda t: (-t[3], t[1]))
        want.extend(
            (qid, i, s, c, rank + 1)
            for rank, (qid, i, s, c) in enumerate(scored[:k])
        )
    assert got == sorted(want)


def test_dsir_state_compaction_preserves_scores(spark, tmp_path):
    """compact_dsir_state collapses appended increments to one row per
    (side, bucket) and batch scores are unchanged."""
    from dw_etl_spark.operators.dsir import (
        build_dsir_state,
        compact_dsir_state,
        dsir_weights_from_state,
        merge_into_dsir_state,
    )
    from dw_etl_spark.sources.files import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    raw = docs.filter(F.col("doc_id") < 200)
    target = raw.filter(F.col("doc_id") % 7 == 0)
    batch = raw.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "state")
    build_dsir_state(
        raw.filter(F.col("doc_id") % 2 == 0), target, "text", path, buckets=64
    )
    merge_into_dsir_state(path, raw_batch=raw.filter(F.col("doc_id") % 2 == 1))
    before = sorted(
        map(tuple, dsir_weights_from_state(batch, "text", "doc_id", path).collect())
    )
    n_before, n_after = compact_dsir_state(spark, path)
    assert n_after < n_before
    assert n_after <= 2 * 64
    after = sorted(
        map(tuple, dsir_weights_from_state(batch, "text", "doc_id", path).collect())
    )
    assert after == before


def test_bm25_index_stream_writer_exactly_once_and_indexed_rerank(
    spark, tmp_path
):
    """r9: (a) the streaming BM25-index maintenance sink — two
    file-stream epochs merge into a seed-built index and querying it
    equals the one-shot scorer on the concatenation; a REPLAY of the
    same files through a fresh checkpoint re-fires the same epoch ids,
    which the index commit protocol skips (no double counting, no sink
    state beyond the index). (b) ``retrieve_rerank_indexed`` served by
    that index equals the in-memory ``retrieve_rerank`` on the
    concatenated corpus."""
    import json

    from dw_etl_spark.operators.bm25_index import (
        build_bm25_index,
        drop_bm25_index,
        query_bm25_index,
    )
    from dw_etl_spark.operators.ir import (
        retrieve_rerank,
        retrieve_rerank_indexed,
    )
    from dw_etl_spark.sources.files import read_table
    from dw_etl_spark.streaming.sinks import bm25_index_stream_writer
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    seed = corpus.filter(F.col("doc_id") % 3 == 0)
    waves = [
        corpus.filter(F.col("doc_id") % 3 == 1),
        corpus.filter(F.col("doc_id") % 3 == 2),
    ]
    drop_bm25_index(spark, "bmi_stream")
    build_bm25_index(seed, "text", "doc_id", "bmi_stream", n_buckets=4)
    try:
        src = tmp_path / "docs"
        src.mkdir()
        for i, w in enumerate(waves):
            rows = [
                json.dumps({"doc_id": r["doc_id"], "text": r["text"]})
                for r in w.collect()
            ]
            (src / f"wave{i}.json").write_text("\n".join(rows))

        def run(ckpt: str) -> None:
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            q = bm25_index_stream_writer(
                stream, "text", "doc_id", "bmi_stream", ckpt
            )
            q.awaitTermination()

        run(str(tmp_path / "ckpt1"))
        queries = docs.filter(F.col("doc_id") % 17 == 0).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 40).alias("text"),
        )

        def rows(df):
            return sorted(
                map(tuple, df.select("query_id", "id", "score", "rank").collect())
            )

        got = rows(query_bm25_index(queries, "bmi_stream", k=3))
        want = rows(bm25_topk(corpus, queries, "text", "doc_id", k=3))
        assert got == want
        # replay through a FRESH checkpoint: same epoch ids re-fire,
        # the commit protocol skips them, the index is unchanged
        run(str(tmp_path / "ckpt2"))
        assert rows(query_bm25_index(queries, "bmi_stream", k=3)) == got

        emb = read_table(spark, SF_SMOKE, "embeddings")
        cemb = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        qemb = emb.select(F.col("vec_id").alias("query_id"), "embedding")
        ix = retrieve_rerank_indexed(
            queries, "bmi_stream", cemb, qemb, "doc_id", k=3, m=8
        )
        mem = retrieve_rerank(
            corpus, queries, cemb, qemb, "text", "doc_id", k=3, m=8
        )
        key = lambda df: sorted(map(tuple, df.collect()))
        assert key(ix) == key(mem)
        assert ix.count() > 0
    finally:
        drop_bm25_index(spark, "bmi_stream")
