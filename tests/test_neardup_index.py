"""Incremental near-dup index: equality to the one-shot path, bucketed
plan shape, and growth across merges."""

from __future__ import annotations

from pyspark.sql import functions as F

from dw_etl_spark.operators.neardup_index import (
    build_neardup_index,
    drop_neardup_index,
    merge_into_neardup_index,
    query_neardup_index,
)
from dw_etl_spark.operators.text_dedup import minhash_lsh_pairs
from dw_etl_spark.sources.files import read_table
from tests.conftest import SF_SMOKE


def _corpus_and_batch(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    # batch: fresh ids — some near-copies of corpus docs, some novel text
    copies = (
        corpus.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 10000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq")).alias("text"),
        )
    )
    novel = docs.filter(F.col("doc_id").between(400, 450)).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    return corpus, copies.unionByName(novel)


def test_query_equals_one_shot_lsh_cross_pairs(spark, tmp_path):
    """Index probe returns exactly the corpus-to-batch pairs the
    one-shot minhash_lsh_pairs finds on the concatenation."""
    corpus, batch = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_eq")
    build_neardup_index(
        corpus, "text", "doc_id", "ndi_eq", n_buckets=4
    )
    try:
        got = query_neardup_index(batch, "text", "doc_id", "ndi_eq").collect()
        got_set = {(r["index_id"], r["batch_id"], r["jaccard"]) for r in got}

        joint = minhash_lsh_pairs(
            corpus.unionByName(batch), "text", "doc_id"
        ).collect()
        want = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in joint
            if r["id_a"] < 10000 <= r["id_b"]  # corpus ↔ batch pairs only
        }
        assert got_set == want
        assert want, "fixture must actually contain cross near-dups"
    finally:
        drop_neardup_index(spark, "ndi_eq")


def test_query_plan_reads_index_bucketed(spark, tmp_path):
    """Both index-side scans come back 'Bucketed: true' — the history
    is never re-shuffled to meet the batch."""
    corpus, batch = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_plan")
    build_neardup_index(corpus, "text", "doc_id", "ndi_plan", n_buckets=4)
    # with a tiny batch Spark rightly broadcasts it (index side still
    # unshuffled); disable broadcast to pin the sort-merge regime a
    # real batch lands in — THERE the bucketed layout must be used
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = query_neardup_index(batch, "text", "doc_id", "ndi_plan")
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        drop_neardup_index(spark, "ndi_plan")
    assert plan.count("Bucketed: true") >= 2, plan


def test_merge_grows_the_index(spark, tmp_path):
    """After merging a batch, a later batch's near-dups of THOSE docs
    are found; before the merge they are not."""
    corpus, batch1 = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_grow")
    build_neardup_index(corpus, "text", "doc_id", "ndi_grow", n_buckets=4)

    batch2 = batch1.filter(F.col("doc_id") >= 20000).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    before = query_neardup_index(batch2, "text", "doc_id", "ndi_grow").collect()
    assert not [r for r in before if r["index_id"] >= 20000]

    merge_into_neardup_index(batch1, "text", "doc_id", "ndi_grow")
    after = query_neardup_index(batch2, "text", "doc_id", "ndi_grow").collect()
    hits = {r["index_id"] for r in after if r["index_id"] >= 20000}
    assert hits, "merged batch docs must be findable"
    # and the pre-merge corpus hits are still there
    assert {r["index_id"] for r in after if r["index_id"] < 10000} == {
        r["index_id"] for r in before
    }
    drop_neardup_index(spark, "ndi_grow")


def test_neardup_filter_stream_drops_dups_across_epochs(spark, tmp_path):
    """Two file-stream epochs through the foreachBatch near-dup sink:
    epoch-2 near-copies of epoch-1 docs (and of the seed corpus) are
    dropped, novel docs survive, and the index has grown."""
    import json

    from dw_etl_spark.streaming.sinks import neardup_filter_stream_writer

    corpus, _ = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_stream")
    build_neardup_index(corpus, "text", "doc_id", "ndi_stream", n_buckets=4)

    base = {
        r["doc_id"]: r["text"]
        for r in corpus.filter(F.col("doc_id") < 6).collect()
    }
    src = tmp_path / "docs"
    src.mkdir()
    out = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("pathGlobFilter", "*.json")
            .json(str(src))
        )
        q = neardup_filter_stream_writer(
            stream, "text", "doc_id", "ndi_stream", out, ckpt
        )
        q.awaitTermination()

    # epoch 1: a near-copy of seed doc 0 (drop), a novel doc (keep),
    # and an in-batch dup pair (keep-min only)
    novel1 = "completely new prose about synthetic benchmarks " * 4
    (src / "e1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 50000, "text": base[0] + " qq"},
                {"doc_id": 50001, "text": novel1},
                {"doc_id": 50002, "text": novel1 + " tail"},
            ]
        )
    )
    run()
    kept1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept1 == {50001}, kept1

    # epoch 2: near-copy of the epoch-1 survivor (drop — the index
    # grew), plus a fresh novel doc (keep)
    novel2 = "another genuinely distinct document about parquet layouts " * 4
    (src / "e2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 60000, "text": novel1 + " zz"},
                {"doc_id": 60001, "text": novel2},
            ]
        )
    )
    run()
    kept2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept2 == {50001, 60001}, kept2
    drop_neardup_index(spark, "ndi_stream")


def test_neardup_filter_stream_replay_overwrites_not_appends(spark, tmp_path):
    """Crash-window idempotence: if an epoch's survivors landed in
    out_path but the index merge never committed, the replay guard
    cannot drop them — the epoch-scoped overwrite must replace the
    half-committed output instead of appending a second copy."""
    import json

    from dw_etl_spark.streaming.sinks import neardup_filter_stream_writer

    corpus, _ = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_replay")
    build_neardup_index(corpus, "text", "doc_id", "ndi_replay", n_buckets=4)

    src = tmp_path / "docs"
    src.mkdir()
    out = str(tmp_path / "kept")
    novel = "fresh prose that matches nothing in the seed corpus " * 4
    (src / "e1.json").write_text(json.dumps({"doc_id": 70001, "text": novel}))

    # simulate the crashed first attempt: survivors written to epoch=0,
    # index merge lost (the id is NOT in ndi_replay_shingles)
    spark.createDataFrame([(70001, novel)], "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{out}/epoch=0")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("pathGlobFilter", "*.json")
        .json(str(src))
    )
    q = neardup_filter_stream_writer(
        stream, "text", "doc_id", "ndi_replay", out, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    assert [r["doc_id"] for r in rows] == [70001], rows  # ONE copy, not two
    # and this time the merge committed
    idx_ids = {
        r["id"] for r in spark.table("ndi_replay_shingles").select("id").collect()
    }
    assert 70001 in idx_ids
    drop_neardup_index(spark, "ndi_replay")


def test_compact_index_shrinks_files_and_preserves_results(spark, tmp_path):
    """After several merge epochs, compaction reduces the file count
    while probe results stay byte-identical and the plan still reads
    both index scans bucketed."""
    from dw_etl_spark.operators.neardup_index import compact_neardup_index

    corpus, batch = _corpus_and_batch(spark)
    drop_neardup_index(spark, "ndi_cmp")
    build_neardup_index(corpus, "text", "doc_id", "ndi_cmp", n_buckets=4)
    try:
        # three merge epochs of disjoint-id slices -> small-file piles
        for i in range(3):
            part = batch.select(
                (F.col("doc_id") + 1_000_000 * (i + 1)).alias("doc_id"), "text"
            )
            merge_into_neardup_index(part, "text", "doc_id", "ndi_cmp")

        probe = batch.select((F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
        key = lambda r: (r["index_id"], r["batch_id"], r["jaccard"])
        before_rows = sorted(
            map(key, query_neardup_index(probe, "text", "doc_id", "ndi_cmp").collect())
        )
        files_before, files_after = compact_neardup_index(spark, "ndi_cmp")
        assert files_after < files_before, (files_before, files_after)

        after_q = query_neardup_index(probe, "text", "doc_id", "ndi_cmp")
        assert sorted(map(key, after_q.collect())) == before_rows

        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = after_q._sc._jvm.PythonSQLUtils.explainString(
                query_neardup_index(probe, "text", "doc_id", "ndi_cmp")
                ._jdf.queryExecution(),
                "formatted",
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        assert plan.count("Bucketed: true") >= 2
    finally:
        drop_neardup_index(spark, "ndi_cmp")


def test_index_name_must_be_plain_identifier(spark):
    import pytest as _pytest

    corpus, _ = _corpus_and_batch(spark)
    for bad in ("x; DROP TABLE y", "a.b", "has space", "quo'te", ""):
        with _pytest.raises(ValueError, match="plain SQL identifier"):
            build_neardup_index(corpus, "text", "doc_id", bad)
        with _pytest.raises(ValueError, match="plain SQL identifier"):
            drop_neardup_index(spark, bad)


def test_incremental_corpus_story_end_to_end(spark):
    """The incremental ingest stack COMPOSED: Bloom exact layer
    (scale.bloom_prefilter_anti_join) + persisted MinHash-LSH index
    (build/query/merge) over 3 daily batches, with per-day HLL
    fingerprint sketches rolled up (sketches.py) and a drift check
    (drift.py) on the way out. The final kept set must equal the
    one-shot dedup (exact_dedup + minhash keep-min) on the
    concatenation — batch-sized work, corpus-identical answer."""
    from dw_etl_spark.functions.text import fingerprint
    from dw_etl_spark.operators.drift import ks_statistic, token_shift
    from dw_etl_spark.operators.scale import bloom_prefilter_anti_join
    from dw_etl_spark.operators.sketches import (
        distinct_sketch,
        merge_distinct_sketches,
    )
    from dw_etl_spark.operators.text_dedup import exact_dedup, minhash_lsh_pairs

    def vocab(g):
        return [f"w{g}x{i}" for i in range(20)]

    def doc(words):
        return " ".join(words)

    seed_rows = [(i, doc(vocab(i))) for i in range(6)]
    b1 = [
        (100, doc(vocab(0))),                 # exact copy of seed 0 → bloom drop
        (101, doc(vocab(1)[:-1] + ["zz"])),   # near-copy of seed 1 → index drop
        (102, doc(vocab(50))),                # novel → keep
        (103, doc(vocab(51))),                # novel → keep
        (104, doc(vocab(50)[:-1] + ["yy"])),  # near-copy of 102 → in-batch drop
    ]
    b2 = [
        (200, doc(vocab(51)[:-1] + ["qq"])),  # near-copy of kept 103 → index drop
        (201, doc(vocab(50))),                # exact copy of kept 102 → bloom drop
        (202, doc(vocab(60))),                # novel → keep
        (203, doc(vocab(1)[:-1] + ["zz"])),   # exact copy of DROPPED 101 → near-dups seed 1 → drop
    ]
    b3 = [
        (300, doc(vocab(60)[:-1] + ["rr"])),  # near-copy of kept 202 → index drop
        (301, doc(vocab(70))),                # novel → keep
    ]

    # ---- one-shot reference on the concatenation
    concat = spark.createDataFrame(
        seed_rows + b1 + b2 + b3, ["doc_id", "text"]
    )
    ex = exact_dedup(concat, "text", "doc_id")
    drops = (
        minhash_lsh_pairs(ex, "text", "doc_id", min_jaccard=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    oneshot = {
        r["doc_id"] for r in ex.join(drops, "doc_id", "left_anti").collect()
    }

    # ---- incremental: seed index, then stream the 3 batches
    seed = spark.createDataFrame(seed_rows, ["doc_id", "text"])
    drop_neardup_index(spark, "ndi_e2e")
    build_neardup_index(seed, "text", "doc_id", "ndi_e2e", n_buckets=4)
    kept = seed
    seen_fp = seed.select(fingerprint("text").alias("fp"))
    day_sketches = [
        distinct_sketch(
            seed.select(F.lit(0).alias("day"), fingerprint("text").alias("fp")),
            "fp",
            by=["day"],
        )
    ]
    for day, rows in enumerate((b1, b2, b3), start=1):
        batch = spark.createDataFrame(rows, ["doc_id", "text"]).withColumn(
            "fp", fingerprint("text")
        )
        day_sketches.append(
            distinct_sketch(batch.withColumn("day", F.lit(day)), "fp", by=["day"])
        )
        fresh = bloom_prefilter_anti_join(batch, seen_fp, "fp", num_bits=1 << 16)
        fresh = exact_dedup(fresh, "text", "doc_id")
        inner = (
            minhash_lsh_pairs(fresh, "text", "doc_id", min_jaccard=0.5)
            .select(F.col("id_b").alias("doc_id"))
            .distinct()
        )
        fresh = fresh.join(inner, "doc_id", "left_anti")
        hits = (
            query_neardup_index(fresh, "text", "doc_id", "ndi_e2e", 0.5)
            .select(F.col("batch_id").alias("doc_id"))
            .distinct()
        )
        survivors = fresh.join(hits, "doc_id", "left_anti").localCheckpoint()
        merge_into_neardup_index(survivors, "text", "doc_id", "ndi_e2e")
        kept = kept.unionByName(survivors.select("doc_id", "text"))
        seen_fp = seen_fp.unionByName(survivors.select("fp"))

    incremental = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert incremental == oneshot, (sorted(incremental), sorted(oneshot))
    assert incremental == {0, 1, 2, 3, 4, 5, 102, 103, 202, 301}

    # ---- HLL rollup of the per-day sketches ≡ one-pass full rescan
    all_days = day_sketches[0]
    for sk in day_sketches[1:]:
        all_days = all_days.unionByName(sk)
    roll = merge_distinct_sketches(all_days, by=None).collect()[0][
        "approx_distinct"
    ]
    full = merge_distinct_sketches(
        distinct_sketch(
            concat.select(fingerprint("text").alias("fp")), "fp"
        ),
        by=None,
    ).collect()[0]["approx_distinct"]
    assert roll == full  # register-max merge is order/grouping-independent
    assert abs(roll - 14) <= 1  # 14 distinct texts across all days

    # ---- drift between the seed day and the final kept corpus
    ks = ks_statistic(
        seed.select(F.length("text").alias("v")),
        kept.select(F.length("text").alias("v")),
        "v",
    )
    assert 0.0 <= ks <= 1.0
    shift = token_shift(seed, kept, "text", k=5).collect()
    assert sum(r["kind"] == "total" for r in shift) == 1
    drop_neardup_index(spark, "ndi_e2e")
