"""Persisted BM25 index: equality to the one-shot scorer, growth by
merge, bucket-pruned query plans, and the query-term cap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import tokens
from dw_etl_spark.operators.bm25_index import (
    build_bm25_index,
    drop_bm25_index,
    merge_into_bm25_index,
    query_bm25_index,
)
from dw_etl_spark.operators.ir import bm25_topk
from dw_etl_spark.sources.files import read_table
from tests.conftest import SF_SMOKE


def _corpus_queries(spark):
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 400)
    queries = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(tokens("text"), 1, 6), " ").alias("text"),
        )
    )
    return corpus, queries


def _rows(df):
    return sorted(map(tuple, df.select("query_id", "id", "score", "rank").collect()))


def test_index_query_equals_one_shot_bm25(spark, tmp_path):
    """Seed-built index returns exactly what bm25_topk computes on the
    same corpus — same idf, same dl normalization, same
    round-then-rank order — including under the df cap."""
    corpus, queries = _corpus_queries(spark)
    drop_bm25_index(spark, "bmi_eq")
    build_bm25_index(corpus, "text", "doc_id", "bmi_eq", n_buckets=4)
    try:
        by_frac = {}
        # 0.78, not a production-style 0.3: the synthetic fixture's
        # 31-word vocabulary puts every query term at df 0.74-0.83,
        # so 0.78 drops SOME terms and keeps SOME (0.3 keeps none)
        for frac in (1.0, 0.78):
            got = query_bm25_index(
                queries, "bmi_eq", k=4, max_df_frac=frac
            )
            want = bm25_topk(
                corpus, queries, "text", "doc_id", k=4, max_df_frac=frac
            )
            by_frac[frac] = _rows(got)
            assert _rows(got) == _rows(want)
            assert got.count() > 0
        assert by_frac[1.0] != by_frac[0.78]  # the cap has teeth
    finally:
        drop_bm25_index(spark, "bmi_eq")


def test_merged_index_equals_one_shot_on_concatenation(spark, tmp_path):
    """Build on half the corpus, merge the other half: query results
    equal bm25_topk on the full corpus — df and avgdl stay exact
    across increments because they are summed, not frozen."""
    corpus, queries = _corpus_queries(spark)
    first = corpus.filter(F.col("doc_id") % 2 == 0)
    second = corpus.filter(F.col("doc_id") % 2 == 1)
    drop_bm25_index(spark, "bmi_merge")
    build_bm25_index(first, "text", "doc_id", "bmi_merge", n_buckets=4)
    try:
        before = _rows(query_bm25_index(queries, "bmi_merge", k=3))
        merge_into_bm25_index(second, "text", "doc_id", "bmi_merge")
        after = _rows(query_bm25_index(queries, "bmi_merge", k=3))
        want = _rows(bm25_topk(corpus, queries, "text", "doc_id", k=3))
        assert after == want
        assert before != after  # the merge actually changed rankings
    finally:
        drop_bm25_index(spark, "bmi_merge")


def test_query_plan_prunes_postings_buckets(spark, tmp_path):
    """The postings scan is bucket-pruned by the query-term isin
    literal — the plan reports selecting a strict subset of buckets,
    which is the 'scan scales with the query, not the corpus' claim."""
    corpus, _ = _corpus_queries(spark)
    queries = spark.createDataFrame(
        [(1, "zzzz_unseen_term")], "query_id long, text string"
    )
    drop_bm25_index(spark, "bmi_plan")
    build_bm25_index(corpus, "text", "doc_id", "bmi_plan", n_buckets=4)
    try:
        q = query_bm25_index(queries, "bmi_plan", k=3)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        drop_bm25_index(spark, "bmi_plan")


def test_query_term_cap_raises(spark, tmp_path):
    """More distinct query terms than the cap is an error, not a
    silent truncation."""
    corpus, queries = _corpus_queries(spark)
    drop_bm25_index(spark, "bmi_cap")
    build_bm25_index(
        corpus.limit(50), "text", "doc_id", "bmi_cap", n_buckets=4
    )
    try:
        with pytest.raises(ValueError, match="distinct terms"):
            query_bm25_index(queries, "bmi_cap", max_query_terms=3)
    finally:
        drop_bm25_index(spark, "bmi_cap")


def test_merge_commit_protocol_crash_and_replay(spark, tmp_path):
    """Round-9 advice fix: the three merge appends are made atomic by
    VISIBILITY — postings/df rows carry an attempt tag, the stats
    append commits it, queries read only committed tags. Pins:
    (a) orphan postings/df rows of a 'crashed' merge (no stats row)
    are invisible — query results equal the committed state exactly;
    (b) re-running the batch after the crash applies cleanly (no
    double count vs the one-shot scorer on the concatenation);
    (c) re-running an ALREADY-COMMITTED batch_id is a no-op returning
    False; (d) compaction physically drops the orphans."""
    from dw_etl_spark.operators.bm25_index import compact_bm25_index

    corpus, queries = _corpus_queries(spark)
    first = corpus.filter(F.col("doc_id") % 2 == 0)
    second = corpus.filter(F.col("doc_id") % 2 == 1)
    drop_bm25_index(spark, "bmi_tx")
    build_bm25_index(first, "text", "doc_id", "bmi_tx", n_buckets=4)
    try:
        seed_rows = _rows(query_bm25_index(queries, "bmi_tx", k=3))
        # (a) simulate a crash between the df append and the stats
        # commit: postings+df land under a tag no stats row names
        from dw_etl_spark.operators.ir import bm25_postings

        orphan = bm25_postings(second, "text", "doc_id").withColumn(
            "batch_tag", F.lit("b1@dead")
        )
        orphan.write.mode("append").bucketBy(4, "term").sortBy(
            "term"
        ).saveAsTable("bmi_tx_postings")
        orphan.groupBy("term").agg(
            F.count(F.lit(1)).alias("df_t")
        ).withColumn("batch_tag", F.lit("b1@dead")).write.mode(
            "append"
        ).bucketBy(4, "term").saveAsTable("bmi_tx_df")
        assert _rows(query_bm25_index(queries, "bmi_tx", k=3)) == seed_rows
        # (b) the replayed merge applies exactly once
        assert merge_into_bm25_index(
            second, "text", "doc_id", "bmi_tx", batch_id="b1"
        )
        want = _rows(bm25_topk(corpus, queries, "text", "doc_id", k=3))
        assert _rows(query_bm25_index(queries, "bmi_tx", k=3)) == want
        # (c) committed batch_id replay is a no-op
        assert not merge_into_bm25_index(
            second, "text", "doc_id", "bmi_tx", batch_id="b1"
        )
        assert _rows(query_bm25_index(queries, "bmi_tx", k=3)) == want
        # (d) compaction drops the orphan rows for good
        orphan_n = (
            spark.table("bmi_tx_postings")
            .filter(F.col("batch_tag") == "b1@dead")
            .count()
        )
        assert orphan_n > 0
        compact_bm25_index(spark, "bmi_tx")
        assert (
            spark.table("bmi_tx_postings")
            .filter(F.col("batch_tag") == "b1@dead")
            .count()
            == 0
        )
        assert _rows(query_bm25_index(queries, "bmi_tx", k=3)) == want
    finally:
        drop_bm25_index(spark, "bmi_tx")


def test_drop_sweeps_stale_table_directories(spark):
    """A table directory left by a PREVIOUS session is invisible to
    this session's catalog (DROP TABLE no-ops) but blocks saveAsTable
    with LOCATION_ALREADY_EXISTS — drop_bm25_index must sweep the
    filesystem too (the gate's correctness and bench sessions share
    one working directory)."""
    from pathlib import Path
    from urllib.parse import urlparse

    corpus, queries = _corpus_queries(spark)
    wh = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    stale = wh / "bmi_stale_meta"
    stale.mkdir(parents=True, exist_ok=True)
    (stale / "junk").write_text("leftover from a dead session")
    drop_bm25_index(spark, "bmi_stale")
    assert not stale.exists()
    build_bm25_index(
        corpus.limit(30), "text", "doc_id", "bmi_stale", n_buckets=2
    )
    try:
        assert query_bm25_index(queries, "bmi_stale", k=2).count() >= 0
    finally:
        drop_bm25_index(spark, "bmi_stale")


def test_compaction_preserves_results_and_shrinks_files(spark, tmp_path):
    """After several merges, compaction sums the df partials to one
    row per term, collapses the stats log, rewrites postings to one
    sorted file per bucket — and query results are unchanged."""
    from dw_etl_spark.operators.bm25_index import compact_bm25_index

    corpus, queries = _corpus_queries(spark)
    slices = [corpus.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    drop_bm25_index(spark, "bmi_cpt")
    build_bm25_index(slices[0], "text", "doc_id", "bmi_cpt", n_buckets=4)
    try:
        for s in slices[1:]:
            merge_into_bm25_index(s, "text", "doc_id", "bmi_cpt")
        before_rows = _rows(query_bm25_index(queries, "bmi_cpt", k=3))
        files_before, files_after = compact_bm25_index(spark, "bmi_cpt")
        assert files_after < files_before, (files_before, files_after)
        df_tbl = spark.table("bmi_cpt_df")
        assert df_tbl.count() == df_tbl.select("term").distinct().count()
        assert spark.table("bmi_cpt_stats").count() == 1
        after_rows = _rows(query_bm25_index(queries, "bmi_cpt", k=3))
        assert after_rows == before_rows
        # equality to the one-shot scorer still holds post-compaction
        want = _rows(bm25_topk(corpus, queries, "text", "doc_id", k=3))
        assert after_rows == want
    finally:
        drop_bm25_index(spark, "bmi_cpt")


def test_compaction_inter_swap_crash_windows_stay_readable(spark, monkeypatch):
    """ADVICE r14 (medium): the three per-table swaps can't form one
    transaction, so a crash AFTER the postings swap but BEFORE the
    stats swap used to leave postings holding only ``compacted@0`` rows
    while ``_stats`` still named the old per-batch tags — the
    committed-tags filter then returned EMPTY forever, and per-table
    recovery could not repair it (both renames had completed). The
    always-visible COMPACTED_TAG rule must keep every inter-swap crash
    point fully readable, and a healing re-compaction must converge."""
    import dw_etl_spark.operators.bm25_index as bmx
    from dw_etl_spark.operators.bm25_index import compact_bm25_index

    corpus, queries = _corpus_queries(spark)
    parts = [corpus.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    name = "bmi_cw"
    drop_bm25_index(spark, name)
    build_bm25_index(parts[0], "text", "doc_id", name, n_buckets=4)
    merge_into_bm25_index(parts[1], "text", "doc_id", name, batch_id="b1")
    try:
        baseline = _rows(query_bm25_index(queries, name, k=4))
        assert baseline  # non-empty before any crash is injected

        orig_swap = bmx.swap_in
        for round_no, crash_after in enumerate(("_postings", "_df")):
            if round_no == 1:
                # re-create the mixed per-batch-tag state so the second
                # window is exercised against uncompacted increments too
                merge_into_bm25_index(
                    parts[2], "text", "doc_id", name, batch_id="b2"
                )
                baseline = _rows(query_bm25_index(queries, name, k=4))

            def crashing(spark_, table, write, _suffix=crash_after):
                orig_swap(spark_, table, write)
                if table.endswith(_suffix):
                    raise RuntimeError(f"injected crash after {table} swap")

            monkeypatch.setattr(bmx, "swap_in", crashing)
            with pytest.raises(RuntimeError, match="injected crash"):
                compact_bm25_index(spark, name)
            monkeypatch.undo()

            # THE pin: mid-window reads are complete, not empty
            assert _rows(query_bm25_index(queries, name, k=4)) == baseline
            # and the next leased compaction heals to the same answers
            compact_bm25_index(spark, name)
            assert _rows(query_bm25_index(queries, name, k=4)) == baseline
    finally:
        drop_bm25_index(spark, name)
