"""Persisted int8-IVF ANN index: equality with the one-shot
``int8_ivf_topk``, incremental merge, the commit protocol (replay
no-op, crash orphans invisible), refit, bucket pruning, the
pre-quantized ``codes_col`` path, and the streaming maintainer."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dw_etl_spark.operators.ann_index import (
    ann_index_centroids,
    build_ann_index,
    drop_ann_index,
    merge_into_ann_index,
    query_ann_index,
    refit_ann_index,
)
from dw_etl_spark.operators.similarity import int8_ivf_topk, quantize_int8
from dw_etl_spark.sources.files import read_table
from tests.conftest import SF_SMOKE

DIM = 64


def _emb(spark):
    return read_table(spark, SF_SMOKE, "embeddings")


def _rows(df):
    return sorted(
        map(tuple, df.select("query_id", "neighbor_id", "cos_sim").collect())
    )


def test_seed_build_query_matches_one_shot(spark):
    """Probing a seed-built index returns exactly what the one-shot
    ``int8_ivf_topk`` returns over the same corpus with the stored
    centroids — same codes, routing, scoring, ranking."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 150)
    queries = emb.filter(F.col("vec_id").between(150, 169))
    drop_ann_index(spark, "annix_eq")
    build_ann_index(corpus, "annix_eq", n_centroids=8, n_buckets=4)
    try:
        got = query_ann_index(queries, "annix_eq", k=3, nprobe=2)
        want = int8_ivf_topk(
            queries,
            corpus,
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_eq"),
        )
        assert _rows(got) == _rows(want)
        assert got.count() > 0
    finally:
        drop_ann_index(spark, "annix_eq")


def test_merge_then_query_matches_one_shot_on_concat(spark):
    """After merging a second wave, probes see the union — and still
    equal the one-shot scorer on the concatenated corpus under the
    (frozen, seed-trained) stored centroids."""
    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 100)
    wave = emb.filter(F.col("vec_id").between(100, 149))
    queries = emb.filter(F.col("vec_id").between(150, 169))
    drop_ann_index(spark, "annix_merge")
    build_ann_index(seed, "annix_merge", n_centroids=8, n_buckets=4)
    try:
        assert merge_into_ann_index(wave, "annix_merge", batch_id="w1") is True
        got = query_ann_index(queries, "annix_merge", k=3, nprobe=2)
        want = int8_ivf_topk(
            queries,
            seed.unionByName(wave),
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_merge"),
        )
        assert _rows(got) == _rows(want)
        # replay of a committed batch_id is a no-op — results unchanged
        assert merge_into_ann_index(wave, "annix_merge", batch_id="w1") is False
        assert _rows(query_ann_index(queries, "annix_merge", k=3, nprobe=2)) == _rows(
            got
        )
    finally:
        drop_ann_index(spark, "annix_merge")


def test_crash_orphans_invisible_and_refit_drops_them(spark):
    """A merge that crashed between the codes append and the log
    commit leaves rows under an uncommitted tag: probes never see
    them, the batch re-applies cleanly, and refit physically drops
    the orphans."""
    from dw_etl_spark.operators.ann_index import (
        _assign,
        _codes_frame,
        _write_codes,
    )
    from dw_etl_spark.operators.similarity import _centroid_frame

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 100)
    wave = emb.filter(F.col("vec_id").between(100, 129))
    queries = emb.filter(F.col("vec_id").between(150, 159))
    drop_ann_index(spark, "annix_crash")
    build_ann_index(seed, "annix_crash", n_centroids=8, n_buckets=4)
    try:
        before = _rows(query_ann_index(queries, "annix_crash", k=3, nprobe=2))
        # simulate the crash point: codes land, the log row never does
        codes = _codes_frame(wave, "embedding", "vec_id", None)
        cents = _centroid_frame(spark, ann_index_centroids(spark, "annix_crash"))
        _write_codes(_assign(codes, cents), "annix_crash", 4, "w1@deadbeef", "append")
        spark.catalog.refreshTable("annix_crash_codes")
        assert (
            _rows(query_ann_index(queries, "annix_crash", k=3, nprobe=2)) == before
        ), "orphan rows of an uncommitted merge leaked into probe results"
        # the re-run applies cleanly under a fresh attempt tag
        assert merge_into_ann_index(wave, "annix_crash", batch_id="w1") is True
        want = int8_ivf_topk(
            queries,
            seed.unionByName(wave),
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_crash"),
        )
        assert _rows(query_ann_index(queries, "annix_crash", k=3, nprobe=2)) == _rows(
            want
        )
        # refit drops the orphan rows for good: exactly seed+wave remain
        n_cents, n_rows = refit_ann_index(spark, "annix_crash")
        assert n_rows == seed.count() + wave.count()
        assert spark.table("annix_crash_codes").count() == n_rows
    finally:
        drop_ann_index(spark, "annix_crash")


def test_refit_preserves_equality_contract(spark):
    """After refit the centroids moved (retrained over the grown
    corpus) — probes must equal the one-shot scorer under the NEW
    stored centroids."""
    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 80)
    wave = emb.filter(F.col("vec_id").between(80, 159))
    queries = emb.filter(F.col("vec_id").between(160, 179))
    drop_ann_index(spark, "annix_refit")
    build_ann_index(seed, "annix_refit", n_centroids=4, n_buckets=4)
    try:
        merge_into_ann_index(wave, "annix_refit", batch_id="w1")
        n_cents, n_rows = refit_ann_index(spark, "annix_refit", n_centroids=8)
        assert (n_cents, n_rows) == (8, seed.count() + wave.count())
        got = query_ann_index(queries, "annix_refit", k=3, nprobe=2)
        want = int8_ivf_topk(
            queries,
            seed.unionByName(wave),
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_refit"),
        )
        assert _rows(got) == _rows(want)
    finally:
        drop_ann_index(spark, "annix_refit")


def test_probe_prunes_buckets(spark):
    """nprobe=1 with a single query routes to one cid — the codes scan
    must read one bucket, not the table (the index's scale claim)."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 150)
    one_query = emb.filter(F.col("vec_id") == 150)
    drop_ann_index(spark, "annix_plan")
    build_ann_index(corpus, "annix_plan", n_centroids=8, n_buckets=4)
    try:
        # pin=False keeps the lazy plan inspectable (the default pins
        # the result via localCheckpoint, which hides the scan node)
        q = query_ann_index(one_query, "annix_plan", k=3, nprobe=1, pin=False)
        plan = q._sc._jvm.PythonSQLUtils.explainString(
            q._jdf.queryExecution(), "formatted"
        )
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        drop_ann_index(spark, "annix_plan")


def test_codes_col_path_equals_inline(spark):
    """An index built and probed from a stored int8 code column (the
    production path — the float column never leaves the lake) equals
    the inline-quantizing build."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 150)
    queries = emb.filter(F.col("vec_id").between(150, 169))
    qcorpus = corpus.select(
        "vec_id", quantize_int8(F.col("embedding"))["q"].alias("q8")
    )
    qqueries = queries.select(
        "vec_id", quantize_int8(F.col("embedding"))["q"].alias("q8")
    )
    drop_ann_index(spark, "annix_inline")
    drop_ann_index(spark, "annix_codes")
    build_ann_index(corpus, "annix_inline", n_centroids=8, n_buckets=4)
    build_ann_index(
        qcorpus, "annix_codes", n_centroids=8, n_buckets=4, codes_col="q8"
    )
    try:
        got = query_ann_index(
            qqueries, "annix_codes", k=3, nprobe=2, codes_col="q8"
        )
        want = query_ann_index(queries, "annix_inline", k=3, nprobe=2)
        assert _rows(got) == _rows(want)
    finally:
        drop_ann_index(spark, "annix_inline")
        drop_ann_index(spark, "annix_codes")


def test_stream_writer_exactly_once(spark, tmp_path):
    """Two file-stream epochs merge into a seed-built index; probing
    equals the one-shot scorer on the concatenation; replaying the
    same files through a FRESH checkpoint re-fires the same epoch
    ids, which the commit protocol skips — no double counting."""
    from dw_etl_spark.streaming.sinks import ann_index_stream_writer

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 100)
    waves = [
        emb.filter(F.col("vec_id").between(100, 124)),
        emb.filter(F.col("vec_id").between(125, 149)),
    ]
    queries = emb.filter(F.col("vec_id").between(150, 169))
    drop_ann_index(spark, "annix_stream")
    build_ann_index(seed, "annix_stream", n_centroids=8, n_buckets=4)
    try:
        src = tmp_path / "vecs"
        src.mkdir()
        for i, w in enumerate(waves):
            rows = [
                json.dumps(
                    {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                )
                for r in w.collect()
            ]
            (src / f"wave{i}.json").write_text("\n".join(rows))

        def run(ckpt: str) -> None:
            stream = (
                spark.readStream.schema("vec_id long, embedding array<float>")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            q = ann_index_stream_writer(stream, "annix_stream", ckpt)
            q.awaitTermination()

        run(str(tmp_path / "ckpt1"))
        got = _rows(query_ann_index(queries, "annix_stream", k=3, nprobe=2))
        want = int8_ivf_topk(
            queries,
            seed.unionByName(waves[0]).unionByName(waves[1]),
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_stream"),
        )
        assert got == _rows(want)
        run(str(tmp_path / "ckpt2"))
        assert _rows(query_ann_index(queries, "annix_stream", k=3, nprobe=2)) == got
    finally:
        drop_ann_index(spark, "annix_stream")


def test_refit_crash_before_version_flip_is_invisible(spark, monkeypatch):
    """r12 (VERDICT r11 'what's wrong' #1): a refit that dies anywhere
    before the single-table ``_meta`` version flip leaves probes
    OLD-consistent — old centroids paired with old code tags, never a
    mixed pair — and a retry completes cleanly without duplicating
    the crashed attempt's staged rows."""
    import dw_etl_spark.operators.ann_index as ai

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 80)
    wave = emb.filter(F.col("vec_id").between(80, 159))
    queries = emb.filter(F.col("vec_id").between(160, 179))
    drop_ann_index(spark, "annix_rcrash")
    build_ann_index(seed, "annix_rcrash", n_centroids=4, n_buckets=4)
    try:
        merge_into_ann_index(wave, "annix_rcrash", batch_id="w1")
        before_rows = _rows(query_ann_index(queries, "annix_rcrash", k=3, nprobe=2))
        before_cents = ann_index_centroids(spark, "annix_rcrash")

        def boom(*a, **kw):
            raise RuntimeError("crash before the meta flip")

        monkeypatch.setattr(ai, "_commit_meta", boom)
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            refit_ann_index(spark, "annix_rcrash", n_centroids=8)
        # everything the crashed attempt staged is invisible
        assert ann_index_centroids(spark, "annix_rcrash") == before_cents
        assert (
            _rows(query_ann_index(queries, "annix_rcrash", k=3, nprobe=2))
            == before_rows
        )
        # a committed batch replay is STILL a no-op mid-disaster
        assert merge_into_ann_index(wave, "annix_rcrash", batch_id="w1") is False

        monkeypatch.undo()
        n_cents, n_rows = refit_ann_index(spark, "annix_rcrash", n_centroids=8)
        assert (n_cents, n_rows) == (8, seed.count() + wave.count())
        # compaction dropped the crashed attempt's orphan rows for good
        assert spark.table("annix_rcrash_codes").count() == n_rows
        assert spark.table("annix_rcrash_centroids").count() == 8
        want = int8_ivf_topk(
            queries,
            seed.unionByName(wave),
            DIM,
            k=3,
            nprobe=2,
            centroids=ann_index_centroids(spark, "annix_rcrash"),
        )
        got = query_ann_index(queries, "annix_rcrash", k=3, nprobe=2)
        assert _rows(got) == _rows(want)
        # replay carried forward across the refit epoch — still a no-op
        assert merge_into_ann_index(wave, "annix_rcrash", batch_id="w1") is False
    finally:
        drop_ann_index(spark, "annix_rcrash")


def test_refit_crash_inside_meta_rename_rolls_forward(spark, monkeypatch):
    """A crash BETWEEN the meta swap's two renames (live gone, staged
    present) is the worst window — ``_read_meta``'s recovery sweep
    rolls the flip forward (every new-version row was already durable)
    and the next probe sees NEW-consistent state."""
    import dw_etl_spark.operators.ann_index as ai

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 80)
    wave = emb.filter(F.col("vec_id").between(80, 159))
    queries = emb.filter(F.col("vec_id").between(160, 179))
    drop_ann_index(spark, "annix_mcrash")
    build_ann_index(seed, "annix_mcrash", n_centroids=4, n_buckets=4)
    try:
        merge_into_ann_index(wave, "annix_mcrash", batch_id="w1")

        def partial_flip(spark_, name_, n_buckets_, version_):
            staged = f"{name_}_meta__stage"
            backup = f"{name_}_meta__old"
            spark_.sql(f"DROP TABLE IF EXISTS {staged}")
            spark_.sql(f"DROP TABLE IF EXISTS {backup}")
            spark_.createDataFrame(
                [(int(n_buckets_), int(version_))],
                "n_buckets int, version int",
            ).write.saveAsTable(staged)
            spark_.sql(f"ALTER TABLE {name_}_meta RENAME TO {backup}")
            raise RuntimeError("crash inside the meta flip")

        monkeypatch.setattr(ai, "_commit_meta", partial_flip)
        import pytest as _pytest

        with _pytest.raises(RuntimeError):
            refit_ann_index(spark, "annix_mcrash", n_centroids=8)
        monkeypatch.undo()
        # recovery (inside any reader) completes the flip: probes are
        # new-consistent — retrained centroids over seed+wave
        cents = ann_index_centroids(spark, "annix_mcrash")
        assert len(cents) == 8
        got = query_ann_index(queries, "annix_mcrash", k=3, nprobe=2)
        want = int8_ivf_topk(
            queries, seed.unionByName(wave), DIM, k=3, nprobe=2, centroids=cents
        )
        assert _rows(got) == _rows(want)
    finally:
        drop_ann_index(spark, "annix_mcrash")


def test_reader_handle_caches_and_tracks_refit(spark):
    """``AnnIndexReader`` caches the centroid collect keyed by the
    committed version: cached probes equal direct probes, and a refit
    (version bump) invalidates the cache automatically — stale
    centroids can never pair with new codes."""
    from dw_etl_spark.operators.ann_index import AnnIndexReader

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 100)
    wave = emb.filter(F.col("vec_id").between(100, 149))
    queries = emb.filter(F.col("vec_id").between(150, 169))
    drop_ann_index(spark, "annix_reader")
    build_ann_index(seed, "annix_reader", n_centroids=8, n_buckets=4)
    try:
        reader = AnnIndexReader(spark, "annix_reader")
        direct = _rows(query_ann_index(queries, "annix_reader", k=3, nprobe=2))
        assert _rows(reader.query(queries, k=3, nprobe=2)) == direct
        v0 = reader._cached[0]
        # merge does not move centroids: cache stays valid, results move
        merge_into_ann_index(wave, "annix_reader", batch_id="w1")
        merged = _rows(reader.query(queries, k=3, nprobe=2))
        assert reader._cached[0] == v0
        assert merged == _rows(
            query_ann_index(queries, "annix_reader", k=3, nprobe=2)
        )
        # refit bumps the version: the handle reloads, never serves stale
        refit_ann_index(spark, "annix_reader")
        refitted = _rows(reader.query(queries, k=3, nprobe=2))
        assert reader._cached[0] > v0
        assert refitted == _rows(
            query_ann_index(queries, "annix_reader", k=3, nprobe=2)
        )
    finally:
        drop_ann_index(spark, "annix_reader")


def test_index_recall_vs_float_ivf_baseline(spark):
    """Recall harness pin (VERDICT r11 next #7): the lifecycle index
    (seed build → merge → refit) probed at nprobe=half-the-lists must
    recover at least 90% of the FLOAT IVF baseline's agreement with
    exact cosine — quantization plus the frozen-then-refit lifecycle
    may cost a little recall, but not a cliff."""
    from dw_etl_spark.operators.similarity import ann_recall, cosine_topk, ivf_topk

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 100)
    wave = emb.filter(F.col("vec_id").between(100, 199))
    corpus = seed.unionByName(wave)
    queries = emb.filter(F.col("vec_id").between(200, 219))
    drop_ann_index(spark, "annix_recall")
    build_ann_index(seed, "annix_recall", n_centroids=8, n_buckets=8)
    try:
        merge_into_ann_index(wave, "annix_recall", batch_id="w1")
        refit_ann_index(spark, "annix_recall")
        exact = cosine_topk(queries, corpus, k=5)
        idx = query_ann_index(queries, "annix_recall", k=5, nprobe=4)
        base = ivf_topk(queries, corpus, DIM, k=5, n_centroids=8, nprobe=4)

        def mean_recall(approx):
            rows = ann_recall(approx, exact).agg(
                F.avg("recall").alias("r")
            ).collect()
            return float(rows[0]["r"])

        r_idx, r_base = mean_recall(idx), mean_recall(base)
        assert r_idx >= 0.9 * r_base, (r_idx, r_base)
        assert r_idx > 0.3, r_idx  # absolute floor: probes find real neighbors
    finally:
        drop_ann_index(spark, "annix_recall")


@pytest.mark.parametrize(
    "point", ["post_codes", "post_centroids", "pre_compact"]
)
def test_refit_crash_matrix(spark, monkeypatch, point):
    """Kill refit at each remaining protocol step (the two pivotal
    windows have dedicated tests above): after the codes append,
    after the centroids append, and after the commit but before
    compaction. Before the ``_meta`` flip probes must be
    OLD-consistent; after it, NEW-consistent; a retry/subsequent
    refit always converges to the clean compacted state — the
    attempt-unique version (max over staged epochs + 1) is what keeps
    a retry from colliding with the crashed attempt's orphan rows."""
    import dw_etl_spark.operators.ann_index as ai

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 80)
    wave = emb.filter(F.col("vec_id").between(80, 159))
    queries = emb.filter(F.col("vec_id").between(160, 179))
    name = f"annix_cm_{point}"
    drop_ann_index(spark, name)
    build_ann_index(seed, name, n_centroids=4, n_buckets=4)
    try:
        merge_into_ann_index(wave, name, batch_id="w1")
        before = _rows(query_ann_index(queries, name, k=3, nprobe=2))
        before_cents = ann_index_centroids(spark, name)

        real_write_codes = ai._write_codes

        def codes_then_crash(*a, **kw):
            real_write_codes(*a, **kw)
            raise RuntimeError("crash after codes append")

        def crash(*a, **kw):
            raise RuntimeError(f"crash at {point}")

        target, fn = {
            "post_codes": ("_write_codes", codes_then_crash),
            "post_centroids": ("_log_frame", crash),
            "pre_compact": ("_compact_after_refit", crash),
        }[point]
        monkeypatch.setattr(ai, target, fn)
        with pytest.raises(RuntimeError):
            refit_ann_index(spark, name, n_centroids=8)
        monkeypatch.undo()

        got = _rows(query_ann_index(queries, name, k=3, nprobe=2))
        cents = ann_index_centroids(spark, name)
        if point == "pre_compact":
            # the meta flip committed: new-consistent (retrained
            # centroids), orphan old rows still on disk but invisible
            assert len(cents) == 8
            want = int8_ivf_topk(
                queries, seed.unionByName(wave), DIM, k=3, nprobe=2,
                centroids=cents,
            )
            assert got == _rows(want)
            n_total = seed.count() + wave.count()
            assert spark.table(f"{name}_codes").count() > n_total
        else:
            # flip never happened: old-consistent, staged rows invisible
            assert cents == before_cents
            assert got == before

        # a subsequent clean refit converges regardless of crash point
        n_cents, n_rows = refit_ann_index(spark, name, n_centroids=8)
        assert (n_cents, n_rows) == (8, seed.count() + wave.count())
        assert spark.table(f"{name}_codes").count() == n_rows
        assert spark.table(f"{name}_centroids").count() == 8
        want = int8_ivf_topk(
            queries, seed.unionByName(wave), DIM, k=3, nprobe=2,
            centroids=ann_index_centroids(spark, name),
        )
        assert _rows(query_ann_index(queries, name, k=3, nprobe=2)) == _rows(want)
    finally:
        drop_ann_index(spark, name)


def test_merge_racing_refit_is_hidden_then_reapplies(spark, monkeypatch):
    """A merge that commits its log row AFTER refit snapshotted the
    corpus but BEFORE the version flip lands at the OLD version: the
    flip hides it (probes are new-consistent, never a mix), the
    module reports it uncommitted under the new epoch, and a replay
    re-applies it cleanly under the NEW centroids — the documented
    single-writer-violation worst case is losing visibility until
    replay, never serving mixed-version results."""
    import dw_etl_spark.operators.ann_index as ai

    emb = _emb(spark)
    seed = emb.filter(F.col("vec_id") < 80)
    racer = emb.filter(F.col("vec_id").between(80, 119))
    queries = emb.filter(F.col("vec_id").between(160, 179))
    name = "annix_race"
    drop_ann_index(spark, name)
    build_ann_index(seed, name, n_centroids=4, n_buckets=4)
    try:
        real_commit = ai._commit_meta

        def merge_then_commit(spark_, name_, n_buckets_, version_):
            # the racing merge: assigned + committed under the OLD
            # centroids/version, a moment before the flip. Patch out
            # first: merge_into_ann_index must not recurse into this.
            monkeypatch.setattr(ai, "_commit_meta", real_commit)
            assert merge_into_ann_index(racer, name, batch_id="raced") is True
            real_commit(spark_, name_, n_buckets_, version_)

        monkeypatch.setattr(ai, "_commit_meta", merge_then_commit)
        refit_ann_index(spark, name, n_centroids=8)

        # new-consistent: probes equal the one-shot over the SNAPSHOT
        # corpus (seed only) — the raced batch is hidden, not mixed in
        cents = ann_index_centroids(spark, name)
        got = _rows(query_ann_index(queries, name, k=3, nprobe=2))
        want = int8_ivf_topk(queries, seed, DIM, k=3, nprobe=2, centroids=cents)
        assert got == _rows(want)

        # replay re-applies under the new epoch and becomes visible
        assert merge_into_ann_index(racer, name, batch_id="raced") is True
        got2 = _rows(query_ann_index(queries, name, k=3, nprobe=2))
        want2 = int8_ivf_topk(
            queries, seed.unionByName(racer), DIM, k=3, nprobe=2,
            centroids=ann_index_centroids(spark, name),
        )
        assert got2 == _rows(want2)
    finally:
        drop_ann_index(spark, name)
