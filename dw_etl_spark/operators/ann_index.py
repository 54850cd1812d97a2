"""Persisted incremental int8-IVF ANN index: build once, probe many.

``int8_ivf_topk`` re-quantizes, re-assigns, and re-shuffles the WHOLE
corpus every call — right for a one-shot near-dup/retrieval sweep,
wrong for the standing similarity service a training pipeline runs
("given any new eval/seed batch, which corpus vectors are closest?")
against a growing 100 TB embedding lake. This module freezes the
quantized-IVF state into a persisted, bucketed catalog table set — the
embedding-side completion of the neardup/BM25 incremental-index story:

  build_ann_index   — one pass over the seed corpus: quantize to int8
                      codes (absmax — direction-preserving, so cosine
                      needs no scale column), train the deterministic
                      md5-sample centroids IN CODE SPACE, assign every
                      code its top-1 centroid, and write the codes
                      bucketed on ``cid`` plus tiny centroid/meta/log
                      tables.
  query_ann_index   — probe a NEW batch: only the batch is quantized
                      and routed; its nprobe centroid ids become an
                      ``isin`` literal on the codes scan, so BUCKET
                      PRUNING skips every file holding no probed
                      cluster — scan work scales with nprobe/n_lists
                      of the corpus, not the corpus.
  merge_into_ann_index — quantize + assign a new batch against the
                      STORED centroids and append under the bucket
                      spec: the index grows without rewriting history,
                      and tomorrow's probes see today's vectors.
  refit_ann_index   — after the corpus has grown/drifted, retrain the
                      centroids over ALL committed codes and reassign
                      (append-only staging + a one-table version flip;
                      see below); also collapses the merge log's
                      physical tags and drops crashed-merge orphans.

Merge commit protocol (two append-only tables can't be updated in one
transaction, so visibility is the transaction — the exact
``bm25_index`` design): every appended code row carries an
attempt-scoped ``batch_tag``; the one-row ``_log`` append — written
LAST — is the COMMIT MARKER, and queries read only rows whose tag the
log names. A crash mid-merge leaves orphan code rows no query ever
sees (refit drops them for good); re-running a committed ``batch_id``
is a no-op — exactly-once per batch id on plain parquet tables.

Refit commit protocol (r12 — closes the r11 two-table-swap race): a
refit retrains centroids AND reassigns every code's ``cid``, so codes
and centroids must flip TOGETHER — a probe pairing new-centroid codes
with old centroids (or vice versa) routes queries into the wrong
inverted lists and silently loses recall. The same marker discipline
fixes it: ``_centroids`` and ``_log`` rows carry a ``version`` column,
``_meta`` names the one committed ``(n_buckets, version)`` pair, and
refit is append-only until a single-table ``_meta`` swap — written
LAST — flips the version. Readers resolve ``_meta`` FIRST and filter
both ``_centroids`` and ``_log`` (hence the visible code tags) to that
version, so every probe sees old-consistent or new-consistent state,
never mixed.

Concurrency/recovery split (r13 — the shared ``_commit_protocol``):

  - READERS never mutate: a crashed swap is resolved by READING the
    surviving side (``read_table_any`` — live, else the fully-written
    ``__stage``, else ``__old``), so a reader in another process can
    never drop a healthy in-flight refit's staged tables. Each probe
    holds the index's in-process lock across ALL its eager reads
    (meta → centroids → routing → visible tags), eagerly PINS its
    result (``localCheckpoint``) so post-probe compaction cannot
    hollow out the lazy plan, then re-verifies the committed version
    and retries if a cross-process flip landed mid-read — a probe
    returns a consistent snapshot or retries, never a silent empty.
  - WRITERS (build/merge/refit) take the in-process lock PLUS an
    on-disk ``writer_lease`` (create-exclusive pid/host marker,
    stale-takeover, fail-loud on contention), then run the mutating
    recovery sweep over all four tables — the cross-process
    single-writer contract is ENFORCED, not documented (the r12
    harness collision, two pytest sessions compacting one
    spark-warehouse, is exactly the failure the lease rejects).

Equality contract (pytest-pinned): probing the index — seed-built or
seed+merge — returns exactly what ``int8_ivf_topk`` returns over the
concatenated corpus with ``centroids=ann_index_centroids(...)``: same
absmax codes, same code-space routing, same BIGINT-exact
``int8_cosine``, same round-to-6-then-(score DESC, id ASC) ranking.

Centroid staleness is the designed trade: merged batches route through
the SEED-trained centroids (exactly like every published IVF system —
FAISS adds to a frozen coarse quantizer), so recall degrades only as
far as the data distribution drifts from the seed sample, and
``refit_ann_index`` is the periodic repair. The alternative — moving
centroids on every merge — would silently re-route HISTORY (old codes
assigned under old centroids) and break the equality contract.

Ids must be disjoint across build/merge batches (the module never
dedups — same contract as the neardup and BM25 indexes).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dw_etl_spark.operators._commit_protocol import (
    ConcurrentWriterError,
    check_name as _check_name,
    drop_catalog_tables,
    index_lock as _index_lock,
    index_writer,
    read_table_any,
    recover_table_swap,
    refresh_tables,
)
from dw_etl_spark.operators.similarity import (
    _centroid_frame,
    _codes_as_double,
    _ranked_centroids,
    int8_cosine,
    ivf_centroids,
    quantize_int8,
)

TABLE_SUFFIXES = ("_codes", "_centroids", "_log", "_meta")
# transient rename-aside names a crashed swap can leave behind
_SWAP_SUFFIXES = tuple(
    f"{s}{t}" for s in TABLE_SUFFIXES for t in ("__stage", "__old")
)


def _refresh(spark: SparkSession, name: str) -> None:
    refresh_tables(spark, name, TABLE_SUFFIXES)


def _recover_index(spark: SparkSession, name: str) -> None:
    """Writer-side recovery sweep over ALL FOUR tables (r13 — the r12
    sweep only repaired ``_meta``, so a crash between a compaction
    swap's two renames left ``_codes``/``_centroids``/``_log``
    unresolvable until manual repair). Meta first: it decides the
    committed version the data tables are filtered to; each data-table
    swap is content-equivalent on both sides under that filter, so
    roll-forward vs roll-back there never changes visible rows. Only
    callers holding the writer lease may run this — it mutates catalog
    state."""
    for suffix in ("_meta",) + tuple(s for s in TABLE_SUFFIXES if s != "_meta"):
        recover_table_swap(spark, f"{name}{suffix}")


def _read_meta(spark: SparkSession, name: str) -> tuple[int, int]:
    """The committed ``(n_buckets, version)`` pair — the single source
    of truth every reader resolves FIRST. NON-MUTATING (r13): a
    crashed ``_meta`` swap is resolved by reading the surviving side —
    live, else the fully-written ``__stage`` (the roll-forward view:
    every new-version row is durable before the flip's first rename),
    else ``__old`` (roll-back). Physical repair is the next leased
    writer's job (``_recover_index``)."""
    row = read_table_any(spark, f"{name}_meta").collect()[0]
    return int(row["n_buckets"]), int(row["version"])


def _codes_frame(
    df: DataFrame, vec_col: str, id_col: str, codes_col: str | None
) -> DataFrame:
    """(id, q): int8 code arrays, quantizing inline unless the caller
    already stores codes (``codes_col`` — the production path: the
    float column never leaves the lake)."""
    q = F.col(codes_col) if codes_col else quantize_int8(F.col(vec_col))["q"]
    return df.select(F.col(id_col).alias("id"), q.alias("q"))


def _assign(codes: DataFrame, cents_df: DataFrame) -> DataFrame:
    """(id, q, cid): each code routed to its top-1 code-space centroid
    via the broadcast one-row centroid frame — the identical ranking
    rule ``int8_ivf_topk`` applies, which is what keeps the equality
    contract exact."""
    return codes.crossJoin(F.broadcast(cents_df)).select(
        "id",
        "q",
        F.element_at(
            _ranked_centroids(_codes_as_double(F.col("q")), F.col("__cents")), 1
        )["cid"].alias("cid"),
    )


def _write_codes(assigned: DataFrame, name: str, n_buckets: int, tag: str,
                 mode: str, table: str | None = None) -> None:
    # repartition to the bucket spec BEFORE the bucketed write so each
    # increment lands as one file per touched bucket, not tasks×buckets
    # shards (the bm25 _append_increment rule)
    (
        assigned.withColumn("batch_tag", F.lit(tag))
        .repartition(n_buckets, "cid")
        .write.mode(mode)
        .bucketBy(n_buckets, "cid")
        .saveAsTable(table or f"{name}_codes")
    )


def _log_frame(spark: SparkSession, rows: list[tuple[str, str, int, int]]):
    return spark.createDataFrame(
        [(b, t, int(n), int(v)) for b, t, n, v in rows],
        "batch_id string, batch_tag string, n_rows long, version int",
    )


def _centroid_rows(cents, version: int) -> list[tuple]:
    return [
        (int(cid), [float(x) for x in vec], float(norm), int(version))
        for cid, vec, norm in cents
    ]


_CENTROID_SCHEMA = "cid int, vec array<double>, norm double, version int"


def build_ann_index(
    corpus: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_buckets: int = 8,
    codes_col: str | None = None,
) -> None:
    """Materialize ``{name}_codes`` / ``{name}_centroids`` /
    ``{name}_log`` / ``{name}_meta`` from the seed corpus. Centroids
    are the deterministic md5-rank sample (``ivf_centroids``) over the
    CODE arrays — no RNG, so a rebuild from the same corpus is
    bit-identical and the DuckDB oracle can replay it. ``_meta`` —
    the commit marker naming version 0 — is written LAST: until it
    exists, the index does not. Holds the writer lock+lease (a build
    racing another writer on the same physical name is rejected loud).

    Scale shape: one quantization pass (pinned via lazy
    localCheckpoint so centroid training and assignment share the
    materialized codes), one k-row ordered-limit collect, one
    bucket-spec shuffle for the write. ``n_buckets`` is the standing
    parallelism/pruning knob — size it to the corpus, not the batch
    (buckets hold whole inverted lists; nprobe pruning reads
    ~nprobe/n_centroids of the files when n_buckets == n_centroids)."""
    _check_name(name)
    spark = corpus.sparkSession
    with index_writer(spark, name):
        codes = _codes_frame(corpus, vec_col, id_col, codes_col).localCheckpoint(
            eager=False
        )
        cents = ivf_centroids(
            codes.select("id", _codes_as_double(F.col("q")).alias("__cv")),
            "__cv",
            "id",
            n_centroids,
        )
        tag = "seed@0"
        _write_codes(
            _assign(codes, _centroid_frame(spark, cents)), name, n_buckets, tag,
            mode="overwrite",
        )
        spark.createDataFrame(
            _centroid_rows(cents, 0), _CENTROID_SCHEMA
        ).write.mode("overwrite").saveAsTable(f"{name}_centroids")
        _log_frame(spark, [("seed", tag, codes.count(), 0)]).write.mode(
            "overwrite"
        ).saveAsTable(f"{name}_log")
        spark.createDataFrame(
            [(int(n_buckets), 0)], "n_buckets int, version int"
        ).write.mode("overwrite").saveAsTable(f"{name}_meta")


def drop_ann_index(spark: SparkSession, name: str) -> None:
    """Drop the four index tables (managed — data included) plus any
    transient swap leftovers and the writer lease, sweeping stale
    directories a dead session left behind."""
    drop_catalog_tables(spark, name, TABLE_SUFFIXES + _SWAP_SUFFIXES)


def _stored_centroids(
    spark: SparkSession, name: str, version: int
) -> list[tuple[int, list[float], float]]:
    return [
        (int(r["cid"]), [float(x) for x in r["vec"]], float(r["norm"]))
        for r in read_table_any(spark, f"{name}_centroids")
        .filter(F.col("version") == version)
        .orderBy("cid")
        .collect()
    ]


def ann_index_centroids(
    spark: SparkSession, name: str
) -> list[tuple[int, list[float], float]]:
    """The committed centroid set in ``ivf_centroids``' [(cid, vec,
    norm)] form — pass to ``int8_ivf_topk(centroids=...)`` to
    reproduce index results from raw frames (the equality-contract
    accessor). Meta and centroids are read under the index lock so an
    in-process refit cannot flip between the two reads."""
    _check_name(name)
    with _index_lock(name):
        _refresh(spark, name)
        _, version = _read_meta(spark, name)
        return _stored_centroids(spark, name, version)


def _committed_log(spark: SparkSession, name: str, version: int):
    """[(batch_id, batch_tag)] committed at ``version`` — the visible
    world. Bounded collect: one row per committed batch."""
    return [
        (r["batch_id"], r["batch_tag"])
        for r in read_table_any(spark, f"{name}_log")
        .filter(F.col("version") == version)
        .select("batch_id", "batch_tag")
        .collect()
    ]


class AnnIndexReader:
    """Probe handle for a standing similarity service: caches the
    stored centroid set keyed by the index's committed version, so
    repeat ``query()`` calls skip the per-call centroid collect.
    The version IS the cache key — a refit bumps it, the stale entry
    misses, and the new centroids load on the next probe; no way to
    pair cached old centroids with new codes."""

    def __init__(self, spark: SparkSession, name: str) -> None:
        _check_name(name)
        self.spark, self.name = spark, name
        self._cached: tuple[int, list] | None = None

    def centroids(self, version: int) -> list[tuple[int, list[float], float]]:
        if self._cached is None or self._cached[0] != version:
            self._cached = (
                version,
                _stored_centroids(self.spark, self.name, version),
            )
        return self._cached[1]

    def query(self, queries: DataFrame, **kwargs) -> DataFrame:
        return query_ann_index(queries, self.name, _reader=self, **kwargs)


def query_ann_index(
    queries: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
    codes_col: str | None = None,
    pin: bool = True,
    _reader: AnnIndexReader | None = None,
    _max_attempts: int = 3,
) -> DataFrame:
    """(query_id, neighbor_id, cos_sim): top-k indexed neighbors of
    each query row under quantized cosine, probing ``nprobe`` inverted
    lists per query.

    Plan shape: only the batch is quantized/routed (pinned with a lazy
    localCheckpoint so routing and scoring share one quantization);
    the union of probed cids — at most n_centroids ints — becomes an
    ``isin`` literal on the codes scan, so bucket pruning skips every
    unprobed file (``SelectedBucketsCount`` plan-asserted in tests);
    the probe side is broadcast onto the pruned lists. Work scales
    with the batch and the probed fraction, never the history.

    Consistency (r13 — closes the reader-vs-refit race): the whole
    eager read sequence (meta → centroids → routing collect → visible
    tags) runs under the index's in-process lock, so an in-process
    refit can never flip mid-probe; the k×|batch| result is then
    eagerly PINNED (``localCheckpoint``) so a post-probe compaction
    cannot hollow out the lazy scan; finally the committed version is
    re-read — if a CROSS-process flip landed mid-read the attempt is
    discarded and retried (``_max_attempts``, then fail-loud). Pass
    ``pin=False`` to keep the lazy plan (for ``.explain`` inspection /
    further composition); an unpinned result must be consumed before a
    subsequent refit's compaction rewrites the codes table."""
    _check_name(name)
    spark = queries.sparkSession
    last_err: Exception | None = None
    for _ in range(_max_attempts):
        try:
            with _index_lock(name):
                _refresh(spark, name)
                _, version = _read_meta(spark, name)
                result = _probe_at_version(
                    spark, queries, name, vec_col, id_col, k, nprobe,
                    codes_col, version, _reader,
                )
                if pin:
                    result = result.localCheckpoint(eager=True)
                # re-verify: did a cross-process refit flip mid-read?
                _refresh(spark, name)
                _, v_after = _read_meta(spark, name)
            if v_after == version:
                return result
            last_err = ConcurrentWriterError(
                f"index {name} version flipped {version}->{v_after} "
                "during the probe"
            )
        except ConcurrentWriterError as e:  # pragma: no cover - defensive
            last_err = e
        except Exception as e:
            # a cross-process compaction swapping tables mid-collect
            # surfaces as missing-table/missing-file — ONLY those retry
            # (resolving against the new committed state); genuine
            # failures (index never built AND no swap in flight, wrong
            # column, analysis errors) re-raise immediately instead of
            # paying three refresh+collect+probe rounds (r14, ADVICE)
            if not _is_transient_probe_error(e):
                raise
            last_err = e
    raise last_err


def _is_transient_probe_error(e: Exception) -> bool:
    """True iff the failure is the kind a concurrent refit/compaction
    swap produces mid-probe: a table or its files vanishing between
    plan and collect. Everything else — analysis errors on columns,
    schema mismatches, arithmetic — is deterministic and must surface
    on the first attempt."""
    markers = (
        "TABLE_OR_VIEW_NOT_FOUND",
        "FileNotFoundException",
        "PATH_NOT_FOUND",
        "FILE_NOT_FOUND",
        "LOCATION_ALREADY_EXISTS",  # stage dir of a racing writer
        "does not exist",  # Hadoop FS listing of a swapped-away dir
    )
    text = str(e)
    return any(m in text for m in markers)


def _probe_at_version(
    spark: SparkSession,
    queries: DataFrame,
    name: str,
    vec_col: str,
    id_col: str,
    k: int,
    nprobe: int,
    codes_col: str | None,
    version: int,
    _reader: AnnIndexReader | None,
) -> DataFrame:
    qcodes = _codes_frame(queries, vec_col, id_col, codes_col).localCheckpoint(
        eager=False
    )
    cents = (
        _reader.centroids(version)
        if _reader is not None
        else _stored_centroids(spark, name, version)
    )
    cents_df = _centroid_frame(spark, cents)
    routed = qcodes.crossJoin(F.broadcast(cents_df)).select(
        F.col("id").alias("query_id"),
        F.col("q").alias("qq"),
        F.explode(
            F.transform(
                F.slice(
                    _ranked_centroids(_codes_as_double(F.col("q")), F.col("__cents")),
                    1,
                    nprobe,
                ),
                lambda s: s["cid"],
            )
        ).alias("cid"),
    ).localCheckpoint(eager=False)
    # bounded collect: ≤ n_centroids ints — the pruning literal
    probed = [int(r["cid"]) for r in routed.select("cid").distinct().collect()]
    tags = [t for _, t in _committed_log(spark, name, version)]
    lists = (
        read_table_any(spark, f"{name}_codes")
        .filter(F.col("cid").isin(probed))
        .filter(F.col("batch_tag").isin(tags))
        .select(F.col("id").alias("neighbor_id"), F.col("q").alias("cq"), "cid")
    )
    scored = (
        lists.join(F.broadcast(routed), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(int8_cosine(F.col("qq"), F.col("cq")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_into_ann_index(
    batch: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_id: str | None = None,
    codes_col: str | None = None,
) -> bool:
    """Append a batch: quantize, assign against the STORED centroids,
    write the code rows under the stored bucket spec, and LAST the
    one-row log increment that COMMITS the batch. Returns True if
    applied, False if ``batch_id`` was already committed (replay →
    no-op). Pass a stable ``batch_id`` (ingest date, crawl snapshot)
    for exactly-once across re-runs; the default auto-id is still
    crash-safe (orphans invisible) but can't recognize content.
    The log row carries the centroid version the batch was assigned
    under: if a refit commits concurrently, the flip hides this
    batch's rows (old version) and a replay re-applies it under the
    new centroids — never a mixed-version probe.

    Holds the writer lock+lease for the whole read-check-append
    sequence (r13): an in-process merge can no longer race a refit's
    post-commit compaction into appending to a table the instant
    before it is renamed aside, and a SECOND PROCESS attempting
    maintenance concurrently fails loud (``ConcurrentWriterError``)
    instead of interleaving."""
    _check_name(name)
    spark = batch.sparkSession
    with index_writer(spark, name):
        _recover_index(spark, name)
        _refresh(spark, name)
        n_buckets, version = _read_meta(spark, name)
        committed = [b for b, _ in _committed_log(spark, name, version)]
        if batch_id is None:
            batch_id = f"merge-{len(committed)}"
        if batch_id in committed:
            return False
        # attempt-scoped physical tag: a crashed earlier attempt of this
        # batch_id left rows under a DIFFERENT tag — never double-counted
        tag = f"{batch_id}@{uuid.uuid4().hex[:8]}"
        codes = _codes_frame(batch, vec_col, id_col, codes_col).localCheckpoint(
            eager=False
        )
        assigned = _assign(
            codes, _centroid_frame(spark, _stored_centroids(spark, name, version))
        )
        _write_codes(assigned, name, n_buckets, tag, mode="append")
        _log_frame(spark, [(batch_id, tag, codes.count(), version)]).write.mode(
            "append"
        ).saveAsTable(f"{name}_log")
    return True


def _swap_in(spark: SparkSession, table: str, write) -> None:
    """Rename-aside swap: stage → live (the shared
    ``_commit_protocol.swap_in``). A crash at any point is resolved by
    the next leased writer's ``_recover_index`` sweep (all four
    tables), and readers resolve the surviving side without mutating
    (``read_table_any``)."""
    from dw_etl_spark.operators._commit_protocol import swap_in

    swap_in(spark, table, write)


def _commit_meta(spark: SparkSession, name: str, n_buckets: int,
                 version: int) -> None:
    """THE refit commit point: one single-table swap flips the
    committed version. Everything staged before it is invisible;
    everything after it (compaction) is content-equivalent cleanup."""
    _swap_in(
        spark,
        f"{name}_meta",
        lambda t: spark.createDataFrame(
            [(int(n_buckets), int(version))], "n_buckets int, version int"
        ).write.saveAsTable(t),
    )


def _compact_after_refit(spark: SparkSession, name: str, n_buckets: int,
                         tag: str, version: int) -> None:
    """Post-commit cleanup: physically drop superseded-version rows
    (old centroids/log epochs, pre-refit code tags, crashed-merge
    orphans). Both sides of each swap are content-equivalent under
    the committed version's filters, so a crash anywhere here —
    including BETWEEN a swap's two renames — leaves a correct index:
    readers resolve the surviving side (``read_table_any``) and the
    next leased writer's ``_recover_index`` repairs the catalog."""
    _refresh(spark, name)
    keep_codes = spark.table(f"{name}_codes").filter(
        F.col("batch_tag") == tag
    ).select("id", "q", "cid")
    _swap_in(
        spark,
        f"{name}_codes",
        lambda t: _write_codes(keep_codes, name, n_buckets, tag, "overwrite",
                               table=t),
    )
    keep_cents = spark.table(f"{name}_centroids").filter(
        F.col("version") == version
    )
    _swap_in(
        spark,
        f"{name}_centroids",
        lambda t: keep_cents.write.saveAsTable(t),
    )
    keep_log = spark.table(f"{name}_log").filter(F.col("version") == version)
    _swap_in(spark, f"{name}_log", lambda t: keep_log.write.saveAsTable(t))


def refit_ann_index(
    spark: SparkSession, name: str, n_centroids: int | None = None
) -> tuple[int, int]:
    """Retrain the coarse quantizer over ALL committed codes and
    reassign every code row — the periodic repair for centroid
    staleness after many merges (and the only step that moves
    history). Append-only until the single-table ``_meta`` version
    flip (the commit marker — see module docstring), so probes see
    old-consistent state right up to the flip and new-consistent
    state after it, never a mixed codes/centroids pair; crashed-merge
    orphan rows and superseded epochs are physically dropped by the
    post-commit compaction. Committed batch_ids are carried forward
    into the new epoch, so a replayed batch stays a no-op across
    refits. Runs under the writer lock+lease; entry begins with the
    all-table recovery sweep, so a crashed predecessor (mid-flip OR
    mid-compaction-swap) is repaired before this refit reads anything.
    Returns (n_centroids, n_code_rows)."""
    _check_name(name)
    with index_writer(spark, name):
        _recover_index(spark, name)
        _refresh(spark, name)
        n_buckets, v_old = _read_meta(spark, name)
        # attempt-unique version: a CRASHED refit left orphan rows at
        # v_old+1 (invisible — meta never flipped); reusing that number
        # would duplicate (cid, version) rows, so skip past every
        # version any prior attempt staged (bounded collects: the
        # centroid and log tables are k-row/batch-row sized)
        staged_max = max(
            spark.table(f"{name}_centroids").agg(
                F.max("version").alias("m")).collect()[0]["m"] or 0,
            spark.table(f"{name}_log").agg(
                F.max("version").alias("m")).collect()[0]["m"] or 0,
        )
        v_new = max(v_old, staged_max) + 1
        old_log = [
            (r["batch_id"], int(r["n_rows"]))
            for r in spark.table(f"{name}_log")
            .filter(F.col("version") == v_old)
            .select("batch_id", "n_rows")
            .collect()
        ]
        tags_old = [t for _, t in _committed_log(spark, name, v_old)]
        if n_centroids is None:
            n_centroids = (
                spark.table(f"{name}_centroids")
                .filter(F.col("version") == v_old)
                .count()
            )
        committed = (
            spark.table(f"{name}_codes")
            .filter(F.col("batch_tag").isin(tags_old))
            .select("id", "q")
            .localCheckpoint(eager=False)
        )
        cents = ivf_centroids(
            committed.select("id", _codes_as_double(F.col("q")).alias("__cv")),
            "__cv",
            "id",
            n_centroids,
        )
        n_rows = committed.count()
        tag = f"refit@{v_new}-{uuid.uuid4().hex[:8]}"
        # --- append-only staging: nothing below is probe-visible ---
        _write_codes(
            _assign(committed, _centroid_frame(spark, cents)),
            name, n_buckets, tag, mode="append",
        )
        spark.createDataFrame(
            _centroid_rows(cents, v_new), _CENTROID_SCHEMA
        ).write.mode("append").saveAsTable(f"{name}_centroids")
        _log_frame(
            spark, [(bid, tag, n, v_new) for bid, n in old_log]
        ).write.mode("append").saveAsTable(f"{name}_log")
        # --- the commit: one-table version flip ---
        _commit_meta(spark, name, n_buckets, v_new)
        # --- post-commit cleanup (best-effort, crash-equivalent) ---
        _compact_after_refit(spark, name, n_buckets, tag, v_new)
    return len(cents), n_rows
