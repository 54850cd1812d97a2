"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al. 2023): score every
raw-corpus document by how much more likely its hashed n-gram features
are under a small TARGET corpus (the high-quality seed — wiki, books, a
curated eval-adjacent sample) than under the raw corpus itself, then
keep a quota by Gumbel top-k — importance resampling without
replacement. This is the standard pretraining-data recipe for "make
100 TB of crawl look like the target distribution" and slots between
quality filtering and dedup in the corpus pipeline.

Everything is deterministic and engine-portable (md5-derived hashing
and Gumbel noise, no RNG, no model), so the DuckDB oracle replays
weights AND selection exactly.

Scale shape: feature extraction is explode → pmod(hash) — one pass,
embarrassingly parallel. Each distribution is a ``buckets``-sized
aggregate (map-side combined); ``buckets`` is 1e2..1e5, so the
log-ratio table broadcasts to every executor and per-doc scoring is a
broadcast join + one groupBy(id) — a single doc-keyed shuffle for the
whole corpus. Selection is a corpus-wide top-``quota`` — implemented as
an orderBy-limit so Spark runs TakeOrdered (per-partition heaps + one
k-sized merge), never a global sort materialization.

Reference scope note: the reference ETL (mikolajkapica/dw-etl) has no
data-selection stage; this module is part of the training-data
extension surface alongside operators/text_dedup.py and sampling.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import (
    stable_hash64,
    tokens,
    tokens_of,
    word_ngrams,
)

#: 2^60 — stable_hash64 is 15 hex chars, so values lie in [0, 2^60).
_HASH_SPACE = float(1 << 60)


def _features_of(toks: F.Column, include_bigrams: bool) -> F.Column:
    """Unigram (+ word-bigram) feature strings from an ALREADY-BOUND
    token-array column. Bigrams are the paper's choice — unigrams alone
    can't tell 'new york times' prose from a bag of frequent words.
    NOT distinct: DSIR weights are over token occurrences (a doc that
    says 'the' 50 times should count it 50 times), unlike the
    shingle-set dedup operators.

    ``toks`` must be a plain column reference, not the tokenize
    expression inlined: it is referenced ~6 times here (and
    higher-order functions run interpreted, outside codegen CSE), so an
    inlined regex split re-runs per reference — and a
    transform+element_at formulation re-ran it per ELEMENT (measured
    8.4s vs 0.3s over the sf0.1 corpus; same trap word_ngrams
    documents, functions/text.py:170). Call sites project
    ``tokens(col).alias(...)`` first — the multi-reference alias stops
    CollapseProject from inlining the split back in."""
    if not include_bigrams:
        return toks
    # word_ngrams is distinct by design (dedup semantics); rebuild the
    # non-distinct bigram list inline via the shifted-slice zip
    m = F.size(toks) - 1
    bi = F.zip_with(
        F.slice(toks, 1, m),
        F.slice(toks, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(F.size(toks) < 2, toks).otherwise(F.concat(toks, bi))


def _features(text_col: str, include_bigrams: bool) -> F.Column:
    """``_features_of`` over the raw text column — single-expression
    convenience for tests/oracles; hot paths project the token array
    first (see ``_features_of``)."""
    return _features_of(tokens(text_col), include_bigrams)


def _smooth_dist(cells: DataFrame, buckets: int) -> DataFrame:
    """Laplace(0.5)-smoothed log distribution from (b, c) bucket
    counts: (b, log_p) for EVERY bucket 0..buckets-1, so log_p is
    finite for unseen buckets and log-ratios never hit ±inf. The
    output is ``buckets`` rows regardless of corpus size: broadcast
    it."""
    all_b = cells.sparkSession.range(buckets).select(F.col("id").alias("b"))
    tot = cells.agg(F.sum("c").alias("total"))
    return (
        all_b.join(cells, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 0.5)
                / (F.coalesce(F.col("total"), F.lit(0)) + 0.5 * buckets)
            ).alias("log_p"),
        )
    )


def _bucket_cells(
    df: DataFrame, text_col: str, buckets: int, include_bigrams: bool
) -> DataFrame:
    """(bucket, count) over a corpus: tokenize once per row (bound
    alias — see ``_features_of``; pretokenized array columns pass
    through), explode features, hash to buckets."""
    return (
        df.select(tokens_of(df, text_col).alias("__toks"))
        .select(F.explode(_features_of(F.col("__toks"), include_bigrams)).alias("feat"))
        .select(F.pmod(stable_hash64(F.col("feat")), F.lit(buckets)).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hashed_ngram_dist(
    df: DataFrame,
    text_col: str,
    buckets: int = 1024,
    include_bigrams: bool = True,
) -> DataFrame:
    """Smoothed hashed-feature distribution of a corpus:
    (bucket, log_p) for every bucket — ``_bucket_cells`` counts under
    ``_smooth_dist`` Laplace(0.5) smoothing."""
    return _smooth_dist(_bucket_cells(df, text_col, buckets, include_bigrams), buckets)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 1024,
    include_bigrams: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    (id, n_feats, log_weight) with
    log_weight = Σ over the doc's feature occurrences of
    (log p_target[bucket] − log p_raw[bucket]).

    Positive ⇒ the doc looks more like the target corpus than like the
    raw corpus. A doc with no tokens scores 0 (kept decision falls to
    the Gumbel noise alone). n_feats is the occurrence count (unigrams
    + bigrams = 2·tokens − 1), the length-normalization denominator for
    callers who want per-feature rates.

    The two distribution tables are ``buckets`` rows each — broadcast
    joins; the only corpus-wide shuffle is the groupBy(id). The raw
    corpus is tokenized/hashed ONCE: its distribution is the per-doc
    cell table re-aggregated by bucket (exchange reuse shares the
    underlying scan within the plan), so only the (small) target
    corpus pays a separate feature pass.
    """
    cells = (
        raw.select(
            F.col(id_col).alias("id"), tokens_of(raw, text_col).alias("__toks")
        )
        .select(
            "id",
            F.explode(_features_of(F.col("__toks"), include_bigrams)).alias("feat"),
        )
        .select("id", F.pmod(stable_hash64(F.col("feat")), F.lit(buckets)).alias("b"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    raw_dist = _smooth_dist(
        cells.groupBy("b").agg(F.sum("c").alias("c")), buckets
    )
    ratio = (
        hashed_ngram_dist(target, text_col, buckets, include_bigrams)
        .withColumnRenamed("log_p", "log_t")
        .join(raw_dist.withColumnRenamed("log_p", "log_r"), "b")
        .select("b", (F.col("log_t") - F.col("log_r")).alias("log_ratio"))
    )
    scored = (
        cells.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("log_ratio")), 6).alias("log_weight"),
        )
    )
    return (
        raw.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def gumbel_key(id_col: F.Column | str, log_weight: F.Column | str) -> F.Column:
    """Deterministic Gumbel-top-k sampling key: log_weight + G(id),
    G = −ln(−ln(u)) with u = (hash64(id)+1)/(2^60+1) ∈ (0,1) — the
    md5-uniform, so selection is reproducible across runs, engines and
    partitionings (no RNG). Taking the quota-largest keys IS importance
    resampling without replacement (Gumbel-max trick).
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    lw = F.col(log_weight) if isinstance(log_weight, str) else log_weight
    u = (stable_hash64(idc.cast("string")) + 1) / F.lit(_HASH_SPACE + 1)
    return lw + -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    quota: int,
    buckets: int = 1024,
    include_bigrams: bool = True,
    gumbel: bool = True,
) -> DataFrame:
    """Keep ``quota`` documents by DSIR importance resampling:
    weights via ``dsir_weights``, then the quota-largest
    (gumbel-perturbed) keys, ties by id ASC. ``gumbel=False`` degrades
    to hard top-quota by weight (mode-seeking; the paper's resampling
    is the default). Returns (id, n_feats, log_weight, sel_key) for the
    kept docs; join back on id for the full rows.

    The selection is orderBy-limit, which Spark executes as
    TakeOrdered: per-partition size-``quota`` heaps, one merge — no
    global sort of the corpus.
    """
    w = dsir_weights(raw, target, text_col, id_col, buckets, include_bigrams)
    return dsir_select_from_weights(w, quota, gumbel)


def dsir_select_from_weights(
    weights: DataFrame, quota: int, gumbel: bool = True
) -> DataFrame:
    """Selection half of ``dsir_select`` over an already-computed
    (id, n_feats, log_weight) frame — callers that also surface the
    weights should score once and select from the same frame rather
    than paying the distribution/scoring lineage twice."""
    key = (
        gumbel_key("id", "log_weight") if gumbel else F.col("log_weight")
    )
    return (
        weights.select(
            "id", "n_feats", "log_weight", F.round(key, 6).alias("sel_key")
        )
        .orderBy(F.desc("sel_key"), F.asc("id"))
        .limit(quota)
    )


# ------------------------------------------------- persisted DSIR state

def build_dsir_state(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    path: str,
    buckets: int = 1024,
    include_bigrams: bool = True,
) -> None:
    """Persist the DSIR distributions as mergeable state: raw/target
    bucket-cell COUNTS (not smoothed log-probs — counts sum, log-probs
    don't) under ``{path}/cells`` with side='raw'|'target', plus a
    one-row params parquet. The remaining rescan-only statistic of the
    engine becomes incremental like the HLL/quantile/CMS sketches and
    the BM25/near-dup indexes: a daily crawl increment appends
    bucket-sized rows; scoring any batch reads summed cells, never the
    corpus history."""
    spark = raw.sparkSession
    cells = (
        _bucket_cells(raw, text_col, buckets, include_bigrams)
        .select(F.lit("raw").alias("side"), "b", "c")
        .unionByName(
            _bucket_cells(target, text_col, buckets, include_bigrams).select(
                F.lit("target").alias("side"), "b", "c"
            )
        )
    )
    cells.write.mode("overwrite").parquet(f"{path}/cells")
    spark.createDataFrame(
        [(int(buckets), bool(include_bigrams))],
        "buckets int, include_bigrams boolean",
    ).write.mode("overwrite").parquet(f"{path}/params")


def merge_into_dsir_state(
    path: str,
    raw_batch: DataFrame | None = None,
    target_batch: DataFrame | None = None,
    text_col: str = "text",
) -> None:
    """Append an increment's bucket cells (raw side, target side, or
    both) under the stored params. Appends are row-level (cells sum at
    read time), so increments never rewrite history and a crashed
    append re-runs cleanly — parquet append of a deterministic frame.
    Holds the state's writer guard (``_commit_protocol.dir_state_writer``,
    r14): threads of ONE process (two streaming queries on one driver)
    BLOCK on the in-process per-path lock, and an increment racing
    ANOTHER process's compaction swap fails loud on the on-disk lease
    instead of appending into a directory mid-rename."""
    from dw_etl_spark.operators._commit_protocol import dir_state_writer

    assert raw_batch is not None or target_batch is not None
    spark = (raw_batch or target_batch).sparkSession
    with dir_state_writer(path, what=f"dsir state {path}"):
        p = spark.read.parquet(f"{path}/params").collect()[0]
        parts = []
        if raw_batch is not None:
            parts.append(
                _bucket_cells(
                    raw_batch, text_col, p["buckets"], p["include_bigrams"]
                ).select(F.lit("raw").alias("side"), "b", "c")
            )
        if target_batch is not None:
            parts.append(
                _bucket_cells(
                    target_batch, text_col, p["buckets"], p["include_bigrams"]
                ).select(F.lit("target").alias("side"), "b", "c")
            )
        inc = parts[0]
        for extra in parts[1:]:
            inc = inc.unionByName(extra)
        inc.write.mode("append").parquet(f"{path}/cells")


def dsir_weights_from_state(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
) -> DataFrame:
    """Score a batch against the persisted distributions: identical
    output to ``dsir_weights`` on the corpora the state has absorbed
    (pytest-pinned, merge path included) — but the only corpus-sized
    work is one feature pass over the BATCH. The summed cell tables
    are ``buckets`` rows a side; the log-ratio broadcast and the
    doc-keyed aggregate are exactly the in-memory scorer's plan."""
    spark = batch.sparkSession
    p = spark.read.parquet(f"{path}/params").collect()[0]
    buckets, bigrams = int(p["buckets"]), bool(p["include_bigrams"])
    stored = spark.read.parquet(f"{path}/cells")
    summed = stored.groupBy("side", "b").agg(F.sum("c").alias("c"))
    ratio = (
        _smooth_dist(summed.filter(F.col("side") == "target").drop("side"), buckets)
        .withColumnRenamed("log_p", "log_t")
        .join(
            _smooth_dist(
                summed.filter(F.col("side") == "raw").drop("side"), buckets
            ).withColumnRenamed("log_p", "log_r"),
            "b",
        )
        .select("b", (F.col("log_t") - F.col("log_r")).alias("log_ratio"))
    )
    cells = (
        batch.select(
            F.col(id_col).alias("id"),
            tokens_of(batch, text_col).alias("__toks"),
        )
        .select(
            "id",
            F.explode(_features_of(F.col("__toks"), bigrams)).alias("feat"),
        )
        .select("id", F.pmod(stable_hash64(F.col("feat")), F.lit(buckets)).alias("b"))
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scored = (
        cells.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("log_ratio")), 6).alias("log_weight"),
        )
    )
    return (
        batch.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        )
    )


def compact_dsir_state(spark, path: str) -> tuple[int, int]:
    """Collapse the appended increment cells to one summed row per
    (side, bucket) — bounded at 2·buckets rows — so read-time
    aggregation cost stops growing with increment count. Rename-aside
    swap (write the summed cells beside the live directory, rename the
    live directory ASIDE, promote the staged one, then drop the aside
    copy — the live cells are never removed before their replacement
    is in place), so a crash at any point leaves either the old
    appended pile or the compacted result readable, never a missing
    directory; a leftover ``__old``/``__staging`` from an interrupted
    run is recovered before compacting. Returns (rows_before,
    rows_after)."""
    from dw_etl_spark.operators._commit_protocol import (
        commit_swap_dir,
        dir_state_writer,
        recover_swap_dir,
    )

    cells_path = f"{path}/cells"
    with dir_state_writer(path, what=f"dsir state {path}"):
        recover_swap_dir(cells_path)
        stored = spark.read.parquet(cells_path)
        before = stored.count()
        summed = stored.groupBy("side", "b").agg(F.sum("c").alias("c"))
        summed.coalesce(1).write.mode("overwrite").parquet(
            f"{cells_path}__staging"
        )
        commit_swap_dir(cells_path)
        return before, spark.read.parquet(cells_path).count()
