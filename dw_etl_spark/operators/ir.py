"""Lexical IR features: TF-IDF keyterms and feature-hashed embeddings.

Two model-free text representations a corpus pipeline wants before any
neural model is in the loop:

  tfidf_top_terms  — per-doc top-k terms by smoothed TF-IDF: keyword
                     extraction, near-dup explanation ("which terms
                     made these docs similar"), topic drift monitoring.
  hashed_embedding — the hashing trick (Weinberger et al. 2009):
                     signed token-count features in a fixed dim,
                     l2-normalized. No vocabulary, no training, no
                     driver state — every token maps to (bucket, sign)
                     by portable md5 lanes, so the SAME text always
                     produces the SAME vector in any engine, and the
                     output plugs straight into the similarity stack
                     (cosine_topk / lsh_topk / semantic_dedup).

Scale shape: both are explode → (doc, term) count → small joins.
TF-IDF's document-frequency table is vocabulary-sized (shuffle keyed
on the term — hot terms are AQE territory); the hashing trick never
materializes a vocabulary at all — its widest shuffle is (doc, bucket)
cells, bounded by dim per doc. All arithmetic is JVM expressions;
DuckDB twins replay both exactly (md5-derived hashes, rounded scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import stable_hash32b, stable_hash64, tokens_of


def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    score = tf · (ln((N+1)/(df_t+1)) + 1) — the sklearn-style smooth
    idf, positive even for a term present in every doc. Output
    (id, term, tf, score, rank), rank 1..k by (score DESC, term ASC);
    ties broken lexically so the result is total-order deterministic.

    ``tf`` (r14, guide §1.2 step 1): a caller that already holds the
    per-document term-frequency table — (id, term, tf) — passes it in
    and the corpus explode+aggregate here is skipped; e.g. a corpus
    token-frequency report can derive its totals from the same table
    (sum(tf) by term ≡ the explode count), sharing ONE corpus pass.
    The caller owns that frame's pinning/lifecycle.
    """
    if tf is None:
        tf = (
            df.select(
                F.col(id_col).alias("id"),
                F.explode(tokens_of(df, text_col)).alias("term"),
            )
            .groupBy("id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n") + F.lit(1)).cast("double")
                        / (F.col("df_t") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hashed_embedding(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding): signed-feature-hashing doc vectors, l2-unit,
    components rounded to 6.

    bucket = stable_hash64(token) mod dim, sign = ±1 from an
    independent md5 lane — the classic unbiased variant (same-bucket
    collisions cancel in expectation instead of inflating). A doc with
    no tokens (or whose signs fully cancel) gets the zero vector, not
    NULL — still a valid cosine operand downstream.
    """
    cells = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_of(df, text_col)).alias("t"),
        )
        .select(
            "id",
            F.pmod(stable_hash64(F.col("t")), F.lit(dim)).alias("b"),
            F.when(stable_hash32b(F.col("t")) % 2 == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
            .alias("s"),
        )
        .groupBy("id", "b")
        .agg(F.sum("s").alias("v"))
    )
    dense = cells.groupBy("id").agg(
        F.map_from_entries(F.collect_list(F.struct("b", "v"))).alias("m")
    ).select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("long")), F.lit(0.0)),
        ).alias("raw"),
    )
    norm = F.sqrt(F.aggregate("raw", F.lit(0.0), lambda a, x: a + x * x))
    vec = F.when(
        norm > 0,
        F.transform("raw", lambda x: F.round(x / norm, 6)),
    ).otherwise(F.transform("raw", lambda x: x * 0.0))
    embedded = dense.select("id", vec.alias(out_col))
    return df.select(F.col(id_col).alias("id")).join(
        embedded, "id", "left"
    ).select(
        "id",
        F.coalesce(
            F.col(out_col),
            F.array_repeat(F.lit(0.0), dim),
        ).alias(out_col),
    )


def bm25_postings(corpus: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf, dl) posting rows of a corpus — term frequency
    with the document length denormalized onto every posting (the
    Lucene norm-in-posting layout). One tokenize pass, one
    (id, term)-keyed map-side-combined aggregate; carrying ``dl``
    through the groupBy key costs nothing (it is functionally
    dependent on ``id``) and saves scoring an id-keyed join against a
    separate doclen table — at corpus scale that join is a second full
    shuffle of the postings. This is the shared build step of
    ``bm25_topk`` (in-memory) and ``bm25_index.build_bm25_index``
    (persisted)."""
    return (
        corpus.select(
            F.col(id_col).alias("id"), tokens_of(corpus, text_col).alias("__toks")
        )
        .select(
            "id",
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("id", "term", "tf", "dl")
    )


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 1.0,
    pin_postings: bool = True,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: for each query, the k best-matching
    corpus documents. The retrieval primitive a training pipeline uses
    for eval-set decontamination beyond exact n-gram overlap ("which
    corpus docs are lexically closest to this benchmark item"), and for
    targeted data selection ("pull the docs most similar to this seed
    set").

    Scoring is Lucene-flavoured BM25 (idf = ln(1 + (N-df+0.5)/(df+0.5)),
    non-negative for every term): score(q,d) = sum over shared terms of
    idf_t * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)). Query-side term
    frequency is ignored (distinct query terms — the common Okapi
    simplification). Output (query_id, id, score, rank), rank 1..k by
    (score DESC, id ASC); score is rounded to 6 BEFORE ranking so the
    ordering is identical in any IEEE engine (DuckDB-twin-tested).

    Scale shape: the corpus side is ``bm25_postings`` — one explode →
    (doc, term) tf aggregation on a well-spread key with the doc
    length riding along (no separate doclen join); document frequency
    is a second, map-side-combined aggregation over the already-reduced
    postings (the exchange carries one partial count per mapper×term,
    not corpus rows — deliberately NOT a single term-keyed
    repartition, which would pile every posting of a stopword onto one
    partition). The query term set is tiny next to a 100 TB corpus, so
    df lookup and the df cap happen ON the query-term frame (dft ⋈
    broadcast(qterms) → a (query, term, df) frame the size of the
    query set), and THAT is what broadcasts against the postings —
    candidate generation is a broadcast semi-join, never all-pairs,
    and hot terms are gone before the big join. ``max_df_frac`` is the
    hot-term lever: drop query terms whose df exceeds that fraction of
    N (a stopword's candidate rows = its df — the entire corpus —
    while its idf is ~zero). The final top-k window is per-query over
    candidate docs only.
    """
    postings = bm25_postings(corpus, text_col, id_col)
    if pin_postings:
        # postings feed THREE consumers (df_t, the doc-length stats,
        # the candidate join). Column pruning specializes each branch's
        # aggregate, so exchange reuse can NOT dedupe them — without a
        # pin the scan+tokenize runs three times. The lazy
        # localCheckpoint materializes the postings once and truncates
        # the plan so all three read the same blocks (the
        # ngram_jaccard_pairs pin_shingles rule, PLANS.md #31); pass
        # False when re-deriving beats storing (preemptible clusters).
        postings = postings.localCheckpoint(eager=False)
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # (n_docs, avgdl) from the postings' denormalized dl, NOT a second
    # corpus tokenize. n_docs is a count(1) over the corpus — a
    # metadata/columnar count that never touches the text — so
    # zero-token docs still count toward avgdl's denominator (dl_sum
    # only sums docs that HAVE postings; absent docs contribute 0).
    doclens = postings.select("id", "dl").distinct()
    stats = (
        corpus.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(
            doclens.agg(
                F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("dl_sum")
            )
        )
        .select(
            "n_docs", (F.col("dl_sum") / F.col("n_docs")).alias("avgdl")
        )
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode_outer(tokens_of(queries, query_text_col)).alias("term"),
    ).distinct()
    # df rides along on the broadcast query-term frame: one less
    # corpus-side join, and the df cap prunes hot terms before any
    # posting row is touched
    # stats is referenced ONCE: avgdl rides the tiny broadcast qdf
    # frame into the postings join instead of a second stats crossJoin
    # — a double reference re-plans the whole stats lineage (two extra
    # corpus-derived subtrees in the static plan; AQE may or may not
    # dedupe them at runtime, so don't gamble a corpus pass on it)
    qdf = dft.join(F.broadcast(qterms), "term").crossJoin(F.broadcast(stats))
    if max_df_frac < 1.0:
        qdf = qdf.filter(F.col("df_t") <= F.lit(max_df_frac) * F.col("n_docs"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    qdf = qdf.select("term", "query_id", idf.alias("idf"), "avgdl")
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    cand = postings.join(F.broadcast(qdf), "term")
    scored = (
        cand.groupBy("query_id", "id")
        .agg(F.round(F.sum(F.col("idf") * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    ks: list[int] = (1_000, 10_000, 50_000),
    counts: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary coverage curve: for each k, the fraction of all token
    OCCURRENCES covered by the k most frequent token types — the
    go/no-go number for sizing a tokenizer vocabulary (or the OOV rate
    a fixed vocab will eat) before training it on the full corpus.

    Output (k, coverage, distinct_types, total_tokens), one row per
    requested k; ties at the k-boundary break by token ASC so the
    curve is engine-deterministic (DuckDB-twin-tested). Scale shape:
    ONE corpus-wide token-count shuffle (map-side combined), then a
    TakeOrdered of max(ks) (count, token) pairs to the driver — the
    driver holds max(ks) longs, never corpus rows — and the prefix
    sums are trivial there.
    """
    ks = sorted(set(int(k) for k in ks))
    if not ks or ks[0] <= 0:
        raise ValueError("ks must be positive ints")
    # ``counts`` (r14, guide §1.2 step 1): a caller that already holds
    # the corpus (token, n) frequency table — e.g. a top-k frequency
    # report sharing one aggregation with this curve — passes it in
    # and the corpus explode+groupBy here is skipped entirely; the
    # caller owns that frame's pinning/lifecycle. Columns: token, n.
    caller_counts = counts is not None
    if not caller_counts:
        counts = (
            df.select(F.explode(tokens_of(df, text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .persist()  # totals + top-k both read it; released below —
            # both consumers collect eagerly inside this function, so the
            # pin never escapes (no net cached frames after return)
        )
    try:
        tot = counts.agg(
            F.sum("n").alias("total"), F.count(F.lit(1)).alias("types")
        ).first()
        total, types = int(tot["total"] or 0), int(tot["types"])
        spark = df.sparkSession
        if total == 0:
            return spark.createDataFrame(
                [(k, None, 0, 0) for k in ks],
                "k int, coverage double, distinct_types long, total_tokens long",
            )
        top = [
            int(r["n"])
            for r in counts.orderBy(F.desc("n"), F.asc("token"))
            .limit(ks[-1])
            .collect()
        ]
    finally:
        if not caller_counts:
            counts.unpersist()
    cum, run = [], 0
    for n in top:
        run += n
        cum.append(run)

    def _round6(x: float) -> float:
        # HALF_UP, not Python's banker's round — SQL engines (and the
        # DuckDB oracle twin) round half away from zero
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    rows = [
        (
            k,
            _round6((cum[min(k, len(cum)) - 1] if cum else 0) / total),
            types,
            total,
        )
        for k in ks
    ]
    return spark.createDataFrame(
        rows, "k int, coverage double, distinct_types long, total_tokens long"
    )


def retrieve_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    query_embeddings: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    m: int = 50,
    vec_col: str = "embedding",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Two-stage retrieval — the standard production stack: BM25
    recall (top-``m`` lexical candidates per query, ``bm25_topk``)
    then embedding-cosine re-rank to top-``k``. Lexical recall is
    cheap and misses paraphrase; dense scoring is sharp and cannot
    scan a corpus — the composition gets both, and the engine already
    owns each half.

    Output (query_id, id, bm25_score, cos_sim, rank), rank 1..k by
    (rounded cosine DESC, id ASC). Scale shape: stage 1 is bm25_topk's
    plan (broadcast query terms over postings, never all-pairs);
    stage 2 touches ONLY the m·|queries| candidate rows — the
    embedding join is id-keyed on that candidate set (broadcast it:
    it is query-sized) against the corpus embedding table, and the
    query vectors broadcast. Never a dense scan of corpus embeddings
    (that is ``similarity.cosine_topk``'s job when no lexical signal
    exists).
    """
    cand = bm25_topk(
        corpus,
        queries,
        text_col,
        id_col,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
        k=m,
        k1=k1,
        b=b,
        max_df_frac=max_df_frac,
    ).select("query_id", "id", F.col("score").alias("bm25_score"))
    return rerank_candidates(cand, embeddings, query_embeddings, id_col, k, vec_col)


def rerank_candidates(
    cand: DataFrame,
    embeddings: DataFrame,
    query_embeddings: DataFrame,
    id_col: str,
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Stage 2 of retrieve-rerank on an already-produced candidate
    frame (query_id, id, bm25_score): cosine re-rank to top-``k``.
    Shared by the in-memory (``retrieve_rerank``) and persisted-index
    (``retrieve_rerank_indexed``) stage-1 paths. The candidate set and
    the query vectors are query-sized → both broadcast; the corpus
    embedding table is only ever touched through the id-keyed
    broadcast join."""
    from dw_etl_spark.operators.similarity import _as_double, cosine

    cvec = embeddings.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("cv")
    )
    qvec = query_embeddings.select(
        F.col("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        cvec.join(F.broadcast(cand), "id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "id",
            "bm25_score",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "bm25_score", "cos_sim", "rank")
    )


def retrieve_rerank_indexed(
    queries: DataFrame,
    index_name: str,
    embeddings: DataFrame,
    query_embeddings: DataFrame,
    id_col: str,
    k: int = 5,
    m: int = 50,
    vec_col: str = "embedding",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    k1: float = 1.2,
    b: float = 0.75,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """``retrieve_rerank`` with stage 1 served by a PERSISTED BM25
    index (``bm25_index.query_bm25_index``) instead of re-scoring the
    corpus — the standing-retrieval-service form: the index is built
    once and merged incrementally, each query batch costs the
    bucket-pruned postings scan plus the m·|queries|-row re-rank.
    Equality contract: identical to ``retrieve_rerank`` over the
    concatenated indexed corpus with the same parameters
    (pytest-pinned, riding the bm25_index equality contract)."""
    from dw_etl_spark.operators.bm25_index import query_bm25_index

    cand = query_bm25_index(
        queries,
        index_name,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
        k=m,
        k1=k1,
        b=b,
        max_df_frac=max_df_frac,
    ).select("query_id", "id", F.col("score").alias("bm25_score"))
    return rerank_candidates(cand, embeddings, query_embeddings, id_col, k, vec_col)
