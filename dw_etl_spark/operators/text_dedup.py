"""Document deduplication operators for training-data pipelines.

Four families, increasing fuzziness (all first-class engine citizens,
graded alongside SURVEY.md §2):

  exact_dedup         — hash-groupBy on a normalized fingerprint
  ngram_jaccard_pairs — n-gram Jaccard similarity join (threshold)
  minhash_lsh_pairs   — MinHash + LSH banding: candidate generation
                        that scales (shingle→minhash→band→bucket-join)
  simhash_pairs       — SimHash + hamming-ball banding

Scale design (the entire point of LSH/banding here):
- Never all-pairs on the full corpus. ``ngram_jaccard_pairs`` is the
  *verifier* — it runs on candidate pairs produced by banding, whose
  count is ~|near-dup clusters|, not |corpus|².
- Banding = groupBy on (band_idx, band_hash): one shuffle whose key
  cardinality grows with corpus size → even distribution; a hot bucket
  means near-identical docs, exactly the rows we want co-located.
- Minhash signatures are fixed-width arrays computed in a single
  narrow map (portable md5-based hashes, see functions/text.py —
  engine-independent, so the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import (
    MINHASH_P,
    char_ngrams,
    fingerprint,
    minhash_coeffs,
    stable_hash28,
    stable_hash32a,
    stable_hash32b,
    stable_hash64,
    tokens_of,
    word_ngrams_from_tokens,
)


def _shingles(df: DataFrame, text_col: str, n: int, shingle: str) -> Column:
    """Shingle set of ``text_col`` in ``df`` — accepts a pretokenized
    ``array<string>`` column for word shingles (``tokens_of``), so a
    multi-section query tokenizes its corpus once. Char shingles need
    the raw text and reject an array column."""
    if shingle == "word":
        return word_ngrams_from_tokens(tokens_of(df, text_col), n)
    if shingle == "char":
        if dict(df.dtypes).get(text_col) == "array<string>":
            raise ValueError("char shingles need raw text, not a token array")
        return char_ngrams(text_col, n)
    raise ValueError(f"shingle must be 'word' or 'char', got {shingle!r}")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized content: keep the min-id row per
    fingerprint. Returns the input columns of surviving rows.

    One shuffle on the 60-bit fingerprint (not the full text — tiny
    shuffle payload at 100 TB). Collisions: 60-bit space ⇒ ~1e-9 risk
    at 1e9 docs; verify equality on the text column if that matters.
    """
    w_min = F.min(F.col(id_col)).over(Window.partitionBy("__fp"))
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .withColumn("__keep", F.col(id_col) == w_min)
        .filter(F.col("__keep"))
        .drop("__fp", "__keep")
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.round(inter / F.greatest(union, F.lit(1)), 6)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_jaccard: float = 0.8,
    candidates: DataFrame | None = None,
    shingle: str = "char",
    pin_shingles: bool = True,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with n-gram Jaccard ≥ threshold.

    ``pin_shingles`` (default on) lazily ``localCheckpoint``s the
    (id, shingles) frame, which both modes consume twice (the inverted
    index's a/b sides; the verifier's sh_a/sh_b joins) — without the
    pin the tokenize→shingle map runs 2× (measured 3.4→2.0 s warm at
    sf0.1; checkpoint, not persist: the self-join re-analyzes an
    unpinned subtree per side and downstream unions double it again —
    plan truncation is the point, PLANS.md #31). The pinned payload is
    the shingle arrays (~text-sized, MEMORY_AND_DISK); pass ``False``
    when re-deriving beats storing or on preemptible clusters.

    Without ``candidates`` (requires ``min_jaccard > 0``): an
    inverted-index join — explode shingles, equi-join on the shingle,
    count shared per pair, derive |union| from per-doc sizes. A pair
    with jaccard ≥ t > 0 shares ≥ 1 shingle, so the output is identical
    to all-pairs, but the plan is a Catalyst shuffle-hash equi-join
    sized by shingle co-occurrence (Σ_s cnt(s)²), never a nested-loop
    over |corpus|² with per-pair array intersections.

    With ``candidates`` (id_a, id_b from LSH banding): verifies just
    those pairs via array intersection — the path ``minhash_lsh_pairs``
    uses, where the pair count is already ~|near-dup clusters|.
    """
    shingled = df.select(
        F.col(id_col).alias("id"), _shingles(df, text_col, n, shingle).alias("sh")
    )
    if pin_shingles:
        shingled = shingled.localCheckpoint(eager=False)
    if candidates is None:
        if min_jaccard <= 0:
            raise ValueError(
                "all-pairs mode requires min_jaccard > 0 "
                "(zero-overlap pairs are never materialized)"
            )
        sized = shingled.select("id", F.explode("sh").alias("s"), F.size("sh").alias("sz"))
        a = sized.withColumnsRenamed({"id": "id_a", "sz": "sz_a"})
        b = sized.withColumnsRenamed({"id": "id_b", "sz": "sz_b"})
        inter = (
            a.join(b, "s")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
        jac = F.round(
            F.col("__inter")
            / F.greatest(F.col("sz_a") + F.col("sz_b") - F.col("__inter"), F.lit(1)),
            6,
        )
        return inter.select(
            "id_a", "id_b", jac.alias("jaccard")
        ).filter(F.col("jaccard") >= min_jaccard)
    pairs = candidates.join(
        shingled.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a"
    ).join(shingled.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    out = pairs.select(
        "id_a", "id_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    num_hashes: int = 32,
    shingle: str = "word",
) -> DataFrame:
    """MinHash signatures as columns m0..m{k-1} from an affine hash
    family over a single md5 base hash. Portable and UDF-free.

    Relational shape, not an expression tree: explode shingles → ONE
    md5 per (doc, shingle) row → k two-op affine transforms inside the
    min-aggregates. One narrow map + one shuffle on the doc id. k=32+
    hash functions cost the same as k=1 digest-wise (a k-digest
    formulation was measured 20x slower and capped usable k — and a
    too-small k is what degenerates LSH banding into all-pairs).
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(df, text_col, n, shingle)).alias("s"),
    )
    hashed = exploded.select("id", stable_hash28(F.col("s")).alias("h"))
    # SQL-string assembly, parsed once per aggregate (r14; the qcut r10
    # precedent): the Column form paid ~5 py4j round-trips per hash
    # function on every call. Integer literals/ops type identically in
    # the parser (int * bigint → bigint), so results are unchanged.
    return hashed.groupBy("id").agg(
        *[
            F.expr(f"min(({a} * h + {b}) % {MINHASH_P}) AS m{j}")
            for j, (a, b) in enumerate(minhash_coeffs(num_hashes))
        ]
    )


def band_keys(
    sig: DataFrame, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(id, band, key) LSH bucket keys from a ``minhash_signatures``
    frame — the shared candidate-generation layer of the self-join
    path (``minhash_lsh_pairs``) and the persisted incremental index
    (``operators/neardup_index.py``). key = the band's r signature
    values comma-joined; one narrow map, bands rows per doc."""
    r = num_hashes // bands
    # one parsed expression instead of bands×(r+2) py4j Column ops
    # (r14; same-typed SQL: concat_ws over STRING casts, int literals)
    structs = ", ".join(
        "named_struct('band', {b}, 'key', concat_ws(',', {cols}))".format(
            b=b,
            cols=", ".join(
                f"CAST(m{b * r + i} AS STRING)" for i in range(r)
            ),
        )
        for b in range(bands)
    )
    return sig.select(
        "id", F.expr(f"explode(array({structs}))").alias("bk")
    ).select("id", "bk.band", "bk.key")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    min_jaccard: float = 0.5,
    shingle: str = "word",
    pin_signatures: bool = True,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → minhash → band → bucket
    self-join → exact-Jaccard verify. Returns (id_a < id_b, jaccard).

    ``pin_signatures`` (default on) lazily ``localCheckpoint``s the
    signature frame: the banded self-join consumes the shingle→hash→
    k-min aggregation on both sides and Spark does not reuse the
    exchange under a broadcast join, so the pin halves the signature
    work — and TRUNCATES the plan, which persist would not (PLANS.md
    #31). num_hashes longs per doc (~256 B at k=32) — negligible at
    any scale; a lost executor fails the job instead of recomputing
    (pass ``False`` on preemptible clusters).

    rows_per_band r = num_hashes/bands; collision prob ≈ 1-(1-s^r)^b.
    Defaults (word bigrams, k=32, b=8 → r=4) keep buckets honest on
    vocabulary-sharing corpora: at s≈0.05 (unrelated docs) a pair
    collides with p≈5e-5; at s≈0.9 (near-dups) p≈0.999. The bucket
    join shuffles on (band, band-signature) — candidate generation is
    linear in corpus + output size, never all-pairs. Docs with no
    shingles (fewer than n tokens) produce no signature and thus no
    candidates.
    """
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, shingle)
    if pin_signatures:
        sig = sig.localCheckpoint(eager=False)
    banded = band_keys(sig, num_hashes, bands)
    a = banded.withColumnsRenamed({"id": "id_a"})
    b = banded.withColumnsRenamed({"id": "id_b"})
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return ngram_jaccard_pairs(
        df,
        text_col,
        id_col,
        n=n,
        min_jaccard=min_jaccard,
        candidates=cands,
        shingle=shingle,
    )


def dup_ngram_char_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
) -> DataFrame:
    """Per-document within-doc repetition: the fraction of word-n-gram
    characters belonging to n-grams that occur more than once in the
    SAME document (the remaining repetition rule of the Gopher filter
    family — ``gopher_metrics`` covers the line-level ones).

    Relational shape, not a per-row HOF scan: explode NON-distinct
    n-grams → count per (doc, gram) → one weighted ratio per doc. An
    in-expression occurrence count would be O(grams²) interpreted work
    per row; this is one shuffle keyed on (doc, gram) whose cardinality
    grows with the corpus — even at 100 TB. Docs with fewer than n
    tokens emit fraction 0.0.

    Returns (id, dup_ngram_frac) — join back to the corpus as needed.
    """
    toks = tokens_of(df, text_col)
    cnt = F.size(toks)
    m = cnt - (n - 1)
    grams = F.slice(toks, 1, F.greatest(m, F.lit(0)))
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, F.greatest(m, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.when(cnt < n, F.array().cast("array<string>")).otherwise(grams)
        ).alias("g"),
    )
    per_gram = exploded.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
    chars = F.length("g") * F.col("c")
    return per_gram.groupBy("id").agg(
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("c") >= 2, chars).otherwise(F.lit(0)))
                / F.sum(chars),
                F.lit(0.0),
            ),
            4,
        ).alias("dup_ngram_frac")
    )


def contamination_flags(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    shingle: str = "word",
    min_shared: int = 1,
) -> DataFrame:
    """Train/eval contamination check: flag corpus docs sharing at
    least ``min_shared`` distinct n-gram shingles with ANY eval-set
    document — the decontamination pass an LLM training pipeline runs
    so benchmark answers don't leak into the corpus (the GPT-3/PaLM
    papers use 8-13 word-gram collisions; pick ``n`` to taste).

    Returns (id, n_shared_grams, contaminated) for every corpus row —
    ``n_shared_grams`` counts the doc's distinct shingles that occur
    anywhere in the eval set.

    Scale shape (r15, guide §3.1/§2.3): corpus shingles explode into
    (id, gram) rows and BROADCAST-join the DISTINCT eval gram set — an
    inverted-index semi-join keyed on the gram, never doc×doc. The
    eval side is the distinct gram set of the *eval corpus*, and a
    benchmark/eval set is a BOUNDED artifact by contract (the same
    argument as the BM25 query cap): 10⁴-10⁶ docs → an eval gram set
    in the tens-to-hundreds of MB, far under the broadcast caps at any
    corpus scale. The hint is explicit because Catalyst cannot
    estimate the exploded-distinct subquery (it planned a sort-merge
    join), and AQE's runtime conversion is TOO LATE — both map stages
    materialize first, so the full corpus gram set (payload strings ×
    every occurrence) was already written to shuffle before the
    broadcast kicked in: 1,082 MB of shuffle write at sf1, 63 s of the
    query's 105 s. With the explicit hint the corpus grams never
    shuffle; the only exchange left is the map-side-combined per-doc
    count (KBs). False-positive risk: none — the join is exact.
    """
    corpus_grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(df, text_col, n, shingle)).alias("g"),
    )
    eval_grams = eval_df.select(
        F.explode(_shingles(eval_df, text_col, n, shingle)).alias("g")
    ).distinct()
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("__n_shared"))
    )
    shared = F.coalesce("__n_shared", F.lit(0)).cast("long")
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            shared.alias("n_shared_grams"),
            (shared >= min_shared).alias("contaminated"),
        )
    )


def normalize_unicode(
    df: DataFrame, text_col: str, form: str = "NFC"
) -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD) so that
    visually-identical strings hash identically — the pre-pass every
    fingerprint/dedup in this module assumes on web text (composed é
    vs e+combining accent are different bytes, hence different md5s).

    Spark has no built-in normalizer, so this is a deliberate
    Arrow-batched ``mapInPandas`` pass (`unicodedata` per batch via
    pandas ``str.normalize`` — vectorized C loop, not per-row Python
    UDF). Narrow map: no shuffle, composes with any downstream plan.
    Lives in operators/ (frame in → frame out), not functions/text,
    whose contract is pure JVM column expressions.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    schema = df.schema

    def norm(batches):
        for pdf in batches:
            out = pdf.copy()
            out[text_col] = out[text_col].str.normalize(form)
            yield out

    return df.mapInPandas(norm, schema)


def _line_frames(
    df: DataFrame, text_col: str, id_col: str, min_docs: int
) -> tuple[DataFrame, Column]:
    """Shared candidate shape for the line-dedup family: one row per
    (doc, line position, line) with the corpus-wide DISTINCT-document
    count of the trimmed line attached. Blank (all-whitespace) lines
    are structural, not content — they never count as duplicates.
    NULL text is treated as the empty document (one blank line), so
    every input row gets a stats row and survives the rewrite."""
    from dw_etl_spark.functions.text import stable_hash64

    norm = F.trim(F.col("line"))
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn(
        "__lfp",
        F.when(norm == "", F.lit(None)).otherwise(stable_hash64(norm)),
    )
    # two-phase distinct-doc count: dedupe (line, doc) first so the
    # per-line combine state is bounded even when one doc repeats a
    # line millions of times (boilerplate), then count per line.
    doc_counts = (
        lines.filter(F.col("__lfp").isNotNull())
        .select("__lfp", "id")
        .distinct()
        .groupBy("__lfp")
        .agg(F.count(F.lit(1)).alias("__docs_w"))
    )
    joined = lines.join(doc_counts, "__lfp", "left")
    is_dup = F.coalesce("__docs_w", F.lit(0)) >= min_docs
    return joined, is_dup


def duplicate_line_stats(
    df: DataFrame, text_col: str, id_col: str, min_docs: int = 2
) -> DataFrame:
    """Cross-document line duplication signal (the C4/RefinedWeb line
    dedup family — distinct from ``gopher_metrics``' WITHIN-doc
    ``dup_line_frac``): for each doc, how many of its lines occur
    (trimmed-identical) in at least ``min_docs`` DISTINCT documents,
    and what fraction of its characters those lines carry. Web-corpus
    boilerplate (nav bars, cookie banners, footers) shows up as a high
    fraction here long before whole-document dedup would catch it.

    Returns (id, n_lines, n_dup_lines, dup_line_char_frac) for every
    input row. Blank lines count in ``n_lines`` but are never
    duplicates; a doc of only blank lines gets fraction 0.0.

    Scale shape: lines shuffle ONCE keyed by a 60-bit md5 line hash
    (portable — a DuckDB oracle grouping raw trimmed lines replays the
    counts exactly, modulo md5 collisions), never the line text; key
    cardinality grows with corpus size. The (line, doc) distinct pass
    bounds combine state under repeated-boilerplate skew, and the
    final aggregation is keyed on the doc id.
    """
    joined, is_dup = _line_frames(df, text_col, id_col, min_docs)
    dup_chars = F.sum(F.when(is_dup, F.length("line")).otherwise(F.lit(0)))
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(is_dup.cast("long")).alias("n_dup_lines"),
        F.round(
            F.coalesce(
                dup_chars / F.nullif(F.sum(F.length("line")), F.lit(0)),
                F.lit(0.0),
            ),
            4,
        ).alias("dup_line_char_frac"),
    )


def remove_duplicate_lines(
    df: DataFrame, text_col: str, id_col: str, min_docs: int = 2
) -> DataFrame:
    """Rewrite ``text_col`` with every cross-corpus duplicated line
    removed (trimmed-identical in ≥ ``min_docs`` DISTINCT docs —
    dropped from ALL of them, the RefinedWeb policy), preserving the
    original line order and every other column. Blank lines survive;
    a doc whose every content line was boilerplate comes back with
    just its blank skeleton (or '' if it had none). NULL text is
    normalized to '' (the empty document).

    Scale shape: the stats shuffle of ``duplicate_line_stats`` plus
    one doc-keyed aggregation whose per-group state is a single
    document's lines — bounded by max doc size, not corpus size.
    """
    joined, is_dup = _line_frames(df, text_col, id_col, min_docs)
    rebuilt = (
        joined.filter(~is_dup)
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("__clean")
        )
    )
    out_cols = [
        F.coalesce("__clean", F.lit("")).alias(c) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return (
        df.drop(text_col)
        .join(rebuilt.withColumnRenamed("id", id_col), id_col, "left")
        .select(*out_cols)
    )


def simhash_values(
    df: DataFrame, text_col: str, id_col: str, n: int = 3,
    shingle: str = "char",
) -> DataFrame:
    """(id, sh): 64-bit SimHash per doc, relational shape.

    explode shingles → one md5 per (doc, shingle), split into two
    portable 32-bit lanes (hex chars 1-8 / 9-16) → 64 integer bit-vote
    sums in a single groupBy → assemble into one signed 64-bit value
    (bit 63 contributes the sign via the two's-complement min-long
    term, so DuckDB BIGINT arithmetic reproduces it exactly). One
    shuffle on doc id; each shingle hashed exactly once.

    Docs with no shingles keep sh = 0 (``explode_outer``).
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(_shingles(df, text_col, n, shingle)).alias("s"),
    )
    hashed = exploded.select(
        "id",
        stable_hash32a(F.col("s")).alias("h1"),
        stable_hash32b(F.col("s")).alias("h2"),
    )

    # The 64 vote aggregates and the 64-term bit assembly are built as
    # SQL strings parsed ONCE (r14; the qcut r10 precedent): the
    # Column-by-Column form cost ~1.3 s of driver py4j round-trips per
    # call — more than this query's entire execution at sf0.1. The
    # parsed expressions are the same operators (shiftright, &, CAST,
    # CASE) with identical typing, so results are bit-identical.
    def vote(b: int) -> str:
        lane = "h1" if b < 32 else "h2"
        return (
            f"sum(CASE WHEN {lane} IS NOT NULL THEN "
            f"CAST(shiftright({lane}, {b % 32}) & 1 AS BIGINT) * 2 - 1 "
            f"ELSE 0 END) AS v{b}"
        )

    votes = hashed.groupBy("id").agg(
        *[F.expr(vote(b)) for b in range(64)]
    )
    terms = []
    for b in range(64):
        # Bit 63 is the sign bit: adding long-min gives the correct
        # two's-complement value (partial sums never overflow: bits
        # 0..62 sum to at most 2^63-1, then + (-2^63) >= -1). The
        # min-long literal goes through a string cast — a bare
        # -9223372036854775808 parses as unary minus of an
        # out-of-range long.
        on = (
            "CAST('-9223372036854775808' AS BIGINT)"
            if b == 63
            else f"CAST({1 << b} AS BIGINT)"
        )
        terms.append(
            f"CASE WHEN v{b} > 0 THEN {on} ELSE CAST(0 AS BIGINT) END"
        )
    return votes.select(
        "id", F.expr(" + ".join(terms)).alias("sh")
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_hamming: int = 3,
    shingle: str = "char",
    bands: int = 4,
    bits_per_band: int = 16,
    max_bucket_size: int | None = None,
    pin_signatures: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit simhash banded into ``bands``
    contiguous ``bits_per_band``-bit keys — any pair within hamming
    distance ≤ bands-1 shares at least one exact band (pigeonhole) →
    bucket-join per band, verify with bit_count.

    Returns (id_a < id_b, hamming).

    Migration note: simhash widened from 32 to 64 bits, so the same
    textual distance now lands at roughly double the hamming — callers
    tuned against the old 32-bit layout should re-tune ``max_hamming``
    (roughly: double your previous threshold) deliberately.

    Scale: the band keyspace is ``bands × 2^bits_per_band`` (defaults
    4×65,536 = 262k keys vs the 1,024 of a 4×8-bit layout) and grows
    by widening bands, so bucket occupancy stays ~n/2^bits and the
    bucket self-join never degenerates toward all-pairs on large
    corpora. For hamming ≤ 5 use bands=8, bits_per_band=8 — wider
    hamming needs more bands (pigeonhole: bands ≥ max_hamming+1),
    trading keyspace for recall.

    Hot buckets: simhash keys are content-correlated by design, so a
    boilerplate-heavy corpus (shared headers, templated crawl pages)
    concentrates genuinely-similar docs into a few buckets and the
    per-bucket self-join cost grows as C(n,2). ``max_bucket_size``
    caps that: any (band, key) bucket holding more rows is dropped
    before the self-join (the standard LSH-dedup mitigation). Recall
    loss is bounded by the pigeonhole slack — a pair is only missed if
    *every* band it shares is hot — and near-identical boilerplate is
    usually better handled by ``exact_dedup`` upstream anyway. The cap
    is a count-window over the same (band, key) the self-join shuffles
    on, so the exchange is reusable and no new shuffle key appears.

    ``pin_signatures`` (default on) lazily ``localCheckpoint``s the
    (id, sh) frame: the self-join consumes the signature pipeline
    (explode → hash → 64 bit-vote aggregates) on BOTH sides and Spark
    does not reuse the exchange under a broadcast join, so without the
    pin the most expensive stage runs 2-3× (checkpoint, not persist —
    plan truncation, PLANS.md #31). The pinned frame is 16
    bytes/doc — negligible at any corpus scale — and is GC-cleaned
    with the DataFrame. Trade-off: a lost executor fails the job
    instead of recomputing; pass ``False`` on preemptible clusters.
    """
    if bands * bits_per_band != 64:
        raise ValueError(
            f"bands * bits_per_band must equal 64, got {bands}×{bits_per_band}"
        )
    if bands < 2:
        raise ValueError(
            "bands must be >= 2: a single 64-bit band has a mask that "
            "overflows Spark's long literal and degenerates banding to "
            "exact-hash equality"
        )
    if bands < max_hamming + 1:
        raise ValueError(
            f"pigeonhole requires bands >= max_hamming+1 "
            f"({bands} < {max_hamming + 1}): a pair at distance "
            f"{max_hamming} could differ in every band"
        )
    if max_bucket_size is not None and max_bucket_size < 2:
        raise ValueError("max_bucket_size must be >= 2 (a pair needs 2 rows)")
    mask = (1 << bits_per_band) - 1
    sh = simhash_values(df, text_col, id_col, n, shingle)
    if pin_signatures:
        sh = sh.localCheckpoint(eager=False)
    banded = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        # Arithmetic shift then mask: the AND keeps only
                        # the low bits_per_band bits, so sign extension
                        # is irrelevant (same as DuckDB's `>> &`).
                        F.shiftright(F.col("sh"), i * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.band", "bk.key")
    if max_bucket_size is not None:
        occ = F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
        banded = banded.withColumn("__occ", occ).filter(
            F.col("__occ") <= max_bucket_size
        ).drop("__occ")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _dup_window_positions(
    df: DataFrame, text_col: str, id_col: str, window: int, min_count: int,
    unit: str = "word",
):
    """(unit frame, all duplicated unit positions, non-first
    duplicated unit positions) shared by the span stats and the span
    remover — the third frame excludes each gram's corpus-global
    first occurrence, for the keep-one-copy policy. Windows are
    hashed (one 64-bit digest per window), counted corpus-globally,
    and windows whose gram occurs >= min_count times anywhere mark
    every unit position they cover. ``unit`` picks the granularity: 'word' (whitespace tokens —
    the production default) or 'char' (every character offset — the
    full-fidelity Lee et al. ExactSubstr granularity, ~5× the rows).
    The hashed-window frame is lazily localCheckpoint-pinned:
    the global count and the per-doc mark join both consume it, and
    without the pin the tokenize→window→digest map runs twice
    (measured 2.5→1.9 s at sf0.1 in the repetition_stats gate row)."""
    if unit == "word":
        seq, sep = tokens_of(df, text_col), " "
    elif unit == "char":
        # split('') → one array element per character
        c = F.col(text_col)
        seq = F.when(c.isNotNull(), F.split(c, "")).otherwise(
            F.array().cast("array<string>")
        )
        sep = ""
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    toks = df.select(F.col(id_col).alias("id"), seq.alias("ts"))
    wins = toks.select(
        "id",
        F.posexplode(
            F.when(
                F.size("ts") >= window,
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - window),
                    lambda i: stable_hash64(
                        F.array_join(
                            F.slice(F.col("ts"), i + F.lit(1), F.lit(window)),
                            sep,
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("wpos", "g"),
    ).localCheckpoint(eager=False)
    dup_g = (
        wins.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            # corpus-global first occurrence of the gram — one extra
            # agg column in the SAME shuffle, consumed only by the
            # keep='first' remover
            F.min(F.struct("id", "wpos")).alias("__first"),
        )
        .filter(F.col("__c") >= min_count)
        .select("g", "__first")
    )
    occ = wins.join(dup_g, "g")
    dup_pos_all = occ.select(
        "id",
        F.explode(
            F.sequence(F.col("wpos"), F.col("wpos") + F.lit(window - 1))
        ).alias("pos"),
    ).distinct()
    dup_pos_nonfirst = (
        occ.filter(
            ~(
                (F.col("id") == F.col("__first.id"))
                & (F.col("wpos") == F.col("__first.wpos"))
            )
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("wpos"), F.col("wpos") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    return toks, dup_pos_all, dup_pos_nonfirst


def duplicated_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    min_count: int = 2,
    unit: str = "word",
) -> DataFrame:
    """(id, n_tokens, n_dup_tokens, dup_token_fraction): how much of
    each doc sits inside a corpus-globally repeated ``window``-unit
    gram — suffix-array ExactSubstr dedup semantics (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): any
    repeat of length >= window units falls out as overlapping
    windows; shorter repeats are ignored by design — for the
    INTRA-document case, ``operators/exact_substr.py`` closes that
    gap exactly (per-doc suffix automaton, any repeat length).

    ``unit='word'`` (default) is the production compromise — windows
    slide over whitespace tokens, ~5× fewer positions than
    characters. ``unit='char'`` is the full-fidelity granularity of
    the paper (window = characters, e.g. 50): sub-token repeats and
    repeats that straddle tokenization now count; the column names
    keep saying *token* but count the chosen unit. Both are the same
    plan shape — one (gram-hash) shuffle of n_units rows per doc.

    Counting is by total occurrence (a doc repeating its own header
    counts), matching the corpus-global ExactSubstr rule. Work is one
    (gram-hash) shuffle of n_units rows per doc — each window is ONE
    64-bit digest, never the gram text — plus a window-factor-bounded
    explode of only the duplicated windows. Docs shorter than
    ``window`` units contribute no windows and get fraction 0.
    """
    toks, dup_pos, _ = _dup_window_positions(
        df, text_col, id_col, window, min_count, unit
    )
    per_doc = dup_pos.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_tokens")
    )
    return (
        toks.select("id", F.size("ts").alias("n_tokens"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dup_tokens"), F.lit(0))
            .cast("long")
            .alias("n_dup_tokens"),
            F.round(
                F.coalesce(F.col("n_dup_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_token_fraction"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 10,
    min_count: int = 2,
    out_col: str = "cleaned",
    unit: str = "word",
    keep: str = "none",
) -> DataFrame:
    """(id, cleaned): each doc with every unit covered by a
    corpus-globally repeated ``window``-unit gram removed — the
    destructive complement of ``duplicated_span_stats`` (same marking
    pass), for stripping license blocks/navigation chrome/templated
    boilerplate that whole-doc dedup cannot touch because the
    SURROUNDING text differs.

    ``keep`` picks the ExactSubstr policy: ``'none'`` (default)
    removes every occurrence of a duplicated span — the boilerplate-
    strip reading; ``'first'`` retains the corpus-global FIRST
    occurrence (min (doc id, position)) and removes only the others —
    the Lee et al. keep-one-copy reading, so the corpus keeps exactly
    one copy of each repeated span instead of zero. Every window of a
    long repeated span picks the same first document, so the whole
    span survives there contiguously. Same plan either way — the
    first-occurrence pick is one extra agg column in the gram-count
    shuffle, not an extra pass.

    With ``unit='word'`` the rebuild concatenates surviving tokens in
    position order with single spaces (token-level semantics:
    original inter-token whitespace is already normalized away by
    ``tokens``); with ``unit='char'`` surviving characters rejoin
    with no separator, so untouched text comes back byte-identical —
    the full-fidelity Lee et al. ExactSubstr cut. A fully boilerplate
    doc comes back as '' — filter on ``duplicated_span_stats`` first
    if you'd rather drop such docs.
    """
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    toks, dup_pos_all, dup_pos_nonfirst = _dup_window_positions(
        df, text_col, id_col, window, min_count, unit
    )
    dup_pos = dup_pos_all if keep == "none" else dup_pos_nonfirst
    kept = (
        toks.select("id", F.posexplode("ts").alias("pos", "tok"))
        .join(dup_pos, ["id", "pos"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " " if unit == "word" else "",
            ).alias(out_col)
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(kept, "id", "left")
        .select("id", F.coalesce(F.col(out_col), F.lit("")).alias(out_col))
    )


def dedup_eval(
    found_pairs: DataFrame,
    truth_pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Precision/recall/F1 of a near-dup pair detector against a
    ground-truth pair set — the ``ann_recall`` analogue for the text
    dedup family, for tuning (bands, shingle size, threshold) on a
    labeled sample BEFORE a 100 TB sweep commits to a configuration.

    Pairs are canonicalized to (min, max) so orientation never
    miscounts; duplicates within either side collapse. Output is one
    row: (n_found, n_truth, n_hit, precision, recall, f1) — empty
    truth yields NULL metrics rather than a division error. Scale:
    two distinct-pair shuffles + one join, all pair-set-sized (the
    labeled sample, not the corpus).
    """

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        ).distinct()

    f, t = canon(found_pairs), canon(truth_pairs)
    hit = f.join(t, ["a", "b"], "left_semi")
    row = (
        f.agg(F.count(F.lit(1)).alias("n_found"))
        .crossJoin(t.agg(F.count(F.lit(1)).alias("n_truth")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    prec = F.when(
        F.col("n_found") > 0, F.col("n_hit") / F.col("n_found")
    )
    rec = F.when(F.col("n_truth") > 0, F.col("n_hit") / F.col("n_truth"))
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        2 * prec * rec / (prec + rec),
    )
    return row.select(
        "n_found",
        "n_truth",
        "n_hit",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
