"""DuckDB oracle-SQL builders for the training-data operators.

Each builder returns ANSI/DuckDB SQL that reproduces the matching
Spark operator EXACTLY — same md5-based hashes, same integer
arithmetic, same rounding — so the driver's value-hash compare is
meaningful for the fuzzy/approximate operators too, not just the
relational ones.

Shared primitives (mirrors of functions/text.py):
  hash64(e)    — CAST('0x' || substr(md5(e),1,15) AS BIGINT)
  tokens(e)    — whitespace split with blank→[] guard
  shingles(e)  — distinct char n-grams with short-text→[] guard
"""

from __future__ import annotations

import hashlib

from dw_etl_spark.functions.text import STOPWORDS


def h64(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h28(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 7) AS BIGINT)"


def h32a(expr: str) -> str:
    """Mirror of functions/text.py stable_hash32a (md5 hex 1-8)."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def h32b(expr: str) -> str:
    """Mirror of functions/text.py stable_hash32b (md5 hex 9-16)."""
    return f"CAST('0x' || substr(md5({expr}), 9, 8) AS BIGINT)"


def tokens(expr: str) -> str:
    # trim on the full whitespace set (twin of text.py tokens' btrim) —
    # plain trim() strips spaces only and leaves a phantom empty token
    # after a trailing newline
    ws = "' ' || chr(9) || chr(10) || chr(13)"
    return (
        f"CASE WHEN trim({expr}, {ws}) = '' THEN CAST([] AS VARCHAR[]) "
        f"ELSE regexp_split_to_array(trim({expr}, {ws}), '\\s+') END"
    )


def shingles(expr: str, n: int) -> str:
    return (
        f"CASE WHEN length({expr}) < {n} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_distinct(list_transform("
        f"range(1, length({expr}) - {n - 1} + 1), "
        f"i -> substr({expr}, i, {n}))) END"
    )


def word_shingles(expr: str, n: int) -> str:
    """Mirror of functions/text.py word_ngrams: distinct n-token
    shingles joined by single spaces; < n tokens → empty array."""
    toks = tokens(expr)
    return (
        f"CASE WHEN len({toks}) < {n} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_distinct(list_transform("
        f"range(1, len({toks}) - {n - 1} + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))) END"
    )


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def spark_round_sql(expr: str, scale: int = 6) -> str:
    """Replay Spark's ``round(double, n)`` EXACTLY in DuckDB.

    Spark rounds the SHORTEST-DECIMAL string form of the double with
    HALF_UP (``BigDecimal.valueOf`` = ``Double.toString`` then
    ``setScale``); DuckDB's ``round(DOUBLE, n)`` works in float space.
    The two disagree whenever the value sits exactly on the 10^-n half
    boundary — the r11 sf1 sweep caught interpolated group means of
    the form k/3200 (exact decimal ...xxx5) flipping the compared 6th
    digit both ways. ``CAST(double AS VARCHAR)`` is DuckDB's shortest
    round-trip repr; the DECIMAL(38,20) parse is exact for any double
    with |x| >= 1e-3 (<= 17 significant digits -> <= 20 fraction
    digits), and DuckDB rounds DECIMAL half-away-from-zero, which is
    Java HALF_UP for either sign. NULL propagates; e-notation reprs of
    tiny values parse fine (their 6th decimal is unaffected by the
    scale-20 parse).

    Magnitude bound: DECIMAL(38,20) holds 18 integer digits, so any
    input with |x| >= 1e18 FAILS the cast (DuckDB conversion error —
    loud, not wrong). Current call sites are means/indicators (~1e5);
    a caller rounding raw money SUMS at warehouse scale should sum in
    exact decimal first (the ``_dec2`` recipe) so the value reaching
    this twin is already small, or fall back to native round where a
    boundary provably cannot occur.
    """
    return (
        f"CAST(round(CAST(CAST({expr} AS VARCHAR) AS DECIMAL(38,20)), "
        f"{scale}) AS DOUBLE)"
    )


def _lang_hits(expr: str) -> dict[str, str]:
    toks = tokens(expr)
    return {
        lang: f"len(list_filter({toks}, t -> list_contains({_sw_list(lang)}, lower(t))))"
        for lang in STOPWORDS
    }


def lang_case_sql(expr: str = "text") -> str:
    """Twin of functions/text.py lang_id over a text expression."""
    hits = _lang_hits(expr)
    best = "greatest(" + ", ".join(hits.values()) + ")"
    return (
        "CASE WHEN " + best + " <= 0 THEN 'unknown' "
        + " ".join(
            f"WHEN {hits[lang]} = {best} THEN '{lang}'"
            for lang in sorted(STOPWORDS)
        )
        + " END"
    )


def quality_sql(expr: str = "text") -> str:
    """Twin of functions/text.py quality_score over a text expression."""
    toks = tokens(expr)
    n_chars = f"length({expr})"
    n_toks = f"len({toks})"
    n_alpha = f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    alpha_ratio = f"round({n_alpha} / greatest({n_chars}, 1), 4)"
    mean_tok_len = f"round(({n_chars} - ({n_toks} - 1)) / greatest({n_toks}, 1), 4)"
    stop_hits = _lang_hits(expr)["en"]
    return (
        f"round((CASE WHEN {n_chars} BETWEEN 100 AND 10000 THEN 0.25 ELSE 0.0 END)"
        f" + (CASE WHEN {mean_tok_len} BETWEEN 3 AND 12 THEN 0.25 ELSE 0.0 END)"
        f" + (CASE WHEN {alpha_ratio} >= 0.6 THEN 0.25 ELSE 0.0 END)"
        f" + (CASE WHEN {stop_hits} > 0 THEN 0.25 ELSE 0.0 END), 2)"
    )


def gopher_metrics_sql(expr: str) -> dict[str, str]:
    """Twin of functions/text.py gopher_metrics over a text expression."""
    toks = tokens(expr)
    n_words = f"len({toks})"
    dw = f"greatest({n_words}, 1)"
    word_chars = f"list_sum(list_transform({toks}, t -> length(t)))"
    lines = f"list_filter(string_split({expr}, chr(10)), l -> trim(l) <> '')"
    n_lines = f"len({lines})"
    dl = f"greatest({n_lines}, 1)"
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": f"round(coalesce({word_chars}, 0) / {dw}, 4)",
        "symbol_ratio": (
            f"round(len(regexp_extract_all({expr}, '#|\\.\\.\\.|…', 0)) / {dw}, 4)"
        ),
        "alpha_word_frac": (
            f"round(len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))"
            f" / {dw}, 4)"
        ),
        "dup_line_frac": (
            f"round(({n_lines} - len(list_distinct({lines}))) / {dl}, 4)"
        ),
        "bullet_line_frac": (
            f"round(len(list_filter({lines}, "
            f"l -> regexp_matches(trim(l), '^[-*•]'))) / {dl}, 4)"
        ),
        "ellipsis_line_frac": (
            f"round(len(list_filter({lines}, "
            f"l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$'))) / {dl}, 4)"
        ),
    }




def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of functions/text.py html_to_text — the identical
    RE2 regex chain (the Spark side is RE2-compatible by design:
    per-element swallow passes instead of a backreference, which RE2
    lacks)."""
    t = expr
    for el in ("script", "style", "noscript", "template"):
        t = (
            f"regexp_replace({t}, "
            f"'(?is)<{el}\\b[^>]*>.*?</{el}>', ' ', 'g')"
        )
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    t = (
        f"regexp_replace({t}, "
        f"'(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\\b[^>]*>', "
        f"chr(10), 'g')"
    )
    t = f"regexp_replace({t}, '(?s)</?[A-Za-z][^>]*>|<![^>]*>', ' ', 'g')"
    for ent, rep in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "''"), ("&apos;", "''"), ("&nbsp;", " "),
        ("&amp;", "&"),
    ]:
        t = f"replace({t}, '{ent}', '{rep}')"
    t = rf"regexp_replace({t}, '[ \t\r\f]+', ' ', 'g')"
    t = rf"regexp_replace({t}, ' ?\n ?', chr(10), 'g')"
    t = rf"regexp_replace({t}, '\n{{2,}}', chr(10), 'g')"
    # DuckDB's two-arg trim == Spark's btrim (strip from both ends)
    return f"trim({t}, ' ' || chr(10) || chr(9) || chr(13))"


#: Twin of the HTML garnish in _q_quality_filters (r7 html_to_text
#: rode-along) — must match the Spark concat byte-for-byte.
QUALITY_HTML_SQL = (
    "'<html><head><title>Doc</title><style>p { color: blue; }"
    "</style><script>var x = \"<b>not text</b>\";</script></head>"
    "<body><!-- hidden <p>comment</p> --><h1>Doc ' "
    "|| CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><ul><li>alpha</li><li>beta&amp;amp;gamma</li></ul>"
    "&nbsp;tail &lt;end&gt;</body></html>'"
)


#: Twin of the synthetic multi-line corpus in _q_quality_filters: the
#: single-line documents fixture gains deterministic repeated lines
#: (even ids), bullet lines (ids % 3) and ellipsis endings (ids % 5) so
#: the line-level Gopher metrics have signal.
QUALITY_SYNTH_SQL = (
    "text || chr(10) || "
    "CASE WHEN doc_id % 2 = 0 THEN substr(text, 1, 40) || chr(10) || "
    "substr(text, 1, 40) "
    "ELSE 'second line ' || CAST(doc_id AS VARCHAR) END || "
    "CASE WHEN doc_id % 3 = 0 THEN chr(10) || '- bullet one' || chr(10) || "
    "'- bullet two' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'to be continued...' "
    "ELSE '' END"
)


def quality_filters_sql() -> str:
    """Twin of _q_quality_filters: Gopher metrics + keep verdict over
    the synthetic multi-line corpus (thresholds as in the query:
    fixture-sized min_words=10, min_mean_word_len=2.0, rest = paper),
    plus the cross-document line duplication stats (r5) — the oracle
    groups raw trimmed lines where Spark groups their 60-bit md5 hash,
    identical counts modulo md5 collisions."""
    m = gopher_metrics_sql("text")
    cols = ",\n       ".join(f"{sql} AS {name}" for name, sql in m.items())
    html_text = html_to_text_sql(QUALITY_HTML_SQL)
    n_html = f"CAST(len({tokens('html_text')}) AS BIGINT)"
    return f"""
WITH synth AS (
  SELECT doc_id, {QUALITY_SYNTH_SQL} AS text FROM documents
),
htext AS (
  SELECT doc_id, {html_text} AS html_text FROM documents
),
metrics AS (
  SELECT doc_id,
       {cols}
  FROM synth
),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM synth
),
line_docs AS (
  SELECT trim(line) AS tl, count(DISTINCT doc_id) AS docs_w
  FROM lines WHERE trim(line) <> '' GROUP BY 1
),
linestats AS (
  SELECT l.doc_id,
         CAST(count(*) AS BIGINT) AS xdoc_n_lines,
         CAST(coalesce(sum(CASE WHEN docs_w >= 2 THEN 1 END), 0) AS BIGINT)
           AS xdoc_dup_lines,
         round(coalesce(
           CAST(sum(CASE WHEN docs_w >= 2 THEN length(line) ELSE 0 END)
                AS DOUBLE) / nullif(sum(length(line)), 0), 0.0), 4)
           AS xdoc_dup_char_frac
  FROM lines l LEFT JOIN line_docs c ON trim(l.line) = c.tl
  GROUP BY 1
),
entcnt AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
  GROUP BY 1, 2
),
ent AS (
  SELECT doc_id, round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS char_ent
  FROM entcnt GROUP BY doc_id
),
qm AS (
  SELECT doc_id, {qm_prob_sql("text")} AS qm_prob FROM documents
)
SELECT m.*,
       (n_words BETWEEN 10 AND 100000
        AND mean_word_len BETWEEN 2.0 AND 10.0
        AND symbol_ratio <= 0.1
        AND alpha_word_frac >= 0.8
        AND dup_line_frac <= 0.3
        AND bullet_line_frac <= 0.9
        AND ellipsis_line_frac <= 0.3) AS keep,
       html_text, {n_html} AS html_tokens, char_ent, qm_prob,
       xdoc_n_lines, xdoc_dup_lines, xdoc_dup_char_frac
FROM metrics m JOIN linestats USING (doc_id) JOIN htext USING (doc_id)
     JOIN ent USING (doc_id) JOIN qm USING (doc_id)
"""


def text_features_sql() -> str:
    """doc_id, cleaned text, token count, lang-id, quality,
    fingerprint, and (r5) the corpus-unigram logppl twin."""
    toks = tokens("text")
    n_toks = f"len({toks})"
    lang_case = lang_case_sql("text")
    quality = quality_sql("text")
    fp = h64("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
    # twin of functions/text.py _SUBWORD_RE (RE2-compatible by design)
    n_subwords = (
        "len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+', 0))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({toks}) AS t FROM documents
),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT sum(c) AS s FROM cnt),
prob AS (SELECT t, ln(CAST(c AS DOUBLE) / s) AS lp FROM cnt, tot),
ppl AS (
  SELECT id, round(-avg(lp), 4) AS logppl
  FROM tok JOIN prob USING (t) GROUP BY id
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '[\\r\\n]+', ' ', 'g'), '\\s+', ' ', 'g')) AS cleaned,
       CAST({n_toks} AS BIGINT) AS n_tokens,
       CAST({n_subwords} AS BIGINT) AS n_subwords,
       {lang_case} AS lang_pred,
       CAST({quality} AS DOUBLE) AS quality,
       {fp} AS fp,
       logppl
FROM documents LEFT JOIN ppl ON documents.doc_id = ppl.id
"""


def corpus_with_copies_sql(perturb: str | None) -> str:
    """documents ∪ copies at doc_id + (1 + max(doc_id)) — the offset is
    DERIVED from the live table exactly like the engine's
    ``_id_offset`` (r13: a fixed +100000 collided with original ids at
    sf10's 500k docs, violating the dedup operators' unique-id
    contract); ``perturb`` appends a suffix to the copy text (None =
    exact copies)."""
    suffix = f" || '{perturb}'" if perturb else ""
    return f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + (SELECT 1 + max(doc_id) FROM documents) AS doc_id,
         text{suffix} AS text
  FROM documents
"""


def exact_dedup_sql() -> str:
    fp = h64("trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
    return f"""
WITH corpus AS ({corpus_with_copies_sql(None)}),
fps AS (SELECT doc_id, {fp} AS fp FROM corpus)
SELECT doc_id FROM (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM fps
) WHERE doc_id = keeper
"""


def jaccard_expr(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    union = f"(len({a}) + len({b}) - {inter})"
    return f"round({inter} / greatest({union}, 1), 6)"


def minhash_lsh_pairs_sql(n: int = 2, num_hashes: int = 32, bands: int = 8,
                          min_jaccard: float = 0.5, perturb: str = " qq",
                          shingle: str = "word") -> str:
    from dw_etl_spark.functions.text import MINHASH_P, minhash_coeffs

    r = num_hashes // bands
    sh = word_shingles("text", n) if shingle == "word" else shingles("text", n)
    sig_terms = ", ".join(
        f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {MINHASH_P})) AS m{j}"
        for j, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        + " || ',' || ".join(f"CAST(m{b * r + i} AS VARCHAR)" for i in range(r))
        + " AS key FROM sigs"
        for b in range(bands)
    )
    jac = jaccard_expr("sa.sh", "sb.sh")
    return f"""
WITH corpus AS ({corpus_with_copies_sql(perturb)}),
shingled AS (SELECT doc_id AS id, {sh} AS sh FROM corpus),
hashed AS (
  SELECT id, sh, list_transform(sh, s -> {h28('s')}) AS hv FROM shingled
),
sigs AS (SELECT id, {sig_terms} FROM hashed),
banded AS ({band_rows}),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT c.id_a, c.id_b, {jac} AS jaccard
FROM cands c
JOIN shingled sa ON sa.id = c.id_a
JOIN shingled sb ON sb.id = c.id_b
WHERE {jac} >= {min_jaccard}
"""


def ngram_jaccard_sql(n: int = 2, min_jaccard: float = 0.5,
                      left_max_id: int = 50, perturb: str = " qq",
                      shingle: str = "word") -> str:
    sh = word_shingles("text", n) if shingle == "word" else shingles("text", n)
    jac = jaccard_expr("a.sh", "b.sh")
    return f"""
WITH corpus AS ({corpus_with_copies_sql(perturb)}),
shingled AS (SELECT doc_id AS id, {sh} AS sh FROM corpus)
SELECT a.id AS id_a, b.id AS id_b, {jac} AS jaccard
FROM (SELECT * FROM shingled WHERE id < {left_max_id}) a
JOIN shingled b ON a.id < b.id
WHERE {jac} >= {min_jaccard}
"""


def simhash_pairs_sql(n: int = 2, max_hamming: int = 3, perturb: str = " qq",
                      shingle: str = "word", bands_n: int = 4,
                      bits_per_band: int = 16,
                      max_bucket_size: int | None = None) -> str:
    """64-bit simhash twin: two 32-bit md5 lanes (hex 1-8 / 9-16) give
    64 portable vote bits; bit 63 contributes -2^63 so the assembled
    BIGINT matches Spark's signed long exactly (partial sums of bits
    0..62 stay <= 2^63-1, so no checked-overflow trip).

    ``max_bucket_size`` mirrors operators/text_dedup.py:simhash_pairs:
    (band, key) buckets holding more rows are dropped before the
    self-join (hot-bucket mitigation)."""
    assert bands_n * bits_per_band == 64
    sh = word_shingles("text", n) if shingle == "word" else shingles("text", n)

    def vote(b: int) -> str:
        lane, shift = ("hs1", b) if b < 32 else ("hs2", b - 32)
        on = -(1 << 63) if b == 63 else 1 << b
        return (
            f"(CASE WHEN 2 * list_sum(list_transform({lane}, h -> (h >> {shift}) & 1))"
            f" - len({lane}) > 0 THEN CAST({on} AS BIGINT) ELSE 0 END)"
        )

    vote_terms = " + ".join(vote(b) for b in range(64))
    mask = (1 << bits_per_band) - 1
    bands = " UNION ALL ".join(
        f"SELECT id, sh, {i} AS band, (sh >> {i * bits_per_band}) & {mask} AS key "
        f"FROM hashes"
        for i in range(bands_n)
    )
    capped = (
        "SELECT id, sh, band, key FROM ("
        "SELECT *, count(*) OVER (PARTITION BY band, key) AS __occ "
        "FROM banded_all"
        f") WHERE __occ <= {max_bucket_size}"
        if max_bucket_size is not None
        else "SELECT * FROM banded_all"
    )
    return f"""
WITH corpus AS ({corpus_with_copies_sql(perturb)}),
shingled AS (SELECT doc_id AS id, {sh} AS shs FROM corpus),
hlists AS (
  SELECT id, list_transform(shs, s -> {h32a('s')}) AS hs1,
         list_transform(shs, s -> {h32b('s')}) AS hs2 FROM shingled
),
hashes AS (
  SELECT id, CASE WHEN len(hs1) = 0 THEN 0 ELSE {vote_terms} END AS sh FROM hlists
),
banded_all AS ({bands}),
banded AS ({capped}),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {max_hamming}
"""


def _dot64(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _norm64(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, 65), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def cosine_topk_sql(k: int = 5, query_max_id: int = 10) -> str:
    cos = f"round({_dot64('q.embedding', 'c.embedding')} / ({_norm64('q.embedding')} * {_norm64('c.embedding')}), 6)"
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM (SELECT * FROM embeddings WHERE vec_id < {query_max_id}) q
  CROSS JOIN embeddings c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def int8_cosine_topk_sql(k: int = 5, query_max_id: int = 10) -> str:
    """SQL twin of ``similarity.int8_cosine_topk``: absmax int8
    quantization replayed closed-form (scale = list_max(|x|)/127,
    codes = round(x/scale) — DuckDB and Spark both round half away
    from zero), then cosine on the CODES with exact BIGINT dot/norm
    sums so the single final double division is bit-identical."""
    qz = (
        "list_transform({e}, x -> CAST(round(CAST(x AS DOUBLE) / "
        "(list_max(list_transform({e}, y -> abs(CAST(y AS DOUBLE)))) "
        "/ 127.0)) AS INTEGER))"
    )
    dotq = (
        "CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.qv[i] AS BIGINT) * c.qv[i])) AS DOUBLE)"
    )
    nrm = (
        "sqrt(CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST({s}.qv[i] AS BIGINT) * {s}.qv[i])) AS DOUBLE))"
    )
    cos = f"round({dotq} / ({nrm.format(s='q')} * {nrm.format(s='c')}), 6)"
    return f"""
WITH quant AS (
  SELECT vec_id, {qz.format(e='embedding')} AS qv FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM (SELECT * FROM quant WHERE vec_id < {query_max_id}) q
  CROSS JOIN quant c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def int8_ivf_topk_sql(
    k: int = 5, query_max_id: int = 10, n_centroids: int = 16, nprobe: int = 4
) -> str:
    """SQL twin of ``similarity.int8_ivf_topk`` — quantized ANN with
    IVF routing, all in CODE space: the same absmax quantization as
    ``int8_cosine_topk_sql``, the same id-keyed md5 centroid sample as
    ``ivf_topk_sql`` (the sample is vector-independent, so float and
    code space pick the SAME rows), assignment/probes ranked by
    (rounded code-cosine DESC, cid ASC), co-listed pairs scored with
    the exact-BIGINT int8 cosine. Every pre-round quantity is integer-
    exact in both engines (code dots ≤ 64·127² ≪ 2^53), so the single
    rounded division per stage is bit-identical."""
    qz = (
        "list_transform({e}, x -> CAST(round(CAST(x AS DOUBLE) / "
        "(list_max(list_transform({e}, y -> abs(CAST(y AS DOUBLE)))) "
        "/ 127.0)) AS INTEGER))"
    )
    # assignment cosine over code arrays as doubles (integer-exact)
    cdot = (
        "CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST(e.qv[i] AS DOUBLE) * c.qv[i])) AS DOUBLE)"
    )
    cnrm = (
        "sqrt(CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST({s}.qv[i] AS DOUBLE) * {s}.qv[i])) AS DOUBLE))"
    )
    rcos = f"round({cdot} / ({cnrm.format(s='e')} * {cnrm.format(s='c')}), 6)"
    # pair scoring: exact BIGINT folds, one double division (the
    # int8_cosine contract)
    dotq = (
        "CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST(q.qqv[i] AS BIGINT) * a.cqv[i])) AS DOUBLE)"
    )
    nrm = (
        "sqrt(CAST(list_sum(list_transform(range(1, 65), "
        "i -> CAST({s}.{v}[i] AS BIGINT) * {s}.{v}[i])) AS DOUBLE))"
    )
    pcos = (
        f"round({dotq} / ({nrm.format(s='q', v='qqv')} * "
        f"{nrm.format(s='a', v='cqv')}), 6)"
    )
    return f"""
WITH quant AS (
  SELECT vec_id, {qz.format(e='embedding')} AS qv FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         qv
  FROM quant
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_centroids}
),
ranked AS (
  SELECT e.vec_id, e.qv, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {rcos} DESC, c.cid ASC) AS rn
  FROM quant e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id AS neighbor_id, qv AS cqv, cid FROM ranked WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, qv AS qqv, cid
  FROM ranked WHERE rn <= {nprobe} AND vec_id < {query_max_id}
),
scored AS (
  SELECT q.query_id, a.neighbor_id, {pcos} AS cos_sim
  FROM assigned a JOIN probes q USING (cid)
  WHERE q.query_id <> a.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


#: retrieve-rerank rode-along (rr: rows of cosine_topk): BM25 recall of
#: the top-M lexical candidates per every-17th-doc prefix query (the
#: bm25 gate framing, hot-term cap active), then 64-dim cosine re-rank
#: to top-K over candidates that HAVE an embeddings row (vec_id-keyed;
#: query docs without a vector drop out identically in both engines).
#: The corpus is the fixed doc_id < MAXID slice — the whole corpus at
#: the 500-doc gate SFs, and an SF-CONSTANT cost bound at bench SFs
#: (same rule as BM25IX_GATE_MAXID).
RR_GATE_M = 10
RR_GATE_K = 3
RR_GATE_MAXID = 500


def retrieve_rerank_sql() -> str:
    """SQL twin of ``operators/ir.retrieve_rerank`` on the gate
    fixture: the parameterized ``bm25_topk_sql`` at k=M plays stage 1,
    the cosine closed form over (candidate × its embedding × the query
    embedding) plays stage 2; rank over (round(cos,6) DESC, id ASC)."""
    cos = (
        f"round({_dot64('qe.embedding', 'ce.embedding')} / "
        f"({_norm64('qe.embedding')} * {_norm64('ce.embedding')}), 6)"
    )
    return f"""
WITH cand AS ({bm25_topk_sql(
        k=RR_GATE_M, corpus_pred=f"doc_id < {RR_GATE_MAXID}")}),
rr AS (
  SELECT c.query_id, c.id, c.score AS bm25_score, {cos} AS cos_sim
  FROM cand c
  JOIN embeddings ce ON ce.vec_id = c.id
  JOIN embeddings qe ON qe.vec_id = c.query_id
)
SELECT query_id, id, bm25_score, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, id ASC) AS rank
  FROM rr
) WHERE rank <= {RR_GATE_K}
"""


def lsh_planes_sql(count_sql: str, target_bucket: int = 16, max_planes: int = 24) -> str:
    """Integer-exact SQL twin of ``suggest_lsh_params(n)["n_planes"]``
    (similarity.py:145) for a LIVE corpus count — the r11 no-per-SF-
    constants rule: the oracle derives index sizing from the data the
    SQL can see, exactly like the engine derives it from ``count()``.

    ``round(log2(max(n/t, 2)))`` clamped to [1, max_planes] is
    replayed WITHOUT floats: round-half-up(log2(n/t)) >= p  ⟺
    n² >= t²·2^(2p−1), so the plane count is just how many p in
    1..max_planes satisfy that HUGEINT comparison (monotone in p),
    floored at 1 (which also covers the m=max(n/t,2) clamp). An exact
    .5 rank would need n/t = 2^(p−1/2) — irrational, so no integer n
    hits the half-up/half-even divergence; parity with the Python rule
    is pytest-swept across n."""
    n = f"CAST(({count_sql}) AS HUGEINT)"
    return (
        f"(SELECT GREATEST(1, count(*)) "
        f"FROM generate_series(1, {max_planes}) g(p) "
        f"WHERE {n} * {n} >= "
        f"(CAST({target_bucket * target_bucket} AS HUGEINT) << (2 * p - 1)))"
    )


def lsh_bucket_sql(
    vec: str, dim: int = 64, n_planes: int | str = 8, max_planes: int = 24
) -> str:
    """Same hyperplanes as operators/similarity.py: md5-derived floats.

    ``n_planes`` may be an SQL expression (r11: a ``lsh_planes_sql``
    scalar) — the bucket then emits every plane term up to
    ``max_planes``, each gated on ``p < n_planes``, so ONE static SQL
    string serves any corpus size."""
    dynamic = not isinstance(n_planes, int)
    terms = []
    for p in range(max_planes if dynamic else n_planes):
        comps = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16)
            comps.append((h % 2001 - 1000) / 1000.0)
        proj = " + ".join(
            f"CAST({vec}[{d + 1}] AS DOUBLE) * {comps[d]!r}" for d in range(dim)
        )
        gate = f"{p} < ({n_planes}) AND " if dynamic else ""
        terms.append(
            f"(CASE WHEN {gate}({proj}) > 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def embedding_dup_pairs_sql(
    n_planes: int | None = None, min_cosine: float = 0.99
) -> str:
    """``n_planes=None`` (r11 default) derives the plane count from the
    live doubled-corpus size via ``lsh_planes_sql`` — the engine twin
    calls ``suggest_lsh_params(2 * emb.count())``."""
    cos = (
        f"round({_dot64('a.embedding', 'b.embedding')} / "
        f"({_norm64('a.embedding')} * {_norm64('b.embedding')}), 6)"
    )
    np_sql = (
        lsh_planes_sql("SELECT 2 * count(*) FROM embeddings")
        if n_planes is None
        else n_planes
    )
    bucket = lsh_bucket_sql("embedding", 64, "np.v" if n_planes is None else n_planes)
    return f"""
WITH np AS (SELECT {np_sql} AS v),
corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + (SELECT 1 + max(vec_id) FROM embeddings) AS vec_id,
         embedding
  FROM embeddings
),
bucketed AS (SELECT vec_id, embedding, {bucket} AS bucket FROM corpus, np)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos_sim
FROM bucketed a JOIN bucketed b
  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {min_cosine}
"""


def ivf_topk_sql(
    k: int = 5, query_max_id: int = 10, n_centroids: int = 16, nprobe: int = 4
) -> str:
    """Twin of operators/similarity.py:ivf_topk — identical centroid
    sample (ORDER BY md5 hex LIMIT k), identical (rounded cos DESC,
    cid ASC) ranking for assignment and probes."""
    rcos = (
        f"round({_dot64('e.embedding', 'c.embedding')} / "
        f"({_norm64('e.embedding')} * {_norm64('c.embedding')}), 6)"
    )
    cos = (
        f"round({_dot64('q.qv', 'a.cv')} / "
        f"({_norm64('q.qv')} * {_norm64('a.cv')}), 6)"
    )
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_centroids}
),
ranked AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {rcos} DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, cid FROM ranked WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv, cid
  FROM ranked WHERE rn <= {nprobe} AND vec_id < {query_max_id}
),
scored AS (
  SELECT q.query_id, a.neighbor_id, {cos} AS cos_sim
  FROM assigned a JOIN probes q USING (cid)
  WHERE q.query_id <> a.neighbor_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def pq_topk_sql(
    k: int = 5,
    query_max_id: int = 10,
    m: int = 8,
    pq_k: int = 16,
    n_centroids: int = 16,
    nprobe: int = 4,
    dim: int = 64,
) -> str:
    """SQL twin of ``similarity.pq_topk`` (section='pq'),
    ``similarity.ivfpq_topk`` (section='ivfpq') under SEED codebooks
    (``pq_train_codebooks(iters=0)`` — the deterministic md5-rank
    sample, closed-form replay), and — r14, VERDICT r13 next #7 —
    section='pq1': ADC top-k under ONE Lloyd refinement with
    QUANTIZED-CENTS means (``pq_train_codebooks(iters=1,
    mean_mode='cents')``). The cents update replays exactly because
    the sum is integer (order-free commutative addition; both engines
    round(x·100) half-away-from-zero, cast to BIGINT, SUM exactly) and
    the mean is one double division ``sum/(100·n)`` — so Lloyd-REFINED
    codebooks are now hash-gated, not pytest-only (float-mean Lloyd
    iterations remain pytest-pinned: their summation order is
    engine-dependent; recall is measured identical to cents at iters
    1-2 on the fixture).

    Bit-parity shape: every subspace distance is an IN-ORDER fold of
    ``dim/m`` double terms (list_transform over an ordered range →
    list_sum, matching Spark's ``aggregate(zip_with(...))`` element
    order), rounded to 9 before the argmin/lookup; the ADC score is an
    in-order fold over the m rounded table entries, rounded to 6 —
    identical operand values and order in both engines, so the gate
    hash is exact, not approximately-equal. IVF routing for the
    ivfpq section replays ``ivf_topk_sql``'s float-space centroid
    sample and (rounded cos DESC, cid ASC) ranking."""
    sub_d = dim // m
    rcos = (
        f"round({_dot64('e.embedding', 'c.embedding')} / "
        f"({_norm64('e.embedding')} * {_norm64('c.embedding')}), 6)"
    )
    sq = (
        f"(CAST(e.embedding[b.sub * {sub_d} + i] AS DOUBLE) - b.bvec[i])"
    )
    adc = (
        f"round(list_sum(list_transform(range(1, {m} + 1), "
        f"s -> q.tbl[s][c.codes[s] + 1])), 6)"
    )
    return f"""
WITH seeds AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {pq_k}
),
books AS (
  SELECT sb.sub, seeds.cid,
         list_transform(range(1, {sub_d} + 1),
                        i -> seeds.v[sb.sub * {sub_d} + i]) AS bvec
  FROM seeds CROSS JOIN (SELECT unnest(range(0, {m})) AS sub) sb
),
dists AS (
  SELECT e.vec_id AS id, b.sub, b.cid,
         round(list_sum(list_transform(range(1, {sub_d} + 1),
               i -> {sq} * {sq})), 9) AS d2
  FROM embeddings e CROSS JOIN books b
),
enc AS (
  SELECT id, list(cid ORDER BY sub) AS codes FROM (
    SELECT id, sub, cid,
           row_number() OVER (PARTITION BY id, sub
                              ORDER BY d2 ASC, cid ASC) AS rn
    FROM dists) WHERE rn = 1
  GROUP BY id
),
qtbl AS (
  SELECT id AS query_id, list(sub_tbl ORDER BY sub) AS tbl FROM (
    SELECT id, sub, list(d2 ORDER BY cid) AS sub_tbl
    FROM dists WHERE id < {query_max_id} GROUP BY id, sub)
  GROUP BY id
),
pq_scored AS (
  SELECT q.query_id, c.id AS neighbor_id, {adc} AS adist
  FROM qtbl q CROSS JOIN enc c
  WHERE q.query_id <> c.id
),
pq_top AS (
  SELECT 'pq' AS section, query_id, neighbor_id, adist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adist ASC, neighbor_id ASC) AS rn
    FROM pq_scored) WHERE rn <= {k}
),
-- section='pq1': one Lloyd step with quantized-cents means. assign1
-- is the seed-book argmin (same ranking as enc); the mean replays
-- EXACTLY because round(x*100)→BIGINT sums are order-free and the
-- mean is one double division sum/(100*n); empty cells keep their
-- seed centroid (COALESCE), matching the engine's got-or-keep rule.
assign1 AS (
  SELECT id, sub, cid FROM (
    SELECT id, sub, cid,
           row_number() OVER (PARTITION BY id, sub
                              ORDER BY d2 ASC, cid ASC) AS rn
    FROM dists) WHERE rn = 1
),
b1means AS (
  SELECT a.sub, a.cid, i.pos,
         CAST(SUM(CAST(round(CAST(e.embedding[a.sub * {sub_d} + i.pos]
                   AS DOUBLE) * 100) AS BIGINT)) AS DOUBLE)
           / (100.0 * COUNT(*)) AS mn
  FROM assign1 a
  JOIN embeddings e ON e.vec_id = a.id
  CROSS JOIN (SELECT unnest(range(1, {sub_d} + 1)) AS pos) i
  GROUP BY a.sub, a.cid, i.pos
),
books1 AS (
  SELECT b.sub, b.cid,
         list_transform(range(1, {sub_d} + 1),
                        i -> COALESCE(m.mvec[i], b.bvec[i])) AS bvec
  FROM books b LEFT JOIN (
    SELECT sub, cid, list(mn ORDER BY pos) AS mvec
    FROM b1means GROUP BY sub, cid) m
  ON m.sub = b.sub AND m.cid = b.cid
),
dists1 AS (
  SELECT e.vec_id AS id, b.sub, b.cid,
         round(list_sum(list_transform(range(1, {sub_d} + 1),
               i -> {sq} * {sq})), 9) AS d2
  FROM embeddings e CROSS JOIN books1 b
),
enc1 AS (
  SELECT id, list(cid ORDER BY sub) AS codes FROM (
    SELECT id, sub, cid,
           row_number() OVER (PARTITION BY id, sub
                              ORDER BY d2 ASC, cid ASC) AS rn
    FROM dists1) WHERE rn = 1
  GROUP BY id
),
qtbl1 AS (
  SELECT id AS query_id, list(sub_tbl ORDER BY sub) AS tbl FROM (
    SELECT id, sub, list(d2 ORDER BY cid) AS sub_tbl
    FROM dists1 WHERE id < {query_max_id} GROUP BY id, sub)
  GROUP BY id
),
pq1_scored AS (
  SELECT q.query_id, c.id AS neighbor_id, {adc} AS adist
  FROM qtbl1 q CROSS JOIN enc1 c
  WHERE q.query_id <> c.id
),
pq1_top AS (
  SELECT 'pq1' AS section, query_id, neighbor_id, adist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adist ASC, neighbor_id ASC) AS rn
    FROM pq1_scored) WHERE rn <= {k}
),
cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_centroids}
),
ranked AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {rcos} DESC, c.cid ASC) AS rn
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id AS id, cid FROM ranked WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cid
  FROM ranked WHERE rn <= {nprobe} AND vec_id < {query_max_id}
),
ivfpq_scored AS (
  SELECT p.query_id, a.id AS neighbor_id, {adc} AS adist
  FROM probes p JOIN assigned a USING (cid)
  JOIN enc c ON c.id = a.id
  JOIN qtbl q ON q.query_id = p.query_id
  WHERE p.query_id <> a.id
),
ivfpq_top AS (
  SELECT 'ivfpq' AS section, query_id, neighbor_id, adist FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY adist ASC, neighbor_id ASC) AS rn
    FROM ivfpq_scored) WHERE rn <= {k}
)
SELECT section, query_id, neighbor_id, adist FROM pq_top
UNION ALL
SELECT section, query_id, neighbor_id, adist FROM pq1_top
UNION ALL
SELECT section, query_id, neighbor_id, adist FROM ivfpq_top
"""


def lsh_topk_sql(
    k: int = 5, query_max_id: int = 10, n_planes: int | None = None
) -> str:
    """``n_planes=None`` (r11 default) derives the plane count from the
    live corpus size via ``lsh_planes_sql`` — the engine twin calls
    ``suggest_lsh_params(emb.count())``."""
    cos = f"round({_dot64('q.embedding', 'c.embedding')} / ({_norm64('q.embedding')} * {_norm64('c.embedding')}), 6)"
    np_sql = (
        lsh_planes_sql("SELECT count(*) FROM embeddings")
        if n_planes is None
        else n_planes
    )
    bucket = lsh_bucket_sql("embedding", 64, "np.v" if n_planes is None else n_planes)
    return f"""
WITH np AS (SELECT {np_sql} AS v),
b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings, np),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM (SELECT * FROM b WHERE vec_id < {query_max_id}) q
  JOIN b c ON q.bucket = c.bucket
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def semantic_dedup_pairs_sql(
    threshold: float = 0.95, n_centroids: int | str = 16,
    source: str = "embeddings",
) -> str:
    """Twin of operators/similarity.py:semantic_dedup_pairs — identical
    md5-sampled centroids, identical (rounded cos DESC, cid ASC)
    assignment, within-cluster (id_a < id_b) pairs at rounded cosine
    >= threshold. ``source`` is any table expression exposing
    (vec_id, embedding). ``n_centroids`` may be an SQL scalar
    expression (r11: derive ``max(16, n // 64)`` from the live corpus
    count — DuckDB accepts subqueries in LIMIT)."""
    rcos = (
        f"round({_dot64('e.embedding', 'c.embedding')} / "
        f"({_norm64('e.embedding')} * {_norm64('c.embedding')}), 6)"
    )
    pcos = (
        f"round({_dot64('a.v', 'b.v')} / "
        f"({_norm64('a.v')} * {_norm64('b.v')}), 6)"
    )
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid,
         embedding
  FROM {source} AS s0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_centroids}
),
ranked AS (
  SELECT e.vec_id, e.embedding, c.cid,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY {rcos} DESC, c.cid ASC) AS rn
  FROM {source} AS e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id AS id, embedding AS v, cid FROM ranked WHERE rn = 1
)
SELECT a.id AS id_a, b.id AS id_b, {pcos} AS cos_sim
FROM assigned a JOIN assigned b USING (cid)
WHERE a.id < b.id AND {pcos} >= {threshold}
"""


def semantic_dedup_sql(threshold: float = 0.95, n_centroids: int = 16) -> str:
    """Keep-verdict twin: drop iff a smaller id pairs with you."""
    pairs = semantic_dedup_pairs_sql(threshold, n_centroids)
    return f"""
SELECT vec_id AS id,
       vec_id NOT IN (SELECT id_b FROM ({pairs})) AS keep
FROM embeddings
"""


def bigram_logppl_sql(lam: float = 0.75) -> str:
    """Twin of operators/lm.py:bigram_logppl on the documents table —
    same bigram construction (adjacent token pairs), same context
    marginal derived from the pair table, same interpolation."""
    toks = tokens("text")
    return f"""
WITH doc_toks AS (
  SELECT doc_id AS id, {toks} AS ts FROM documents
),
bi AS (
  SELECT id, ts[i] AS a, ts[i + 1] AS b
  FROM doc_toks, unnest(range(1, len(ts))) AS r(i)
),
c2 AS (SELECT a, b, count(*) AS c2 FROM bi GROUP BY a, b),
ctx AS (SELECT a, sum(c2) AS c1 FROM c2 GROUP BY a),
uni AS (
  SELECT t, count(*) AS cu
  FROM (SELECT unnest(ts) AS t FROM doc_toks) GROUP BY t
),
tot AS (SELECT sum(cu) AS s FROM uni),
scored AS (
  SELECT bi.id,
         ln({lam} * CAST(c2.c2 AS DOUBLE) / ctx.c1
            + {1.0 - lam} * CAST(uni.cu AS DOUBLE) / tot.s) AS lp
  FROM bi
  JOIN c2 USING (a, b)
  JOIN ctx USING (a)
  JOIN uni ON bi.b = uni.t
  CROSS JOIN tot
),
ppl AS (SELECT id, round(-avg(lp), 4) AS logppl2 FROM scored GROUP BY id)
SELECT doc_id AS id, logppl2
FROM documents LEFT JOIN ppl ON documents.doc_id = ppl.id
"""


def kn_bigram_logppl_sql(discount: float = 0.75) -> str:
    """Twin of operators/lm.py:kn_bigram_logppl on the documents table
    — absolute discount, continuation counts over distinct histories,
    every statistic derived from the one (a, b, c2) pair table."""
    toks = tokens("text")
    return f"""
WITH doc_toks AS (
  SELECT doc_id AS id, {toks} AS ts FROM documents
),
bi AS (
  SELECT id, ts[i] AS a, ts[i + 1] AS b
  FROM doc_toks, unnest(range(1, len(ts))) AS r(i)
),
c2 AS (SELECT a, b, count(*) AS c2 FROM bi GROUP BY a, b),
ctx AS (SELECT a, sum(c2) AS c1, count(*) AS n1a FROM c2 GROUP BY a),
cont AS (SELECT b, count(*) AS n1b FROM c2 GROUP BY b),
tt AS (SELECT count(*) AS tt FROM c2),
scored AS (
  SELECT bi.id,
         ln(greatest(CAST(c2.c2 AS DOUBLE) - {discount}, 0.0) / ctx.c1
            + {discount} * ctx.n1a / ctx.c1
              * CAST(cont.n1b AS DOUBLE) / tt.tt) AS lp
  FROM bi
  JOIN c2 USING (a, b)
  JOIN ctx USING (a)
  JOIN cont USING (b)
  CROSS JOIN tt
),
ppl AS (SELECT id, round(-avg(lp), 4) AS logppl_kn FROM scored GROUP BY id)
SELECT doc_id AS id, logppl_kn
FROM documents LEFT JOIN ppl ON documents.doc_id = ppl.id
"""


def tfidf_top_terms_sql(k: int = 5) -> str:
    """Twin of operators/ir.py:tfidf_top_terms on the documents table."""
    toks = tokens("text")
    return f"""
WITH tf AS (
  SELECT doc_id AS id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
  GROUP BY 1, 2
),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT id, term, tf,
         round(tf * (ln(CAST(n + 1 AS DOUBLE) / (df_t + 1)) + 1.0), 6)
           AS score
  FROM tf JOIN dft USING (term) CROSS JOIN n
)
SELECT id, term, CAST(tf AS BIGINT) AS tf, score, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY id
            ORDER BY score DESC, term ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def hashed_embedding_sql(dim: int = 64) -> str:
    """Twin of operators/ir.py:hashed_embedding — identical md5 bucket
    and sign lanes, identical fold order for the l2 norm."""
    toks = tokens("text")
    b = f"{h64('t')} % {dim}"
    # CAST: DuckDB decimal literals would otherwise make v/x*x DECIMAL
    # arithmetic while Spark accumulates doubles
    s = f"CAST(CASE WHEN {h32b('t')} % 2 = 0 THEN 1.0 ELSE -1.0 END AS DOUBLE)"
    return f"""
WITH cells AS (
  SELECT id, {b} AS b, sum({s}) AS v
  FROM (SELECT doc_id AS id, unnest({toks}) AS t FROM documents)
  GROUP BY 1, 2
),
grid AS (
  SELECT d.doc_id AS id, i.i AS b
  FROM documents d CROSS JOIN (SELECT unnest(range({dim})) AS i) i
),
raw AS (
  SELECT g.id, list(CAST(coalesce(c.v, 0) AS DOUBLE) ORDER BY g.b) AS rv
  FROM grid g LEFT JOIN cells c ON g.id = c.id AND g.b = c.b
  GROUP BY g.id
)
SELECT id,
       CASE WHEN sqrt(list_sum(list_transform(rv, x -> x * x))) > 0
            THEN list_transform(
              rv, x -> round(x / sqrt(list_sum(list_transform(rv, y -> y * y))), 6))
            ELSE list_transform(rv, x -> 0.0)
       END AS embedding
FROM raw
"""


def _dup_span_ctes(window: int, min_count: int) -> str:
    """Shared CTEs of the repeated-span twins: hashed word windows,
    corpus-global counts, covered token positions (0-based, like the
    engine's posexplode)."""
    toks = tokens("text")
    return f"""
dt AS (SELECT doc_id AS id, {toks} AS ts FROM documents),
wins AS (
  SELECT id, i - 1 AS wpos,
         {h64(f"array_to_string(ts[i : i + {window} - 1], ' ')")} AS g
  FROM dt, unnest(range(1, len(ts) - {window} + 2)) AS r(i)
),
dup_g AS (SELECT g FROM wins GROUP BY g HAVING count(*) >= {min_count}),
dup_pos AS (
  SELECT DISTINCT w.id, p
  FROM (SELECT wins.* FROM wins JOIN dup_g USING (g)) w,
       unnest(range(w.wpos, w.wpos + {window})) AS r(p)
)"""


def duplicated_span_stats_sql(window: int = 10, min_count: int = 2) -> str:
    """Twin of operators/text_dedup.py:duplicated_span_stats."""
    return f"""
WITH {_dup_span_ctes(window, min_count)},
per_doc AS (SELECT id, count(*) AS n_dup FROM dup_pos GROUP BY id)
SELECT dt.id,
       CAST(len(dt.ts) AS BIGINT) AS n_tokens,
       CAST(coalesce(per_doc.n_dup, 0) AS BIGINT) AS n_dup_tokens,
       round(CAST(coalesce(per_doc.n_dup, 0) AS DOUBLE)
             / greatest(len(dt.ts), 1), 6) AS dup_token_fraction
FROM dt LEFT JOIN per_doc USING (id)
"""


def remove_duplicated_spans_sql(window: int = 10, min_count: int = 2) -> str:
    """Twin of operators/text_dedup.py:remove_duplicated_spans —
    surviving tokens rejoined in position order with single spaces."""
    return f"""
WITH {_dup_span_ctes(window, min_count)},
toks AS (
  SELECT id, ts[pos + 1] AS tok, pos
  FROM dt, unnest(range(0, len(ts))) AS r(pos)
),
kept AS (
  SELECT toks.id, string_agg(toks.tok, ' ' ORDER BY toks.pos) AS cleaned
  FROM toks ANTI JOIN dup_pos ON toks.id = dup_pos.id AND toks.pos = dup_pos.p
  GROUP BY toks.id
)
SELECT dt.id, coalesce(kept.cleaned, '') AS cleaned
FROM dt LEFT JOIN kept USING (id)
"""


def chunk_documents_sql(chunk_tokens: int = 512, overlap: int = 0) -> str:
    """Twin of operators/packing.py:chunk_documents on the documents
    table — same stride, same pure-overlap trailing-chunk rule."""
    stride = chunk_tokens - overlap
    toks = tokens("text")
    return f"""
WITH dt AS (SELECT doc_id AS id, {toks} AS ts FROM documents),
starts AS (
  SELECT id, ts, s, CAST(row_number() OVER (
           PARTITION BY id ORDER BY s) - 1 AS BIGINT) AS chunk_id
  FROM dt, unnest(range(0, len(ts), {stride})) AS r(s)
  WHERE s = 0 OR s + {overlap} < len(ts)
)
SELECT id, chunk_id,
       CAST(len(ts[s + 1 : s + {chunk_tokens}]) AS BIGINT) AS n_tokens,
       array_to_string(ts[s + 1 : s + {chunk_tokens}], ' ') AS chunk
FROM starts
"""


# ---- round-8 gate fixtures: shared by __spark_entry__ (Spark side) and
# the SQL builders below, so the two sides can never drift -----------------

#: fixed-weight quality-scorer vocabulary (qm_prob column of the
#: quality_filters gate row). Term order IS the dot-product addition
#: order on both engines. Mix of unigrams and joined bigrams over the
#: documents fixture's working vocabulary.
QM_GATE_WEIGHTS: dict[str, float] = {
    "data": 0.35,
    "join": -0.2,
    "scan": 0.15,
    "slow": -0.45,
    "fast": 0.3,
    "query": 0.05,
    "hash_join": 0.6,
    "slow_scan": -0.8,
}
QM_GATE_INTERCEPT = -0.75

#: unigram-LM tokenizer gate fixture (tok: rows of token_freq): a tiny
#: inlined piece vocabulary whose probabilities make every fixture
#: word's Viterbi-best segmentation (a) unique with a >0.2 nat margin
#: and (b) at most 3 pieces, so DuckDB can replay the argmax as a
#: closed-form enumeration over <=3-piece lattices (verified in
#: tests/test_training_ops.py against the engine Viterbi).
UNI_GATE_VOCAB: dict[str, float] = {
    "a": 0.08,
    "b": 0.06,
    "c": 0.05,
    "ab": 0.22,
    "bc": 0.18,
    "ca": 0.13,
    "abc": 0.28,
}
UNI_GATE_WORDS = ["abc", "abca", "cab", "bcab", "aab", "abcab"]

#: PageRank gate fixture (pr: rows of profile_metrics): a 5-node
#: asymmetric digraph with one dangling node (4), damped 0.85, run a
#: FIXED 3 rounds so the oracle can unroll the power iteration.
PR_GATE_EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 4), (3, 0), (3, 2)]
PR_GATE_DAMPING = 0.85
PR_GATE_ROUNDS = 3


def qm_prob_sql(text_expr: str = "text") -> str:
    """Scalar SQL twin of ``quality_model.linear_quality_score`` with
    the ``QM_GATE_WEIGHTS`` model: unigrams + joined bigrams of the
    lower-cased text, count-based dot in the dict's order, sigmoid.
    DuckDB lists are 1-indexed; ``range(1, n)`` enumerates bigram
    start positions 1..n-1."""
    tk = tokens(f"lower({text_expr})")
    terms = (
        f"({tk} || list_transform(range(1, len({tk})), "
        f"i -> {tk}[i] || '_' || {tk}[i + 1]))"
    )
    dot = f"({QM_GATE_INTERCEPT})"
    for t, w in QM_GATE_WEIGHTS.items():
        dot += (
            f" + ({w}) * CAST(len(list_filter({terms}, "
            f"x -> x = '{t}')) AS DOUBLE)"
        )
    return f"round(1.0 / (1.0 + exp(-({dot}))), 6)"


def unigram_gate_sql() -> str:
    """tok: rows for the token_freq gate — closed-form Viterbi replay:
    enumerate every segmentation of each fixture word into <=3 pieces
    of ``UNI_GATE_VOCAB``, score by summed ln-probability, keep the
    argmax (unique by fixture design). Columns match token_freq's
    (kind, token, n, v): pieces joined by spaces, piece count, score
    rounded to 6."""
    vvals = ", ".join(f"('{p}', ln({pr}))" for p, pr in UNI_GATE_VOCAB.items())
    wvals = ", ".join(f"('{w}')" for w in UNI_GATE_WORDS)
    return f"""
SELECT 'tok:' || word AS kind, pieces AS token, n, round(score, 6) AS v
FROM (
  WITH uv(piece, lp) AS (VALUES {vvals}),
  uw(word) AS (VALUES {wvals}),
  seg AS (
    SELECT w.word, v1.piece AS pieces, CAST(1 AS BIGINT) AS n,
           v1.lp AS score
    FROM uw w JOIN uv v1 ON v1.piece = w.word
    UNION ALL
    SELECT w.word, v1.piece || ' ' || v2.piece, 2, v1.lp + v2.lp
    FROM uw w, uv v1, uv v2
    WHERE v1.piece || v2.piece = w.word
    UNION ALL
    SELECT w.word, v1.piece || ' ' || v2.piece || ' ' || v3.piece, 3,
           v1.lp + v2.lp + v3.lp
    FROM uw w, uv v1, uv v2, uv v3
    WHERE v1.piece || v2.piece || v3.piece = w.word
  )
  SELECT word, pieces, n, score,
         row_number() OVER (PARTITION BY word ORDER BY score DESC) AS rn
  FROM seg
) WHERE rn = 1
"""


def pagerank_gate_sql() -> str:
    """pr: rows for the profile_metrics gate — the power iteration
    unrolled ``PR_GATE_ROUNDS`` times as chained CTEs, replaying
    graph.pagerank's exact per-round arithmetic: rank' = ((1-d)/N +
    d*D/N) + d * sum of incoming rank/deg, with the dangling mass D
    read from the PREVIOUS round by a scalar subquery. Returns a
    standalone (metric, value) SELECT to UNION onto the host query."""
    d = PR_GATE_DAMPING
    n = len({x for e in PR_GATE_EDGES for x in e})
    vals = ", ".join(f"({s}, {t})" for s, t in PR_GATE_EDGES)
    ctes = [
        f"e(s, t) AS (VALUES {vals})",
        "pn(id) AS (SELECT s FROM e UNION SELECT t FROM e)",
        "deg AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS deg"
        " FROM e GROUP BY s)",
        f"r0 AS (SELECT id, 1.0 / {n} AS rank FROM pn)",
        "d0 AS (SELECT coalesce(sum(r.rank), 0.0) AS dm FROM r0 r"
        " LEFT JOIN deg USING (id) WHERE deg.deg IS NULL)",
    ]
    for k in range(1, PR_GATE_ROUNDS + 1):
        shared = (
            f"(1.0 - {d}) / {n} + {d} * (SELECT dm FROM d{k - 1}) / {n}"
        )
        ctes.append(
            f"r{k} AS (SELECT pn.id, ({shared})"
            f" + {d} * coalesce(c.c, 0.0) AS rank"
            f" FROM pn LEFT JOIN ("
            f"   SELECT e.t AS id, sum(r.rank / deg.deg) AS c"
            f"   FROM r{k - 1} r JOIN deg USING (id)"
            f"   JOIN e ON e.s = r.id GROUP BY e.t"
            f" ) c USING (id))"
        )
        ctes.append(
            f"d{k} AS (SELECT coalesce(sum(r.rank), 0.0) AS dm FROM r{k} r"
            f" LEFT JOIN deg USING (id) WHERE deg.deg IS NULL)"
        )
    body = ",\n  ".join(ctes)
    return f"""
SELECT 'pr:' || CAST(id AS VARCHAR) AS metric, round(rank, 6) AS value
FROM (
  WITH {body}
  SELECT id, rank FROM r{PR_GATE_ROUNDS}
)
"""


#: exact-repeat (suffix automaton) gate fixture: 'sam' rows of
#: repetition_stats — per-doc exact-repeat diagnostics + the intra-doc
#: ExactSubstr cut over the first SAM_GATE_NDOCS documents, each
#: pre-truncated to SAM_GATE_MAX_CHARS so the brute-force SQL twin
#: stays ~10k substrings/doc. The oracle replays the automaton results
#: exactly through the m-gram reduction: a char sits inside a repeat of
#: length >= m iff it sits inside an occurrence of a repeated m-gram
#: (every length->m sub-window of a long repeat is itself repeated),
#: and dup-coverage ("duplicates EARLIER text") reduces to m-gram
#: occurrences i with i > min-start(gram). Property-verified equal to
#: operators/exact_substr.py on 400 random strings x 3 min_lens and on
#: the first-6-docs fixture at all three gate SFs.
SAM_GATE_NDOCS = 6
SAM_GATE_MIN_LEN = 5
SAM_GATE_MAX_CHARS = 150

#: Cross-doc ExactSubstr gate fixture (xdoc:/xdocstat: rows of
#: repetition_stats): the first XDOC_GATE_NDOCS docs raw, plus a
#: planted near-copy of each of the first XDOC_GATE_NPLANT (id+100,
#: text = 'zz ' || substr(text, 31, 90) || ' yy') so the seed-and-
#: extend tier provably finds >= min_len cross-doc matches at every
#: SF. min_len 30 > any accidental whitespace run; the occurrence cap
#: is set high enough that no planted gram drops.
XDOC_GATE_NDOCS = 12
XDOC_GATE_NPLANT = 6
XDOC_GATE_MIN_LEN = 30
XDOC_GATE_CAP = 64


def xdoc_corpus_sql() -> str:
    """The planted cross-doc fixture (twin of the Spark-side union in
    ``_q_repetition_stats``)."""
    return f"""
  SELECT doc_id AS id, text FROM documents WHERE doc_id < {XDOC_GATE_NDOCS}
  UNION ALL
  SELECT doc_id + 100 AS id, 'zz ' || substr(text, 31, 90) || ' yy' AS text
  FROM documents WHERE doc_id < {XDOC_GATE_NPLANT}
"""


def cross_doc_repeats_sql() -> str:
    """SQL twin of ``operators/exact_substr.cross_doc_repeats`` +
    ``cross_doc_dup_stats`` on the planted fixture: seed every
    min_len-char window with the md5-60-bit lane, cap hot grams, pair
    across docs, island-merge consecutive diagonal hits into maximal
    matches, then interval-sweep the later-doc spans for the
    keep-first duplication stats. Emits match rows (kind='m') and
    per-doc stat rows (kind='s')."""
    L, cap = XDOC_GATE_MIN_LEN, XDOC_GATE_CAP
    fp = h64(f"substr(text, pos + 1, {L})")
    return f"""
WITH xcorp AS ({xdoc_corpus_sql()}),
pos0 AS (
  SELECT id, text,
         unnest(range(0, greatest(length(text) - {L} + 1, 0))) AS pos
  FROM xcorp
),
seeds0 AS (SELECT id, pos, {fp} AS fp FROM pos0),
occ AS (SELECT fp, count(*) AS c FROM seeds0 GROUP BY 1),
seeds AS (SELECT s.id, s.pos, s.fp FROM seeds0 s JOIN occ USING (fp)
          WHERE c <= {cap}),
hits AS (
  SELECT a.id AS id_a, b.id AS id_b, a.pos AS pos_a, b.pos AS pos_b,
         a.pos - b.pos AS diag
  FROM seeds a JOIN seeds b USING (fp)
  WHERE a.id < b.id
),
brk AS (
  SELECT *, CASE WHEN pos_a - lag(pos_a) OVER (
      PARTITION BY id_a, id_b, diag ORDER BY pos_a) = 1
    THEN 0 ELSE 1 END AS opens
  FROM hits
),
runs AS (
  SELECT *, sum(opens) OVER (
      PARTITION BY id_a, id_b, diag ORDER BY pos_a) AS isl
  FROM brk
),
matches AS (
  SELECT id_a, id_b, min(pos_a) AS pos_a, min(pos_b) AS pos_b,
         max(pos_a) - min(pos_a) + {L} AS length
  FROM runs GROUP BY id_a, id_b, diag, isl
),
spans AS (SELECT id_b AS id, pos_b AS s, pos_b + length AS e FROM matches),
sweep AS (
  SELECT *, max(e) OVER (PARTITION BY id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM spans
),
sweep2 AS (
  SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS op
  FROM sweep
),
grps AS (
  SELECT *, sum(op) OVER (PARTITION BY id ORDER BY s, e) AS grp FROM sweep2
),
merged AS (SELECT id, min(s) AS s, max(e) AS e FROM grps GROUP BY id, grp),
cov AS (SELECT id, sum(e - s) AS x FROM merged GROUP BY id)
SELECT 'm' AS kind, id_a, id_b, pos_a, pos_b, CAST(length AS BIGINT) AS v,
       CAST(NULL AS DOUBLE) AS frac
FROM matches
UNION ALL
SELECT 's' AS kind, c.id AS id_a, CAST(NULL AS BIGINT) AS id_b,
       CAST(length(c.text) AS BIGINT) AS pos_a,
       CAST(coalesce(cov.x, 0) AS BIGINT) AS pos_b,
       CAST(NULL AS BIGINT) AS v,
       round(coalesce(cov.x, 0) * 1.0 /
             greatest(length(c.text), 1), 6) AS frac
FROM xcorp c LEFT JOIN cov USING (id)
"""


def exact_substr_sam_sql() -> str:
    """SQL twin of ``exact_substr_stats`` + ``exact_substr_dedup`` on
    the SAM gate fixture (columns shaped to union with the
    repetition_stats histogram): lrs via all-substring brute force,
    repeat/dup char coverage via the m-gram reduction above, and the
    cleaned string rebuilt with string_agg over non-dup positions —
    full-string equality through the hash gate."""
    m, cap, nd = SAM_GATE_MIN_LEN, SAM_GATE_MAX_CHARS, SAM_GATE_NDOCS
    return f"""
SELECT section, decile, n_docs, mean_frac, id_sum, span_docs,
       mean_span_frac, extra
FROM (
WITH sam_docs AS (
  SELECT doc_id, substr(text, 1, {cap}) AS t,
         least(length(text), {cap}) AS n
  FROM documents WHERE doc_id < {nd}
),
positions AS (
  SELECT doc_id, t, n, unnest(range(1, n + 1)) AS i FROM sam_docs
),
pairs AS (
  SELECT doc_id, substr(t, i, L) AS s, L FROM (
    SELECT doc_id, t, i, unnest(range(1, n - i + 2)) AS L FROM positions
  )
),
lrs AS (
  SELECT doc_id, coalesce(max(CASE WHEN c >= 2 THEN L END), 0) AS lrs_len
  FROM (SELECT doc_id, s, L, count(*) AS c FROM pairs GROUP BY 1, 2, 3)
  GROUP BY 1
),
grams AS (
  SELECT doc_id, i, substr(t, i, {m}) AS g FROM positions
  WHERE i <= n - {m} + 1
),
gstats AS (
  SELECT doc_id, g, count(*) AS c, min(i) AS mini FROM grams GROUP BY 1, 2
),
occ AS (SELECT o.doc_id, o.i, s.c, s.mini
        FROM grams o JOIN gstats s ON o.doc_id = s.doc_id AND o.g = s.g),
rep_cov AS (
  SELECT DISTINCT doc_id, k FROM (
    SELECT doc_id, i + unnest(range(0, {m})) AS k FROM occ WHERE c >= 2)
),
dup_cov AS (
  SELECT DISTINCT doc_id, k FROM (
    SELECT doc_id, i + unnest(range(0, {m})) AS k FROM occ WHERE i > mini)
),
cleaned AS (
  SELECT p.doc_id,
         string_agg(substr(p.t, p.i, 1), '' ORDER BY p.i) AS cleaned
  FROM positions p LEFT JOIN dup_cov d
       ON p.doc_id = d.doc_id AND p.i = d.k
  WHERE d.k IS NULL
  GROUP BY 1
)
SELECT 'sam' AS section,
       d.doc_id AS decile,
       d.n AS n_docs,
       round(coalesce(r.rc, 0) * 1.0 / d.n, 6) AS mean_frac,
       l.lrs_len AS id_sum,
       coalesce(u.dc, 0) AS span_docs,
       round(coalesce(u.dc, 0) * 1.0 / d.n, 6) AS mean_span_frac,
       coalesce(c.cleaned, '') AS extra
FROM sam_docs d
JOIN lrs l USING (doc_id)
LEFT JOIN (SELECT doc_id, count(*) AS rc FROM rep_cov GROUP BY 1) r
  USING (doc_id)
LEFT JOIN (SELECT doc_id, count(*) AS dc FROM dup_cov GROUP BY 1) u
  USING (doc_id)
LEFT JOIN cleaned c USING (doc_id)
)
"""


#: BM25 gate fixture (bm25: rows of contamination): every 17th doc
#: plays the query set (same eval-set framing as the contamination
#: section), query text = its first BM25_GATE_QLEN tokens, top
#: BM25_GATE_K docs per query under Lucene-BM25 with the k1/b defaults.
#: Scores are rounded to 6 BEFORE ranking in BOTH engines so rank
#: order can't diverge on ULP tails. MAXDF exercises the operator's
#: hot-term cap: query terms with df above that corpus fraction drop
#: out of scoring (a stopword's candidate rows = its df — the skew
#: lever the docstring prescribes at 100 TB). 0.78 because the
#: synthetic fixture's 31-word vocabulary packs every query term into
#: df fractions 0.74-0.83 — this value provably drops SOME terms and
#: keeps SOME at every test SF (a 0.3 production-style cap would
#: silently empty the section here).
BM25_GATE_QLEN = 8
BM25_GATE_K = 3
BM25_GATE_K1 = 1.2
BM25_GATE_B = 0.75
BM25_GATE_MAXDF = 0.78
#: The query set is additionally capped at a FIXED doc_id bound —
#: benchmark/eval sets in production decontamination are fixed-size
#: artifacts; they do not grow with the crawl. Without the cap the
#: every-17th framing scales Q with the corpus and the postings join
#: does Q x N work: the r11 sf1 sweep measured 43x runtime at 10x
#: data (2,942 queries x 50k docs). With Q pinned the section is
#: linear in N again. 5000 covers the whole corpus at every gate SF
#: (sf0.01 = 500 docs, sf0.1 = 5000), so gate rows are unchanged
#: there; only larger sweep corpora see the cap (sf1: 294 queries).
BM25_GATE_QMAXID = 5000
#: bm25ix rode-along (persisted-index path): the corpus slice is a
#: fixed doc_id range so the per-run index build/merge cost is
#: SF-CONSTANT (240 docs at every test SF), and the oracle replays the
#: same closed form restricted to the slice with no df cap.
BM25IX_GATE_MAXID = 240


def bm25_topk_sql(
    k: int = BM25_GATE_K,
    maxdf: float = BM25_GATE_MAXDF,
    corpus_pred: str = "TRUE",
) -> str:
    """SQL twin of ``operators/ir.bm25_topk`` on the gate fixture.
    Postings/df/avgdl from the documents table; distinct query terms
    from the first-QLEN-token prefix of every 17th doc with
    doc_id < BM25_GATE_QMAXID (fixed-size benchmark set — see the
    constant's rationale; a no-op under every gate ``corpus_pred``);
    idf =
    ln(1 + (N-df+0.5)/(df+0.5)); row_number over (round(score,6) DESC,
    id ASC) per query; terms with df > MAXDF·N drop out of scoring.
    ``corpus_pred`` restricts BOTH the corpus and the query set (the
    bm25ix rode-along replays the persisted-index path on a fixed
    doc_id slice so gate cost stays SF-constant); ``k``/``maxdf``
    parameterize the rode-alongs that reuse this twin (retrieve-rerank
    stage 1 runs it at k=m)."""
    toks = tokens("text")
    qlen, k1, b = BM25_GATE_QLEN, BM25_GATE_K1, BM25_GATE_B
    return f"""
WITH postings AS (
  SELECT doc_id AS id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest({toks}) AS term FROM documents
    WHERE {corpus_pred}
  ) GROUP BY 1, 2
),
doclen AS (
  SELECT doc_id AS id, len({toks}) AS dl FROM documents WHERE {corpus_pred}
),
dft AS (SELECT term, count(*) AS df_t FROM postings GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(list_slice({toks}, 1, {qlen})) AS term
  FROM documents
  WHERE doc_id % 17 = 0 AND doc_id < {BM25_GATE_QMAXID} AND {corpus_pred}
),
scored AS (
  SELECT q.query_id, p.id,
         round(sum(
           ln(1.0 + (s.n_docs - d.df_t + 0.5) / (d.df_t + 0.5))
           * (p.tf * ({k1} + 1)) / (p.tf + {k1} * (1 - {b} + {b} * l.dl / s.avgdl))
         ), 6) AS score
  FROM postings p
  JOIN qterms q USING (term)
  JOIN dft d USING (term)
  JOIN doclen l ON p.id = l.id
  CROSS JOIN stats s
  WHERE d.df_t <= CAST({maxdf} AS DOUBLE) * s.n_docs
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, id ASC) AS rank
  FROM scored
)
SELECT query_id, id, score, rank FROM ranked WHERE rank <= {k}
"""


#: DSIR gate fixture (dsir: rows of token_freq): raw = documents,
#: target = every 7th doc (the "curated seed"), 64 hash buckets,
#: unigram + word-bigram occurrence features, Laplace(0.5) smoothing.
#: Per-doc log weights surface for doc_id < DSIR_GATE_NWEIGHTS; the
#: Gumbel-top-quota selection surfaces as count / id-sum / weight-sum
#: summary rows.
DSIR_GATE_BUCKETS = 64
DSIR_GATE_NWEIGHTS = 15
DSIR_GATE_QUOTA = 40


def _dsir_feats(expr: str) -> str:
    """Unigram + NON-distinct word-bigram occurrence list (twin of
    operators/dsir._features)."""
    toks = tokens(expr)
    return (
        f"list_concat({toks}, "
        f"CASE WHEN len({toks}) < 2 THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len({toks})), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1]) END)"
    )


def dsir_token_freq_sql() -> str:
    """SQL twin of ``operators/dsir``: smoothed bucket distributions
    for raw and target corpora, per-doc log importance weights, and the
    deterministic Gumbel-top-quota selection — shaped as
    (kind, token, n, v) rows to union with token_freq."""
    feats = _dsir_feats("text")
    h = h64("feat")
    B, nw, quota = DSIR_GATE_BUCKETS, DSIR_GATE_NWEIGHTS, DSIR_GATE_QUOTA
    return f"""
WITH feat_raw AS (
  SELECT doc_id, {h} % {B} AS b FROM (
    SELECT doc_id, unnest({feats}) AS feat FROM documents
  )
),
feat_tgt AS (
  SELECT b FROM feat_raw WHERE doc_id % 7 = 0
),
dist_raw AS (
  SELECT g.b, ln((coalesce(c.c, 0) + 0.5) /
                 ((SELECT count(*) FROM feat_raw) + 0.5 * {B})) AS log_r
  FROM (SELECT unnest(range(0, {B})) AS b) g
  LEFT JOIN (SELECT b, count(*) AS c FROM feat_raw GROUP BY 1) c USING (b)
),
dist_tgt AS (
  SELECT g.b, ln((coalesce(c.c, 0) + 0.5) /
                 ((SELECT count(*) FROM feat_tgt) + 0.5 * {B})) AS log_t
  FROM (SELECT unnest(range(0, {B})) AS b) g
  LEFT JOIN (SELECT b, count(*) AS c FROM feat_tgt GROUP BY 1) c USING (b)
),
cells AS (
  SELECT doc_id AS id, b, count(*) AS c FROM feat_raw GROUP BY 1, 2
),
weights AS (
  SELECT d.doc_id AS id,
         CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
         coalesce(s.log_weight, 0.0) AS log_weight
  FROM documents d
  LEFT JOIN (
    SELECT id, sum(c) AS n_feats,
           round(sum(c * (t.log_t - r.log_r)), 6) AS log_weight
    FROM cells JOIN dist_tgt t USING (b) JOIN dist_raw r USING (b)
    GROUP BY 1
  ) s ON d.doc_id = s.id
),
keyed AS (
  SELECT id, n_feats, log_weight,
         round(log_weight + -ln(-ln(
           ({h64("CAST(id AS VARCHAR)")} + 1)
           / (CAST(1152921504606846976 AS DOUBLE) + 1)
         )), 6) AS sel_key
  FROM weights
),
kept AS (
  SELECT * FROM keyed ORDER BY sel_key DESC, id ASC LIMIT {quota}
)
SELECT 'dsir:w:' || CAST(id AS VARCHAR) AS kind, '' AS token,
       n_feats AS n, log_weight AS v
FROM weights WHERE id < {nw}
UNION ALL
SELECT 'dsir:kept' AS kind, '' AS token,
       CAST(count(*) AS BIGINT) AS n, round(sum(log_weight), 6) AS v
FROM kept
UNION ALL
SELECT 'dsir:kept_ids' AS kind, '' AS token,
       CAST(sum(id) AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v
FROM kept
"""


#: Count-Min gate fixture (cms: rows of topk_values): grid over
#: customer.c_mktsegment, built as TWO increments (even/odd custkey)
#: and merged — so the gate pins build, merge-idempotence AND
#: estimation; estimates are for the exact top-3 segments. Small width
#: keeps the replay cheap; the md5-salted rows make the grid identical
#: in any engine.
CMS_GATE_WIDTH = 256
CMS_GATE_DEPTH = 3


def cms_topk_sql() -> str:
    """SQL twin of ``operators/sketches.cms_build + cms_merge +
    cms_estimate`` on the gate fixture. The merged two-increment grid
    is arithmetically the single-pass grid (sum splits), so the replay
    builds it in one aggregate; estimate = min over depth rows of the
    probed cells."""
    W, D = CMS_GATE_WIDTH, CMS_GATE_DEPTH
    hcell = h64("'cms' || CAST(d AS VARCHAR) || ':' || c_mktsegment")
    hprobe = h64("'cms' || CAST(d AS VARCHAR) || ':' || value")
    return f"""
WITH exact AS (
  SELECT c_mktsegment AS value, count(*) AS cnt
  FROM customer GROUP BY 1
  ORDER BY cnt DESC, value ASC LIMIT 3
),
depths AS (SELECT unnest(range(0, {D})) AS d),
cells AS (
  SELECT d, {hcell} % {W} AS b, count(*) AS c
  FROM customer CROSS JOIN depths
  GROUP BY 1, 2
),
probes AS (
  SELECT value, d, {hprobe} % {W} AS b
  FROM exact CROSS JOIN depths
),
est AS (
  SELECT value, min(coalesce(c, 0)) AS est
  FROM probes LEFT JOIN cells USING (d, b)
  GROUP BY 1
)
SELECT value, CAST(cnt AS BIGINT) AS cnt FROM exact
UNION ALL
SELECT 'cms:' || value AS value, CAST(est AS BIGINT) AS cnt FROM est
UNION ALL
-- hh: rows — heavy_hitters.exact_topk is EXACT and
-- partitioning-independent by construction (escalation until the
-- TPUT proof holds), so its twin is a plain top-5 with the same
-- deterministic (cnt DESC, key ASC) cut
SELECT 'hh:' || CAST(l_suppkey AS VARCHAR) AS value,
       CAST(cnt AS BIGINT) AS cnt
FROM (
  SELECT l_suppkey, count(*) AS cnt
  FROM lineitem WHERE l_suppkey IS NOT NULL
  GROUP BY 1 ORDER BY cnt DESC, l_suppkey ASC LIMIT 5
)
UNION ALL
-- hhg: rows — the grouped form (exact_topk_by): exact top-2 part-key
-- buckets within each returnflag, same deterministic cut per group
SELECT 'hhg:' || l_returnflag || ':' || CAST(pkb AS VARCHAR) AS value,
       CAST(cnt AS BIGINT) AS cnt
FROM (
  SELECT l_returnflag, l_partkey % 97 AS pkb, count(*) AS cnt,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY count(*) DESC, l_partkey % 97 ASC) AS rn
  FROM lineitem WHERE l_partkey IS NOT NULL
  GROUP BY 1, 2
) WHERE rn <= 2
"""
