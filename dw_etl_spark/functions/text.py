"""Text-analysis column functions for training-data pipelines.

Beyond the reference's capability bar (SURVEY.md 'training-data
pipeline' extensions): tokenization, language-ID heuristic, quality
scoring, document fingerprinting, shingling, portable hashing.

All pure `pyspark.sql.functions` expressions — JVM-side, codegen'd,
no UDFs — and each has an exactly-equivalent ANSI/DuckDB formulation
(used by the oracle gate), so results are engine-independent and
deterministic.

Scale notes: everything here is a narrow map — no shuffle, no state.
The md5-based ``stable_hash64`` costs one digest per call; prefer it
where cross-run/engine stability matters (dedup keys, minhash), and
``F.xxhash64`` where raw speed matters and stability only within
Spark is needed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Modulus for the affine MinHash family — 2^31-1 (Mersenne prime).
#: Base hashes are 28-bit, coefficients < 2^31, so a*h+b < 2^59:
#: no 64-bit overflow in Spark OR DuckDB (which raises on overflow).
MINHASH_P = 2147483647

#: fold_punctuation tables — shared with the DuckDB oracle builder so
#: the two can never drift: quote family -> ' or ", nbsp family -> ' ',
#: dash family (regex class) -> '-'
FOLD_SINGLES = "\u2018\u2019\u201a\u201b\u00b4\u0060"
FOLD_DOUBLES = "\u201c\u201d\u201e\u201f\u00ab\u00bb"
FOLD_SPACES = "\u00a0\u2007\u202f"
FOLD_DASH_CLASS = "[\u2010-\u2015\u2212]"

# Small built-in stopword lists for the language-ID heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "que", "est", "pour"],
}


def stable_hash64(col: Column | str) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5, as BIGINT.

    Identical in any engine with md5 (DuckDB:
    ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``). Positive range,
    no overflow.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def stable_hash32a(col: Column | str) -> Column:
    """Portable 32-bit hash: md5 hex chars 1-8 as BIGINT (DuckDB:
    ``CAST('0x' || substr(md5(s),1,8) AS BIGINT)``). Low lane of the
    64-bit simhash — paired with ``stable_hash32b`` it yields 64
    independent portable bits from one digest."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def stable_hash32b(col: Column | str) -> Column:
    """Portable 32-bit hash: md5 hex chars 9-16 as BIGINT (DuckDB:
    ``CAST('0x' || substr(md5(s),9,8) AS BIGINT)``). High lane of the
    64-bit simhash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long")


def stable_hash28(col: Column | str) -> Column:
    """Portable 28-bit hash: first 7 hex chars of md5, as BIGINT.

    Small on purpose — the base hash for the affine MinHash family
    (see ``minhash_coeffs``), where products must stay under 2^63 in
    engines with checked overflow. DuckDB:
    ``CAST('0x' || substr(md5(s),1,7) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family
    ``h_j(x) = (a_j * x + b_j) mod MINHASH_P``.

    Derived from md5 so any engine (or the DuckDB oracle builder)
    reproduces them without an RNG. One md5 per *shingle* total — the
    per-hash-function cost is two integer ops, so k=32..128 hash
    functions are nearly free (vs. k digests per shingle).
    """
    out = []
    for j in range(num_hashes):
        a = int(hashlib.md5(f"a{j}".encode()).hexdigest()[:7], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.md5(f"b{j}".encode()).hexdigest()[:7], 16) % MINHASH_P
        out.append((a, b))
    return out


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/blank text → empty array.

    Trims with ``btrim(.., " \\t\\n\\r")``, not ``trim`` — SQL ``trim``
    strips spaces only, so text ending in a newline kept a phantom
    empty trailing token (same quirk in the DuckDB twin, fixed
    together).
    """
    c = F.col(col) if isinstance(col, str) else col
    t = F.btrim(c, F.lit(" \t\n\r"))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def tokens_of(df, col: str) -> Column:
    """``tokens(col)``, or the column itself when it is ALREADY an
    ``array<string>`` — the pretokenized fast path. A multi-section
    query (several operators over one corpus) should project
    ``tokens(text)`` once, lazily pin it, and hand every operator the
    token column: each section then reads the shared pin instead of
    re-running the regex split over the full text (at 100 TB, each
    avoided re-tokenize is a full corpus scan). Operators that accept
    a ``text_col`` route through this, so both raw text and a
    pretokenized column work unchanged."""
    if dict(df.dtypes).get(col) == "array<string>":
        return F.col(col)
    return tokens(col)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish subword estimate ≈ tokens·4/3
    is left to callers; this is the exact whitespace count)."""
    return F.size(tokens(col)).cast("long")


# GPT-2-family pre-tokenizer shape, RE2-compatible (no lookahead, so the
# DuckDB oracle replays it exactly): optional leading space + a letter
# run / digit run / punctuation run. Whitespace-only stretches are not
# counted (the lookahead-dependent trailing-space rule is the one
# deviation from the GPT-2 pattern).
_SUBWORD_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def subword_count(col: Column | str) -> Column:
    """BPE-ish token-count estimate: the number of pre-tokenizer pieces
    (letter runs, digit runs, punctuation runs, each with an optional
    leading space). Counts pieces a byte-pair vocabulary would start
    from — a closer LLM-token estimate than whitespace words (which
    undercount punctuation-heavy and digit-heavy text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_SUBWORD_RE), 0)).cast("long")


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-gram (shingle) set of the text.

    Text shorter than n → empty array (guarded: Spark's
    ``sequence(1, 0)`` would count *down*, not return empty).
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.length(c) - (n - 1))
    return F.when(
        F.length(c) < n, F.array().cast("array<string>")
    ).otherwise(F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n))))


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """Distinct word n-gram (shingle) set: n consecutive whitespace
    tokens joined by a single space. Fewer than n tokens → empty array.

    The shingle unit for near-dup detection at corpus scale: unrelated
    documents drawn from a shared vocabulary still have near-zero
    *word-bigram* Jaccard, so LSH banding keyed on these separates
    cleanly — char n-grams of vocabulary-sharing corpora do not
    (measured: one char-4-gram band bucket held 41% of a 10k corpus).
    """
    return word_ngrams_from_tokens(tokens(col), n)


def word_ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """``word_ngrams`` over an ALREADY-TOKENIZED array column — the
    pretokenized fast path for multi-section queries that project
    ``tokens(text)`` once and feed every operator from the pin."""
    cnt = F.size(toks)
    m = cnt - (n - 1)
    # shifted-slice zip, not per-position slicing: n-1 zips of O(len)
    # arrays instead of len O(n)-slices — higher-order functions run
    # interpreted, so the win is large (measured ~6x on 10k docs)
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def _stopword_hits(toks: Column, sw: list[str]) -> Column:
    # NB: a plain single-arg lambda — adding bound default args (sw=sw)
    # changes the visible arity and PySpark then passes (element, index).
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))


def lang_id(col: Column | str) -> Column:
    """N-gram/stopword language-ID heuristic: hit count of each
    language's stopword list over the token multiset; argmax wins,
    ties broken by language code order; zero hits → 'unknown'."""
    toks = tokens(col)
    hits = {lang: _stopword_hits(toks, sw) for lang, sw in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.when(best <= 0, F.lit("unknown"))
    for lang in sorted(STOPWORDS):  # deterministic tie order
        expr = expr.when(hits[lang] == best, F.lit(lang))
    return expr


def quality_score(col: Column | str) -> Column:
    """Document quality in [0,1] from cheap surface statistics:
    length band, mean token length band, alpha ratio, stopword presence.

    Weights are arbitrary but fixed; the value is a *deterministic
    feature*, not a learned score. All integer/4-decimal arithmetic →
    engine-independent.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    # alpha ratio with 4-decimal truncation for cross-engine stability
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    alpha_ratio = F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 4)
    mean_tok_len = F.round(
        (n_chars - (n_toks - 1)) / F.greatest(n_toks, F.lit(1)), 4
    )
    stop_hits = _stopword_hits(toks, STOPWORDS["en"])
    score = (
        F.when((n_chars >= 100) & (n_chars <= 10000), 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), 0.25).otherwise(0.0)
        + F.when(alpha_ratio >= 0.6, 0.25).otherwise(0.0)
        + F.when(stop_hits > 0, 0.25).otherwise(0.0)
    )
    return F.round(score, 2)


# PII patterns, RE2-compatible by design (no lookahead/backrefs) so the
# DuckDB oracle applies the literal same regexes. Order matters: URLs
# before emails (a URL may embed an @), IPs before phones (digit runs).
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ip": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-]{7,}[0-9]",
}


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Match count per PII category (url/email/ip/phone) — counted on
    the raw text, before any redaction."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(col: Column | str) -> Column:
    """Replace each PII category with its ``<TOKEN>`` placeholder, in
    PII_PATTERNS order — the scrubbing pass a training corpus runs
    before tokenization. Pure ``regexp_replace`` chain: JVM-side,
    pushdown-friendly, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def gopher_metrics(col: Column | str) -> dict[str, Column]:
    """Gopher-style repetition/quality surface statistics (Rae et al.
    2021, "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", appendix A — the published corpus-filtering
    rules). All pure JVM expressions over one row — no shuffle, no UDF;
    ratios rounded to 4 decimals for cross-engine stability.

    Returns named columns:
      n_words            whitespace token count
      mean_word_len      Σ len(token) / words
      symbol_ratio       ('#' or ellipsis occurrences) / words
      alpha_word_frac    words containing a letter / words
      dup_line_frac      1 − distinct non-blank lines / non-blank lines
      bullet_line_frac   lines starting with -, * or •
      ellipsis_line_frac lines ending with ... or …
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_words = F.size(toks).cast("long")
    denom_w = F.greatest(n_words, F.lit(1))
    word_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    lines = F.filter(F.split(c, "\n"), lambda l: F.trim(l) != F.lit(""))
    n_lines = F.size(lines)
    denom_l = F.greatest(n_lines, F.lit(1))
    return {
        "n_words": n_words,
        "mean_word_len": F.round(word_chars / denom_w, 4),
        "symbol_ratio": F.round(
            F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\.|…"), 0)) / denom_w, 4
        ),
        "alpha_word_frac": F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / denom_w, 4
        ),
        "dup_line_frac": F.round(
            (n_lines - F.size(F.array_distinct(lines))) / denom_l, 4
        ),
        "bullet_line_frac": F.round(
            F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))) / denom_l,
            4,
        ),
        "ellipsis_line_frac": F.round(
            F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
            / denom_l,
            4,
        ),
    }


def gopher_keep(
    col: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_dup_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
) -> Column:
    """Boolean Gopher filter verdict — the conjunction of the published
    thresholds (defaults = the paper's; every threshold overridable,
    e.g. short-doc corpora lower ``min_words``)."""
    m = gopher_metrics(col)
    return (
        m["n_words"].between(min_words, max_words)
        & m["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (m["symbol_ratio"] <= max_symbol_ratio)
        & (m["alpha_word_frac"] >= min_alpha_word_frac)
        & (m["dup_line_frac"] <= max_dup_line_frac)
        & (m["bullet_line_frac"] <= max_bullet_line_frac)
        & (m["ellipsis_line_frac"] <= max_ellipsis_line_frac)
    )


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: stable hash of whitespace-normalized,
    lowercased text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return stable_hash64(normalized)


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (nats) of the string's character distribution —
    the classic degenerate-text signal: keyboard mash, repeated
    padding, and base64 blobs sit at the distribution's tails while
    natural language clusters in a narrow band (~2.8-3.2 nats for
    English), so both low- and high-entropy cutoffs are useful quality
    filters alongside ``gopher_metrics``.

    H = ln(n) − (Σ c·ln c)/n over per-character counts c — computed as
    a pure expression: split to chars, then for each DISTINCT char
    count its occurrences with an array filter. Per-row cost is
    O(len × distinct-chars) JVM-side with NO shuffle — the explode +
    groupBy(doc, char) formulation would shuffle one row per
    CHARACTER of the corpus, which at 100 TB is the corpus itself.
    Empty/NULL-safe: '' has one ''-char and entropy 0.

    Caveat: ``split('')`` operates on UTF-16 code units, so astral
    characters (emoji, rare CJK) count as two units; entropy shifts
    negligibly and identically in the DuckDB oracle replay at the
    fixture's BMP-only text.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    n = F.size(chars)
    sum_clnc = F.aggregate(
        F.transform(
            F.array_distinct(chars),
            lambda ch: F.size(F.filter(chars, lambda x: x == ch)).cast(
                "double"
            ),
        ),
        F.lit(0.0),
        lambda acc, cnt: acc + cnt * F.log(cnt),
    )
    return F.when(
        n > 0, F.log(n.cast("double")) - sum_clnc / n.cast("double")
    ).otherwise(F.lit(0.0))


def simhash32(col: Column | str, n: int = 3) -> Column:
    """32-bit SimHash over character n-gram shingles.

    Per bit b: majority vote of shingle-hash bit b (+1/-1); bit set if
    the vote is positive. Pure expression tree (no UDF): one hash per
    shingle, then a 32-lane bit-count via transform/aggregate.
    """
    sh = char_ngrams(col, n)
    hashes = F.transform(sh, lambda s: stable_hash64(s))

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("long") * 2
            - 1,
        )

    out = F.lit(0).cast("long")
    for b in range(32):
        out = out + F.when(bit_vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def strip_control_chars(col: Column | str) -> Column:
    """Remove C0/C1 control characters (except \\t \\n \\r), zero-width
    characters (ZWSP/ZWNJ/ZWJ/BOM), and collapse runs of 3+ newlines to
    2 — the mechanical cleanup pass raw web text needs before any
    metric is computed. Pure JVM ``regexp_replace`` chain, narrow map.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]", "")
    c = F.regexp_replace(c, "[​‌‍﻿]", "")
    return F.regexp_replace(c, r"\n{3,}", "\n\n")


def fold_punctuation(col: Column | str) -> Column:
    """Fold typographic punctuation to ASCII: curly/angle quotes →
    straight quotes, the dash family → '-', ellipsis → '...', and the
    non-breaking-space family → ' '. Composes with
    ``strip_control_chars`` as the standard crawl-text canonicalization
    (dedup fingerprints and n-gram stats shouldn't split on a
    typesetter's choice of quote). Pure JVM translate/regexp chain,
    narrow map.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(
        c,
        FOLD_SINGLES + FOLD_DOUBLES + FOLD_SPACES,
        "'" * len(FOLD_SINGLES)
        + '"' * len(FOLD_DOUBLES)
        + " " * len(FOLD_SPACES),
    )
    # hyphen/dash family (incl. minus sign) -> ASCII hyphen
    c = F.regexp_replace(c, FOLD_DASH_CLASS, "-")
    return F.regexp_replace(c, "\u2026", "...")


def nfc_normalize(col: Column | str) -> Column:
    """Unicode NFC normalization (é as one codepoint, not e+◌́ — the
    same text must fingerprint identically however the crawler
    composed it). Spark SQL has no normalizer builtin, so this is the
    one Arrow-batched Python scalar pass in this module (a
    ``pandas_udf`` COLUMN, composable inside any select — the
    column-expression sibling of
    ``operators.text_dedup.normalize_unicode``, which normalizes a
    whole frame via ``mapInPandas`` and is the right shape for the
    bulk ingest pass; use this one when a single expression needs NFC
    inline, e.g. the oracle-checked gate rows). Pay it once at
    ingest, before fingerprints/shingles, not per metric. DuckDB
    twin: ``nfc_normalize()`` (parity-tested).
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    # lambda form, not decorator: this module uses postponed annotation
    # evaluation, so `pd.Series` hints arrive as unresolvable strings
    # and pandas_udf's hint inference rejects them; an unannotated
    # callable takes the scalar eval type directly
    _nfc = pandas_udf(
        lambda s: s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        ),
        "string",
    )
    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


# ---------------------------------------------------------- HTML → text

def html_to_text(col: Column | str) -> Column:
    """Boilerplate-free-ish text from raw HTML — the extraction step a
    web-crawl pipeline runs before any quality/dedup work, as pure JVM
    regexp expressions (UDF-free, codegen'd, RE2-compatible so an
    oracle can replay them verbatim):

    1. drop <script>/<style>/<noscript>/<template> elements WITH their
       content (case-insensitive, non-greedy across newlines) and
       HTML comments;
    2. turn block-level boundaries (</p>, </div>, <br>, </li>, </h1-6>,
       </tr>) into newlines so words from different blocks don't fuse;
    3. strip every remaining tag;
    4. decode the named entities that dominate real corpora (&lt;
       &gt; &quot; &#39;/&apos; &nbsp;, then &amp; LAST so
       markup-escaped entities like &amp;lt; don't double-decode);
       other numeric escapes are full entity tables — data, not code —
       and pass through intact;
    5. collapse runs of blank lines and intra-line whitespace.

    This is the regex-extraction tier (what CommonCrawl's WET files
    are); DOM-aware readability extraction needs an HTML parser and
    stays an injection point."""
    c = F.col(col) if isinstance(col, str) else col
    # (?is): case-insensitive, dot-matches-newline. One pass per
    # swallowed element, NOT an alternation with a </\1> backreference:
    # RE2 (the oracle's engine, and the module's compatibility bar)
    # has no backreferences.
    t = c
    for el in ("script", "style", "noscript", "template"):
        t = F.regexp_replace(
            t, rf"(?is)<{el}\b[^>]*>.*?</{el}>", " "
        )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\b[^>]*>",
        "\n",
    )
    # only strip things shaped like tags (letter / close / declaration
    # after '<') — a bare "a < b and c > d" in prose is NOT a tag
    t = F.regexp_replace(t, r"(?s)</?[A-Za-z][^>]*>|<![^>]*>", " ")
    for ent, rep in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
        ("&amp;", "&"),  # last — see docstring
    ]:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    return F.btrim(t, F.lit(" \n\t\r"))


def compression_ratio(col: Column | str, level: int = 6) -> Column:
    """zlib-compressed bytes / raw UTF-8 bytes, in (0, ~1.05]; NULL on
    NULL, 0-length texts map to NULL (no meaningful ratio). The
    standard cheap redundancy signal for crawl quality filtering
    (RefinedWeb/Dolma family): boilerplate, keyword stuffing and
    template spam compress far below prose (~0.2-0.35 vs ~0.4-0.6 for
    natural text); pair with ``char_entropy`` — entropy sees character
    DISTRIBUTION, this sees REPETITION STRUCTURE at any range, so each
    catches spam the other misses.

    Arrow-batched ``pandas_udf`` (zlib is not expressible as a JVM
    expression) — keep it behind the cheap JVM prefilters like the
    other Python-tier scorers; verification tier is pytest (direct
    zlib replay), same as readability/CDC: no SQL closed form exists.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    lvl = level

    def _ratio(s):
        def one(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, lvl)) / len(raw)

        return s.map(one)

    return pandas_udf(_ratio, "double")(
        F.col(col) if isinstance(col, str) else col
    )
