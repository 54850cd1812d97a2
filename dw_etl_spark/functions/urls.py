"""URL hygiene for web-crawl curation: canonicalization, host/domain
extraction, and domain blocklist filtering — the dedup-prep every
crawl pipeline runs before URL-level dedup (the same page arrives as
``HTTP://Example.com:80/a?utm_source=x&b=1#frag`` and
``http://example.com/a?b=1``; canonicalize first or URL dedup
under-counts).

Everything here is pure JVM expressions (regexp_extract / split /
filter / array_sort / concat) — no UDFs, whole-stage-codegen'd, one
narrow map over the corpus. The canonicalization:

1. scheme and host lowercased (case-insensitive per RFC 3986);
2. default ports dropped (http:80, https:443), explicit others kept;
3. fragment dropped (never sent to the server);
4. tracking query params removed (``utm_*``, gclid, fbclid, msclkid),
   remaining params SORTED so param order doesn't split duplicates,
   empty query dropped;
5. empty path normalized to ``/``.

This is the conservative production subset: transforms that are safe
for (nearly) every server. Lossy steps some pipelines add (dropping
``www.``, decoding percent-escapes, case-folding paths) change
identity on real sites and are left to callers.

``url_domain`` approximates the registered domain (eTLD+1) with the
common multi-part public suffixes (co.uk, com.au, …) embedded as an
expression — a full Public Suffix List is data, not code; pass your
own via ``extra_multipart_suffixes`` when the crawl needs it.

Tested against Python's ``urllib.parse`` as an independent reference
implementation, plus closed-form expected outputs under the
``pii_scrub`` hash gate (the oracle derives the canonical form
independently rather than replaying the engine's steps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"

_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid)="

_DEFAULT_MULTIPART = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(col: Column | str) -> Column:
    """Lower-cased scheme; NULL-safe (no scheme → empty string)."""
    return F.lower(F.regexp_extract(_col(col), _SCHEME_RE, 1))


def url_host(col: Column | str) -> Column:
    """Lower-cased host: authority minus userinfo and port."""
    auth = F.regexp_extract(_col(col), _AUTH_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.element_at(F.split(no_user, ":"), 1))


def url_port(col: Column | str) -> Column:
    """Explicit port as a string ('' when absent)."""
    auth = F.regexp_extract(_col(col), _AUTH_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    parts = F.split(no_user, ":")
    return F.when(F.size(parts) > 1, F.element_at(parts, 2)).otherwise(
        F.lit("")
    )


def url_domain(
    col: Column | str,
    extra_multipart_suffixes: tuple[str, ...] = (),
) -> Column:
    """Registered-domain approximation (eTLD+1): the last two host
    labels, or three when the last two form a known multi-part public
    suffix (co.uk and friends; extend via the parameter)."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    suffixes = _DEFAULT_MULTIPART + tuple(extra_multipart_suffixes)
    is_multi = last2.isin(*suffixes)
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form per the module contract; non-URL strings (no
    ``scheme://``) come back unchanged so the expression is safe on
    mixed columns."""
    c = _col(col)
    scheme = url_scheme(c)
    host = url_host(c)
    port = url_port(c)
    keep_port = (port != "") & ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(c, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(c, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    q2 = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", c).otherwise(rebuilt)


def block_domains(
    df: DataFrame,
    url_col: str,
    blocked_domains: DataFrame | list[str],
    keep: bool = False,
) -> DataFrame:
    """Drop (or with ``keep=True``, retain only) rows whose
    registered domain appears in the blocklist — the crawl-curation
    deny/allow-list step. ``blocked_domains`` is a single-column
    DataFrame (scales to million-domain lists via broadcast-gated
    join) or a Python list (inlined ``isin`` for small lists).

    Scale shape: domain extraction is a narrow expression; the list
    join is LEFT SEMI/ANTI on the domain — Spark broadcasts a small
    list side automatically (AQE), and a huge list degrades to a
    shuffle join instead of an OOM."""
    dom = url_domain(url_col)
    if isinstance(blocked_domains, list):
        cond = dom.isin(*[d.lower() for d in blocked_domains])
        return df.filter(cond if keep else ~cond)
    bl = blocked_domains.select(
        F.lower(F.col(blocked_domains.columns[0])).alias("__bdom")
    ).distinct()
    tagged = df.withColumn("__dom", dom)
    joined = tagged.join(
        bl,
        tagged["__dom"] == bl["__bdom"],
        "left_semi" if keep else "left_anti",
    )
    return joined.drop("__dom")


def robots_filter(
    df: "DataFrame",
    url_col: str,
    robots_df: "DataFrame",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
    default_allow: bool = True,
) -> "DataFrame":
    """Drop rows whose URL the host's robots.txt disallows for
    ``agent`` — the crawl-curation politeness/compliance gate.
    ``robots_df`` is the per-host robots corpus (host, robots_txt) a
    crawler already fetched; hosts with no row (or a NULL body) fall
    back to ``default_allow``.

    Scale shape: the robots table is hosts-sized — it BROADCAST-joins
    onto the rows by ``url_host``; evaluation is an Arrow-batched
    ``mapInPandas`` that parses each host's robots.txt ONCE per task
    (stdlib ``urllib.robotparser``, parser cached per host within the
    batch iterator) — no shuffle beyond the broadcast, no Python in
    the join path. Parsing semantics are the stdlib's — NOTE: ``urllib.robotparser``
    applies rules FIRST-MATCH in file order, not RFC 9309
    longest-match (an ``Allow`` carving an exception out of a broader
    ``Disallow`` must precede it) — which is also exactly what a
    Python crawler obeying robots via the stdlib would have
    enforced."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    marked = df.withColumn("__rb_host", url_host(url_col)).join(
        F.broadcast(
            robots_df.select(
                F.col(host_col).alias("__rb_host"),
                F.col(robots_col).alias("__rb_txt"),
            )
        ),
        "__rb_host",
        "left",
    )
    out_cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from urllib.robotparser import RobotFileParser

        parsers: dict[str, RobotFileParser | None] = {}
        for pdf in batches:
            keep = []
            for url, host, txt in zip(
                pdf[url_col], pdf["__rb_host"], pdf["__rb_txt"]
            ):
                if txt is None or host is None:
                    keep.append(default_allow)
                    continue
                rp = parsers.get(host)
                if rp is None:
                    rp = RobotFileParser()
                    rp.parse(txt.splitlines())
                    parsers[host] = rp
                try:
                    keep.append(rp.can_fetch(agent, url))
                except Exception:
                    keep.append(default_allow)
            yield pdf.loc[keep, out_cols]

    schema = marked.select(*out_cols).schema
    return marked.mapInPandas(run, schema)


# ---------------------------------------------------- link extraction

#: double-quoted <a href="..."> values, any attribute order, any case.
#: Java regex and RE2 agree on this pattern (no backreferences); the
#: gate oracle derives expected links closed-form anyway. The href
#: attribute name must follow whitespace (``<a\s(?:[^>]*\s)?href``) so
#: lookalike attributes (``data-href=...``) don't yield false links
#: (r10 advice fix).
_HREF_RE = r'(?i)<a\s(?:[^>]*\s)?href\s*=\s*"([^"]*)"'


def extract_hrefs(html: Column | str) -> Column:
    """Anchor hrefs from an HTML column as ``array<string>``: fragment
    stripped (never sent to the server), empty values dropped. Pure
    JVM regexp — one narrow map, no UDF. Contract: double-quoted
    ``href`` attributes (the overwhelmingly dominant form in real
    crawl HTML); single-quoted/bare attributes are a parser's job, not
    a regex's — route exotic markup through the DOM tier
    (``operators/readability.py``) first."""
    raw = F.regexp_extract_all(_col(html), F.lit(_HREF_RE), 1)
    no_frag = F.transform(raw, lambda h: F.element_at(F.split(h, "#"), 1))
    return F.filter(no_frag, lambda h: h != "")


def remove_dot_segments(path: Column | str) -> Column:
    """RFC 3986 §5.2.4 remove-dot-segments as pure JVM array
    expressions (one fold — no UDF, no loop): ``.`` segments drop,
    ``..`` pops the previous segment, traversal above the root is
    clamped at ``/`` (cannot escape the origin), and a trailing
    ``.``/``..`` keeps the directory's trailing slash (urljoin parity,
    pytest-pinned). Input is an absolute path (``/...``) WITHOUT
    query/fragment — ``resolve_href`` splits those off first."""
    p = _col(path)
    segs = F.split(p, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            F.when(s == ".", acc)
            # pop — but never the leading '' that anchors the root
            .when(
                (s == "..") & (F.size(acc) > 1),
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
            )
            .when(s == "..", acc)
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    joined = F.array_join(folded, "/")
    last = F.element_at(segs, -1)
    return F.when(
        last.isin(".", ".."), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_href(base: Column | str, href: Column | str) -> Column:
    """Resolve an href against its page URL — the RFC 3986 subset a
    link-graph build needs: absolute (kept verbatim), protocol-relative
    (``//host/p`` — base scheme prepended), root-relative (``/p`` —
    base origin prepended), query-only (``?page=2`` — appended to the
    FULL base path per §5.3, r10 advice fix), and path-relative (joined
    onto the base path's directory). Relative resolutions run through
    ``remove_dot_segments`` (§5.2.4) so ``./``/``../`` links land on
    the same node as their normalized duplicates in the link graph;
    absolute and protocol-relative hrefs pass through verbatim
    (normalizing someone else's URL is a canonicalizer's decision, not
    a resolver's). NULL when the base has no scheme (not a URL), and
    NULL for empty/fragment-only hrefs (same-document references — a
    link graph wants them dropped, which the NULL filter downstream
    already does). Pytest-pinned against ``urllib.parse.urljoin`` on
    every resolving class."""
    b, h = _col(base), _col(href)
    scheme = url_scheme(b)
    auth = F.regexp_extract(b, _AUTH_RE, 1)
    base_path = F.regexp_extract(b, _PATH_RE, 1)
    base_dir = F.regexp_replace(base_path, r"/[^/]*$", "")
    origin = F.concat(scheme, F.lit("://"), auth)
    is_abs = h.rlike(_SCHEME_RE)
    is_proto_rel = h.startswith("//")
    is_root = h.startswith("/") & ~is_proto_rel
    is_query = h.startswith("?")
    # empty and fragment-only hrefs are same-document references —
    # NULL so link-graph callers drop them (extract_links strips
    # fragments before resolving, so these reach here only via direct
    # calls); NULL hrefs propagate as NULL through the when-chain
    is_self = h.isNull() | (h == "") | h.startswith("#")
    # merged relative path (root- or dir-relative), query split off so
    # dot-segment removal only ever sees the path
    merged = F.when(is_root, h).otherwise(
        F.concat(base_dir, F.lit("/"), h)
    )
    qpos = F.instr(merged, "?")
    mpath = F.when(qpos > 0, F.substring(merged, F.lit(1), qpos - 1)).otherwise(
        merged
    )
    mquery = F.when(qpos > 0, F.substr(merged, qpos)).otherwise(F.lit(""))
    rel = F.concat(origin, remove_dot_segments(mpath), mquery)
    resolved = (
        F.when(is_self, F.lit(None).cast("string"))
        .when(is_abs, h)
        .when(is_proto_rel, F.concat(scheme, F.lit(":"), h))
        .when(is_query, F.concat(origin, base_path, h))
        .otherwise(rel)
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(resolved)


def extract_links(
    html: Column | str, base: Column | str, canonical: bool = True
) -> Column:
    """Outgoing links of a page: hrefs extracted, resolved against the
    page URL, and (by default) canonicalized — the per-document column
    a crawl frontier / link-graph build starts from. Whole chain is
    JVM array expressions over one row; zero shuffle until the caller
    aggregates."""
    hrefs = extract_hrefs(html)
    b = _col(base)
    resolved = F.transform(hrefs, lambda h: resolve_href(b, h))
    links = F.filter(resolved, lambda x: x.isNotNull())
    if canonical:
        links = F.transform(links, canonicalize_url)
    return links


def host_link_edges(
    df: DataFrame,
    html_col: str,
    base_col: str,
    weight_out: str = "n",
) -> DataFrame:
    """Host-level link graph from raw pages: ``(src_host, dst_host,
    n)`` with edge multiplicity — the input ``graph.pagerank`` /
    ``pagerank_fixed`` expect (feed ``select('src_host', 'dst_host')``
    as the edge list). One explode + ONE aggregation shuffle keyed on
    the host pair; at crawl scale host-pair cardinality is orders of
    magnitude below page-pair, so the aggregate is the compaction
    step, not a bottleneck. Self-loop host edges (intra-site links)
    are kept — PageRank callers typically filter them; dropping data
    is the caller's decision."""
    links = extract_links(html_col, base_col)
    return (
        df.select(
            url_host(_col(base_col)).alias("src_host"),
            F.explode(links).alias("__l"),
        )
        .select("src_host", url_host(F.col("__l")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias(weight_out))
    )


#: anchor pairs: group 1 = href, group 2 = inner text (non-greedy, no
#: nested tags stripped — strip_html downstream for that). One pattern
#: used for BOTH extraction calls so the two arrays always align.
#: ``(?s)`` lets the inner text span newlines — real crawl HTML wraps
#: anchor text freely, and without it extract_anchor_pairs silently
#: dropped multi-line anchors that extract_hrefs still saw, making the
#: two link sets disagree (r10 advice fix). Same whitespace-anchored
#: href attribute as _HREF_RE (no data-href false positives).
_ANCHOR_RE = r'(?is)<a\s(?:[^>]*\s)?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'


def extract_anchor_pairs(html: Column | str) -> Column:
    """Anchor (href, text) pairs as ``array<struct<href,text>>`` — the
    anchor text is the classic relevance/quality signal a link graph
    carries beyond its topology (what OTHER pages call this page).
    Same double-quoted-href contract as ``extract_hrefs``; inner text
    is raw markup (run it through the HTML→text tier if anchors nest
    tags). Fragments are stripped from hrefs, empty hrefs dropped;
    pure JVM — two ``regexp_extract_all`` calls over ONE pattern,
    zipped, so the arrays align by construction."""
    c = _col(html)
    hrefs = F.regexp_extract_all(c, F.lit(_ANCHOR_RE), 1)
    texts = F.regexp_extract_all(c, F.lit(_ANCHOR_RE), 2)
    pairs = F.zip_with(
        hrefs,
        texts,
        lambda h, t: F.struct(
            F.element_at(F.split(h, "#"), 1).alias("href"), t.alias("text")
        ),
    )
    return F.filter(pairs, lambda p: p["href"] != "")


def extract_links_with_text(
    html: Column | str, base: Column | str, canonical: bool = True
) -> Column:
    """``extract_anchor_pairs`` with hrefs resolved against the page
    URL (and canonicalized): ``array<struct<url,text>>`` — explode it
    and aggregate by ``url_host(url)`` for per-destination anchor-text
    profiles (the dst-host description signal)."""
    b = _col(base)
    pairs = extract_anchor_pairs(html)
    resolved = F.transform(
        pairs,
        lambda p: F.struct(
            resolve_href(b, p["href"]).alias("url"), p["text"].alias("text")
        ),
    )
    live = F.filter(resolved, lambda p: p["url"].isNotNull())
    if canonical:
        live = F.transform(
            live,
            lambda p: F.struct(
                canonicalize_url(p["url"]).alias("url"),
                p["text"].alias("text"),
            ),
        )
    return live


def host_anchor_terms(
    df: DataFrame,
    html_col: str,
    base_col: str,
    top_n: int = 5,
    exact: bool = False,
    m: int = 64,
) -> DataFrame:
    """Per-DESTINATION-host anchor-text term profile: ``(dst_host,
    term, n, rank)`` — the top-``top_n`` tokens other pages use when
    linking to a host (the classic description signal: a host's anchor
    profile describes it better than its own boilerplate). Pipeline:
    explode resolved (url, text) pairs → tokenize the anchor text →
    top-``top_n`` per host with the (n DESC, term ASC) deterministic
    cut. Rows whose destination host is empty (garbage links) drop.

    Two physical strategies, identical output (pytest-pinned equal) —
    they trade on DIFFERENT axes:

    - ``exact=False`` (default): one (dst_host, term)-keyed count
      shuffle + per-host window top-n. Fully distributed with zero
      driver state — this IS the frontier-scale path when the HOST
      count is huge (millions of dst hosts): the shuffle partitions by
      host and nothing ever concentrates.
    - ``exact=True``: routes through ``heavy_hitters.exact_topk_by``
      (TPUT) — per-partition local tops with the threshold-sum proof,
      so the anchor-term TAIL never shuffles. Wins when the per-host
      TERM tail is enormous but the host count is MODEST (TPUT's own
      contract: driver state scales with m × partitions × groups), e.g.
      profiling the top few thousand destination hosts of a crawl.
      ``m`` sizes phase 1 (escalates automatically if the proof
      fails). Do NOT point it at a frontier-sized host set — that is
      the window path's regime.
    """
    from pyspark.sql import Window

    from dw_etl_spark.functions.text import tokens

    pairs = df.select(
        F.explode(extract_links_with_text(html_col, base_col)).alias("p")
    ).select(
        url_host(F.col("p.url")).alias("dst_host"),
        F.explode(tokens(F.col("p.text"))).alias("term"),
    ).filter(F.col("dst_host") != "")
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    if exact:
        from dw_etl_spark.operators.heavy_hitters import exact_topk_by

        counts = exact_topk_by(
            pairs, "term", ["dst_host"], k=top_n, m=m
        ).withColumnRenamed("cnt", "n")
        # rank over the k-rows-per-host literal frame — driver-sized
        return counts.withColumn("rank", F.row_number().over(w))
    counts = pairs.groupBy("dst_host", "term").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )
