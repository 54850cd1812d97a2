"""DOM-aware readability extraction (operators/readability.py) —
the boilerplate-removal tier above functions.text.html_to_text.
Pure-function tests run without Spark; the distributed wrapper gets
row-stability + partition-invariance coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from dw_etl_spark.operators.readability import (
    classify_blocks,
    extract_blocks,
    extract_main_text,
    readability_extract,
)

PAGE = """
<html><head><title>My Great Article</title>
<style>p { color: red; }</style>
<script>var nav = "<p>fake paragraph in script</p>";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
<div class="sidebar"><ul>
  <li><a href="/r1">Related article one</a></li>
  <li><a href="/r2">Related article two</a></li>
</ul></div>
<article class="content">
<h2>The Heading</h2>
<p>This is the first long paragraph of the main article body and it
definitely carries more than sixteen words of flowing body text for
the classifier to keep.</p>
<p>Short lead-in sentence here with nine words total now.</p>
<p>Another long paragraph follows with plenty of words so that the
number-of-words rules will confidently mark it as content rather than
boilerplate furniture around the page.</p>
</article>
<div class="comments"><p>First!</p><p>Nice post.</p></div>
<footer>Copyright 2024 Example Corp. All rights reserved.</footer>
</body></html>
"""


def test_extracts_article_drops_furniture():
    r = extract_main_text(PAGE)
    assert r["title"] == "My Great Article"
    main = r["main_text"]
    # every article block survives, heading included
    assert "The Heading" in main
    assert "first long paragraph" in main
    assert "Short lead-in sentence" in main  # positive-scope rescue
    assert "Another long paragraph" in main
    # furniture is gone
    for junk in ("Home", "Related article", "First!", "Copyright",
                 "fake paragraph", "color: red"):
        assert junk not in main, junk
    assert 0.0 < r["boilerplate_frac"] < 1.0
    assert r["n_content_blocks"] < r["n_blocks"]


def test_block_features_and_link_density():
    _title, blocks = extract_blocks(
        '<p><a href="/x">all link text</a></p>'
        "<p>no links at all in this one</p>"
    )
    assert len(blocks) == 2
    assert blocks[0]["link_density"] == 1.0
    assert blocks[1]["link_density"] == 0.0
    # pure link block is always boilerplate
    assert classify_blocks(blocks)[0] is False


def test_negative_scope_closes_with_element():
    # the paragraph AFTER the closed nav must not inherit its scope
    html = (
        "<nav><p>menu menu menu</p></nav>"
        "<p>" + "body word " * 20 + "</p>"
    )
    r = extract_main_text(html)
    assert "menu" not in r["main_text"]
    assert "body word" in r["main_text"]


def test_malformed_html_never_raises():
    cases = [
        "",
        "plain text with no markup at all " * 10,
        "<div><p>broken <b>nesting</div> stray</b> tail " + "w " * 30,
        "<p " + "x" * 500,          # unterminated tag
        "<<<>>>&&&;&nosuch;</p></p></div>",
        "\x00\x01<p>control bytes</p>",
    ]
    for html in cases:
        r = extract_main_text(html)
        assert isinstance(r["main_text"], str)
    # bare text still comes back when long enough
    assert "markup" in extract_main_text(cases[1])["main_text"]


def test_distributed_wrapper_row_stable_and_partition_invariant(spark):
    rows = [
        (1, PAGE),
        (2, "<p>" + "word " * 30 + "</p>"),
        (3, None),  # NULL html -> empty extraction, row preserved
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = readability_extract(df, "html").orderBy("id").collect()
    assert [r["id"] for r in out] == ["1", "2", "3", "4"]
    assert out[0]["title"] == "My Great Article"
    assert out[2]["main_text"] == "" and out[2]["n_blocks"] == 0

    again = {
        r["id"]: (r["main_text"], r["boilerplate_frac"])
        for r in readability_extract(df.repartition(7), "html").collect()
    }
    assert again == {
        r["id"]: (r["main_text"], r["boilerplate_frac"]) for r in out
    }

    # bounded emission: chunk size 1 still yields every row exactly once
    tiny = readability_extract(df, "html", batch_rows=1)
    assert tiny.count() == 4
