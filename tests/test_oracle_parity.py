"""Local replica of the driver's correctness gate: every ``queries()``
entry vs its ``oracle_sql()`` DuckDB twin at sf0.001 (fast smoke; the
driver runs sf0.01 — run with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
for the full check)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_matches_oracle, duckdb_conn

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", SF_SMOKE)

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def oracle():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle():
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql())
    # non-SQL-expressible ops may be absent; keep the list explicit.
    allowed_missing: set[str] = set()
    assert missing <= allowed_missing, f"queries missing oracles: {missing}"


# r11: lsh_topk / embedding_dup_pairs oracles now derive their index
# sizing (planes, centroids) from the live corpus count in SQL
# (oracles.lsh_planes_sql) exactly like the engine derives it from
# count() — the former 500-row-fixture skip is gone; the parity test
# runs at any SF.


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only check
        return
    assert_matches_oracle(df, oracle, sql)


def test_query_count_fits_driver_sweep_cap():
    """The external correctness sweep records at most 50 rows (r4
    declared 57 and the last 7 dict entries silently got no row).
    Adding a gate query requires freeing a slot first — merge
    near-duplicate queries rather than exceeding the cap."""
    n = len(entrymod.queries())
    assert n <= 50, (
        f"queries() declares {n} entries but the driver sweep caps at 50 — "
        "the trailing entries would get no correctness row"
    )


# Gate rode-along sections that MUST produce rows: a section whose
# engine and oracle sides are BOTH empty still hash-matches, so the
# driver's compare cannot catch a silently-dead section (this bit
# round 8: a 0.3 df cap emptied the new bm25 rows on the
# narrow-vocabulary fixture and parity stayed green). Each entry:
# query -> list of (column, kind, needle) where kind is 'eq' (exact
# value), 'prefix' (startswith) or 'notnull' (non-null values exist).
_REQUIRED_SECTIONS = {
    "token_freq": [
        ("kind", "prefix", "vocab:"),
        ("kind", "prefix", "tok:"),
        ("kind", "prefix", "dsir:w:"),
        ("kind", "eq", "dsir:kept"),
    ],
    "contamination": [
        ("section", "eq", "contam"),
        ("section", "eq", "bm25"),
        ("section", "eq", "bm25ix"),
    ],
    "cosine_topk": [
        ("section", "eq", "cos"),
        ("section", "eq", "q8"),
        ("section", "eq", "q8ivf"),
        ("section", "eq", "rr"),
    ],
    "profile_metrics": [
        ("metric", "prefix", "skew:"),
        ("metric", "prefix", "qsketch:"),
        ("metric", "prefix", "pr:"),
    ],
    "describe_stats": [
        ("col_name", "prefix", "drift:"),
        ("col_name", "prefix", "winsor"),
        ("col_name", "prefix", "zscore"),
    ],
    "topk_values": [
        ("value", "prefix", "cms:"),
        ("value", "prefix", "hh:"),
        ("value", "prefix", "hhg:"),
    ],
    "dedup_clusters": [
        ("algo", "eq", "label"),
        ("algo", "eq", "best"),
        ("algo", "eq", "cc2"),
        ("algo", "prefix", "split:"),
    ],
    "dim_indicator": [
        ("QcutMode", "eq", "count"),
        ("QcutMode", "eq", "value"),
    ],
    "corpus_overlap": [
        ("section", "prefix", "min:"),
        ("section", "prefix", "est:"),
        ("section", "prefix", "exact:"),
        ("section", "eq", "jaccard"),
        ("section", "eq", "containment:a_in_b"),
        ("section", "prefix", "g0:"),
        ("section", "prefix", "g1:"),
    ],
    "csv_roundtrip": [("PriceCategory", "eq", "__quarantine")],
    "text_features": [("ppl_bucket", "notnull", None)],
    "sampling_splits": [("grp", "prefix", "temp:")],
    "minhash_lsh_pairs": [("section", "prefix", "eval:")],
    "repetition_stats": [
        ("section", "eq", "sam"),
        ("section", "eq", "xdoc"),
        ("section", "eq", "xdocstat"),
    ],
    "quality_filters": [("qm_prob", "notnull", None)],
}


def test_gate_rodealong_sections_nonempty(spark):
    """Every oracle-gated rode-along section yields at least one row
    on the gate-sized fixture — empty-vs-empty hash matches are
    invisible to the driver compare, so emptiness is pinned here."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    qs = entry.queries()
    problems = []
    for qname, specs in _REQUIRED_SECTIONS.items():
        df = qs[qname](spark, SF_DIR).persist()
        try:
            cols = dict(df.dtypes)
            for col, kind, needle in specs:
                if col not in cols:
                    problems.append((qname, col, "missing column"))
                    continue
                c = F.col(col)
                if kind == "eq":
                    cond = c == needle
                elif kind == "prefix":
                    cond = c.startswith(needle)
                else:
                    cond = c.isNotNull()
                if df.filter(cond).limit(1).count() == 0:
                    problems.append((qname, col, f"{kind}:{needle} empty"))
        finally:
            df.unpersist()
    assert not problems, problems
