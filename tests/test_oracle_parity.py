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


def test_copy_offsets_are_derived_not_fixed(spark):
    """r13 (caught by the sf10 scale rung): planted-copy ids must be
    DERIVED from the corpus (1 + max id), never a fixed constant — the
    old +100000 landed copy ids on other originals' ids once the
    fixture passed 100k documents (sf10: 500k docs, 200k vectors),
    silently violating the dedup operators' unique-id contract and
    collapsing planted-pair recall to 0.31 at bench scale. The fixture
    ids are contiguous 0..n-1, so the copies must occupy exactly
    [n, 2n) — a fixed offset fails this at every SF."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from dw_etl_spark.sources.files import read_table

    n = read_table(spark, SF_DIR, "documents").count()
    corpus = e._docs_with_copies(spark, SF_DIR, " qq")
    assert corpus.count() == 2 * n
    assert corpus.select("doc_id").distinct().count() == 2 * n
    lo, hi = corpus.agg(
        F.min("doc_id"), F.max("doc_id")
    ).collect()[0]
    assert (lo, hi) == (0, 2 * n - 1)
    # embeddings-side twin (embedding_dup_pairs uses the same rule)
    emb = read_table(spark, SF_DIR, "embeddings")
    m = emb.count()
    assert e._id_offset(emb, "vec_id") == m  # contiguous fixture ids


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
    "ivf_topk": [
        ("section", "eq", "ivf"),
        ("section", "eq", "pq"),
        ("section", "eq", "ivfpq"),
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


def test_spark_round_twin_on_half_boundaries(spark):
    """Pin the r11 sf1-sweep round-semantics class: Spark rounds the
    shortest-decimal string of a double HALF_UP; DuckDB's float-space
    round(DOUBLE, 6) flips both ways on exact .5 boundaries (values of
    the form k/3200 that the interpolation chain produces at scale).
    oracles.spark_round_sql must equal Spark on the boundary values the
    sweep caught, and the naive round must provably disagree somewhere
    (else this test stops guarding anything)."""
    import duckdb

    from dw_etl_spark.oracles import spark_round_sql

    vals = [33.2521875, 32.5334375, 64.3265625, 107.3753125,
            64.1534375, -33.2521875, 0.0000005, 0.0]
    from pyspark.sql import functions as F
    got = [
        r["r"]
        for r in spark.createDataFrame([(v,) for v in vals], "v DOUBLE")
        .select(F.round("v", 6).alias("r"))
        .collect()
    ]
    con = duckdb.connect()
    twin = [
        con.execute(
            f"SELECT {spark_round_sql(f'CAST({v!r} AS DOUBLE)')}"
        ).fetchone()[0]
        for v in vals
    ]
    naive = [
        con.execute(f"SELECT round(CAST({v!r} AS DOUBLE), 6)").fetchone()[0]
        for v in vals
    ]
    assert twin == got, (twin, got)
    # CANARY ONLY: if this fires, parity itself is intact (the twin
    # assertion above still guards it) — a DuckDB upgrade changed
    # round(DOUBLE, 6) on these literals, so the naive-round hazard
    # spark_round_sql exists for may have narrowed. Re-derive the
    # boundary list (values of the form k/3200) against the new
    # engine; only if naive round matches Spark on EVERY such value
    # can the twin be retired.
    assert naive != got, (
        "canary: naive DuckDB round now agrees with Spark on the pinned "
        "boundary values — the guard lost its teeth (parity is NOT "
        "broken); see comment above for triage"
    )


def test_indicator_pivot_mean_is_order_free(spark):
    """Pin the r11 exact fixed-point pivot mean: summing integer cents
    is independent of partition/partial-agg order, so the indicator
    base is bit-identical under different parallelism (a float avg()
    was 1 ulp off between engines on sums landing on .5 boundaries)."""
    from pyspark.sql import functions as F

    from dw_etl_spark.operators.pivot import pivot_wide
    from dw_etl_spark.sources.files import read_table

    lf = read_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("UserId"),
        F.dayofmonth("ts").alias("Day"),
        F.col("event_type").alias("Indicator"),
        F.round(F.col("value") * 100).cast("long").alias("Cents"),
    )
    agg = F.sum("Cents").cast("double") / F.lit(100.0) / F.count("Cents")

    def wide_map(frame):
        w = pivot_wide(frame, ["UserId", "Day"], "Indicator", "Cents",
                       ["click", "view"], agg=agg)
        return {(r["UserId"], r["Day"]): (r["click"], r["view"])
                for r in w.collect()}

    # repartitioning the INPUT changes which rows each partial
    # aggregate folds together — an order-sensitive float sum would
    # differ in ulps; the integer-cent sum must be bit-identical
    assert wide_map(lf) == wide_map(lf.repartition(13))
