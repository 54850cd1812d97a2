"""Unit tests for as-of join and range join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dw_etl_spark.operators.similarity import embedding_dup_pairs
from dw_etl_spark.operators.temporal_joins import asof_join, range_join


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, 100.0),
            ("A", 20, 101.0),
            ("A", 5, 99.0),
            ("B", 15, 50.0),
        ],
        ["sym", "t", "px"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 0.10),
            ("A", 10, 0.12),  # equal timestamp matches (<=)
            ("A", 18, 0.15),
            ("C", 1, 9.99),
        ],
        ["sym", "t", "spread"],
    )
    return trades, quotes


def test_asof_backward_with_equal_ts_and_miss(spark):
    trades, quotes = _trades_quotes(spark)
    got = {
        (r["sym"], r["t"]): (r["asof_t"], r["asof_spread"])
        for r in asof_join(trades, quotes, on=["sym"], left_time="t", right_time="t").collect()
    }
    assert got[("A", 10)] == (10, 0.12)   # tie: t_right == t_left matches
    assert got[("A", 20)] == (18, 0.15)   # latest earlier quote
    assert got[("A", 5)] == (None, None)  # nothing at-or-before
    assert got[("B", 15)] == (None, None)  # key absent on right
    assert len(got) == 4                   # left-outer: |out| == |left|


def test_asof_tolerance(spark):
    trades, quotes = _trades_quotes(spark)
    got = {
        (r["sym"], r["t"]): r["asof_spread"]
        for r in asof_join(
            trades, quotes, on=["sym"], left_time="t", right_time="t",
            tolerance_seconds=1,
        ).collect()
    }
    assert got[("A", 10)] == 0.12   # lag 0 <= 1: kept
    assert got[("A", 20)] is None   # lag 2 > 1: nulled
    assert got[("A", 5)] is None


def test_range_join_bins_and_out_of_range(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 24.9), (4, 99.0)], ["id", "v"]
    )
    ranges = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid")], ["low", "high", "band"]
    )
    got = {
        r["id"]: r["band"] for r in range_join(facts, ranges, "v").collect()
    }
    assert got == {1: "low", 2: "mid", 3: "mid"}  # right-open; 99 drops (inner)


def test_embedding_dup_pairs_finds_copies(spark):
    vecs = [(1, [1.0, 0.5, -0.25, 2.0]), (2, [-1.0, 0.3, 0.9, 0.1])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    copies = df.select((F.col("vec_id") + 100).alias("vec_id"), "embedding")
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dup_pairs(
            df.unionByName(copies), dim=4, n_planes=4, min_cosine=0.99
        ).collect()
    }
    assert pairs[(1, 101)] == 1.0
    assert pairs[(2, 102)] == 1.0
    assert (1, 2) not in pairs and (1, 102) not in pairs
