"""SCD Type-2 merge tests: close/open/passthrough semantics."""

from __future__ import annotations

import datetime

from dw_etl_spark.operators.scd import scd2_apply, scd2_current


def _dim(spark):
    rows = [
        # key, attr, valid_from, valid_to
        ("PL", 100.0, "2020-01-01", None),          # current, will change
        ("PL", 90.0, "2010-01-01", "2020-01-01"),   # history, untouched
        ("DE", 200.0, "2020-01-01", None),          # current, unchanged
        ("FR", 300.0, "2020-01-01", None),          # current, no update
    ]
    df = spark.createDataFrame(rows, "country string, gdp double, valid_from string, valid_to string")
    return df.selectExpr(
        "country", "gdp",
        "CAST(valid_from AS DATE) AS valid_from",
        "CAST(valid_to AS DATE) AS valid_to",
    )


def _updates(spark):
    return spark.createDataFrame(
        [("PL", 110.0), ("DE", 200.0), ("ES", 50.0)],
        "country string, gdp double",
    )


def test_scd2_close_open_passthrough(spark):
    out = scd2_apply(
        _dim(spark), _updates(spark), key=["country"], attrs=["gdp"],
        effective="2024-06-01",
    )
    rows = {
        (r["country"], r["gdp"]): (str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
        for r in out.collect()
    }
    eff = "2024-06-01"
    assert rows[("PL", 100.0)] == ("2020-01-01", eff)       # closed
    assert rows[("PL", 110.0)] == (eff, None)               # opened
    assert rows[("PL", 90.0)] == ("2010-01-01", "2020-01-01")  # history kept
    assert rows[("DE", 200.0)] == ("2020-01-01", None)      # unchanged current
    assert rows[("FR", 300.0)] == ("2020-01-01", None)      # no update
    assert rows[("ES", 50.0)] == (eff, None)                # brand new
    assert len(rows) == 6

    current = {
        r["country"]: r["gdp"] for r in scd2_current(out).collect()
    }
    assert current == {"PL": 110.0, "DE": 200.0, "FR": 300.0, "ES": 50.0}


def test_scd2_idempotent_when_no_changes(spark):
    dim = _dim(spark)
    no_change = _updates(spark).filter("country = 'DE'")
    out = scd2_apply(dim, no_change, ["country"], ["gdp"], "2024-06-01")
    assert out.count() == dim.count()
    assert scd2_current(out).count() == scd2_current(dim).count()


def test_scd2_revives_key_with_all_versions_closed(spark):
    """An update for a key whose versions are all closed (soft-deleted)
    must open exactly one new version, not vanish."""
    dim = spark.createDataFrame(
        [
            ("PL", 90.0, "2010-01-01", "2015-01-01"),
            ("PL", 95.0, "2015-01-01", "2020-01-01"),
        ],
        "country string, gdp double, valid_from string, valid_to string",
    ).selectExpr(
        "country", "gdp",
        "CAST(valid_from AS DATE) AS valid_from",
        "CAST(valid_to AS DATE) AS valid_to",
    )
    updates = spark.createDataFrame([("PL", 120.0)], "country string, gdp double")
    out = scd2_apply(dim, updates, ["country"], ["gdp"], "2024-06-01")
    rows = sorted(
        (r["gdp"], str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]))
        for r in out.collect()
    )
    assert rows == [
        (90.0, "2010-01-01", "2015-01-01"),
        (95.0, "2015-01-01", "2020-01-01"),
        (120.0, "2024-06-01", None),
    ]
    assert scd2_current(out).count() == 1


def test_scd2_dedups_duplicate_update_keys(spark):
    """Duplicate keys in one update batch must not open multiple
    simultaneous current versions."""
    dim = _dim(spark)
    dup = spark.createDataFrame(
        [("PL", 110.0), ("PL", 111.0)], "country string, gdp double"
    )
    out = scd2_apply(dim, dup, ["country"], ["gdp"], "2024-06-01")
    current_pl = scd2_current(out).filter("country = 'PL'").collect()
    assert len(current_pl) == 1


def test_scd_dedup_of_conflicting_keys_is_partition_independent(spark):
    """A batch carrying CONFLICTING duplicate keys must land the SAME
    winner on every run and partitioning (dropDuplicates keeps a
    partition-order-dependent row; the ranked dedup keeps the smallest
    attr tuple, NULLs first) — for both SCD2 and SCD1."""
    from dw_etl_spark.operators.scd import scd1_apply

    dim = _dim(spark)
    rows = [("PL", 130.0), ("PL", 110.0), ("PL", None), ("ES", 50.0)]
    for parts in (1, 3, 7):
        dup = spark.createDataFrame(
            rows, "country string, gdp double"
        ).repartition(parts)
        out2 = scd2_apply(dim, dup, ["country"], ["gdp"], "2024-06-01")
        cur = {
            r["country"]: r["gdp"] for r in scd2_current(out2).collect()
        }
        # NULL sorts first -> the NULL-gdp row wins the PL conflict
        assert cur["PL"] is None and cur["ES"] == 50.0, (parts, cur)

        out1 = scd1_apply(dim, dup, key=["country"], attrs=["gdp"])
        got = {r["country"]: r["gdp"] for r in out1.collect()}
        assert got["PL"] is None and got["ES"] == 50.0, (parts, got)
