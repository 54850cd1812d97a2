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
