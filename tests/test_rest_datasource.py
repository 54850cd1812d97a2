"""Custom Python DataSource tests: registration, partition-per-indicator
parallel read, schema, offline fixture mode — plus CSV source/sink
round-trip (S1/S5)."""

from __future__ import annotations

import json

from dw_etl_spark.sources.files import read_csv, write_csv
from dw_etl_spark.sources.rest_datasource import RestIndicatorDataSource


def _rec(cc, name, ind, year, value):
    return {
        "country": {"id": cc, "value": name},
        "indicator": {"id": ind, "value": "x"},
        "date": str(year),
        "value": value,
    }


def test_datasource_fixture_read(spark):
    fixture = {
        "POP": [_rec("PL", "Poland", "POP", 2020, 38.0),
                 _rec("PL", "Poland", "POP", 2021, None)],
        "GDP": [_rec("PL", "Poland", "GDP", 2020, 500.0)],
    }
    spark.dataSource.register(RestIndicatorDataSource)
    df = (
        spark.read.format("rest_indicator")
        .option("indicators", "POP,GDP")
        .option("fixture", json.dumps(fixture))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one per indicator
    rows = sorted(
        (r["INDICATORCODE"], r["YEAR"], r["VALUE"]) for r in df.collect()
    )
    assert rows == [("GDP", 2020, 500.0), ("POP", 2020, 38.0), ("POP", 2021, None)]
    assert [f.name for f in df.schema.fields] == [
        "COUNTRYCODE", "COUNTRYNAME", "INDICATORCODE", "YEAR", "VALUE"
    ]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b"), (2, 'quo"te'), (3, None)], ["id", "s"]
    )
    out = str(tmp_path / "csv_out")
    write_csv(df, out, single_file=True)
    back = read_csv(
        spark, out, schema=df.schema, required_columns=["id", "s"]
    )
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [
        (1, "a,b"), (2, 'quo"te'), (3, None)
    ]
