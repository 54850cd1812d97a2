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


def test_datasource_stream_reads_one_indicator_per_batch(spark, tmp_path):
    import time

    fixture = {
        "POP": [_rec("PL", "Poland", "POP", 2020, 38.0)],
        "GDP": [_rec("PL", "Poland", "GDP", 2020, 500.0),
                 _rec("PL", "Poland", "GDP", 2021, 510.0)],
        "AREA": [_rec("PL", "Poland", "AREA", 2020, 312.0)],
    }
    spark.dataSource.register(RestIndicatorDataSource)
    stream = (
        spark.readStream.format("rest_indicator")
        .option("indicators", "POP,GDP,AREA")
        .option("fixture", json.dumps(fixture))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("rest_stream").count() >= 4:
                break
            time.sleep(0.5)
        rows = sorted(
            (r["INDICATORCODE"], r["YEAR"], r["VALUE"])
            for r in spark.table("rest_stream").collect()
        )
    finally:
        q.stop()
    assert rows == [
        ("AREA", 2020, 312.0),
        ("GDP", 2020, 500.0),
        ("GDP", 2021, 510.0),
        ("POP", 2020, 38.0),
    ]


def test_stream_reader_offset_replay_is_exact():
    fixture = {
        "POP": [_rec("PL", "Poland", "POP", 2020, 1.0)],
        "GDP": [_rec("PL", "Poland", "GDP", 2020, 2.0)],
    }
    from dw_etl_spark.sources.rest_datasource import RestIndicatorStreamReader

    r = RestIndicatorStreamReader(
        {"indicators": "POP,GDP", "fixture": json.dumps(fixture)}
    )
    assert r.initialOffset() == {"i": 0}
    rows1, o1 = r.read({"i": 0})
    assert o1 == {"i": 1} and len(list(rows1)) == 1
    rows2, o2 = r.read(o1)
    assert o2 == {"i": 2} and len(list(rows2)) == 1
    drained, o3 = r.read(o2)
    assert o3 == {"i": 2} and list(drained) == []
    # recovery replay: exactly the [start, end) indicators, same rows
    replay = list(r.readBetweenOffsets({"i": 0}, {"i": 2}))
    assert len(replay) == 2
