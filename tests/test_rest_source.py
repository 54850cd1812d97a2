"""REST source tests (S3): pagination, nested-JSON flattening, retry —
all against an injected fake fetcher, zero network."""

from __future__ import annotations

import pytest

from dw_etl_spark.sources.rest import (
    PaginatedJsonSource,
    flatten_indicator_records,
)


def _record(country_id, country_name, indicator, year, value):
    return {
        "country": {"id": country_id, "value": country_name},
        "indicator": {"id": indicator, "value": "ignored"},
        "date": str(year),
        "value": value,
    }


def test_flatten_nested_json_nulls_kept():
    rows = flatten_indicator_records(
        [
            _record("PL", "Poland", "SP.POP", 2020, 38.0),
            _record("DE", "Germany", "SP.POP", 2021, None),
            _record("FR", "France", "SP.POP", 2022, ""),
        ]
    )
    assert rows == [
        ("PL", "Poland", "SP.POP", 2020, 38.0),
        ("DE", "Germany", "SP.POP", 2021, None),
        ("FR", "France", "SP.POP", 2022, None),
    ]


def test_pagination_and_dataframe(spark):
    pages = {
        1: [{"pages": 2}, [_record("PL", "Poland", "A", 2020, 1.0)]],
        2: [{"pages": 2}, [_record("PL", "Poland", "A", 2021, 2.0)]],
    }
    calls = []

    def fake(url, params):
        calls.append(params["page"])
        return pages[params["page"]]

    src = PaginatedJsonSource(
        base_url="http://example.test", indicators=["A"], fetcher=fake
    )
    df = src.to_dataframe(spark)
    assert calls == [1, 2]
    got = sorted((r["YEAR"], r["VALUE"]) for r in df.collect())
    assert got == [(2020, 1.0), (2021, 2.0)]
    assert df.schema["VALUE"].simpleString() == "VALUE:double"


def test_retry_then_success_and_exhaustion():
    attempts = {"n": 0}

    def flaky(url, params):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("boom")
        return [{"pages": 1}, [_record("PL", "Poland", "A", 2020, 1.0)]]

    src = PaginatedJsonSource(
        base_url="u", indicators=["A"], fetcher=flaky,
        max_retries=3, retry_delay_s=0.0,
    )
    assert len(src.fetch_indicator("A")) == 1  # survives 2 failures

    def always_fails(url, params):
        raise ConnectionError("down")

    bad = PaginatedJsonSource(
        base_url="u", indicators=["A"], fetcher=always_fails,
        max_retries=1, retry_delay_s=0.0,
    )
    with pytest.raises(RuntimeError, match="after 1 retries"):
        bad.fetch_indicator("A")
