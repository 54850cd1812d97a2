"""REST API source: paginated JSON → DataFrame (SURVEY.md §2.1 S3).

Capability parity: the reference fetches World Bank indicators —
GET ``{base}/country/all/indicator/{id}?date=Y0:Y1&per_page=N&page=k``,
flattening nested records (``record["country"]["id"]`` etc.) to rows
(reference extract.py:263-297, config main.py:22-36).

Spark-first design: the fetch itself is driver-side (a REST endpoint is
not a splittable source; the reference's per_page=32767 pulls everything
in one page anyway). Rows land in a DataFrame via ``createDataFrame``
with an explicit schema, after which everything is distributed. The
fetcher is injectable so tests run a deterministic fake with zero
network access. At real scale the same interface can be backed by a
Spark 4 custom Python DataSource that partitions page-ranges across
executors; the flattening logic below is shared either way.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Flattened record schema (reference extract.py:286-294).
INDICATOR_SCHEMA = T.StructType(
    [
        T.StructField("COUNTRYCODE", T.StringType()),
        T.StructField("COUNTRYNAME", T.StringType()),
        T.StructField("INDICATORCODE", T.StringType()),
        T.StructField("YEAR", T.IntegerType()),
        T.StructField("VALUE", T.DoubleType()),
    ]
)

Fetcher = Callable[[str, dict], object]


def _default_fetcher(url: str, params: dict) -> object:
    import json
    import urllib.parse
    import urllib.request

    qs = urllib.parse.urlencode(params)
    with urllib.request.urlopen(f"{url}?{qs}", timeout=30) as resp:
        return json.loads(resp.read())


def flatten_indicator_records(records: Iterable[dict]) -> list[tuple]:
    """Nested JSON → scalar rows (reference extract.py:286-294).

    ``country``/``indicator`` structs are dotted into scalars; empty
    values become NULL (reference extract.py:292 keeps API nulls).
    """
    rows = []
    for rec in records:
        value = rec.get("value")
        rows.append(
            (
                rec["country"]["id"],
                rec["country"]["value"],
                rec["indicator"]["id"],
                int(rec["date"]),
                float(value) if value not in (None, "") else None,
            )
        )
    return rows


@dataclass
class PaginatedJsonSource:
    """World-Bank-shaped paginated JSON source with retry (X2 parity).

    Reference retry policy: 3 retries, 1 s delay (extract.py:13).
    """

    base_url: str
    indicators: list[str]
    year_start: int = 1960
    year_end: int = 2023
    per_page: int = 32767
    max_retries: int = 3
    retry_delay_s: float = 1.0
    fetcher: Fetcher = field(default=_default_fetcher)

    def _get_with_retry(self, url: str, params: dict) -> object:
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return self.fetcher(url, params)
            except Exception as err:  # noqa: BLE001 — retry any fetch error
                last_err = err
                if attempt < self.max_retries:
                    time.sleep(self.retry_delay_s)
        raise RuntimeError(f"REST fetch failed after {self.max_retries} retries") from last_err

    def fetch_indicator(self, indicator: str) -> list[tuple]:
        """All pages of one indicator, flattened (extract.py:269-294)."""
        rows: list[tuple] = []
        page, pages = 1, 1
        while page <= pages:
            payload = self._get_with_retry(
                f"{self.base_url}/country/all/indicator/{indicator}",
                {
                    "format": "json",
                    "date": f"{self.year_start}:{self.year_end}",
                    "per_page": self.per_page,
                    "page": page,
                },
            )
            meta, records = payload[0], (payload[1] or [])
            pages = int(meta.get("pages", 1))
            rows.extend(flatten_indicator_records(records))
            page += 1
        return rows

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        """Fetch all indicators and union into one long-form DataFrame.

        The reference appends all indicators into one list
        (extract.py:267-294) — the moral equivalent of unionByName.
        """
        rows: list[tuple] = []
        for ind in self.indicators:
            rows.extend(self.fetch_indicator(ind))
        return spark.createDataFrame(rows, INDICATOR_SCHEMA)


def rest_to_dataframe(
    spark: SparkSession, source: PaginatedJsonSource
) -> DataFrame:
    return source.to_dataframe(spark)
