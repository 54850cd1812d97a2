"""Custom Python DataSource (Spark 4) for the paginated REST source.

``sources/rest.py`` fetches driver-side (faithful to the reference,
fine for one-shot dimension enrichment). This is the scale path: each
(indicator, page-range) becomes an *input partition*, so fetching and
JSON flattening run on executors in parallel and feed straight into
the scan — no driver materialization, no ``createDataFrame`` of a
giant local list.

Usage:
    spark.dataSource.register(RestIndicatorDataSource)
    df = (spark.read.format("rest_indicator")
          .option("base_url", "https://api.worldbank.org/v2")
          .option("indicators", "SP.POP.TOTL,NY.GDP.MKTP.CD")
          .option("date", "1960:2023")
          .load())

Offline mode for tests/air-gapped runs: pass a ``fixture`` option — a
JSON object mapping indicator id → list of raw API records; partitions
parse the fixture instead of fetching.

Streaming (r5): ``spark.readStream.format("rest_indicator")`` consumes
one indicator per micro-batch via ``RestIndicatorStreamReader`` — dict
offsets track consumed-indicator count and ``readBetweenOffsets``
replays any offset range exactly for checkpoint recovery.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "COUNTRYCODE string, COUNTRYNAME string, INDICATORCODE string, "
    "YEAR int, VALUE double"
)


@dataclass
class IndicatorPartition(InputPartition):
    indicator: str


class RestIndicatorDataSource(DataSource):
    """World-Bank-shaped paginated JSON as a first-class Spark source."""

    @classmethod
    def name(cls) -> str:
        return "rest_indicator"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> "RestIndicatorReader":
        return RestIndicatorReader(self.options)

    def simpleStreamReader(self, schema) -> "RestIndicatorStreamReader":
        # one indicator per micro-batch; offset = indicators consumed
        return RestIndicatorStreamReader(self.options)


class RestIndicatorReader(DataSourceReader):
    def __init__(self, options: dict):
        self.base_url = options.get("base_url", "")
        self.indicators = [
            s for s in options.get("indicators", "").split(",") if s
        ]
        self.date = options.get("date", "1960:2023")
        self.per_page = int(options.get("per_page", "32767"))
        self.fixture = options.get("fixture")

    def partitions(self) -> list[InputPartition]:
        # one partition per indicator: the API shards naturally there;
        # page-level splitting would need a pre-flight page-count call
        return [IndicatorPartition(i) for i in self.indicators]

    def read(self, partition: IndicatorPartition):
        # runs ON EXECUTORS — import locally, keep self picklable
        from dw_etl_spark.sources.rest import flatten_indicator_records

        if self.fixture is not None:
            records = json.loads(self.fixture).get(partition.indicator, [])
            yield from flatten_indicator_records(records)
            return

        from dw_etl_spark.sources.rest import PaginatedJsonSource

        y0, y1 = self.date.split(":")
        src = PaginatedJsonSource(
            base_url=self.base_url,
            indicators=[partition.indicator],
            year_start=int(y0),
            year_end=int(y1),
            per_page=self.per_page,
        )
        yield from src.fetch_indicator(partition.indicator)


class RestIndicatorStreamReader(SimpleDataSourceStreamReader):
    """Incremental (streaming) variant: each micro-batch consumes the
    next indicator from the configured list, with the consumed count
    as the stream offset — the shape of a nightly API-ingest stream
    where new series appear over time.

    Offsets are plain dicts (``{"i": n}`` = first n indicators
    consumed), so checkpoint recovery replays deterministically:
    ``readBetweenOffsets(start, end)`` re-reads exactly the indicators
    in [start, end) — required for exactly-once delivery into a
    checkpointed sink. Fixture mode (offline) reads the same JSON
    fixture as the batch reader.
    """

    def __init__(self, options: dict):
        self._r = RestIndicatorReader(options)

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows_for(self, indicator: str) -> list:
        # materialized: the streaming runner deep-copies the returned
        # rows for its prefetch cache — a generator cannot be pickled
        return list(self._r.read(IndicatorPartition(indicator)))

    def read(self, start: dict):
        n = start["i"]
        if n >= len(self._r.indicators):
            return [], start  # drained: offset unchanged
        ind = self._r.indicators[n]
        return self._rows_for(ind), {"i": n + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows: list = []
        for ind in self._r.indicators[start["i"]:end["i"]]:
            rows.extend(self._rows_for(ind))
        return rows

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — offsets fully describe progress
