"""SQL entry point: register the testdata tables and the star schema as
temp views so any query runs via ``spark.sql`` — the full Spark SQL
surface (joins, windows, rollup, lateral, set ops) over the same lazy
plans the DataFrame API builds.

The reference has no query language at all (SURVEY.md §3 — its "query"
is a hand-wired DAG); this module is what makes the engine a *queryable*
warehouse rather than a fixed pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dw_etl_spark.plans.star_schema import build_star_schema
from dw_etl_spark.sources.files import read_table

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the raw tables (same names the DuckDB oracle uses)."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def register_star_schema(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for the warehouse tables (DIM_*, FACT_*) as lazy
    plans — queries against them compose into one optimized plan, no
    materialization unless the user writes them out."""
    for name, df in build_star_schema(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
