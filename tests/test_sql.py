"""SQL surface tests: raw-table and star-schema views queried via
spark.sql, results cross-checked against the DataFrame API."""

from __future__ import annotations

from pyspark.sql import functions as F

from dw_etl_spark.sql import register_star_schema, register_tables
from dw_etl_spark.sources.files import read_table
from tests.conftest import SF_SMOKE


def test_sql_over_raw_tables(spark):
    register_tables(spark, SF_SMOKE)
    got = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """
    ).collect()
    want = (
        read_table(spark, SF_SMOKE, "customer")
        .join(
            read_table(spark, SF_SMOKE, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "n_name")
        .limit(3)
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_sql_over_star_schema(spark):
    register_star_schema(spark, SF_SMOKE)
    rows = spark.sql(
        """
        SELECT d.Year, count(*) AS n_lines, round(sum(f.ExtendedPrice), 2) AS total
        FROM FACT_LineItem f JOIN DIM_Date d ON f.DateId = d.Id
        GROUP BY d.Year ORDER BY d.Year
        """
    ).collect()
    assert len(rows) > 0
    assert sum(r["n_lines"] for r in rows) > 0
    # window + rollup compose over the views too
    win = spark.sql(
        """
        SELECT Year, Quarter,
               row_number() OVER (PARTITION BY Year ORDER BY Quarter) AS rn
        FROM DIM_Date ORDER BY Year, Quarter LIMIT 5
        """
    ).collect()
    assert all(r["rn"] >= 1 for r in win)
