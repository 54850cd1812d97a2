"""dw_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query/data-processing
capabilities of the reference ETL system (a pandas/Dagster star-schema
warehouse builder; see SURVEY.md). Everything is expressed through the
DataFrame / Spark SQL API so Catalyst can optimize (predicate pushdown,
column pruning, broadcast joins, AQE); Python UDFs appear only where the
built-in operators genuinely cannot express the semantics.

Layout:
  session    — SparkSession factory (AQE on, tuned for local + cluster)
  sources    — csv/parquet/json readers w/ schema validation, REST, JDBC
  operators  — composable DataFrame -> DataFrame relational operators
  functions  — scalar column expressions (pure `pyspark.sql.functions`)
  plans      — end-to-end pipelines (star schema build)
  streaming  — Structured Streaming variants over the events stream
"""

__version__ = "0.1.0"
