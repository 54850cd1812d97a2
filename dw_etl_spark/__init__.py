"""dw_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query/data-processing
capabilities of the reference ETL system (a pandas/Dagster star-schema
warehouse builder; see SURVEY.md). Everything is expressed through the
DataFrame / Spark SQL API so Catalyst can optimize (predicate pushdown,
column pruning, broadcast joins, AQE); Python UDFs appear only where the
built-in operators genuinely cannot express the semantics.

Layout:
  session    — SparkSession factory (AQE on, tuned for local + cluster)
  sources    — csv/parquet readers w/ schema validation, REST (+ custom
               Spark 4 Python DataSource)
  sinks      — warehouse writers: parquet (validated PK/FK invariants)
               and JDBC (batched INSERT + DDL retrofit)
  operators  — composable DataFrame -> DataFrame relational operators,
               dedup/similarity/multimodal training-data ops, scale
               utilities (salting, bucketing)
  functions  — scalar/text column expressions + observe-based metrics
  plans      — end-to-end pipelines (star schema build)
  streaming  — Structured Streaming: event-time windows, sessions,
               stream-stream interval join, stateful dedup
  sql        — temp-view registration: full Spark SQL over raw tables
               and the star schema
"""

__version__ = "0.1.0"
