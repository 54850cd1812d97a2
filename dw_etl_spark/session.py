"""SparkSession factory.

Scale notes (100 TB / 1000-executor design intent):
- AQE on everywhere: runtime shuffle-partition coalescing, skew-join
  splitting, and dynamic join-strategy switching are the main levers that
  keep the same plan healthy from sf0.001 local runs to cluster scale.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces down. For local[32] testing 32 is right; on a cluster set it
  to ~2-3x total cores via ``extra_conf``.
- Arrow enabled so the few Pandas-UDF code paths (exact qcut oracle,
  multimodal decode plumbing) use columnar batch transfer, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "dw_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults target local mode for tests/bench; on a real cluster pass
    ``master=None`` with externally-provided master/deploy config and a
    larger ``shuffle_partitions``.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r14 (guide §2.2): with parallelismFirst (default), AQE
        # coalesces a post-shuffle stage to
        # max(bytes/defaultParallelism, minPartitionSize) — the 1 MB
        # default floor collapses small-but-fanning-out intermediates
        # (e.g. BM25 postings feeding a candidate explode-join: ~4 MB
        # → 2 partitions → a 3-core-s join ran on 2 of 32 cores).
        # 64k keeps such frames at ~defaultParallelism partitions.
        # Scale-adaptive by construction: anything larger than
        # parallelism×1 MB is untouched at any cluster size, and the
        # value is env-overridable rather than tuned to this host.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"),
        )
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(DEFAULT_CPUS)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
