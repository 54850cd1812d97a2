"""Streaming → warehouse sinks (micro-batch incremental maintenance).

The reference pipeline is batch-only; a Spark-native engine gets the
incremental form for free via ``foreachBatch``: each micro-batch is a
plain DataFrame, so the batch operators (SCD2 merge, validated writes)
apply unchanged. This is the standard Structured Streaming pattern for
sinks without native streaming support (parquet-overwrite dims,
JDBC upserts): exactly-once per epoch is delegated to the checkpoint +
idempotent batch write.

Scale notes:
- State lives in the dimension table itself, not executor memory — a
  restart resumes from the checkpoint and re-applies only the last
  uncommitted epoch (the SCD2 merge is idempotent for a replayed batch:
  re-applying the same updates to the already-merged dim opens no new
  versions, since attributes compare equal).
- Each micro-batch does one broadcast-shaped SCD2 pass over the dim —
  the update batch is micro-batch-sized (small), the dim side streams
  through.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dw_etl_spark.operators.scd import scd2_apply


def scd2_stream_writer(
    stream: DataFrame,
    spark: SparkSession,
    dim_path: str,
    key: list[str],
    attrs: list[str],
    checkpoint_dir: str,
    effective_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Maintain an SCD2 dimension from a stream of attribute updates.

    Each micro-batch: dedup the batch per key (latest by
    ``effective_col`` when given), read the current dimension parquet,
    apply the SCD2 merge, overwrite. Returns the started
    ``StreamingQuery``; callers ``awaitTermination()``.

    The batch effective date is the max ``effective_col`` of the batch
    (or current_date when absent) — one date per epoch, matching the
    reference's batch-run semantics.
    """

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        if effective_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*key).orderBy(F.col(effective_col).desc())
            batch = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            eff = str(
                batch.agg(F.max(F.col(effective_col).cast("date"))).first()[0]
            )
        else:
            eff = str(batch.sparkSession.sql("SELECT current_date()").first()[0])
        updates = batch.select(*key, *attrs)
        try:
            dim = spark.read.parquet(dim_path)
        except Exception:  # first epoch: empty dimension
            dim = updates.limit(0).select(
                *key,
                *attrs,
                F.lit(None).cast("date").alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
            )
        merged = scd2_apply(dim, updates, key=key, attrs=attrs, effective=eff)
        # can't overwrite the path the plan is reading: write the new
        # state beside it, then swap directories (driver-side metadata
        # op only — no row ever passes through the driver). On an
        # object store or HDFS the same shape goes through the
        # FileSystem API or a table format's atomic commit.
        import shutil
        from pathlib import Path

        staging = f"{dim_path}__staging"
        merged.write.mode("overwrite").parquet(staging)
        p_old, p_new = Path(dim_path), Path(staging)
        if p_old.exists():
            shutil.rmtree(p_old)
        p_new.rename(p_old)

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
