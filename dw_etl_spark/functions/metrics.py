"""Pipeline observability (SURVEY.md §2.10 X5).

The reference logs row counts and head() samples between ops — each an
extra pass in Spark terms. ``df.observe`` attaches aggregate metrics to
an existing action instead: zero extra jobs, metrics collected by the
same pass that computes the result.

    fact, obs = observe_counts(fact, "fact_load", null_cols=["DateId"])
    fact.write.parquet(...)          # the one real action
    print(obs.get)                   # {'n_rows': ..., 'n_null_DateId': ...}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    name: str,
    null_cols: list[str] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count (and per-column null-count) metrics to the next
    action on ``df``. Returns (instrumented df, observation handle);
    read ``observation.get`` after an action has run.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    return df.observe(obs, *metrics), obs
