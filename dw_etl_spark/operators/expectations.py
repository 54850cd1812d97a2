"""Rule-based data-quality expectations (one-pass, Deequ-style).

The reference validates sources by required-column lists and FAILFAST
casts (SURVEY §1.3); a warehouse engine wants the general form: declare
row-level expectations, get per-rule pass/fail counts from ONE
aggregation pass over the data, and optionally fail the pipeline when
a rule breaches its tolerance.

    report = expect(df, {
        "price_positive":  F.col("o_totalprice") > 0,
        "status_known":    F.col("o_orderstatus").isin("O", "F", "P"),
        "key_not_null":    F.col("o_orderkey").isNotNull(),
    })
    # → rows: (rule, n_rows, n_failed, fail_frac)

Scale shape: all rules evaluate in a single narrow agg (one scan, one
partial-agg tree — adding a rule adds a counter, not a pass). A NULL
predicate result counts as FAILED (unknown ≠ verified), the
conservative choice for data quality; wrap a rule in
``F.coalesce(cond, F.lit(True))`` to opt out per rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule report frame (rule, n_rows, n_failed, fail_frac)."""
    if not rules:
        raise ValueError("expect() needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"__f_{name}")
        )
    row = df.agg(*aggs)
    # ONE agg row exploded into the per-rule report — a unionByName of
    # per-rule selects would re-run the whole aggregation per rule
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").cast("long").alias("n_rows"),
                        F.col(f"__f_{name}").cast("long").alias("n_failed"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select(
        "r.rule",
        "r.n_rows",
        "r.n_failed",
        F.round(
            F.col("r.n_failed") / F.greatest(F.col("r.n_rows"), F.lit(1)), 6
        ).alias("fail_frac"),
    )


def check_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    max_fail_frac: float = 0.0,
) -> DataFrame:
    """Run ``expect`` and raise ``ValueError`` listing every rule whose
    failure fraction exceeds ``max_fail_frac`` (default: zero
    tolerance). Returns the report frame when all rules pass, so the
    caller can log it. This is the engine twin of the reference's
    fail-on-missing-column source guards, generalized to row-level
    predicates."""
    report = expect(df, rules).collect()
    bad = [r for r in report if r["fail_frac"] > max_fail_frac]
    if bad:
        detail = ", ".join(
            f"{r['rule']}: {r['n_failed']}/{r['n_rows']} ({r['fail_frac']:.4%})"
            for r in bad
        )
        raise ValueError(f"expectations breached: {detail}")
    return df.sparkSession.createDataFrame(
        report, "rule string, n_rows long, n_failed long, fail_frac double"
    )


def observe_expectations(
    df: DataFrame, rules: dict[str, Column], name: str = "expectations"
):
    """The zero-extra-pass form of ``expect``: attach the per-rule
    failure counters to whatever action the caller runs next (a sink
    write, usually) via ``DataFrame.observe`` — at 100 TB the quality
    report comes out of the SAME scan that wrote the data, not a
    second one.

        out, obs = observe_expectations(df, rules)
        out.write.parquet(path)          # the one real action
        report = expectation_report(obs.get)
        # → [{"rule": ..., "n_rows": ..., "n_failed": ..., "fail_frac": ...}]

    Same NULL-counts-as-failed semantics as ``expect`` (pytest pins the
    two paths equal). Returns (instrumented df, Observation handle).
    """
    from pyspark.sql import Observation

    if not rules:
        raise ValueError("observe_expectations() needs at least one rule")
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for rname, cond in rules.items():
        metrics.append(
            F.count_if(~F.coalesce(cond, F.lit(False))).alias(f"fail_{rname}")
        )
    return df.observe(obs, *metrics), obs


def expectation_report(metrics: dict) -> list[dict]:
    """Shape an ``Observation.get`` dict from ``observe_expectations``
    into the same records ``expect`` emits."""
    n = int(metrics["n_rows"])
    out = []
    for k, v in metrics.items():
        if not k.startswith("fail_"):
            continue
        failed = int(v)
        out.append(
            {
                "rule": k[len("fail_"):],
                "n_rows": n,
                "n_failed": failed,
                "fail_frac": round(failed / max(n, 1), 6),
            }
        )
    return out
