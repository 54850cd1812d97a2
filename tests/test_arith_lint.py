"""Arithmetic-parity lint (VERDICT r11 next #5): no gate query may
fold the fixture's fixed-point money/quantity columns through a raw
DOUBLE ``sum``/``avg``.

Float sums are partial-aggregation-order dependent: the r11 sf1 sweep
caught a 6M-row ``sum(l_extendedprice)`` (~3.2e11, ulp ~6e-5) flipping
its compared 2nd decimal between Spark's tree aggregation and DuckDB's
sequential fold. The standing recipe (``__spark_entry__._dec2``) sums
in exact DECIMAL(18,2) — order-free on any engine — and casts to
double LAST. This lint walks every ``queries()`` plan and fails the
suite if a money aggregate sidesteps the recipe, so the next money
column added to a gate query cannot silently reintroduce the class.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from dw_etl_spark.sources.files import read_table
from tests.conftest import SF_SMOKE

# the fixture's 2-decimal fixed-point columns (TESTDATA.md contract)
MONEY_COLS = (
    "l_quantity|l_extendedprice|l_discount|l_tax|o_totalprice"
    "|p_retailprice|s_acctbal|c_acctbal|value"
)
_MONEY_REF = re.compile(rf"\b({MONEY_COLS})#\d+")

# (query, agg_fn, money_col) -> why the raw float fold is acceptable.
# Additions require the same justification discipline: either the
# summed values are NOT fixed-point (so the decimal recipe does not
# apply) or the fold provably never reaches a hash-compared digit.
ALLOWED: dict[tuple[str, str, str], str] = {
    ("describe_stats", "avg", "l_extendedprice"): (
        "winsorized mean: the clip bounds are percentile LERPS, so the"
        " clipped values are full-precision floats, not fixed-point —"
        " DECIMAL(18,2) would round them before summing and change the"
        " answer; documented accepted residual (PLANS #52)"
    ),
}


def _agg_args(plan: str) -> list[tuple[str, str]]:
    """(fn, balanced-paren argument) for every sum(/avg( in a plan
    string — regex on the analyzed logical plan, where aggregate
    expressions render as ``sum(cast(col#id as decimal(18,2)))``."""
    out = []
    for m in re.finditer(r"\b(sum|avg)\(", plan):
        i = m.end()
        depth, j = 1, i
        while depth and j < len(plan):
            if plan[j] == "(":
                depth += 1
            elif plan[j] == ")":
                depth -= 1
            j += 1
        out.append((m.group(1), plan[i : j - 1]))
    return out


def _money_folds(df) -> set[tuple[str, str]]:
    """(fn, money_col) pairs where a sum/avg folds a raw (non-decimal)
    expression over a fixed-point column. ``isnull`` wraps are null
    COUNTS (0/1 integers), not value folds."""
    plan = df._jdf.queryExecution().analyzed().toString()
    folds = set()
    for fn, arg in _agg_args(plan):
        if "as decimal" in arg or "isnull(" in arg:
            continue
        for ref in _MONEY_REF.finditer(arg):
            folds.add((fn, ref.group(1)))
    return folds


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_raw_float_money_aggregate(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    violations = {
        (name, fn, col)
        for fn, col in _money_folds(df)
        if (name, fn, col) not in ALLOWED
    }
    assert not violations, (
        f"raw double {sorted(violations)} over fixed-point columns — "
        "order-dependent across engines/parallelism at scale; use the "
        "_dec2 exact-decimal recipe (sum DECIMAL(18,2), cast to double "
        "last) on BOTH the Spark and oracle sides, or justify an "
        "ALLOWED entry"
    )


def test_lint_has_teeth(spark):
    """The detector flags a deliberate raw float money sum and does
    NOT flag the _dec2 recipe — if either side breaks, the lint has
    silently stopped guarding."""
    li = read_table(spark, SF_SMOKE, "lineitem")
    bad = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("total")
    )
    assert ("sum", "l_extendedprice") in _money_folds(bad)
    good = li.groupBy("l_returnflag").agg(
        F.sum(entrymod._dec2("l_extendedprice")).cast("double").alias("total")
    )
    assert not _money_folds(good)
    # null counts over money columns are integer folds, not value folds
    nullcount = li.agg(
        F.sum(F.isnull("l_extendedprice").cast("bigint")).alias("n_null")
    )
    assert not _money_folds(nullcount)
