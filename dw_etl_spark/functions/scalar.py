"""Scalar column functions (SURVEY.md §2.7).

All pure `pyspark.sql.functions` Column expressions — JVM-side, inside
whole-stage codegen, no Python UDFs. Each cites the reference behavior
it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decade(year: Column | str) -> Column:
    """Integer decade: ``(Year // 10) * 10`` (reference transform.py:378)."""
    c = F.col(year) if isinstance(year, str) else year
    return (F.floor(c / 10) * 10).cast("int")


def map_lookup(col: Column | str, mapping: dict, default=None) -> Column:
    """Dict map with null/default-on-miss (reference transform.py:383-390,
    Season 1-4 → Winter/Spring/Summer/Autumn).

    Built as a literal MAP so Catalyst constant-folds it; ``element_at``
    returns NULL on miss, then coalesce applies the default.
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked_up = F.element_at(F.create_map(*pairs), c)
    if default is not None:
        looked_up = F.coalesce(looked_up, F.lit(default))
    return looked_up


def domain_whitelist(col: Column | str, allowed: list, default) -> Column:
    """Keep values in ``allowed``, else ``default`` (reference
    transform.py:136-138 — Gender ∈ {M, F} else 'UNKNOWN').

    Native when/otherwise — no UDF (the reference used a row-wise apply).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*allowed), c).otherwise(F.lit(default))


def clean_whitespace(col: Column | str) -> Column:
    """Newline→space, collapse runs, trim (reference raw_analysis/main.py:16-24)."""
    c = F.col(col) if isinstance(col, str) else col
    no_newlines = F.regexp_replace(c, r"[\r\n]+", " ")
    collapsed = F.regexp_replace(no_newlines, r"\s+", " ")
    return F.trim(collapsed)


def strict_cast(df: DataFrame, column: str, dtype: str) -> DataFrame:
    """Fail-on-malformed cast (reference ``pd.to_numeric(errors='raise')``,
    transform.py:135,141-144 etc.).

    Under non-ANSI configs a plain ``cast`` silently nulls un-parseable
    values; under ANSI (Spark 4 default) it throws a generic error. This
    helper gives uniform, labeled fail-on-malformed semantics regardless
    of session config: ``try_cast`` + per-row ``raise_error`` — fully
    distributed, no extra pass over the data, stays in codegen.
    """
    raw = F.col(column)
    parsed = raw.try_cast(dtype)
    checked = F.when(
        raw.isNotNull() & parsed.isNull(),
        F.raise_error(
            F.concat(
                F.lit(f"strict_cast: cannot cast {column} value '"),
                raw.cast("string"),
                F.lit(f"' to {dtype}"),
            )
        ).cast(dtype),
    ).otherwise(parsed)
    return df.withColumn(column, checked)
