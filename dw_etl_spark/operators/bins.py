"""Fixed-edge value binning (SURVEY.md §2.7 F1/F2).

Reference: ``pd.cut`` with explicit edges + labels — age bins
(transform.py:109-127) and peak-height 500 m bins (:229-245).
Semantics preserved: right-open intervals ``[lo, hi)``, out-of-range
and NULL inputs → NULL label.

Implementation: a chained ``when`` expression — pure Catalyst, constant-
folded, codegen'd, no UDF, no shuffle (embarrassingly parallel map).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bin_numeric(
    col: Column | str,
    edges: list[float],
    labels: list[str] | None = None,
    right_closed: bool = False,
) -> Column:
    """Label ``col`` by the bin ``[edges[i], edges[i+1])`` it falls in.

    ``labels`` defaults to ``"{lo}-{hi-1}"`` strings like the reference's
    "18-29" / "8000-8499". ``right_closed=True`` flips to ``(lo, hi]``
    (pandas ``pd.cut`` default; the reference passes ``right=False``).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_bins = len(edges) - 1
    if labels is None:
        labels = [f"{int(edges[i])}-{int(edges[i + 1]) - 1}" for i in range(n_bins)]
    if len(labels) != n_bins:
        raise ValueError(f"need {n_bins} labels, got {len(labels)}")

    expr = None
    for i in range(n_bins):
        lo, hi = edges[i], edges[i + 1]
        if right_closed:
            cond = (c > F.lit(lo)) & (c <= F.lit(hi))
        else:
            cond = (c >= F.lit(lo)) & (c < F.lit(hi))
        expr = F.when(cond, F.lit(labels[i])) if expr is None else expr.when(cond, F.lit(labels[i]))
    return expr.otherwise(F.lit(None).cast("string"))
