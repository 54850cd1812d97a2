"""Deterministic pretraining-data augmentations.

``fim_transform`` — fill-in-the-middle (Bavarian et al. 2022,
"Efficient Training of Language Models to Fill in the Middle"): for a
deterministic ``fim_rate`` fraction of documents, split the text into
(prefix, middle, suffix) at two content-independent cut points and
re-serialize in PSM order (``<PRE>prefix<SUF>suffix<MID>middle``), so
a left-to-right LM learns infilling. The standard code-corpus
augmentation, applied at data-prep time exactly like this.

Everything is md5-derived from the document id (the engine's standard
no-RNG discipline — ``sampling.py``/``dsir.gumbel_key`` use the same
lanes), so the SAME corpus always yields the SAME augmented rows in
any engine, the transform is reproducible across runs/partitionings,
and a DuckDB twin replays it exactly (pytest-pinned). Scale shape:
pure row-local JVM expressions (hash lanes + substrings) — no shuffle,
no Python, embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dw_etl_spark.functions.text import stable_hash64

#: 2^60 — stable_hash64 values lie in [0, 2^60); dividing gives the
#: md5-uniform in [0, 1).
_HASH_SPACE = float(1 << 60)


def _uniform(col: F.Column, lane: str) -> F.Column:
    """md5-uniform in [0,1) from an id column and a lane salt."""
    return stable_hash64(F.concat(col.cast("string"), F.lit(lane))) / F.lit(
        _HASH_SPACE
    )


def fim_transform(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    pre_tok: str = "<PRE>",
    mid_tok: str = "<MID>",
    suf_tok: str = "<SUF>",
    out_col: str = "fim_text",
    min_chars: int = 3,
) -> DataFrame:
    """(input columns) + (fim_applied, out_col): PSM fill-in-the-middle.

    A document is selected iff its id's md5-uniform (lane 'fim') is
    below ``fim_rate`` AND it has at least ``min_chars`` characters
    (shorter docs can't split into three non-degenerate views — they
    pass through, the paper's convention). The two cut points are the
    sorted pair of two more id-keyed uniforms scaled to the text
    length, so character coverage of (prefix, middle, suffix) is exact
    and reassembly is lossless: prefix+middle+suffix == text, pinned.
    Unselected rows carry the original text in ``out_col``
    (fim_applied=false) so the output column is directly packable.
    """
    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError("fim_rate must be in [0, 1]")
    idc = F.col(id_col)
    t = F.col(text_col)
    n = F.length(t)
    apply_fim = (_uniform(idc, "fim") < F.lit(fim_rate)) & (
        n >= F.lit(min_chars)
    )
    u1 = _uniform(idc, "fim-a")
    u2 = _uniform(idc, "fim-b")
    # 1-based cut positions 1 <= p1 <= p2 <= n-1: prefix = [1, p1],
    # middle = (p1, p2], suffix = (p2, n] — floor to ints the twin can
    # reproduce, clamped so middle and suffix are never the whole doc
    p1 = F.floor(F.least(u1, u2) * (n - 1)).cast("int") + F.lit(1)
    p2 = F.floor(F.greatest(u1, u2) * (n - 1)).cast("int") + F.lit(1)
    prefix = t.substr(F.lit(1), p1)
    middle = t.substr(p1 + 1, p2 - p1)
    suffix = t.substr(p2 + 1, n)
    psm = F.concat(
        F.lit(pre_tok), prefix, F.lit(suf_tok), suffix, F.lit(mid_tok), middle
    )
    return df.select(
        "*",
        apply_fim.alias("fim_applied"),
        F.when(apply_fim, psm).otherwise(t).alias(out_col),
    )
