"""Join operators (SURVEY.md §2.3).

J1/J2  resolve_surrogate_key — left equi-join on a (composite) natural
       key against a dimension, keeping only the dim's surrogate Id
       (reference transform.py:31-37, 63-69).
J3     fuzzy_top1_join — top-1 similarity join of free-text values onto
       a canonical domain (reference transform.py:41-59, fuzzywuzzy
       ``process.extractOne`` with memo cache + exact short-circuit).

Scale design:
- Dimensions are small → ``F.broadcast`` forces a broadcast hash join;
  no shuffle of the fact side at any scale.
- The fuzzy join never scores the fact table. It deduplicates the left
  side first (``distinct()`` — this IS the reference's memo cache,
  expressed relationally), cross-joins the small distinct×domain grid,
  scores with built-in ``levenshtein`` (JVM codegen), takes top-1 per
  left value with a window, then broadcast-joins the tiny mapping back.
  Cost: |distinct_left| × |domain| scored pairs — independent of fact
  row count, the property that makes it viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_surrogate_key(
    fact: DataFrame,
    dim: DataFrame,
    on: dict[str, str],
    dim_id: str = "Id",
    as_name: str | None = None,
) -> DataFrame:
    """Left-join ``fact`` to ``dim`` on ``{fact_col: dim_col}``; append only
    the dim's ``dim_id`` (renamed to ``as_name``). Unmatched rows keep NULL.

    Equivalent of the reference's rename-Id-then-left-merge idiom
    (transform.py:31-37). The dim side is broadcast.
    """
    as_name = as_name or dim_id
    dim_proj = dim.select(
        *[F.col(c).alias(f"__k_{c}") for c in on.values()],
        F.col(dim_id).alias(as_name),
    )
    cond = None
    for fcol, dcol in on.items():
        clause = fact[fcol].eqNullSafe(F.col(f"__k_{dcol}"))
        cond = clause if cond is None else cond & clause
    joined = fact.join(F.broadcast(dim_proj), cond, "left")
    return joined.drop(*[f"__k_{c}" for c in on.values()])


def token_sort_levenshtein(a: Column, b: Column) -> Column:
    """Word-order-insensitive edit distance: levenshtein over
    lowercased, sorted, re-joined tokens — the built-in-only analog of
    fuzzywuzzy's ``token_sort_ratio`` (reference transform.py:45-59
    scores with fuzzywuzzy; plain levenshtein misses word-order noise
    like 'Korea, South' vs 'South Korea'). Pass as ``score_expr`` to
    ``fuzzy_top1_join``."""

    def norm(c: Column) -> Column:
        return F.concat_ws(
            " ", F.array_sort(F.split(F.lower(F.trim(c)), r"\s+"))
        )

    return F.levenshtein(norm(a), norm(b))


def token_set_distance(a: Column, b: Column) -> Column:
    """Token-set edit distance in [0, 100], lower = better — the
    built-in-only analog of fuzzywuzzy's ``token_set_ratio`` (the
    dominant component of ``process.extractOne``'s WRatio, reference
    transform.py:45-59). Word-subset noise ('Rep. of Korea' vs 'Korea')
    scores 0 because the token intersection equals the shorter side:

      inter = sorted(tokens(a) ∩ tokens(b))
      c1    = inter + sorted(tokens(a) − tokens(b))
      c2    = inter + sorted(tokens(b) − tokens(a))
      dist  = min over (inter,c1), (inter,c2), (c1,c2) of
              100·levenshtein(x,y)/max(len(x),len(y))

    All JVM expressions (split/array_intersect/levenshtein) — codegen'd,
    no Python in the scoring loop. Pass as ``score_expr`` to
    ``fuzzy_top1_join``.
    """

    def toks(c: Column) -> Column:
        return F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+"))

    ta, tb = toks(a), toks(b)
    inter = F.concat_ws(" ", F.array_sort(F.array_intersect(ta, tb)))
    only_a = F.concat_ws(" ", F.array_sort(F.array_except(ta, tb)))
    only_b = F.concat_ws(" ", F.array_sort(F.array_except(tb, ta)))
    c1 = F.trim(F.concat_ws(" ", inter, only_a))
    c2 = F.trim(F.concat_ws(" ", inter, only_b))

    def ndist(x: Column, y: Column) -> Column:
        denom = F.greatest(F.length(x), F.length(y), F.lit(1))
        return F.lit(100.0) * F.levenshtein(x, y) / denom

    return F.least(ndist(inter, c1), ndist(inter, c2), ndist(c1, c2))


def partial_levenshtein(a: Column, b: Column) -> Column:
    """Substring-alignment distance in [0, 100], lower = better — the
    built-in-only analog of fuzzywuzzy's ``partial_ratio``: the shorter
    string is slid over every same-length substring alignment of the
    longer and the best (minimum) normalized levenshtein wins. Catches
    containment noise ('Korea' vs 'Republic of Korea' → 0) that whole-
    string edit distance scores badly.

    The alignment sweep is a ``transform``/``array_min`` higher-order
    expression — interpreted, not codegen'd, but it only ever runs on
    the distinct×domain grid of ``fuzzy_top1_join`` (|distinct_left| ×
    |domain| rows), never on fact-table rows, so the cost is bounded at
    any corpus scale.
    """
    la, lb = F.length(a), F.length(b)
    s = F.when(la <= lb, a).otherwise(b)
    lng = F.when(la <= lb, b).otherwise(a)
    slen = F.length(s)
    dists = F.transform(
        F.sequence(F.lit(1), F.length(lng) - slen + 1),
        lambda i: F.levenshtein(s, F.substring(lng, i, slen)),
    )
    return F.lit(100.0) * F.array_min(dists) / F.greatest(slen, F.lit(1))


def wratio_distance(a: Column, b: Column) -> Column:
    """Weighted composite distance in [0, 100], lower = better — the
    built-in-only analog of fuzzywuzzy's ``WRatio``, the scorer
    ``process.extractOne`` actually uses (reference transform.py:45-59).

    Mirrors WRatio's public structure: the whole-string ratio is the
    floor; token-sort and token-set variants are discounted ×0.95; when
    the lengths diverge (ratio ≥ 1.5) the substring-alignment
    ``partial_levenshtein`` components join the max, discounted ×0.9
    (×0.6 past an 8× length gap). All similarities are taken as
    ``100 − normalized_distance`` and the result converted back, so the
    lower-is-better contract of ``fuzzy_top1_join`` holds.
    """

    def norm(c: Column) -> Column:
        return F.concat_ws(" ", F.array_sort(F.split(F.lower(F.trim(c)), r"\s+")))

    la, lb = F.length(a), F.length(b)
    mx = F.greatest(la, lb, F.lit(1))
    len_ratio = mx / F.greatest(F.least(la, lb), F.lit(1))

    sim_base = F.lit(100.0) - F.lit(100.0) * F.levenshtein(a, b) / mx
    na, nb = norm(a), norm(b)
    nmx = F.greatest(F.length(na), F.length(nb), F.lit(1))
    sim_tsort = F.lit(100.0) - F.lit(100.0) * F.levenshtein(na, nb) / nmx
    sim_tset = F.lit(100.0) - token_set_distance(a, b)

    pscale = F.when(len_ratio > 8, F.lit(0.6)).otherwise(F.lit(0.9))
    sim_partial = F.lit(100.0) - partial_levenshtein(a, b)
    sim_ptsort = F.lit(100.0) - partial_levenshtein(na, nb)

    best = F.when(
        len_ratio >= 1.5,
        F.greatest(
            sim_base,
            sim_partial * pscale,
            sim_ptsort * F.lit(0.95) * pscale,
            sim_tset * F.lit(0.95) * pscale,
        ),
    ).otherwise(
        F.greatest(sim_base, sim_tsort * F.lit(0.95), sim_tset * F.lit(0.95))
    )
    return F.lit(100.0) - best


def fuzzy_top1_join(
    left: DataFrame,
    left_col: str,
    domain: DataFrame,
    domain_col: str,
    mapped_name: str = "matched",
    score_expr: Callable[[Column, Column], Column] | None = None,
    max_distance: int | None = None,
    max_left_distinct: int | None = 100_000,
) -> DataFrame:
    """Map each ``left_col`` value to its best-scoring ``domain_col`` value.

    Pipeline (all Catalyst-visible, no Python UDF):
      1. ``distinct(left_col)`` — dedup before the expensive op (the
         reference's memo cache, transform.py:43,50-57).
      2. cross-join against broadcast ``distinct(domain_col)``.
      3. score: default ``F.levenshtein`` (lower=better). Pass
         ``score_expr(left, right) -> Column`` for a custom metric
         (lower=better contract).
      4. exact matches short-circuit with score -1 (reference :50-52).
      5. top-1 per left value: ``row_number()`` ordered by
         (score, domain value) — the domain tiebreak makes it
         deterministic.
      6. optional ``max_distance``: worse matches → NULL (the
         reference's unmatchable→null, :53-57).
      7. broadcast the mapping back onto ``left``.

    ``max_left_distinct`` is the SURVEY §4.4 guardrail: the operator's
    viability rests on the distinct left side being domain-shaped
    (country names, categories), and a high-cardinality free-text
    column would silently build a |distinct_left| × |domain| grid. The
    distinct side is counted first (one cheap job over one column) and
    the join refuses to run past the cap — raise it (or pass ``None``)
    deliberately if the grid is genuinely intended.
    """
    score = score_expr or (lambda a, b: F.levenshtein(a, b))

    lv = left.select(F.col(left_col).alias("__lv")).filter(F.col("__lv").isNotNull()).distinct()
    dv = domain.select(F.col(domain_col).alias("__dv")).filter(F.col("__dv").isNotNull()).distinct()
    if max_left_distinct is not None:
        n_left = lv.count()
        if n_left > max_left_distinct:
            raise ValueError(
                f"fuzzy_top1_join: distinct({left_col}) has {n_left} values, "
                f"over max_left_distinct={max_left_distinct} — the scoring "
                f"grid would be {n_left} x |domain|. If this column is "
                "genuinely domain-shaped, raise max_left_distinct (or pass "
                "None); otherwise pre-aggregate or block the left side."
            )

    scored = lv.crossJoin(F.broadcast(dv)).withColumn(
        "__score",
        F.when(F.col("__lv") == F.col("__dv"), F.lit(-1)).otherwise(
            score(F.col("__lv"), F.col("__dv"))
        ),
    )
    w = Window.partitionBy("__lv").orderBy(F.col("__score").asc(), F.col("__dv").asc())
    best = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    if max_distance is not None:
        best = best.withColumn(
            "__dv",
            F.when(F.col("__score") <= max_distance, F.col("__dv")),
        )
    mapping = best.select(
        F.col("__lv"), F.col("__dv").alias(mapped_name)
    )
    return left.join(
        F.broadcast(mapping), left[left_col] == mapping["__lv"], "left"
    ).drop("__lv")
