"""Distributed EXACT top-k heavy hitters without a full-vocabulary
shuffle.

The naive exact top-k (``groupBy(key).count()`` + TakeOrdered) shuffles
one row per DISTINCT key — at 100 TB a token- or URL-keyed count means
shuffling billions of tail keys that can never reach the top-k. The
classic fix (TPUT — Cao & Wang, "Efficient top-k query calculation in
distributed networks", PODC 2004; same family as Misra-Gries per-shard
summaries) is:

  phase 1  each partition counts ITS OWN rows locally (zero shuffle,
           ``mapInPandas`` over the partition iterator) and emits only
           its top-``m`` (key, local_count) pairs plus its m-th local
           count t_p — the "threshold" row;
  bound    any key absent from every partition's top-m has total count
           <= sum_p t_p (it was beaten by m keys in every partition);
  phase 2  exact counts for the CANDIDATE set only: broadcast the
           (<= m * n_partitions)-sized candidate keys, semi-join the
           corpus, one aggregation whose shuffle carries candidate
           rows only — the tail never moves;
  proof    if the k-th verified count is STRICTLY greater than the
           bound, no unseen key can displace (or tie into) the top-k:
           the result is provably the exact top-k.

``exact_topk`` wraps the three phases in an escalation loop: if the
proof fails (m too small for the key distribution), m doubles and
phase 1 re-runs — so the RETURNED ANSWER is always the true top-k,
independent of partitioning; only the number of full-scan rounds
varies. Each round costs one corpus scan; size ``m`` off a frequency
sketch (``sketches.cms_build``) to land in one round. Memory per task
in phase 1 is one Counter over the partition's distinct keys — bounded
by ``spark.sql.files.maxPartitionBytes`` worth of rows, the same
envelope as every other ``mapInPandas`` user in this repo.

Ties: top-k is ordered by (count DESC, key ASC), so the cut is
deterministic; the proof uses a STRICT inequality so an unseen key
tying the k-th count can never silently reorder the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


#: above this, struct literals stop being a plan and start being a
#: plan-size bomb (the centroid-frame lesson: thousands of plan
#: literals blow up codegen/analysis) — route through createDataFrame,
#: whose one-time Python-RDD cost is the right trade at that size
_LITERAL_FRAME_MAX_ROWS = 512


def _literal_frame(spark, rows, schema: T.StructType) -> DataFrame:
    """Re-plant driver-verified rows as a PURE-EXPRESSION literal frame
    (explode of an array of struct literals) — no Python-RDD
    serialization (``createDataFrame(list_of_rows)`` plans a
    ``Scan ExistingRDD`` and pays a Python worker round-trip per call,
    PLANS.md #8's ~0.5-1 s lesson) and no live lineage. Order of
    ``rows`` is preserved (single-partition explode of an ordered
    array literal). Above ``_LITERAL_FRAME_MAX_ROWS`` (a grouped top-k
    over many groups can verify k×n_groups rows) the literal form
    would be a plan-size bomb — fall back to ``createDataFrame``,
    still lineage-free."""
    if len(rows) > _LITERAL_FRAME_MAX_ROWS:
        return spark.createDataFrame(rows, schema)
    structs = [
        F.struct(
            *[
                F.lit(r[f.name]).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
        for r in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__s"))
        .select("__s.*")
    )


def _local_tops_frame(df: DataFrame, key_col: str, m: int) -> DataFrame:
    """Phase 1: per-partition local top-``m`` counts + threshold rows
    (key=NULL, cnt=t_p). Zero shuffle — the iterator form of
    ``mapInPandas`` sees each input partition exactly once."""
    key_field = df.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("cnt", T.LongType(), False),
        ]
    )

    def local_tops(batches):
        from collections import Counter

        import pandas as pd

        c: Counter = Counter()
        for pdf in batches:
            # vectorized per Arrow batch; the Python loop runs over
            # DISTINCT keys, not rows
            for key, n in pdf[key_col].dropna().value_counts().items():
                c[key] += int(n)
        if not c:
            return
        top = c.most_common(m)
        keys = [k for k, _ in top]
        cnts = [v for _, v in top]
        # threshold row: the m-th local count, 0 when the partition's
        # whole vocabulary fit in m (nothing unseen remains here)
        thr = cnts[-1] if len(c) > m else 0
        yield pd.DataFrame(
            {key_col: keys + [None], "cnt": [*cnts, thr]}
        ).astype({"cnt": "int64"})

    return df.select(key_col).mapInPandas(local_tops, out_schema)


def exact_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    m: int = 64,
    max_rounds: int = 8,
    max_collect_rows: int = 1_000_000,
) -> DataFrame:
    """Exact top-``k`` (key, cnt) of ``key_col``'s frequency, ordered
    (cnt DESC, key ASC), computed without shuffling the vocabulary
    tail. NULL keys are ignored (``count`` semantics). See module
    docstring for the phase structure and the exactness proof; raises
    if the proof cannot be established within ``max_rounds``
    escalations (pathological only: m grows 2x per round).

    The escalation loop already COLLECTS the verified top-k to test
    the proof, so the returned frame is those rows re-planted as a
    literal (the qcut-quantile-edges pattern: driver-verified values
    become plan literals) — consuming the result costs ZERO further
    corpus scans (r9 returned the live phase-2 lineage and paid the
    candidate aggregation a second time at the sink). The phase-2
    plan itself stays auditable through the candidates frame inside
    the loop. The phase-1 collect adapts to scale: below
    ``max_collect_rows`` potential rows it is ONE raw collect (fewest
    jobs — the gate/bench shape); above it (100 TB: m × 10^5 partitions
    would ship every duplicate of every common hitter), the frame is
    pinned, the bound aggregated, and candidates DEDUPED ON THE
    EXECUTORS first — the driver then receives each candidate once
    (the candidate union is far smaller than m × partitions precisely
    when partitions agree on the heavy keys).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    key_field = df.schema[key_col]
    n_parts = df.rdd.getNumPartitions()
    for _ in range(max_rounds):
        local = _local_tops_frame(df, key_col, m)
        if (m + 1) * n_parts <= max_collect_rows:
            # one phase-1 job: threshold rows (NULL key) and candidates
            # from a single raw collect
            local_rows = local.collect()
            bound = sum(r["cnt"] for r in local_rows if r[key_col] is None)
            cand_keys = list(
                {r[key_col] for r in local_rows if r[key_col] is not None}
            )
        else:
            local = local.persist()
            try:
                bound = int(
                    local.filter(F.col(key_col).isNull())
                    .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("b"))
                    .collect()[0]["b"]
                )
                cand_keys = [
                    r[0]
                    for r in local.filter(F.col(key_col).isNotNull())
                    .select(key_col)
                    .distinct()
                    .collect()
                ]
            finally:
                local.unpersist()
        if not cand_keys:  # empty input (bound is 0 too): empty top-k
            return spark.createDataFrame(
                [], T.StructType([key_field, T.StructField("cnt", T.LongType())])
            )
        candidates = spark.createDataFrame(
            [(x,) for x in cand_keys], T.StructType([key_field])
        )
        exact = (
            df.select(key_col)
            .join(F.broadcast(candidates), key_col)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        topk = exact.orderBy(F.col("cnt").desc(), F.col(key_col).asc()).limit(k)
        rows = topk.collect()
        kth = int(rows[-1]["cnt"])
        # proof: the k-th verified count is STRICTLY above the bound
        # every unseen key is under (ties can't reorder the boundary),
        # and the candidate set is not truncated below k unless the
        # bound certifies the vocabulary itself is smaller than k
        if kth > bound and (len(rows) >= k or bound == 0):
            return _literal_frame(spark, rows, topk.schema)
        m *= 2
    raise RuntimeError(
        f"exact_topk: proof not established after {max_rounds} rounds "
        f"(final m={m}) — key distribution too flat; raise m or use "
        "a plain groupBy count"
    )


def _local_tops_frame_by(
    df: DataFrame, key_col: str, by: list[str], m: int
) -> DataFrame:
    """Grouped phase 1: per-partition, per-GROUP local top-``m`` counts
    plus one threshold row per (partition, group). Still zero shuffle;
    per-task memory is one Counter over the partition's distinct
    (group, key) pairs."""
    fields = [df.schema[c] for c in by] + [
        T.StructField(key_col, df.schema[key_col].dataType, True),
        T.StructField("cnt", T.LongType(), False),
    ]
    out_schema = T.StructType(fields)
    cols = [*by, key_col]

    def local_tops(batches):
        from collections import Counter, defaultdict

        import pandas as pd

        per_group: dict = defaultdict(Counter)
        for pdf in batches:
            sub = pdf[cols].dropna(subset=[key_col])
            if sub.empty:
                continue
            # eager NULL-group validation (r10 advice): a NULL group
            # value would collide with the threshold-row marker AND be
            # silently dropped by pandas groupby — fail loudly instead
            # of returning a quietly incomplete top-k
            null_by = [c for c in by if sub[c].isnull().any()]
            if null_by:
                raise ValueError(
                    f"exact_topk_by: NULL values in group column(s) "
                    f"{null_by}; filter or fill them upstream — NULL "
                    "groups are not supported"
                )
            # vectorized: one groupby per Arrow batch; the Python loop
            # below runs over DISTINCT (group, key) pairs, not rows
            vc = sub.groupby(cols, sort=False).size()
            for idx, n in vc.items():
                t = idx if isinstance(idx, tuple) else (idx,)
                per_group[t[:-1]][t[-1]] += int(n)
        if not per_group:
            return
        out_rows = []
        for g, c in per_group.items():
            top = c.most_common(m)
            for key, cnt in top:
                out_rows.append((*g, key, cnt))
            thr = top[-1][1] if len(c) > m else 0
            out_rows.append((*g, None, thr))
        yield pd.DataFrame(out_rows, columns=[*by, key_col, "cnt"]).astype(
            {"cnt": "int64"}
        )

    return df.select(*cols).mapInPandas(local_tops, out_schema)


def exact_topk_by(
    df: DataFrame,
    key_col: str,
    by: list[str],
    k: int = 10,
    m: int = 64,
    max_rounds: int = 8,
    max_collect_rows: int = 1_000_000,
) -> DataFrame:
    """Grouped ``exact_topk``: the true top-``k`` of ``key_col`` WITHIN
    each ``by`` group ("top URLs per language"), same TPUT proof per
    group, same escalation loop (all groups escalate together — the
    full scan is the unit of cost, so per-group m bookkeeping buys
    nothing). Output (by..., key, cnt), k rows per group, ordered
    within each group by (cnt DESC, key ASC).

    Driver state per round is the collected local-tops frame —
    <= (m+1) * n_partitions * n_groups rows — plus k * n_groups proof
    rows; meant for MODEST group counts (languages, sources, buckets),
    not per-host fan-outs. NULL keys are ignored; NULL GROUP values
    RAISE eagerly in phase 1 (a NULL group key would collide with the
    threshold-row marker and be silently dropped by the grouped
    count) — filter or fill them upstream. Like ``exact_topk``, the
    verified proof rows are re-planted as the returned literal frame.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not by:
        raise ValueError("by must be non-empty; use exact_topk instead")
    spark = df.sparkSession
    from pyspark.sql import Window

    n_parts = df.rdd.getNumPartitions()
    for _ in range(max_rounds):
        local = _local_tops_frame_by(df, key_col, by, m)
        if (m + 1) * n_parts > max_collect_rows:
            # scale path (same rule as exact_topk): dedup candidates
            # and sum bounds on the executors so the driver never
            # receives per-partition duplicates of the heavy keys
            local = local.persist()
            try:
                bound_rows = (
                    local.filter(F.col(key_col).isNull())
                    .groupBy(*by)
                    .agg(F.sum("cnt").alias("cnt"))
                    .collect()
                )
                cand_rows_in = (
                    local.filter(F.col(key_col).isNotNull())
                    .select(*by, key_col)
                    .distinct()
                    .collect()
                )
            finally:
                local.unpersist()
            bounds = {
                tuple(r[c] for c in by): int(r["cnt"]) for r in bound_rows
            }
            cand = {}
            for r in cand_rows_in:
                cand.setdefault(tuple(r[c] for c in by), set()).add(
                    r[key_col]
                )
        else:
            local_rows = local.collect()
            bounds = {}
            cand = {}
            for r in local_rows:
                g = tuple(r[c] for c in by)
                if r[key_col] is None:
                    bounds[g] = bounds.get(g, 0) + r["cnt"]
                else:
                    cand.setdefault(g, set()).add(r[key_col])
        if not cand:
            return spark.createDataFrame(
                [],
                T.StructType(
                    [df.schema[c] for c in by]
                    + [
                        T.StructField(
                            key_col, df.schema[key_col].dataType, True
                        ),
                        T.StructField("cnt", T.LongType(), False),
                    ]
                ),
            )
        cand_rows = [(*g, key) for g, keys in cand.items() for key in keys]
        candidates = spark.createDataFrame(
            cand_rows,
            T.StructType(
                [df.schema[c] for c in by]
                + [T.StructField(key_col, df.schema[key_col].dataType, True)]
            ),
        )
        exact = (
            df.select(*by, key_col)
            .join(F.broadcast(candidates), [*by, key_col])
            .groupBy(*by, key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy(*by).orderBy(
            F.col("cnt").desc(), F.col(key_col).asc()
        )
        topk = (
            exact.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        rows = topk.collect()
        per_group: dict = {}
        for r in rows:
            g = tuple(r[c] for c in by)
            per_group.setdefault(g, []).append(int(r["cnt"]))
        ok = True
        for g, cnts in per_group.items():
            bound_g = bounds.get(g, 0)
            kth = min(cnts)
            if not (kth > bound_g and (len(cnts) >= k or bound_g == 0)):
                ok = False
                break
        if ok:
            return _literal_frame(spark, rows, topk.schema)
        m *= 2
    raise RuntimeError(
        f"exact_topk_by: proof not established after {max_rounds} rounds "
        f"(final m={m}) — a group's key distribution is too flat; raise m"
    )
