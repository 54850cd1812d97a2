"""Connected components + cluster-level dedup (training-data extension).

``minhash_lsh_pairs``/``simhash_pairs``/``embedding_dup_pairs`` emit
near-duplicate PAIRS; an end-to-end corpus dedup needs the transitive
closure — if A~B and B~C, exactly one of {A,B,C} survives. That closure
is connected components over the pair graph.

Spark-first design (no GraphX dependency — it has no Python API):
iterative min-label propagation, the standard large-graph formulation:

  label(v) ← min(label(v), min_{(u,v)∈E} label(u))     until fixpoint

- Near-dup graphs are many tiny star/clique components, so the label
  diameter is small and convergence takes a handful of rounds; the cap
  (``max_iter``) bounds pathological chains.
- Each round is one join + one aggregation, both shuffling on the node
  id — co-partitioned round to round.
- ``localCheckpoint`` truncates the per-round lineage (otherwise the
  plan doubles every iteration and planning time, not data, becomes
  the bottleneck) and pins the frame for the convergence check.
- Convergence is detected with one tiny agg (sum of labels + count of
  label==id) instead of a join against the previous round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """(node id → component id) for every node appearing in ``edges``;
    the component id is the minimum node id of the component.

    ``checkpoint_dir`` switches lineage truncation from
    ``localCheckpoint`` (executor-local blocks — fast, but a lost
    executor loses the blocks and the job with them, since the lineage
    that could recompute them was truncated away) to reliable
    ``checkpoint()`` into that directory (HDFS/S3 on a cluster). Local
    mode and short jobs keep the default; long iterative runs on a
    1000-executor cluster, where an executor loss mid-iteration is
    routine, should pass a durable path.

    Non-convergence is NEVER silent: a component whose label diameter
    exceeds ``max_iter`` (a pathological long chain — near-dup graphs
    are stars/cliques, so this means the input is not a near-dup
    graph) would come back with split components. When the fixpoint is
    not reached within ``max_iter`` rounds the operator raises
    (``on_nonconverged='raise'``) or warns (default ``'warn'``), and
    either way stamps the outcome into the ``component`` column's
    metadata: ``{'converged': bool, 'iterations': int}`` — callers
    that swallow warnings can still check
    ``df.schema['component'].metadata``.
    """
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_nonconverged: {on_nonconverged!r}")

    def _pin_lazy(df: DataFrame) -> DataFrame:
        # plan truncates now; data materializes on the signature action
        # below — ONE job per round instead of pin + signature
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=False)
        return df.checkpoint(eager=False)

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    # lazy pins: plans truncate now; round 1's signature job is what
    # materializes sym and the seed labels (one job, not three)
    sym = _pin_lazy(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # seed with min(id, min neighbor) — one agg instead of the first
    # propagation round; stars and pairs (the common near-dup shapes)
    # are already converged after this
    labels = _pin_lazy(
        sym.groupBy(F.col("a").alias("id"))
        .agg(F.min("b").alias("__mn"))
        .select("id", F.least("id", "__mn").alias("component"))
    )

    prev_sig = None
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        msgs = labels.join(sym, labels["id"] == sym["a"]).select(
            F.col("b").alias("id"), F.col("component")
        )
        new_labels = _pin_lazy(
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        sig = new_labels.agg(
            F.sum("component").alias("s"), F.count(F.lit(1)).alias("n")
        ).first()
        labels = new_labels
        if prev_sig == (sig["s"], sig["n"]):
            converged = True
            break
        prev_sig = (sig["s"], sig["n"])
    if not converged:
        msg = (
            f"connected_components did not reach a fixpoint within "
            f"max_iter={max_iter} rounds — labels may split long-chain "
            f"components; raise max_iter (graph diameter bounds the "
            f"rounds needed)"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.withMetadata(
        "component", {"converged": converged, "iterations": rounds}
    )


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contractions (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — same output contract as
    ``connected_components`` (node id → component min, convergence
    stamped in metadata), different convergence physics: rounds scale
    with log of the component size, NOT its diameter, so a
    1M-node chain finishes in ~a dozen rounds where min-label
    propagation needs a million. Use this when the pair graph is not
    guaranteed to be near-dup-shaped (stars/cliques); label
    propagation remains the cheaper default for those.

    Per round: large-star hangs every node's larger neighbors off the
    neighborhood min (one groupBy + join over the symmetrized edges),
    small-star re-hangs the smaller ones (one groupBy + join over the
    to-smaller directed edges) — ~4 node-keyed shuffles per round, and
    the edge set can only shrink toward the final star forest.
    Convergence = edge-set signature (count + xxhash XOR) stable
    across a round; the signature is a 64-bit XOR over distinct edges,
    so a false stop needs a hash collision (~2⁻⁶⁴, non-adversarial
    ids).

    Iteration plumbing (the cost that actually dominates at small
    scale is jobs-per-round, not tasks): each round's edge set is
    LAZILY checkpointed — the DataFrame plan truncates to a
    LogicalRDD immediately (so analysis stays bounded: ``e`` feeds
    the next round TWICE via the symmetrize union, and an untruncated
    plan would double per round — measured exponential analysis blowup
    with plain ``persist``) — and the signature agg is the action that
    materializes it, so each round costs ONE job instead of an eager
    pin job plus the signature job.
    """
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_nonconverged: {on_nonconverged!r}")

    def _pin_lazy(df: DataFrame) -> DataFrame:
        # plan truncates now; the data materializes on the next action
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=False)
        return df.checkpoint(eager=False)

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    # lazy: consumed once, by the final labels join
    nodes = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    # directed child>parent form; self-loops contribute the node only.
    # Lazy pin: the initial signature below is the materializing job.
    e = _pin_lazy(
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    def signature(df: DataFrame):
        # bit_xor, not sum: a LongType sum of 64-bit hashes overflows
        # under ANSI mode; XOR is closed over int64 and order-free.
        # Running this agg is also what materializes the round's
        # persist — the one job per round.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev_sig = signature(e)
    converged = False
    rounds = 0
    for rounds in range(1, max_iter + 1):
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.col("a"), F.min("b")).alias("m")
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        smins = large.groupBy("a").agg(F.min("b").alias("m"))
        joined = large.join(smins, "a")
        small = (
            joined.filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select("a", F.col("m").alias("b")))
            .distinct()
        )
        e = _pin_lazy(small)
        sig = signature(e)  # the one job: materializes the pin + aggs
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        msg = (
            f"connected_components_two_phase did not stabilize within "
            f"max_iter={max_iter} rounds — raise max_iter (rounds grow "
            f"with log component size, so this indicates a very large "
            f"component or a pathological id distribution)"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # one row per node even on the warn/ignore non-converged path: a
    # not-yet-stable edge set can hold multiple parents per child, and
    # joining it raw would duplicate those ids — collapse to the min
    # parent first (a no-op once converged: the star forest has exactly
    # one parent per non-root)
    parents = e.groupBy(F.col("a").alias("id")).agg(
        F.min("b").alias("component")
    )
    labels = nodes.join(parents, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    return labels.withMetadata(
        "component", {"converged": converged, "iterations": rounds}
    )


def cluster_dedup(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
    algorithm: str = "label",
    score_col: str | None = None,
    components: DataFrame | None = None,
) -> DataFrame:
    """Keep one document per near-duplicate cluster, plus every
    document with no near-dup pair. ``pairs`` is any of the near-dup
    pair frames (minhash/simhash/embedding). ``checkpoint_dir`` is
    forwarded to the components pass. ``algorithm``: 'label'
    (min-label propagation — cheapest on the star/clique shapes
    near-dup graphs actually have) or 'two_phase' (Kiveris
    large-star/small-star — log-round convergence on ANY shape, the
    safe choice when chains are possible).

    Survivor policy: with ``score_col=None`` the minimum id survives
    (free — it IS the component id). With ``score_col`` set, the
    HIGHEST-scoring member survives (ties by min id) — the production
    policy: near-dup clusters usually hold one clean original plus
    mangled copies, and quality-keyed survivor selection keeps the
    clean one (pass any per-doc quality signal: a model score,
    readability length, -perplexity). Cost: one extra broadcast-shaped
    join of the component table against (id, score) and a per-cluster
    argmax window — both keyed on cluster members only, never the full
    corpus.

    ``components``: pass a precomputed (id, component) frame to skip
    the CC pass — callers that already labeled the pair graph (for
    cluster stats, for several survivor policies over one labeling)
    should not pay the iterative rounds twice.
    """
    if algorithm not in ("label", "two_phase"):
        raise ValueError(f"algorithm: {algorithm!r}")
    if components is not None:
        comp = components.select("id", "component")
    else:
        cc = (
            connected_components
            if algorithm == "label"
            else connected_components_two_phase
        )
        comp = cc(pairs, src=src, dst=dst, checkpoint_dir=checkpoint_dir)
    if score_col is None:
        # the survivor of each cluster IS its component id (min node id)
        dropped = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return corpus.join(dropped, id_col, "left_anti")
    scored = comp.join(
        corpus.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("__s")
        ),
        "id",
    )
    w = Window.partitionBy("component").orderBy(
        F.desc_nulls_last("__s"), F.asc("id")
    )
    dropped = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return corpus.join(dropped, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "warn",
) -> DataFrame:
    """(node id → pagerank) over a directed edge list — the standard
    crawl-curation quality prior (domain/page authority for weighting
    or filtering web-scale pretraining data; Page et al. 1999).

    Semantics: the damped random surfer with UNIFORM teleport and
    dangling-mass redistribution — per iteration

        r'(v) = (1-d)/N + d · ( Σ_{u→v} r(u)/deg(u) + D/N )

    where D is the total rank held by dangling nodes (no out-edges),
    redistributed uniformly, so Σ r = 1 is invariant (asserted by the
    convergence agg and pinned in tests against a numpy power-
    iteration oracle).

    Scale shape — the same iterative plumbing as the CC loops above:

    - Out-degrees are computed ONCE and joined into the edge frame, so
      each round is one contributions join (rank ⋈ edges on the source
      id) + one destination-keyed aggregation — two node/edge-keyed
      shuffles, co-partitioned round to round.
    - Each round's rank frame is LAZILY pinned (``localCheckpoint`` /
      reliable ``checkpoint`` via ``checkpoint_dir`` — same trade as
      ``connected_components``) and the convergence aggregate (L1
      delta vs the previous round + dangling mass for the NEXT round)
      is the action that materializes it: ONE job per round.
    - The L1-delta check needs prev⋈new; rank frames are node-sized,
      id-keyed — this join shuffles nothing extra at scale since both
      sides share the aggregation partitioning.

    Convergence: stop when the L1 delta ≤ ``tol``; otherwise
    ``on_nonconverged`` ('warn'/'raise'/'ignore'), outcome stamped in
    the ``rank`` column metadata like the CC operators.
    """
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError(f"on_nonconverged: {on_nonconverged!r}")

    def _pin_lazy(df: DataFrame) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=False)
        return df.checkpoint(eager=False)

    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    nodes = _pin_lazy(
        e.select(F.col("s").alias("id"))
        .unionByName(e.select(F.col("t").alias("id")))
        .distinct()
    )
    n_nodes = nodes.count()  # materializes the pin; N is needed up front
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame(
            [], "id long, rank double"
        ).withMetadata("rank", {"converged": True, "iterations": 0})

    degs = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # degree joined once; dangling nodes carry deg NULL
    with_deg = _pin_lazy(nodes.join(degs, "id", "left"))

    ranks = _pin_lazy(
        with_deg.select("id", "deg", F.lit(1.0 / n_nodes).alias("rank"))
    )
    # first materialization also reads the dangling mass
    row = ranks.agg(
        F.sum(F.when(F.col("deg").isNull(), F.col("rank")).otherwise(0.0)).alias("d")
    ).first()
    dangling = float(row["d"] or 0.0)

    base = (1.0 - damping) / n_nodes
    converged = False
    iters = 0
    for iters in range(1, max_iter + 1):
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["id"] == e["s"])
            .select(
                F.col("t").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        shared = base + damping * dangling / n_nodes
        new_ranks = _pin_lazy(
            with_deg.join(
                contribs.groupBy("id").agg(F.sum("c").alias("c")), "id", "left"
            ).select(
                "id",
                "deg",
                (
                    F.lit(shared)
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # ONE job: materializes the round and reads delta + next dangling
        row = new_ranks.join(
            ranks.select("id", F.col("rank").alias("prev")), "id"
        ).agg(
            F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("delta"),
            F.sum(
                F.when(F.col("deg").isNull(), F.col("rank")).otherwise(0.0)
            ).alias("d"),
        ).first()
        ranks = new_ranks
        dangling = float(row["d"] or 0.0)
        if float(row["delta"]) <= tol:
            converged = True
            break
    if not converged:
        msg = (
            f"pagerank did not reach tol={tol} within max_iter={max_iter} "
            f"iterations (last L1 delta ~{float(row['delta']):.2e}) — "
            f"raise max_iter or loosen tol"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return ranks.select("id", "rank").withMetadata(
        "rank", {"converged": converged, "iterations": iters}
    )


def pagerank_fixed(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    damping: float = 0.85,
    rounds: int = 3,
) -> DataFrame:
    """(node id → pagerank) after EXACTLY ``rounds`` power-iteration
    steps, as ONE fully-lazy plan — no per-round driver job.

    Same per-round arithmetic as ``pagerank`` (uniform teleport +
    dangling-mass redistribution), but the node count, the initial
    uniform rank and each round's dangling mass live in 1-row
    aggregate frames zipped in by literal-keyed broadcast joins
    instead of driver ``collect``s, so nothing materializes until the
    caller's action: the whole iteration is a single job (the shape
    the profile_metrics gate row wants — its DuckDB oracle unrolls
    the identical rounds as chained CTEs).

    Trade-off vs the ``pagerank`` loop, stated plainly: each round
    references the previous round's frame THREE times (dangling mass,
    contributions, rank carry-through), so an unpinned plan triples
    per round — measured ~12 s for a 5-node, 3-round gate fixture in
    stage overhead alone. Each round's output is therefore pinned with
    a LAZY ``localCheckpoint`` (r15; was a lazy ``persist``): the
    LOGICAL plan truncates to a LogicalRDD leaf at construction — the
    same idiom as ``connected_components_two_phase``, and for the same
    measured reason: with ``persist`` the 3× self-reference still
    inlines the previous round's full ANALYZED tree, so driver-side
    construction + planning grew ~3^rounds (profiled at 0.5 s
    construction + ~1.8 s action-side planning for the 5-node gate
    fixture; the lazy checkpoint form is ~1.7 s construction + ~0.04 s
    action, a net −0.6 s and LINEAR in rounds). Nothing materializes
    early — each round's RDD computes once, inside the caller's single
    action. Blocks are executor-local (lineage truncated: a lost
    executor loses the job — acceptable for the gate-fixture consumer;
    convergence runs at scale should use ``pagerank``, which reads the
    L1 delta and takes ``checkpoint_dir`` for durable truncation). The
    literal-keyed 1-row zips constant-fold into
    BroadcastNestedLoopJoins with SINGLE-ROW build sides — the
    documented tiny-build-side plan convention, not a scan-cross-scan
    hazard. pytest pins this equal to
    ``pagerank(max_iter=rounds, tol=0)``.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    nodes = (
        e.select(F.col("s").alias("id"))
        .unionByName(e.select(F.col("t").alias("id")))
        .distinct()
    )
    degs = e.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    stats = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("n_nodes")
    ).withColumn("__k", F.lit(1))
    with_deg = nodes.join(degs, "id", "left")

    ranks = with_deg.withColumn("__k", F.lit(1)).join(
        F.broadcast(stats), "__k"
    ).select(
        "id", "deg", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        dm = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("dm")
        ).withColumn("__k", F.lit(1))
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["id"] == e["s"])
            .groupBy(F.col("t").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            ranks.select("id", "deg", "n_nodes")
            .join(contribs, "id", "left")
            .withColumn("__k", F.lit(1))
            .join(F.broadcast(dm), "__k")
            .select(
                "id",
                "deg",
                "n_nodes",
                (
                    (
                        F.lit(1.0 - damping) / F.col("n_nodes")
                        + F.lit(damping) * F.col("dm") / F.col("n_nodes")
                    )
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        ).localCheckpoint(eager=False)
    return ranks.select("id", "rank")
