"""Connected components over an edge list — the cluster step of
transitive near-duplicate deduplication.

Keep-first pair policies (drop ``doc_b`` of every near-dup pair) are not
cluster-consistent: for pairs (1,3),(2,3) they keep both 1 and 2 even
though all three documents are transitively duplicates. The standard
corpus-dedup policy is one representative per CONNECTED COMPONENT of the
near-dup graph (min id), which this operator computes.

Algorithm: iterative label propagation over the ACTIVE vertex set only
(vertices touched by at least one edge) — every other vertex is a
singleton component by definition and is unioned back at the end. At
corpus scale the near-dup vertex set is orders of magnitude smaller
than the corpus, so the loop never re-joins or re-checkpoints the
billions of never-changing singleton labels. Each active vertex starts
labeled with itself; each round takes the min label over itself and its
neighbors, until a fixpoint. Rounds needed = graph diameter, which for
near-dup graphs is tiny (clusters are quasi-cliques: every member pairs
with most others). Each round is one equi-join + one aggregation of the
(edge, label) relation — all shuffles on ids, nothing quadratic. Lineage
is truncated per round with ``localCheckpoint`` so the plan does not
grow exponentially (at cluster scale, configure a checkpoint dir and use
``checkpoint`` instead; same contract). For graphs with large diameters
(paths/meshes) use :func:`connected_components_star` — the two-phase
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond"), O(log n) rounds on any graph shape.

Determinism: min-propagation is order- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_ROUNDS = 25


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str,
    src_col: str,
    dst_col: str,
    component_col: str = "component",
    stats: dict | None = None,
    materialize_vertices: bool = True,
) -> DataFrame:
    """Label every vertex with the min vertex id of its component.

    ``vertices``: one row per vertex (singletons keep their own id).
    ``edges``: may be directed/deduplicated — both directions are derived.
    Returns (id_col, component_col). When ``stats`` is passed, it receives
    ``{"rounds": k}`` — the scale-sweep's convergence telemetry (rounds
    must stay a small constant as the corpus grows; tools/scale_sweep.py).
    ``materialize_vertices=False`` skips the vertex-frame checkpoint for
    callers whose vertex source is a trivially cheap scan (a pruned
    parquet id column): it is re-read by the active/singleton splits
    instead of paying a materialization job.
    """
    # materialize the DIRECTED edge list once — every round joins against
    # it, and upstream edge pipelines (e.g. the MinHash LSH join) are far
    # more expensive than the ids they produce. Deriving both directions
    # AFTER the checkpoint (r7) keeps the expensive join out of the
    # second union branch: checkpoint-then-union runs the edge plan once,
    # union-then-checkpoint ran it once per branch (the exchanges are
    # reused across branches, the join/filter/project above them is not).
    directed = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    und = directed.unionByName(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # iterate ONLY over vertices touched by an edge: every other vertex
    # is a singleton whose component is itself, no propagation needed.
    # At corpus scale the near-dup vertex set is orders of magnitude
    # smaller than the corpus — without this, every round re-joins and
    # re-checkpoints billions of never-changing singleton labels (r3
    # bench: the loop's per-round cost drops to O(|edge vertices|)).
    # one materialization of the vertex ids (the upstream scan may be
    # expensive); active/singleton split derives from it, not from two
    # rescans of the source
    ids = vertices.select(F.col(id_col).alias("id"))
    if materialize_vertices:
        ids = ids.localCheckpoint(eager=True)
    # initialize each active vertex at min(self ∪ neighbors) — round 1's
    # result, computed by the SAME groupBy that would find the active set
    # anyway (no join needed: both edge directions are present, so every
    # active vertex appears as src). Still ≥ the component min and
    # produced by the same monotone update rule, so convergence and the
    # fixpoint test are unchanged; for star/quasi-clique near-dup graphs
    # (every member adjacent to the component min) this IS the fixpoint,
    # and the loop's first iteration merely verifies it — one fewer
    # join+checkpoint+count round than self-labeled initialization (r7:
    # measured ~0.3 s off docs_dedup_apply at sf0.1).
    init = und.groupBy("src").agg(F.min("dst").alias("nmin"))
    active = init.select(F.col("src").alias("id"), "nmin").join(
        ids, "id", "left_semi"
    )
    singletons = ids.join(active, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    labels = active.select(
        "id", F.least(F.col("id"), F.col("nmin")).alias("comp")
    ).localCheckpoint(eager=True)

    for round_no in range(1, MAX_ROUNDS + 1):
        neighbor_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(F.col("comp"), F.coalesce("nmin", "comp")).alias("comp"),
            (F.col("nmin") < F.col("comp")).alias("changed"),
        )
        # convergence test BEFORE materializing (r13): on the converged
        # round new_labels == labels row-for-row (no comp moved), so the
        # old materialize-then-count shape paid a localCheckpoint job for
        # a frame it immediately discarded. Near-dup graphs converge on
        # round 1 (the min(self ∪ neighbors) init is the fixpoint for
        # quasi-cliques), so the common path now runs ONE job per query
        # here instead of two; a continuing round re-executes the
        # label join once into its checkpoint — both inputs are already
        # materialized, so that re-run is the cheap part of the round.
        n_changed = new_labels.filter(F.col("changed")).count()
        if stats is not None:
            stats["rounds"] = round_no
        if n_changed == 0:
            return labels.unionByName(singletons).select(
                F.col("id").alias(id_col), F.col("comp").alias(component_col)
            )
        labels = new_labels.drop("changed").localCheckpoint(eager=True)
    raise RuntimeError(
        f"connected_components did not converge in {MAX_ROUNDS} rounds; "
        "graph diameter too large — use large-star/small-star"
    )


# ---------------------------------------------------------------------------
# Large-star / small-star — the O(log n)-round fallback for long diameters
# ---------------------------------------------------------------------------


def _checksum(e: DataFrame) -> tuple:
    """Cheap fixpoint detector for an edge set: count + order-insensitive
    sums. Exact set equality is a shuffle; this is one aggregation."""
    row = e.agg(
        F.count(F.lit(1)),
        F.sum(F.col("u").cast("decimal(38,0)")),
        F.sum(F.col("v").cast("decimal(38,0)")),
        # decimal accumulator: a long sum of xxhash64 values overflows
        # under ANSI mode
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(row)


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: m = min(neighbors ∪ {u}); every LARGER neighbor
    re-attaches to m. (Kiveris et al., Algorithm: large-star.)"""
    nbr = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbr.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        nbr.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Key every edge by its larger endpoint; m = min(smaller neighbors
    ∪ {u}); all of them plus u re-attach to m. (small-star.)"""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so m < u
    attach_nbrs = (
        d.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    attach_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return attach_nbrs.unionByName(attach_self).distinct()


def connected_components_star(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str,
    src_col: str,
    dst_col: str,
    component_col: str = "component",
    max_rounds: int = 50,
) -> DataFrame:
    """Two-phase large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", MR-CC): each
    round is two groupBy+join passes over the EDGE set only, and the
    round count is O(log n) on ANY graph shape — the fallback
    :func:`connected_components`'s diameter-bound label propagation
    needs for paths/meshes. At fixpoint the edge set is a star forest:
    every non-minimum node holds exactly the edge (node, component min).

    Same contract as :func:`connected_components`; prefer that operator
    for near-dup quasi-cliques (fewer passes per round), this one for
    unknown or long-diameter graph shapes.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _checksum(e)
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"star CC did not converge in {max_rounds} rounds"
        )
    # star forest: non-min nodes -> their center; everyone else (centers
    # and edge-free vertices) labels itself
    ids = vertices.select(F.col(id_col).alias("id"))
    labeled = e.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    selfed = ids.join(labeled, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return labeled.join(ids, "id", "left_semi").unionByName(selfed).select(
        F.col("id").alias(id_col), F.col("comp").alias(component_col)
    )
