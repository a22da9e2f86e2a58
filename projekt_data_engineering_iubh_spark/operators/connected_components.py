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
(paths/meshes) prefer the two-phase large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") — out
of scope here because near-dup diameters don't need it.

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
) -> DataFrame:
    """Label every vertex with the min vertex id of its component.

    ``vertices``: one row per vertex (singletons keep their own id).
    ``edges``: may be directed/deduplicated — both directions are derived.
    Returns (id_col, component_col).
    """
    # materialize the edge list once — every round joins against it, and
    # upstream edge pipelines (e.g. the MinHash LSH join) are far more
    # expensive than the ids they produce
    und = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .localCheckpoint(eager=True)
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
    ids = vertices.select(F.col(id_col).alias("id")).localCheckpoint(eager=True)
    active = (
        und.select(F.col("src").alias("id"))  # both directions present
        .distinct()
        .join(ids, "id", "left_semi")
    )
    singletons = ids.join(active, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    labels = active.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=True
    )

    for _ in range(MAX_ROUNDS):
        neighbor_min = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("nmin", "comp")).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            return labels.unionByName(singletons).select(
                F.col("id").alias(id_col), F.col("comp").alias(component_col)
            )
    raise RuntimeError(
        f"connected_components did not converge in {MAX_ROUNDS} rounds; "
        "graph diameter too large — use large-star/small-star"
    )
