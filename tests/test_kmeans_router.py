"""Two-level coarse router pins (r11 — productized from the r10
tools/knn_join_scale.py measurement).

The r10 scale law: join recall depends on router CONSISTENCY, not argmin
fidelity (recall held 0.140 vs 0.156 while 60.7% of vectors routed
differently from exact argmin) — BECAUSE both join sides share the
router, a misrouted region of space is misrouted identically on both
sides and still meets itself in the joined cell. These pins state the
contract that result rests on; the cross-engine bit-parity of the whole
construction (trainer, router, routing, join) is certified separately by
emb_knn_join_trained's DuckDB oracle hash match.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table, spread
from projekt_data_engineering_iubh_spark.operators import kmeans as km

SF = "/root/testdata/sf0.001"
DIM = 64


def _vectors(spark):
    e = spread(load_table(spark, SF, "embeddings"))
    return e.select("vec_id", km.quantize(F.col("embedding")).alias("qemb"))


def _trained_router(spark, k=12):
    v = _vectors(spark)
    cents = km.kmeans_train_ranked(v, k, 2, DIM).localCheckpoint(eager=True)
    router = km.train_router(cents, DIM)
    router.supers = router.supers.localCheckpoint(eager=True)
    router.cent_super = router.cent_super.localCheckpoint(eager=True)
    return v, cents, router


def test_router_assignment_is_first_probe(spark):
    """THE consistency contract: routing a vector as corpus
    (route_top_cells n_cells=1) must return exactly the first cell of
    routing the same vector as a query (n_cells>1) — same ranking, same
    (dist, cell) tie-break, one shared router. If this drifts, the two
    join sides stop agreeing on where space lives and recall silently
    collapses at scale (the failure mode the r10 law warns about)."""
    v, _, router = _trained_router(spark)
    assigned = {
        r.vec_id: r.cell
        for r in km.route_top_cells(router, v, "vec_id", [], 1).collect()
    }
    probes = km.route_top_cells(router, v, "vec_id", [], 4).collect()
    first = {}
    for r in probes:
        first.setdefault(r.vec_id, r.cell)  # rows come back rank-ordered?
    # don't rely on collect order: recompute rank-1 INDEPENDENTLY with
    # the join/window shape (the pre-r13 implementation) — this is the
    # cross-check that the r13 literal-expression routing replicates
    # the (sd, super_cell) / (d, cell) tie-breaks exactly
    from pyspark.sql import Window

    sc = v.crossJoin(F.broadcast(router.supers)).withColumn(
        "sd", km._int_sq_dist(F.col("qemb"), F.col("scq"))
    )
    sw = Window.partitionBy("vec_id").orderBy("sd", "super_cell")
    probed = (
        sc.withColumn("sr", F.row_number().over(sw))
        .filter(F.col("sr") <= km.ROUTER_SUPER_PROBES)
        .select("vec_id", "qemb", "super_cell")
    )
    cand = probed.join(
        F.broadcast(router.cent_super), "super_cell"
    ).withColumn("d", km._int_sq_dist(F.col("qemb"), F.col("cq")))
    w = Window.partitionBy("vec_id").orderBy("d", "cell")
    rank1 = {
        r.vec_id: r.cell
        for r in cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert assigned == rank1
    # and every assigned cell is among the vector's probe set
    probe_sets: dict[int, set] = {}
    for r in probes:
        probe_sets.setdefault(r.vec_id, set()).add(r.cell)
    for vid, cell in assigned.items():
        assert cell in probe_sets[vid], vid


def test_router_probes_are_distinct_and_bounded(spark):
    """Each vector probes ROUTER_SUPER_PROBES distinct supers (or fewer
    only when fewer survive training) and n_cells distinct cells, all
    drawn from the probed supers' centroids."""
    v, cents, router = _trained_router(spark)
    sup_of = {
        r.cell: r.super_cell for r in router.cent_super.collect()
    }
    rows = km.route_top_cells(router, v, "vec_id", [], 3).collect()
    per_vec: dict[int, list] = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, []).append(r.cell)
    n_vec = v.count()
    assert len(per_vec) == n_vec
    for vid, cells in per_vec.items():
        assert len(cells) == len(set(cells)), vid
        assert len(cells) <= 3
        # cells span at most ROUTER_SUPER_PROBES supers
        assert len({sup_of[c] for c in cells}) <= km.ROUTER_SUPER_PROBES


def test_router_super_count_tracks_sqrt_k(spark):
    """n_super = max(2, isqrt(k)) over the MATERIALIZED centroid count —
    the sizing the ~(√k + 2k/√k) folds-per-vector cost model assumes."""
    v, cents, router = _trained_router(spark, k=12)
    k_eff = cents.count()
    expected = max(2, math.isqrt(k_eff))
    assert router.supers.count() <= expected  # empty supers may drop
    assert router.supers.count() >= 2
    # every centroid routes to exactly one surviving super
    cs = router.cent_super.collect()
    assert len(cs) == k_eff
    sup_ids = {r.super_cell for r in router.supers.collect()}
    assert {r.super_cell for r in cs} <= sup_ids


def test_ranked_seeds_work_on_non_dense_ids(spark):
    """kmeans_train_ranked seeds by RANK: a corpus half (odd ids only)
    still seeds k centroids with dense cell ids 0..k-1 — dense-id
    seeding (vec_id < k) would grab ~k/2 seeds here."""
    v = _vectors(spark).filter(F.col("vec_id") % 2 == 1)
    cents = km.kmeans_train_ranked(v, 6, 0, DIM)  # seeds only, no rounds
    rows = sorted(cents.collect(), key=lambda r: r.cell)
    assert [r.cell for r in rows] == list(range(6))
    # seed vectors are the 6 lowest odd vec_ids' quantized embeddings
    low = v.orderBy("vec_id").limit(6).collect()
    assert [list(r.cq) for r in rows] == [list(r.qemb) for r in low]


def test_wide_super_probing_recovers_exact_argmin(spark):
    """n_probe_super widened to ALL supers makes the probe pool every
    centroid, so routed assignment must equal the exact broadcast
    argmin (assign_cells) — the equivalence that makes n_probe_super a
    pure recall/cost dial (2 = two-pass min_by fast path, wider = the
    row_number window path; r11 trap note)."""
    v, cents, router = _trained_router(spark)
    n_supers = router.supers.count()
    routed = {
        r.vec_id: r.cell
        for r in km.route_top_cells(
            router, v, "vec_id", [], 1, n_probe_super=n_supers
        ).collect()
    }
    exact = {
        r.vec_id: r.cell
        for r in km.assign_cells(
            v, cents.select("cell", "cq")
        ).collect()
    }
    assert routed == exact
    # and n_probe_super=3 draws cells from at most 3 supers per vector
    sup_of = {r.cell: r.super_cell for r in router.cent_super.collect()}
    rows = km.route_top_cells(
        router, v, "vec_id", [], 4, n_probe_super=3
    ).collect()
    per_vec: dict[int, set] = {}
    for r in rows:
        per_vec.setdefault(r.vec_id, set()).add(sup_of[r.cell])
    assert all(len(s) <= 3 for s in per_vec.values())


def test_join_fallback_equals_literal_path(spark, monkeypatch):
    """Routers past ROUTER_LITERAL_MAX_VALUES embedded values route
    through the broadcast-join shape; forcing the gate to 0 must give
    the literal path's exact answer for both corpus assignment
    (n_cells=1) and query probing (n_cells>1) — and the routed trainer's
    gated round must reproduce the literal round bit-for-bit."""
    v, cents, router = _trained_router(spark)
    lit1 = sorted(
        (r.vec_id, r.cell)
        for r in km.route_top_cells(router, v, "vec_id", [], 1).collect()
    )
    lit3 = sorted(
        (r.vec_id, r.cell)
        for r in km.route_top_cells(router, v, "vec_id", [], 3).collect()
    )
    trained_lit = {
        r.cell: list(r.cq)
        for r in km.kmeans_train_ranked_routed(v, 24, 2, DIM).collect()
    }
    monkeypatch.setattr(km, "ROUTER_LITERAL_MAX_VALUES", 0)
    join1 = sorted(
        (r.vec_id, r.cell)
        for r in km.route_top_cells(router, v, "vec_id", [], 1).collect()
    )
    join3 = sorted(
        (r.vec_id, r.cell)
        for r in km.route_top_cells(router, v, "vec_id", [], 3).collect()
    )
    trained_join = {
        r.cell: list(r.cq)
        for r in km.kmeans_train_ranked_routed(v, 24, 2, DIM).collect()
    }
    assert join1 == lit1
    assert join3 == lit3
    assert trained_join == trained_lit


def test_routed_trainer_equals_exact_when_probes_cover_all_supers(spark):
    """kmeans_train_ranked_routed (r12 — router-assisted Lloyd, the
    trainer that makes cells ∝ n affordable at 1M+ vectors): when the
    per-iteration router's probes cover EVERY super (k small enough
    that n_super == n_probe_super == 2), routed assignment degenerates
    to exact argmin, so the routed trainer must reproduce the exact
    trainer BIT-FOR-BIT — the degenerate-case consistency pin that
    anchors what 'approximate' means at larger k (assignment may then
    differ near cell boundaries, centroids drift, and that is the
    documented trade)."""
    v = _vectors(spark)
    k = 4  # isqrt(4) = 2 supers; 2 probes cover both
    exact = {
        r.cell: list(r.cq)
        for r in km.kmeans_train_ranked(v, k, 2, DIM).collect()
    }
    routed = {
        r.cell: list(r.cq)
        for r in km.kmeans_train_ranked_routed(v, k, 2, DIM).collect()
    }
    assert routed == exact


def test_routed_trainer_output_shape_at_production_k(spark):
    """At a k where routing is genuinely approximate: the routed
    trainer still emits <= k cells (Lloyd drops emptied cells), every
    centroid is dim-length, and cell ids come from the seed rank space
    [0, k)."""
    v = _vectors(spark)
    k = 24
    cents = km.kmeans_train_ranked_routed(v, k, 2, DIM).collect()
    assert 0 < len(cents) <= k
    assert all(len(r.cq) == DIM for r in cents)
    assert all(0 <= r.cell < k for r in cents)
