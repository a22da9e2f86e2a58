"""Connected-components operator: chains, singletons, convergence."""

from __future__ import annotations

from projekt_data_engineering_iubh_spark.operators.connected_components import (
    connected_components,
)


def _cc(spark, vertices, edges):
    v = spark.createDataFrame([(x,) for x in vertices], "doc_id long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "a long, b long"
    )
    if not edges:
        e = e.filter("a IS NOT NULL")
    out = connected_components(
        v, e, id_col="doc_id", src_col="a", dst_col="b", component_col="comp"
    )
    return {r["doc_id"]: r["comp"] for r in out.collect()}


def test_chain_collapses_transitively(spark):
    # (1,3),(2,3): keep-first pair policies keep 1 AND 2; CC keeps only 1
    got = _cc(spark, [1, 2, 3], [(1, 3), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_path_and_singleton(spark):
    got = _cc(spark, [1, 2, 3, 4, 5, 9], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9}


def test_two_components_direction_agnostic(spark):
    got = _cc(spark, [1, 2, 3, 4], [(2, 1), (4, 3)])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, [7, 8], [])
    assert got == {7: 7, 8: 8}


# ---------------------------------------------------------------------------
# large-star / small-star (the long-diameter fallback)
# ---------------------------------------------------------------------------


def _union_find(n_ids, edges):
    """Ground truth: plain union-find over python ints."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    comp = {}
    for i in n_ids:
        r = find(i)
        comp[i] = min(comp.get(r, r), r)
    reps = {}
    for i in n_ids:
        reps[i] = find(i)
    # normalize: representative must be the component MIN
    min_of = {}
    for i in n_ids:
        r = reps[i]
        min_of[r] = min(min_of.get(r, i), i)
    return {i: min_of[reps[i]] for i in n_ids}


def _run_star(spark, ids, edges):
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components_star,
    )

    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    e = (
        spark.createDataFrame(edges, "doc_a long, doc_b long")
        if edges
        else spark.createDataFrame([], "doc_a long, doc_b long")
    )
    out = connected_components_star(
        v, e, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
    )
    return {r.doc_id: r.component for r in out.collect()}


def test_star_long_path_beyond_label_prop_rounds(spark):
    """A 60-node path has diameter 59 — label propagation's 25-round cap
    would fail; star CC must converge in O(log n) rounds."""
    ids = list(range(60))
    edges = [(i, i + 1) for i in range(59)]
    got = _run_star(spark, ids, edges)
    assert got == {i: 0 for i in ids}


def test_star_mixed_shapes(spark):
    # two paths, a triangle, singletons; ids deliberately non-contiguous
    ids = [0, 1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 30, 99]
    edges = [
        (1, 0), (1, 2), (3, 2), (4, 3),     # path 0-1-2-3-4
        (12, 11), (10, 11),                  # path 10-11-12
        (20, 21), (21, 22), (22, 20),        # triangle
        # 30, 99 singletons
    ]
    got = _run_star(spark, ids, edges)
    assert got == _union_find(ids, edges)


def test_star_agrees_with_label_propagation(spark):
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components,
    )

    import random

    rnd = random.Random(7)
    ids = list(range(80))
    edges = [(rnd.randrange(80), rnd.randrange(80)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _union_find(ids, edges)
    got_star = _run_star(spark, ids, edges)
    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got_lp = {
        r.doc_id: r.component
        for r in connected_components(
            v, e, id_col="doc_id", src_col="doc_a", dst_col="doc_b"
        ).collect()
    }
    assert got_star == want == got_lp


def test_star_no_edges_all_singletons(spark):
    ids = [5, 6, 7]
    got = _run_star(spark, ids, [])
    assert got == {5: 5, 6: 6, 7: 7}
