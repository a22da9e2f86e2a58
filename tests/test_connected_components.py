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
