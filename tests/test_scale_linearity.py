"""Scale-linearity guard for the dedup stack (r3 VERDICT #2).

CI-sized version of tools/scale_sweep.py: replicate sf0.01 3× (disjoint
token-remapped copies) and assert the content-banded pair pipeline grows
linearly — a regression that makes candidate generation super-linear
(degenerate banding, sentinel leak, hash collision blowup) fails here
before any 100 TB run meets it. Full curves: tools/scale_sweep.py →
BASELINE.md.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

SF_BASE = "/root/testdata/sf0.01"
K = 3


@pytest.fixture(scope="module")
def replicated(spark, tmp_path_factory):
    from scale_sweep import build_replicas

    out = str(tmp_path_factory.mktemp("scale3x"))
    build_replicas(spark, SF_BASE, out, K)
    return out


def test_minhash_pairs_grow_linearly(spark, replicated):
    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        docs_minhash_lsh_pairs,
    )

    base = docs_minhash_lsh_pairs(spark, SF_BASE).count()
    big = docs_minhash_lsh_pairs(spark, replicated).count()
    assert base > 0
    # k disjoint copies ⇒ ≈ k× pairs; >1.3× linear = super-linear blowup,
    # <0.7× = candidate recall collapsed. (MinHash estimates vary per
    # copy under the token remap — hence the band, not exact equality.)
    assert 0.7 * K * base <= big <= 1.3 * K * base, (base, big)


def test_dedup_edges_stay_within_copies_and_cc_rounds_constant(
    spark, replicated
):
    from scale_sweep import OFFSET

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components,
    )
    from projekt_data_engineering_iubh_spark.plans.text_queries import _lsh_pairs

    edges = _lsh_pairs(spark, replicated).filter(F.col("est_jaccard") >= 0.5)
    cross = edges.filter(
        (F.col("doc_a") / OFFSET).cast("int")
        != (F.col("doc_b") / OFFSET).cast("int")
    ).count()
    assert cross == 0  # disjoint shingle spaces must never band together

    stats: dict = {}
    connected_components(
        load_table(spark, replicated, "documents").select("doc_id"),
        edges,
        id_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
        stats=stats,
    ).count()
    # convergence rounds = dup-cluster diameter, a data property — it must
    # NOT grow with corpus size (the 100 TB iteration-cost contract)
    assert stats["rounds"] <= 8, stats


def test_dedup_survivors_grow_linearly(spark, replicated):
    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        docs_dedup_apply,
    )

    base = docs_dedup_apply(spark, SF_BASE).count()
    big = docs_dedup_apply(spark, replicated).count()
    # every copy keeps its own representatives: exact k× up to estimator
    # noise on borderline pairs
    assert 0.9 * K * base <= big <= 1.1 * K * base, (base, big)
