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


# ---------------------------------------------------------------------------
# Adversarial hot-bucket skew (r4 VERDICT #1): a boilerplate template
# cluster funnels ALL its docs into one band bucket — the uncapped
# self-join would materialize bands·B²/2 candidate pairs there. The
# LSH_MAX_BUCKET guard must keep candidates linear in B while the dedup
# still collapses the cluster to exactly one representative.
# ---------------------------------------------------------------------------

ADV_N = 300


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    from scale_sweep import plant_template_cluster

    out = str(tmp_path_factory.mktemp("adv"))
    plant_template_cluster(spark, SF_BASE, out, ADV_N)
    return out


def test_hot_bucket_candidates_stay_linear(spark, adversarial_dir):
    from scale_sweep import ADV_OFFSET

    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        _LSH_BANDS,
        LSH_MAX_BUCKET,
        _lsh_pairs,
    )

    capped = _lsh_pairs(spark, adversarial_dir, max_bucket=LSH_MAX_BUCKET)
    tmpl_pairs = capped.filter(F.col("doc_a") >= ADV_OFFSET).count()
    linear_bound = _LSH_BANDS * LSH_MAX_BUCKET * ADV_N
    quadratic = _LSH_BANDS * ADV_N * (ADV_N - 1) // 2
    # the guard binds: well under the all-pairs blowup, within the
    # bands·cap·B linear envelope
    assert 0 < tmpl_pairs <= linear_bound, (tmpl_pairs, linear_bound)
    assert tmpl_pairs < quadratic / 3, (tmpl_pairs, quadratic)


def test_hot_bucket_cluster_still_collapses_to_one(spark, adversarial_dir):
    from scale_sweep import ADV_OFFSET

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators.connected_components import (
        connected_components,
    )
    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        _lsh_pairs,
        docs_dedup_apply,
        docs_dedup_clusters,
    )

    # multi-star connectivity: every planted doc lands in ONE component,
    # so exactly one representative survives and the cluster map shows a
    # single cluster of size ADV_N (deterministic at this fixture size —
    # the guard-neutrality form of the claim, capped == uncapped
    # components, is asserted below and is what must hold at ANY size;
    # tools/scale_sweep.py asserts the same at n=1000, where MinHash
    # estimator noise legitimately leaves one planted doc a singleton in
    # BOTH variants)
    survivors = (
        docs_dedup_apply(spark, adversarial_dir)
        .filter(F.col("doc_id") >= ADV_OFFSET)
        .count()
    )
    assert survivors == 1, survivors
    clusters = (
        docs_dedup_clusters(spark, adversarial_dir)
        .filter(F.col("doc_id") >= ADV_OFFSET)
        .select("cluster_id")
        .distinct()
        .count()
    )
    assert clusters == 1, clusters

    # guard-neutrality: the capped dedup keeps exactly what the uncapped
    # (quadratic-candidate) reference keeps
    docs = load_table(spark, adversarial_dir, "documents").select("doc_id")
    unc = connected_components(
        docs,
        _lsh_pairs(spark, adversarial_dir).filter(F.col("est_jaccard") >= 0.5),
        id_col="doc_id",
        src_col="doc_a",
        dst_col="doc_b",
        component_col="cluster_id",
    )
    unc_survivors = unc.filter(
        (F.col("doc_id") >= ADV_OFFSET)
        & (F.col("doc_id") == F.col("cluster_id"))
    ).count()
    assert unc_survivors == survivors, (unc_survivors, survivors)


def test_hot_bucket_guard_ann_pairs(spark, tmp_path):
    """Same guard on the embedding LSH: B copies of one vector share one
    bucket; capped pairs stay ≤ cap·B instead of B²/2."""
    import os

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.plans.vector_queries import (
        ANN_MAX_BUCKET,
        emb_lsh_ann_pairs,
    )

    b = 400
    e = load_table(spark, SF_BASE, "embeddings")
    one = e.limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(50_000_000 + i, one.embedding, one.label) for i in range(b)],
        schema=e.schema,
    )
    out = str(tmp_path / "annadv")
    os.makedirs(out, exist_ok=True)
    e.unionByName(dup).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    pairs = (
        emb_lsh_ann_pairs(spark, out)
        .filter(F.col("vec_a") >= 50_000_000)
        .count()
    )
    assert 0 < pairs <= ANN_MAX_BUCKET * b, (pairs, ANN_MAX_BUCKET * b)
    assert pairs < b * (b - 1) / 2, pairs


def test_occupancy_probe_memo_invalidates_on_rewrite(spark, tmp_path):
    """The probe memo (keyed by table path + dir mtime) must NOT serve a
    stale occupancy after the dataset at the same path is rewritten —
    a stale "under cap" answer would run the uncapped plan on oversized
    buckets and diverge from the capped oracle."""
    import os
    import time as _time

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.plans.vector_queries import (
        ANN_MAX_BUCKET,
        _max_occupancy,
    )

    out = str(tmp_path / "memoinv")
    os.makedirs(out, exist_ok=True)
    e = load_table(spark, SF_BASE, "embeddings")
    e.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    occ1 = _max_occupancy(spark, out)
    assert occ1 <= ANN_MAX_BUCKET  # normal data: under cap, memoized

    # rewrite the SAME path with an adversarial bucket (mtime must tick)
    one = e.limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(60_000_000 + i, one.embedding, one.label) for i in range(300)],
        schema=e.schema,
    )
    _time.sleep(0.05)
    e.unionByName(dup).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    occ2 = _max_occupancy(spark, out)
    assert occ2 > ANN_MAX_BUCKET, (occ1, occ2)
