"""The Arrow/numpy similarity kernel must agree with the HOF fold.

Tolerance policy (documented in operators/similarity.py): numpy sums
products pairwise/SIMD-reordered while the HOF fold is strictly
left-to-right, so doubles may differ by O(dim·eps) RELATIVE error — but
rankings, and therefore the top-k sets, must be identical on real data
(neighbor gaps are ~1e-2, twelve orders above the summation noise).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators import similarity as sim
from projekt_data_engineering_iubh_spark.plans.vector_queries import (
    emb_knn_brute,
)

SF_DIR = "/root/testdata/sf0.001"
REL_TOL = 1e-12  # dim 64: 64 * 2^-52 ≈ 1.4e-14, with margin


def test_cosine_pd_matches_hof_fold(spark):
    hof = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in emb_knn_brute(spark, SF_DIR).collect()
    }
    np_ = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in sim.knn_brute_pandas(spark, SF_DIR).collect()
    }
    # identical top-k membership AND rank order (keys carry both)
    assert set(hof) == set(np_)
    for key, v in hof.items():
        assert math.isclose(v, np_[key], rel_tol=REL_TOL), (key, v, np_[key])


def test_dot_pd_matches_hof_dot(spark):
    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.functions import vectors as vx

    e = load_table(spark, SF_DIR, "embeddings").limit(200)
    both = e.select(
        vx.dot(F.col("embedding"), F.col("embedding")).alias("hof"),
        sim.dot(F.col("embedding"), F.col("embedding")).alias("np"),
    ).collect()
    assert len(both) == 200
    for r in both:
        assert math.isclose(r.hof, r.np, rel_tol=REL_TOL), (r.hof, r.np)


def test_pandas_knn_is_arrow_batched_not_row_udf(spark):
    """The whole point of the variant: one ArrowEvalPython (pandas) stage,
    never a row-at-a-time BatchEvalPython."""
    plan = (
        sim.knn_brute_pandas(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
