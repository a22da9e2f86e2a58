"""The r13 stacked PQ-book trainer must be BIT-IDENTICAL to the
sequential per-subspace km.kmeans_train path it replaced (and the
literal-centroid Lloyd loop must be bit-identical to the lazy
assign/update chain): the IVF-PQ oracles re-derive the sequential
arithmetic, so any divergence anywhere in the stacked loop is a
hash mismatch on every ADC entry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table, spread
from projekt_data_engineering_iubh_spark.operators import kmeans as km
from projekt_data_engineering_iubh_spark.plans import vector_queries as vq

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def res(spark):
    e = spread(load_table(spark, SF, "embeddings"))
    qv = e.select(
        "vec_id", km.quantize_normalized(F.col("embedding")).alias("qemb")
    )
    coarse = (
        km.kmeans_train(qv, vq._KM_K, vq._KM_ITERS, vq.EMB_DIM)
        .orderBy("cell")
        .collect()
    )
    cells = [r.cell for r in coarse]
    cqs = [list(r.cq) for r in coarse]
    return vq._ivfpq_residuals(qv, cells, cqs).localCheckpoint(eager=True)


def _sequential_books(res, pq_m, pq_codes, iters, subdim):
    """The pre-r13 shape: one km.kmeans_train per subspace."""
    book_cells, books = [], []
    for m in range(pq_m):
        subv = res.select(
            "vec_id", F.slice("remb", m * subdim + 1, subdim).alias("qemb")
        )
        cents = (
            km.kmeans_train(subv, pq_codes, iters, subdim)
            .orderBy("cell")
            .collect()
        )
        book_cells.append([r.cell for r in cents])
        books.append([list(r.cq) for r in cents])
    return book_cells, books


def test_stacked_books_equal_sequential(res):
    seq_cells, seq_books = _sequential_books(
        res, vq._PQ_M, vq._PQ_CODES, vq._PQT_ITERS, vq.EMB_DIM // vq._PQ_M
    )
    stk_cells, stk_books = vq._train_books(
        res, vq._PQ_M, vq._PQ_CODES, vq._PQT_ITERS, vq.EMB_DIM // vq._PQ_M
    )
    assert stk_cells == seq_cells
    assert stk_books == seq_books


def test_literal_trainer_equals_lazy_chain(spark):
    """km.kmeans_train's per-round literal loop == the lazy
    assign_cells/update_centroids chain, bit for bit (the arithmetic
    the DuckDB kmeans CTEs replicate)."""
    e = load_table(spark, SF, "embeddings")
    qv = e.select("vec_id", km.quantize(F.col("embedding")).alias("qemb"))

    def lazy_train(vectors, k, iters, dim):
        cents = vectors.filter(F.col("vec_id") < k).select(
            F.col("vec_id").cast("int").alias("cell"),
            F.col("qemb").alias("cq"),
        )
        for _ in range(iters):
            cents = km.update_centroids(km.assign_cells(vectors, cents), dim)
        return cents

    for k, iters in [(8, 3), (5, 0)]:
        a = sorted(
            (r.cell, list(r.cq)) for r in lazy_train(qv, k, iters, 64).collect()
        )
        b = sorted(
            (r.cell, list(r.cq))
            for r in km.kmeans_train(qv, k, iters, 64).collect()
        )
        assert a == b, f"k={k} iters={iters}"
