"""docs_train_order (#108) determinism guarantees beyond the oracle:
the training order must be a pure function of (seed, doc_id) — invariant
to physical partitioning and input row order. A data-parallel reader
recomputing its slice on a different cluster layout must see the SAME
epoch order, or training runs stop being reproducible."""

from __future__ import annotations

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.plans.curation_queries import (
    _ORD_SHARDS,
    docs_train_order,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.doc_id, r.shard, r.pos, r.global_ord, r.shard_offset_chars)
        for r in df.collect()
    )


def test_train_order_invariant_to_partitioning(spark):
    base = _rows(docs_train_order(spark, SF))
    assert base

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert _rows(docs_train_order(spark, SF)) == base
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_train_order_is_a_permutation_with_dense_orders(spark):
    df = docs_train_order(spark, SF)
    n = load_table(spark, SF, "documents").count()
    assert df.count() == n
    # every doc appears once; global_ord is injective; shard positions
    # are dense 1..shard_size; offsets are non-negative and increasing
    assert df.select("doc_id").distinct().count() == n
    assert df.select("global_ord").distinct().count() == n
    per_shard = df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("sz"),
        F.max("pos").alias("mx"),
        F.min("pos").alias("mn"),
        F.min("shard_offset_chars").alias("off0"),
    )
    for r in per_shard.collect():
        assert 0 <= r.shard < _ORD_SHARDS
        assert (r.mn, r.mx) == (1, r.sz)
        assert r.off0 == 0  # first doc of every shard starts at offset 0
