"""Bucketed tables co-locate joins: same bucket count on the join key on
both sides → SortMergeJoin with ZERO exchanges. This is the storage-level
answer to repeated big-fact joins at 100 TB (shuffle once at write time,
never again at read time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("orders_bucketed")
        )
        (
            c.write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("customer_bucketed")
        )
        ob = spark.table("orders_bucketed")
        cb = spark.table("customer_bucketed")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan
        # and it still computes the right thing
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS customer_bucketed")
