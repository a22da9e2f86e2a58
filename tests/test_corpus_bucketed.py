"""Bucketed corpus store (r4 VERDICT #5): the corpus side of the
incremental exact-dedup join must read pre-bucketed — zero exchange,
zero sort on the big side; only the (small) arriving batch shuffles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.pipeline import corpus, corpus_store

SF_DIR = "/root/testdata/sf0.001"
TABLE = "corpus_bucketed_test"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bcorpus") / "curated")
    corpus.run(spark, SF_DIR, out, bucketed_table=TABLE)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_corpus_side_join_is_exchange_free(spark, bucketed):
    batch = load_table(spark, SF_DIR, "documents").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        m = corpus_store.exact_matches(spark, batch, bucketed)
        plan = m._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # exactly TWO hash exchanges in the whole plan: the batch side
        # shuffling into the corpus's bucketing, and the final groupBy —
        # i.e. ZERO on the corpus branch (its scan feeds the join through
        # a bucket-local sort only)
        assert plan.count("Exchange hashpartitioning") == 2, plan
        # and the corpus scan really is the bucketed read
        assert "Bucketed: true" in plan and "SelectedBucketsCount" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_exact_matches_correct_and_batch_side_only_shuffles(spark, bucketed):
    docs = load_table(spark, SF_DIR, "documents")
    # batch = copies of 5 corpus docs (exact dups) + 2 novel docs
    dup = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    novel = docs.sparkSession.createDataFrame(
        [(2_000_000, "novel text never seen one"),
         (2_000_001, "novel text never seen two")],
        ["doc_id", "text"],
    )
    batch = dup.unionByName(novel)
    got = {
        r.doc_id: r.match_doc_id
        for r in corpus_store.exact_matches(spark, batch, bucketed).collect()
    }
    # every duplicated corpus doc that SURVIVED curation matches itself;
    # novel docs produce no row
    table_ids = {
        r.doc_id for r in docs.sparkSession.table(bucketed).select("doc_id").collect()
    }
    for base_id in range(5):
        if base_id in table_ids:
            assert got.get(1_000_000 + base_id) == base_id
    assert 2_000_000 not in got and 2_000_001 not in got


def test_bucketed_write_via_corpus_run_matches_parquet(spark, bucketed):
    t = spark.table(bucketed)
    assert t.count() > 0
    # bucketing column present and equal to md5(text)
    bad = t.filter(F.col("text_hash") != F.md5("text")).count()
    assert bad == 0
