"""Shared-signature cache (r7 headroom #2): the opt-in session-scoped
persist of the MinHash signature frame must (a) change NO results, (b)
actually share one persisted frame across consumers, and (c) invalidate
when the table at the same path is rewritten."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.plans import text_queries as tq

SF_BASE = "/root/testdata/sf0.001"


@pytest.fixture()
def share_on(spark):
    spark.conf.set("spark.graft.shareSignatures", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.graft.shareSignatures", "false")
        for k in list(tq._SIG_SHARE_CACHE):
            try:
                tq._SIG_SHARE_CACHE.pop(k).unpersist()
            except Exception:
                pass


def _pairs(spark, sf_dir):
    return sorted(
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in tq.docs_minhash_lsh_pairs(spark, sf_dir).collect()
    )


def test_shared_signatures_identical_results_and_shared_frame(
    spark, share_on
):
    want = None
    # compute the reference result with sharing OFF first
    spark.conf.set("spark.graft.shareSignatures", "false")
    want = _pairs(spark, SF_BASE)
    spark.conf.set("spark.graft.shareSignatures", "true")

    got = _pairs(spark, SF_BASE)
    assert got == want and len(got) > 0

    # the memo serves the SAME persisted frame to every consumer
    s1 = tq._signatures(spark, SF_BASE)
    s2 = tq._signatures(spark, SF_BASE)
    assert s1 is s2
    assert s1.storageLevel.useMemory or s1.storageLevel.useDisk
    # a second query family consumes it too (dedup_apply path)
    assert tq.docs_dedup_apply(spark, SF_BASE).count() > 0


def test_shared_signatures_invalidate_on_rewrite(spark, share_on, tmp_path):
    out = str(tmp_path / "sigshare")
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, SF_BASE, "documents")
    docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    n1 = tq.docs_minhash_signatures(spark, out).count()
    stale = tq._signatures(spark, out)

    # rewrite the SAME path with half the corpus (mtime must tick)
    _time.sleep(0.05)
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    n2 = tq.docs_minhash_signatures(spark, out).count()
    assert 0 < n2 < n1, (n1, n2)
    # the superseded persist was dropped from the memo
    assert all(
        s is not stale for s in tq._SIG_SHARE_CACHE.values()
    )


def test_sharing_off_by_default(spark):
    assert not tq._share_signatures(spark)
    s1 = tq._signatures(spark, SF_BASE)
    s2 = tq._signatures(spark, SF_BASE)
    assert s1 is not s2
    assert tq._SIG_SHARE_CACHE == {}


def test_shset_signatures_identical(spark):
    """The with_shsets signature build (r14: minhash over the DISTINCT
    shingle set, sets riding the band rows) must produce bit-identical
    minhash values to the shared pipeline (_signatures hashes the
    shingle MULTISET — min is unaffected by duplicates), and the carried
    sets must equal a from-scratch array_distinct(shingles(tokens))."""
    from projekt_data_engineering_iubh_spark.catalog import spread
    from projekt_data_engineering_iubh_spark.functions import text as tx

    for sf_dir in (SF_BASE, "/root/testdata/sf0.01"):
        base = sorted(
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in tq._lsh_pairs(spark, sf_dir).collect()
        )
        withs = tq._lsh_pairs(spark, sf_dir, with_shsets=True).collect()
        assert sorted((r.doc_a, r.doc_b, r.est_jaccard) for r in withs) == base
        # carried sets == from-scratch shingle sets for the pair docs
        d = spread(load_table(spark, sf_dir, "documents"))
        shs = {
            r.doc_id: list(r.shset)
            for r in d.select(
                "doc_id",
                F.array_distinct(
                    tx.shingles(tx.tokens(F.col("text")))
                ).alias("shset"),
            ).collect()
        }
        for r in withs:
            assert list(r.set_a) == shs[r.doc_a]
            assert list(r.set_b) == shs[r.doc_b]
