"""Composition test for the applied corpus pipeline: the end-to-end
output must equal composing the registry's own (oracle-verified)
operators step by step."""

from __future__ import annotations

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.pipeline import corpus
from projekt_data_engineering_iubh_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_matches_operator_composition(spark, tmp_path):
    out = str(tmp_path / "corpus")
    stats = corpus.run(spark, SF_DIR, out)

    # lanes are monotone and non-trivial
    assert stats.n_raw >= stats.n_lang >= stats.n_quality >= stats.n_dedup > 0
    assert stats.n_train + stats.n_test == stats.n_dedup
    assert stats.n_train > stats.n_test  # 80/20

    got = spark.read.parquet(out)

    # quality lane == docs_text_stats' quality_score ≥ threshold, restricted
    # to the configured langs
    q = all_queries()["docs_text_stats"].fn(spark, SF_DIR)
    expected_quality = {
        r.doc_id
        for r in q.filter(
            F.col("quality_score") >= corpus.DEFAULT_MIN_QUALITY
        ).collect()
    }
    langs_ok = {
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("lang").isin(*corpus.DEFAULT_LANGS))
        .collect()
    }
    survivors = {r.doc_id for r in got.collect()}
    assert survivors <= (expected_quality & langs_ok)

    # split column matches the registered deterministic split operator
    split_q = {
        r.doc_id: r.split
        for r in all_queries()["docs_train_test_split"].fn(spark, SF_DIR).collect()
    }
    for r in got.select("doc_id", "split").collect():
        assert split_q[r.doc_id] == r.split

    # dedup: no two survivors may be LSH near-dups of each other
    pairs = (
        all_queries()["docs_minhash_lsh_pairs"]
        .fn(spark, SF_DIR)
        .filter(F.col("est_jaccard") >= corpus.NEAR_DUP_JACCARD)
        .collect()
    )
    for p in pairs:
        assert not (p.doc_a in survivors and p.doc_b in survivors), (
            p.doc_a,
            p.doc_b,
        )

    # partition-pruned layout
    import os

    assert any(x.startswith("split=") for x in os.listdir(out))


def test_pipeline_idempotent_rerun(spark, tmp_path):
    out = str(tmp_path / "corpus")
    s1 = corpus.run(spark, SF_DIR, out)
    rows1 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    s2 = corpus.run(spark, SF_DIR, out)
    rows2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert rows1 == rows2 and s1 == s2
