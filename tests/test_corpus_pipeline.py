"""Composition test for the applied corpus pipeline: the end-to-end
output must equal composing the registry's own (oracle-verified)
operators step by step."""

from __future__ import annotations

import pytest
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


def test_corpus_run_with_trained_scorer(spark, tmp_path):
    """pipeline.corpus can swap the heuristic lane for the trained
    naive-Bayes classifier (r3 VERDICT #6): the run completes, stats are
    coherent, and the model lane is a subset of the lang filter."""
    from projekt_data_engineering_iubh_spark.pipeline.corpus import run

    out = str(tmp_path / "corpus_model")
    stats = run(spark, "/root/testdata/sf0.001", out, scorer="model")
    assert stats.n_quality <= stats.n_lang <= stats.n_raw
    assert stats.n_dedup <= stats.n_quality
    assert stats.n_train + stats.n_test == stats.n_dedup
    assert stats.n_dedup > 0

    got = spark.read.parquet(out)
    assert got.count() == stats.n_dedup


def test_model_scorer_agrees_with_heuristic_on_extremes(spark):
    """The classifier is bootstrapped FROM the heuristic's unambiguous
    slices — on those training docs it must overwhelmingly reproduce the
    labels (a model that can't fit its own training data is broken)."""
    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators.quality_model import (
        BAD_T,
        GOOD_T,
        fit_predict,
    )
    from projekt_data_engineering_iubh_spark.plans.text_queries import (
        docs_text_stats,
    )

    sf = "/root/testdata/sf0.001"
    heur = docs_text_stats(spark, sf).select("doc_id", "quality_score")
    pred = fit_predict(load_table(spark, sf, "documents"))
    joined = heur.join(pred, "doc_id").collect()
    labeled = [
        r for r in joined
        if r.quality_score >= GOOD_T or r.quality_score <= BAD_T
    ]
    assert len(labeled) >= 20  # the bootstrap slices are non-trivial
    agree = sum(
        1 for r in labeled
        if r.pred == ("good" if r.quality_score >= GOOD_T else "bad")
    )
    # 0.85, not higher: the observed misfits are all docs within ~0.01 of
    # the BAD_T threshold whose token mix resembles good text — the
    # token-level generalization disagreeing with a borderline heuristic
    # label is the model working, not failing
    assert agree / len(labeled) >= 0.85, f"{agree}/{len(labeled)}"


def test_model_scorer_fails_loudly_on_degenerate_bootstrap(spark):
    """All-good (or all-bad) input leaves one bootstrap slice empty; the
    prior would be ln(inf). The model must raise an actionable error, not
    crash with CAST_OVERFLOW or silently classify everything 'bad'."""
    from projekt_data_engineering_iubh_spark.operators.quality_model import (
        fit_predict,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and the cat is in "
        "the house and the dog is at the door and all of the animals are "
        "in the garden of the old man who is happy to see them every day"
    )
    docs = spark.createDataFrame(
        [(i, good + f" extra {i}") for i in range(5)], "doc_id long, text string"
    )
    # the wrapper type varies by Spark client path — the MESSAGE is the
    # contract being tested
    with pytest.raises(Exception, match="bootstrap slices empty"):
        fit_predict(docs).collect()
