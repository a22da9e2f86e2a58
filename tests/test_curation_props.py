"""Semantic property pins for the late-r7 curation/sketch queries —
claims the oracle hash equality alone doesn't state: the histogram
sketch's declared error bar, HLL's error vs its theoretical bound, the
weighted sample's length bias, and BM25's rare-term ranking."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.plans import all_queries

SF = "/root/testdata/sf0.01"
_Q = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    yield con
    con.close()


def test_hist_quantile_brackets_exact(spark, duck):
    """p_ub is an upper bin edge: exact quantile in (p_ub - width, p_ub]."""
    rows = _Q["events_value_hist_quantiles"].fn(spark, SF).collect()
    exact = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            "SELECT event_type,"
            " quantile_disc(value, 0.5), quantile_disc(value, 0.9),"
            " quantile_disc(value, 0.99)"
            " FROM events WHERE value IS NOT NULL GROUP BY 1"
        ).fetchall()
    }
    assert rows
    for r in rows:
        for ub, ex in zip((r.p50_ub, r.p90_ub, r.p99_ub), exact[r.event_type]):
            assert ub - 10 < ex <= ub, (r.event_type, ub, ex)


def test_hll_error_within_bound(spark):
    """Observed per-source error stays within ~4 sigma of the m=256
    theoretical standard error (1.04/sqrt(m) ~ 6.5%)."""
    for r in _Q["docs_hll_distinct"].fn(spark, SF).collect():
        rel = abs(r.hll_micro / 1e6 - r.n_exact) / r.n_exact
        assert rel < 4 * 1.04 / 16, (r.source, rel)


def test_hll_union_merge_identity(spark):
    r = _Q["docs_hll_union"].fn(spark, SF).collect()[0]
    assert r.hll_micro_merged == r.hll_micro_direct


def test_weighted_sample_prefers_long_docs(spark, duck):
    """Length-proportional sampling: the selected docs' mean n_chars
    must exceed the corpus mean (k=50 of 500 leaves ample signal)."""
    sel = _Q["docs_weighted_sample"].fn(spark, SF).agg(
        F.avg("n_chars")
    ).collect()[0][0]
    overall = duck.execute("SELECT AVG(n_chars) FROM documents").fetchone()[0]
    assert sel > overall, (sel, overall)


def test_bm25_rare_term_docs_outrank(spark, duck):
    """Docs containing the rare query term ('dup', df~5%) must dominate
    the top-k over docs matching only ubiquitous terms."""
    top = _Q["docs_bm25_topk"].fn(spark, SF).collect()
    ids = [r.doc_id for r in top]
    with_dup = {
        r[0]
        for r in duck.execute(
            "SELECT doc_id FROM documents"
            " WHERE list_contains(string_split_regex(lower(text),"
            " '[^a-z0-9]+'), 'dup')"
        ).fetchall()
    }
    hits = sum(1 for i in ids if i in with_dup)
    assert hits >= len(ids) * 0.8, (hits, len(ids))


def test_pagerank_mass_in_clusters(spark):
    """Connected documents must carry more rank than isolated ones
    (isolated pin at (1-d) = 0.15e6), and every rank is positive."""
    rows = _Q["docs_pagerank"].fn(spark, SF).collect()
    iso = [r.rank_micro for r in rows if r.deg == 0]
    con = [r.rank_micro for r in rows if r.deg > 0]
    assert all(r == 150_000 for r in iso)
    assert con and min(con) > 0
    assert max(con) > 150_000


def test_dsir_src0_docs_score_higher(spark):
    """Importance weights against the src0 target: src0's own docs must
    average a higher weight than the rest of the corpus."""
    df = _Q["docs_dsir_weights"].fn(spark, SF)
    docs = (
        df.sparkSession.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
    )
    avg = (
        df.join(docs, "doc_id")
        .groupBy(F.col("source") == "src0")
        .agg(F.avg("avg_lw_micro").alias("a"))
        .collect()
    )
    by = {r[0]: r.a for r in avg}
    assert by[True] > by[False], by
