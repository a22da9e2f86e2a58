"""Sketch aggregates: the HLL estimate is engine-specific, so the driver
contract carries (exact count, within-error-bound boolean) — pin the
boolean locally so a sketch regression can't hide behind the contract."""

from __future__ import annotations

from projekt_data_engineering_iubh_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_hll_error(spark):
    rows = all_queries()["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.exact_parts > 0, r
        # rsd=0.02 sketch vs 5% tolerance: deterministic for fixed input
        assert r.within_5pct, r
