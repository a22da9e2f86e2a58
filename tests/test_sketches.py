"""Sketch aggregates: rows-only queries still need local accuracy bounds
(the driver can't oracle engine-specific sketches)."""

from __future__ import annotations

from projekt_data_engineering_iubh_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_hll_error(spark):
    rows = all_queries()["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # approx_count_distinct default rsd = 0.05; allow 3 sigma
        assert abs(r.approx_parts - r.exact_parts) <= max(3, 0.15 * r.exact_parts), r
