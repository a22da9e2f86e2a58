"""Property tests binding the generator to the pipeline (SURVEY.md §5.3).

The generator injects errors from ranges that strictly violate the default
thresholds while ok-ranges never do (rounding included), so the pipeline's
total_error_count must equal the injected count exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.config import DEFAULT_RULES
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)


@pytest.fixture(scope="module", params=[7, 42])
def sim(request, tmp_path_factory):
    res = simulate_day("DieBonder_01", "2024-10-16", hours=0.1, seed=request.param)
    path = tmp_path_factory.mktemp("sim") / f"day_{request.param}.csv"
    write_csv(res, path)
    return res, str(path)


def test_generator_shape(sim):
    res, _ = sim
    assert len(res.rows) == res.n_cycles * 8
    assert res.n_cycles > 500  # 0.1h at ~0.6s/cycle


def test_generator_determinism():
    a = simulate_day("DieBonder_01", "2024-10-16", hours=0.05, seed=99)
    b = simulate_day("DieBonder_01", "2024-10-16", hours=0.05, seed=99)
    c = simulate_day("DieBonder_01", "2024-10-16", hours=0.05, seed=100)
    assert a.rows == b.rows and a.error_rates == b.error_rates
    assert a.rows != c.rows


def test_pipeline_matches_injected_ground_truth(spark, sim):
    res, path = sim
    raw = da.read_events_csv(spark, path)
    enriched, summary = da.transform(raw, DEFAULT_RULES)

    total_injected = sum(res.injected_errors.values())
    total_flagged = enriched.agg(F.sum("is_error")).collect()[0][0]
    assert total_flagged == total_injected

    stats = summary.agg(
        F.sum("cycle_count").alias("cycles"),
        F.sum("total_error_count").alias("errors"),
        F.min("min_cycle_time_seconds").alias("min_ct"),
        F.max("max_cycle_time_seconds").alias("max_ct"),
    ).collect()[0]
    assert stats.cycles == res.n_cycles
    assert stats.errors == total_injected
    # complete cycles are bounded by the delta sums: 575–660 ms
    # (min 130+95+50+220+80, max 150+105+55+250+100; +1ms for ms truncation)
    assert 0.575 <= stats.min_ct <= stats.max_ct
    assert stats.max_ct <= 0.661


def test_events_rows_equal_cycles_times_8(spark, sim):
    res, path = sim
    raw = da.read_events_csv(spark, path)
    enriched, _ = da.transform(raw, DEFAULT_RULES)
    assert enriched.count() == res.n_cycles * 8
