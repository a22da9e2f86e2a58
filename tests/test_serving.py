"""Serving-layer tests: dashboard query shapes over the summary store."""

from __future__ import annotations

import pytest

from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline import serving
from projekt_data_engineering_iubh_spark.pipeline.config import DEFAULT_RULES
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    for machine, seed in [("M_A", 1), ("M_B", 2)]:
        res = simulate_day(machine, "2024-06-01", hours=0.05, seed=seed)
        p = tmp / f"{machine}.csv"
        write_csv(res, p)
        da.run(spark, str(p), str(tmp / "wh"), DEFAULT_RULES)
    return str(tmp / "wh")


def test_available_dates(spark, warehouse):
    s = serving.summary_table(spark, warehouse)
    dates = [str(r.summary_date) for r in serving.available_dates(s).collect()]
    assert dates == ["2024-06-01"]


def test_day_slice_shape_and_derived_hour(spark, warehouse):
    s = serving.summary_table(spark, warehouse)
    rows = serving.day_slice(s, "2024-06-01").collect()
    assert {r.machine_id for r in rows} == {"M_A", "M_B"}
    for r in rows:
        assert r.timestamp_hour.hour == r.hour_of_day
    # P17: machine filter
    only_a = serving.day_slice(s, "2024-06-01", machine_ids=["M_A"]).collect()
    assert {r.machine_id for r in only_a} == {"M_A"}


def test_day_slice_prunes_partitions(spark, warehouse):
    s = serving.summary_table(spark, warehouse)
    plan = (
        serving.day_slice(s, "2024-06-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partition filter present on the partition column
    assert "PartitionFilters" in plan and "summary_date" in plan
