"""Profiler unit tests: the null/distinct cases the all-dense corpus
oracle can't exercise."""

from __future__ import annotations

from projekt_data_engineering_iubh_spark.operators.profile import profile


def test_profile_counts_nulls_and_distincts(spark):
    rows = [
        (1, "a", None),
        (2, "a", 1.5),
        (3, None, 1.5),
        (4, "b", None),
    ]
    df = spark.createDataFrame(rows, "id long, s string, v double")
    got = {r.column_name: r for r in profile(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in got.values())
    assert (got["id"].n_nulls, got["id"].n_distinct) == (0, 4)
    assert (got["s"].n_nulls, got["s"].n_distinct) == (1, 2)  # nulls excluded
    assert (got["v"].n_nulls, got["v"].n_distinct) == (2, 1)
    assert got["v"].null_frac == 0.5


def test_profile_single_pass(spark):
    """One aggregation over the input — the scan appears once in the
    plan (the whole point vs per-column scans)."""
    df = spark.range(100).selectExpr("id", "id % 7 AS m")
    plan = profile(df)._jdf.queryExecution().optimizedPlan().toString()  # noqa: SLF001
    assert plan.lower().count("range (0, 100") == 1
