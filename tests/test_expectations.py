"""operators/expectations.py — planted-violation coverage (the registry
entry orders_expectations only proves the all-pass path on clean driver
data) and the one-pass plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators import expectations as ex

ROWS = [
    # (k, cat, val, name)
    (1, "A", 10.0, "x-1"),
    (1, "A", 20.0, "x-2"),  # duplicate k
    (2, "B", -5.0, "x-3"),  # out of range
    (3, "Z", 30.0, "x-4"),  # bad category
    (None, "A", 40.0, "bad"),  # null key + regex violation
    (4, None, None, "x-5"),  # nulls that row-level rules must NOT count
]
SCHEMA = "k long, cat string, val double, name string"


def _report(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        r.rule: (r.violations, r.passed)
        for r in ex.check(
            df,
            [
                ex.not_null("k"),
                ex.unique("k"),
                ex.in_range("val", 0, 100),
                ex.accepted_values("cat", ["A", "B"]),
                ex.matches("name", "^x-"),
            ],
        ).collect()
    }


def test_planted_violations_counted_exactly(spark):
    got = _report(spark)
    assert got["not_null:k"] == (1, False)
    assert got["unique:k"] == (1, False)  # one row beyond the first '1'
    assert got["in_range:val"] == (1, False)  # null val NOT a violation
    assert got["accepted_values:cat"] == (1, False)  # null cat NOT counted
    assert got["matches:name"] == (1, False)
    assert len(got) == 5


def test_clean_table_all_pass_and_empty_table(spark):
    clean = spark.createDataFrame(
        [(1, "A", 1.0, "x-1"), (2, "B", 2.0, "x-2")], SCHEMA
    )
    rules = [ex.not_null("k"), ex.unique("k"), ex.in_range("val", 0, 10)]
    assert all(r.passed and r.violations == 0
               for r in ex.check(clean, rules).collect())
    # empty input: zero violations, every rule passes (coalesce guard)
    empty = spark.createDataFrame([], SCHEMA)
    rep = ex.check(empty, rules).collect()
    assert len(rep) == 3 and all(r.violations == 0 and r.passed for r in rep)


def test_referential_orphans(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    rep = ex.referential(child, parent, "fk", "pk").collect()
    assert len(rep) == 1
    r = rep[0]
    # the 99 row is an orphan; the NULL fk is not_null's business
    assert r.rule == "referential:fk->pk"
    assert (r.violations, r.passed) == (1, False)


def test_single_scan_regardless_of_rule_count(spark):
    """N row-level rules must compile to ONE aggregate over ONE scan —
    the executed plan contains exactly one scan of the input and no
    join/union fan-out."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = (
        ex.check(
            df,
            [
                ex.not_null("k"),
                ex.unique("k"),
                ex.in_range("val", 0, 100),
                ex.accepted_values("cat", ["A", "B"]),
                ex.matches("name", "^x-"),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1
    assert "Join" not in plan
    assert "Union" not in plan
