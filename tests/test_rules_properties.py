"""Property tests for the threshold-rule compiler (reference P12).

Hypothesis generates arbitrary rule configs and event rows; the compiled
Column predicate must agree with a direct Python evaluation of the
reference semantics (strict comparisons, NULL-safe, ``_``-keys skipped,
unknown shapes ignored, no rules → all zero).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from projekt_data_engineering_iubh_spark.operators.rules import (
    compile_predicate,
    rules_to_sql_predicate,
    with_error_flag,
)

PARAMS = ["AS_VacuumUnits", "PP_VacuumUnits", "PP_Force"]
EVENTS = ["AS_Check", "Pick_Check", "Place_Check", "Cycle_Start"]
MAPPING = {
    f"rule_{p}_{e}": {"parameter_name": p, "event_name": e}
    for p in PARAMS
    for e in EVENTS
}

thresholds = st.floats(
    min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
)

rule_body = st.one_of(
    st.fixed_dictionaries({"error_if_above": thresholds}),
    st.fixed_dictionaries({"error_if_below": thresholds}),
    st.builds(
        lambda a, b: {"error_if_outside_range": [min(a, b), max(a, b)]},
        thresholds,
        thresholds,
    ),
    st.just({"unknown_shape": 1}),  # ignored by compiler
    st.just("not-a-dict"),  # skipped like the reference
)

rules_config = st.dictionaries(
    st.sampled_from(sorted(MAPPING) + ["_comment", "unmapped_key"]),
    rule_body,
    max_size=6,
)

rows = st.lists(
    st.tuples(
        st.sampled_from(PARAMS),
        st.sampled_from(EVENTS),
        st.one_of(st.none(), thresholds),
    ),
    min_size=1,
    max_size=40,
)


def python_reference(rules, mapping, param, event, value) -> int:
    """Direct transcription of the reference semantics
    (daily_aggregator.py:70-116)."""
    for key, rule in rules.items():
        if key.startswith("_") or not isinstance(rule, dict):
            continue
        if key not in mapping:
            continue
        scope = mapping[key]
        if scope["parameter_name"] != param or scope["event_name"] != event:
            continue
        if value is None:
            continue
        if "error_if_above" in rule:
            if value > rule["error_if_above"]:
                return 1
        elif "error_if_below" in rule:
            if value < rule["error_if_below"]:
                return 1
        elif "error_if_outside_range" in rule:
            lo, hi = rule["error_if_outside_range"]
            if value < lo or value > hi:
                return 1
    return 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rules=rules_config, data=rows)
def test_compiled_predicate_matches_python_reference(spark, rules, data):
    df = spark.createDataFrame(
        [(i, p, e, v) for i, (p, e, v) in enumerate(data)],
        "row_id long, parameter_name string, event_name string, value double",
    )
    got = {
        r.row_id: r.is_error
        for r in with_error_flag(df, rules, MAPPING).collect()
    }
    for i, (p, e, v) in enumerate(data):
        want = python_reference(rules, MAPPING, p, e, v)
        assert got[i] == want, (rules, p, e, v)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rules=rules_config, data=rows)
def test_sql_rendering_agrees_with_compiled_predicate(spark, rules, data):
    """The DuckDB SQL rendering (used in oracles) and the Column compiler
    must express the same predicate."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (row_id BIGINT, parameter_name VARCHAR, "
        "event_name VARCHAR, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [(i, p, e, v) for i, (p, e, v) in enumerate(data)],
    )
    pred = rules_to_sql_predicate(rules, MAPPING)
    duck = dict(
        con.execute(
            f"SELECT row_id, CASE WHEN {pred} THEN 1 ELSE 0 END FROM t"
        ).fetchall()
    )
    df = spark.createDataFrame(
        [(i, p, e, v) for i, (p, e, v) in enumerate(data)],
        "row_id long, parameter_name string, event_name string, value double",
    )
    got = {
        r.row_id: r.is_error
        for r in with_error_flag(df, rules, MAPPING).collect()
    }
    assert got == duck
