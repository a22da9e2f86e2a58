"""Declarative threshold-rule compiler (reference P12).

The reference loads ``config/schwellwerte.json`` and metaprograms Column
predicates from it (``src/daily_aggregator.py:70-116``): for each rule key,
``(parameter_name == p) & (event_name == e) & value.isNotNull() & <violation>``,
OR-folded over all rules with a ``lit(False)`` seed, then
``is_error = when(pred, 1).otherwise(0)``.

Semantics preserved exactly:

* keys starting with ``_`` and non-dict rule bodies are skipped
  (``src/daily_aggregator.py:75``);
* ``error_if_above`` is strict ``>``, ``error_if_below`` strict ``<``,
  ``error_if_outside_range`` is ``< lo or > hi`` (boundaries are OK values)
  (``src/daily_aggregator.py:89-96``);
* a NULL measurement is never an error;
* no rules → constant false (``src/daily_aggregator.py:109``).

Everything stays a native Column expression — constant-folded and
codegen'd by Catalyst, never a UDF — so the rule engine costs nothing at
100 TB beyond the comparisons themselves.
"""

from __future__ import annotations

import operator
from collections.abc import Mapping
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

# logical rule key -> {column: required value}, the generalization of the
# reference's PARAMETER_EVENT_MAPPING (src/daily_aggregator.py:21-28).
RuleMapping = Mapping[str, Mapping[str, str]]


def _violation(rule: Mapping[str, Any], value: Column) -> Column | None:
    if "error_if_above" in rule:
        return value > F.lit(float(rule["error_if_above"]))
    if "error_if_below" in rule:
        return value < F.lit(float(rule["error_if_below"]))
    if "error_if_outside_range" in rule:
        lo, hi = rule["error_if_outside_range"]
        return (value < F.lit(float(lo))) | (value > F.lit(float(hi)))
    return None


def compile_predicate(
    rules: Mapping[str, Any],
    mapping: RuleMapping,
    *,
    value_col: str = "value",
) -> Column:
    """Fold all threshold rules into one boolean Column."""
    value = F.col(value_col)
    preds: list[Column] = []
    for key, rule in rules.items():
        if key.startswith("_") or not isinstance(rule, Mapping):
            continue
        if key not in mapping:
            continue
        violation = _violation(rule, value)
        if violation is None:
            continue
        scope = [F.col(c) == F.lit(v) for c, v in mapping[key].items()]
        preds.append(reduce(operator.and_, scope + [value.isNotNull(), violation]))
    return reduce(operator.or_, preds, F.lit(False))


def with_error_flag(
    df: DataFrame,
    rules: Mapping[str, Any],
    mapping: RuleMapping,
    *,
    value_col: str = "value",
    flag_col: str = "is_error",
) -> DataFrame:
    pred = compile_predicate(rules, mapping, value_col=value_col)
    return df.withColumn(
        flag_col, F.when(pred, F.lit(1)).otherwise(F.lit(0)).cast("int")
    )


def rules_to_sql_predicate(
    rules: Mapping[str, Any],
    mapping: RuleMapping,
    *,
    value_col: str = "value",
) -> str:
    """ANSI-SQL rendering of the same predicate (for DuckDB oracles)."""
    parts: list[str] = []
    for key, rule in rules.items():
        if key.startswith("_") or not isinstance(rule, Mapping):
            continue
        if key not in mapping:
            continue
        if "error_if_above" in rule:
            viol = f"{value_col} > {float(rule['error_if_above'])}"
        elif "error_if_below" in rule:
            viol = f"{value_col} < {float(rule['error_if_below'])}"
        elif "error_if_outside_range" in rule:
            lo, hi = rule["error_if_outside_range"]
            viol = f"({value_col} < {float(lo)} OR {value_col} > {float(hi)})"
        else:
            continue
        scope = " AND ".join(f"{c} = '{v}'" for c, v in mapping[key].items())
        parts.append(f"({scope} AND {value_col} IS NOT NULL AND {viol})")
    return "(" + " OR ".join(parts) + ")" if parts else "FALSE"
