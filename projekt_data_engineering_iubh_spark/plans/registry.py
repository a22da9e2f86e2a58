"""Registry of driver-checkable queries.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (usually) an
ANSI-SQL oracle string DuckDB runs on the same parquet tables. Column names
must match exactly between both sides — the driver sorts columns by name
before hashing values (see repo README / driver contract).

``headline=True`` marks the queries bench.py times at sf0.1.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool
    doc: str
    driver: bool = True


_REGISTRY: dict[str, Query] = {}

# The verification driver checks only the first 50 registry entries
# (round 1: 23 of 73 queries — the whole docs_*/emb_* family — got no
# CORRECTNESS row). The registry is therefore curated: ``driver=True``
# entries (the set __spark_entry__ exposes) must stay ≤ this budget;
# ``driver=False`` entries remain locally oracle-verified via
# tests/test_oracle_differential.py but are not shipped to the driver.
DRIVER_BUDGET = 50


def register(
    name: str,
    oracle: str | None = None,
    *,
    headline: bool = False,
    driver: bool = True,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name, fn, oracle, headline, (fn.__doc__ or "").strip(), driver
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def scalar_schema_violations(schema) -> list[str]:
    """Columns the external correctness driver cannot canonicalize.

    The driver sorts results through pandas ``sort_values`` before
    hashing; list/dict-typed cells raise ``TypeError: unhashable type``
    inside pandas' factorize (observed: CORRECTNESS_r08
    docs_inverted_index, postings array<long>). Every ``driver=True``
    entry must therefore ship SCALAR columns only — arrays join to
    delimited strings, structs flatten to columns. Enforced by
    tests/test_registry_budget.py (analysis-time, no execution) and by
    tools/verify_driver.py's pre-flight.
    """
    from pyspark.sql import types as T

    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def driver_queries() -> dict[str, Query]:
    """The curated set the verification driver sees (must fit DRIVER_BUDGET)."""
    return {k: q for k, q in _REGISTRY.items() if q.driver}


def headline_queries() -> dict[str, Query]:
    return {k: q for k, q in _REGISTRY.items() if q.headline}
