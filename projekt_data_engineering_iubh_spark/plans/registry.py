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


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    *,
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def headline_queries() -> dict[str, Query]:
    return {k: q for k, q in _REGISTRY.items() if q.headline}
