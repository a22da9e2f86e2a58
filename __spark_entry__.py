"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``projekt_data_engineering_iubh_spark.plans`` as
(Spark plan, DuckDB oracle SQL) pairs; this module only adapts them to the
driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from projekt_data_engineering_iubh_spark.plans import all_queries  # noqa: E402
from projekt_data_engineering_iubh_spark.plans.registry import (  # noqa: E402
    driver_queries,
)
from projekt_data_engineering_iubh_spark.session import prepare_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "events_flagship_session_rollup"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Sessionize (marker running-count) → session boundary aggregation →
    hourly conditional rollup → full-outer join + zero-fill: the
    reference pipeline's complete operator core in one plan
    (/root/reference/src/daily_aggregator.py:32-243).
    """
    prepare_session(spark)
    return all_queries()[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[
    [SparkSession, str], DataFrame
]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        prepare_session(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver verifies the first 50 entries only, so this is the CURATED
    registry (plans/registry.py::driver_queries, budget-enforced by
    tests/test_registry_budget.py): overlapping idioms are tag-unioned or
    column-folded into one entry each; the handful of redundant variants
    (e.g. top20_lineitems vs q3's ORDER BY+LIMIT tail) stay locally
    oracle-verified via tests/test_oracle_differential.py.
    """
    return {name: _wrap(q.fn) for name, q in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query; keys with
    no oracle (engine-specific sketches, streaming) are omitted → the
    driver records a weaker rows-only check."""
    return {
        name: q.oracle
        for name, q in driver_queries().items()
        if q.oracle is not None
    }
