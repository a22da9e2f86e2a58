"""Skew mitigation: salted two-stage aggregation.

When a groupBy key is pathologically hot (one machine, one user, one
token), the single reducer for that key becomes the job's critical path.
Salting splits each key into ``n_salts`` sub-keys aggregated in parallel,
then combines the partials — turning one hot reducer into ``n_salts``.

Only algebraic aggregates decompose this way (sum/count/min/max — avg is
sum÷count at the end). Spark's map-side partial aggregation already does
most of this for simple pipelines; explicit salting matters when the
per-key state is too large for the hash-agg map (e.g. countDistinct, or
collect-like states) or under extreme cardinality skew. AQE's skew-join
splitting covers joins, not aggregations — hence this operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# (output_name, source_col, kind) with kind in sum/count/min/max
AggSpec = tuple[str, str, str]

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[AggSpec],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over ``keys`` with a salt column in stage 1."""
    salt = (F.rand(seed=0) * n_salts).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _PARTIAL[kind](col).alias(f"__p_{name}")
                for name, col, kind in aggs
            ]
        )
    )
    return stage1.groupBy(*keys).agg(
        *[
            _COMBINE[kind](f"__p_{name}").alias(name)
            for name, col, kind in aggs
        ]
    )
