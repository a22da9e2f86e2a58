"""One-pass data profiling — the ingest-monitoring companion every
production pipeline runs next to its loads.

``profile(df, cols)`` computes per-column row count, null count/fraction,
and exact distinct count in ONE aggregation pass over the data (all
counters accumulate in the same hash-agg; the multi-countDistinct plan
is Spark's Expand, one shuffle), then pivots the single wide row into
one tidy row per column with an ``explode`` — no second scan, no
driver-side loop over columns.

Exact (not approx) distincts so the output is oracle-verifiable; swap
``F.approx_count_distinct`` in at 100 TB when ±2% is acceptable and the
Expand becomes the bottleneck — the shape stays identical. Min/max are
deliberately absent: their string renderings differ across engines
(1.0E4 vs 10000.0), and a profile that can't be verified is a liability.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

PROFILE_COLUMNS = ("column_name", "n_rows", "n_nulls", "null_frac", "n_distinct")


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """One row per profiled column: (column_name, n_rows, n_nulls,
    null_frac, n_distinct)."""
    cols = list(cols) if cols is not None else df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                (
                    (F.col("__n") - F.col(f"__nn_{c}")).cast("double")
                    / F.col("__n")
                ).alias("null_frac"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select(
        *[F.col(f"p.{name}").alias(name) for name in PROFILE_COLUMNS]
    )
