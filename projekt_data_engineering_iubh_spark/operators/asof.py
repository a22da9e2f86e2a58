"""As-of join: for each left row, the most recent right row at or before it.

Spark has no native ASOF JOIN (DuckDB does — which makes it a perfect
oracle). The scalable composition here is the union-and-carry trick:

1. tag right rows (carrying their payload) and left rows (payload NULL),
2. union them, sort per key by (ts, side) — right rows sort before left
   rows at equal timestamps so "at or before" is inclusive,
3. last non-NULL payload over the running window = the as-of match,
4. keep only left rows.

One shuffle (the window partition), no per-group pandas, no range
explosion — this is how the pattern survives 100 TB, versus the
``pd.merge_asof``-per-group fallback which materializes whole keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: attach the latest ``payload`` columns from ``right``
    whose ``right_ts`` <= ``left_ts``, per ``on`` key. Left rows with no
    earlier right row get NULLs.

    Ties: when several right rows share (key, right_ts), the window order
    falls back to the payload columns themselves (ascending, lexicographic
    in ``payload`` order), so the carried match is the MAX payload tuple —
    deterministic regardless of partitioning. Identical (key, ts, payload)
    duplicates are interchangeable by construction.
    """
    on = list(on)
    lcols = left.columns
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for p in payload:
        l = l.withColumn(f"__p_{p}", F.lit(None).cast(right.schema[p].dataType))
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__p_{p}") for p in payload],
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(*on, "__ts", "__side", *[f"__p_{p}" for p in payload], *[
        c for c in lcols if c not in on
    ]).unionByName(
        r.select(*on, "__ts", "__side", *[f"__p_{p}" for p in payload], *[
            c for c in lcols if c not in on
        ])
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            "__ts",
            "__side",
            # deterministic tiebreak for equal (key, ts) right rows: the
            # last (= carried) row is the max payload tuple. Left rows
            # (all-null payload) are mutually interchangeable here.
            *[F.col(f"__p_{p}").asc_nulls_first() for p in payload],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *on,
        "__ts",
        "__side",
        *[c for c in lcols if c not in on],
        *[
            F.last(f"__p_{p}", ignorenulls=True).over(w).alias(f"{prefix}{p}")
            for p in payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__ts", "__side")
