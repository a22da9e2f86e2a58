"""Marker-based sessionization (reference W1).

The reference assigns each machine event to a "cycle" by a running count of
``Cycle_Start`` markers per machine (``src/daily_aggregator.py:32-67``):

    Window.partitionBy(machine_id).orderBy(event_timestamp, tiebreak)
    cycle_seq = sum(when(event == CYCLE_START, 1).otherwise(0)).over(w)

Differences from the reference, deliberate:

* The tiebreaker must be a *stable* column (a unique id from the data), not
  ``monotonically_increasing_id()`` — the reference's choice varies with
  partitioning (SURVEY.md §4 "non-determinism") and would break
  oracle-differential tests.
* At 100 TB the window is a single shuffle hash-partitioned by the session
  key; skew (one hot machine) is handled by AQE only for joins, so the
  session key domain must be large (machines/users), which it is. The
  cumulative sum itself is O(n log n) sort per key group — fine while one
  key's events fit a partition (~1e8 rows); beyond that use the two-level
  prefix-sum strategy noted in SURVEY.md §7.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_session_seq(
    df: DataFrame,
    *,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    is_marker: Column,
    session_col: str = "session_seq",
) -> DataFrame:
    """Add a running count of marker rows per partition → session id.

    Rows before the first marker get session_seq == 0 (the reference drops
    them with ``filter(cycle_seq > 0)``; callers decide).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    flag = F.when(is_marker, F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(session_col, F.sum(flag).over(w))


def with_session_seq_presorted(
    df: DataFrame,
    *,
    is_marker: Column,
    session_col: str = "session_seq",
) -> DataFrame:
    """Two-level prefix-sum sessionization for time-sorted inputs
    (SURVEY.md §4/§7: the single-hot-key fix).

    ``with_session_seq`` hash-partitions by the session key; a daily file
    containing ONE machine collapses onto one core and the window sort
    serializes ~1M rows. When the input is already globally ordered (the
    reference's per-machine daily CSVs are written in time order), the
    running marker count decomposes:

    1. per input split: local running count of markers (a window keyed by
       ``spark_partition_id`` — every core works);
    2. per split: total marker count → tiny driver-side exclusive prefix
       sum (#splits values, not rows);
    3. session id = local count + split offset, broadcast-joined back.

    Ordering contract: split order == data order — true for a SINGLE
    file read (splits are consecutive byte ranges packed in order) but
    NOT for multi-file directories, whose listing order is size-based;
    the totals pass below enforces this (one distinct source file, or no
    file scan at all for in-memory frames, where ordering is the
    caller's contract). Cost: one narrow window per split + one
    broadcast join — no global shuffle.
    """
    part = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__file", F.input_file_name()
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.monotonically_increasing_id())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flag = F.when(is_marker, F.lit(1)).otherwise(F.lit(0))
    # persisted only for the totals pass; released right after — the
    # final plan recomputes the narrow per-split window (deterministic:
    # split packing and in-split row order are plan-time properties)
    # instead of pinning the whole frame in memory for its lifetime
    local = part.withColumn("__local_seq", F.sum(flag).over(w)).persist()
    try:
        totals = (
            local.groupBy("__pid")
            .agg(
                F.max("__local_seq").alias("__cnt"),
                F.countDistinct("__file").alias("__nf"),
                F.min("__file").alias("__f"),
            )
            .orderBy("__pid")
            .collect()
        )
    finally:
        local.unpersist()
    files = {row["__f"] for row in totals if row["__f"]}
    if len(files) > 1 or any((row["__nf"] or 0) > 1 for row in totals):
        raise ValueError(
            "with_session_seq_presorted requires a single time-ordered input "
            f"file (got {len(files)} source files); multi-file inputs have "
            "size-ordered splits — use with_session_seq instead"
        )
    offsets, acc = {}, 0
    for row in totals:
        offsets[row["__pid"]] = acc
        acc += row["__cnt"] or 0
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __offset long"
    )
    out = (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(session_col, F.col("__local_seq") + F.col("__offset"))
        .drop("__pid", "__local_seq", "__offset", "__file")
    )
    return out


def session_bounds(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str,
    session_col: str = "session_seq",
) -> DataFrame:
    """Per-session boundary aggregate (reference A1 + P11).

    Returns one row per (keys…, session) with start/end timestamps, event
    count, and exact integer-µs duration. Duration is computed in integer
    microseconds (``unix_micros``) so results are bit-identical across
    engines — the reference's double-epoch subtraction
    (``src/daily_aggregator.py:56-62``) is FP-order sensitive.
    """
    out = (
        df.filter(F.col(session_col) > 0)
        .groupBy(*keys, session_col)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn(
            "duration_us",
            F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start")),
        )
        .withColumn("duration_sec", F.col("duration_us") / F.lit(1000000.0))
    )
    return out
