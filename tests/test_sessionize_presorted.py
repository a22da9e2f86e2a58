"""The two-level prefix-sum sessionizer must agree with the window-based
one on time-sorted single-machine files — across multiple input splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators.sessionize import (
    with_session_seq,
    with_session_seq_presorted,
)
from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)


def test_presorted_matches_window_sessionization(spark, tmp_path):
    res = simulate_day("M_solo", "2024-07-01", hours=0.05, seed=11)
    path = tmp_path / "solo.csv"
    write_csv(res, path)

    # force several consecutive input splits over the single CSV
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        events = da.cleanse(da.read_events_csv(spark, str(path)))
        assert events.rdd.getNumPartitions() > 2  # the test needs >1 split

        marker = F.col("event_name") == "Cycle_Start"
        fast = with_session_seq_presorted(events, is_marker=marker)

        windowed = with_session_seq(
            events.withColumn("marker_rank", da._marker_rank()),
            partition_by=["machine_id"],
            order_by=["event_timestamp", "marker_rank", "parameter_name"],
            is_marker=marker,
        ).drop("marker_rank")

        key = ["event_timestamp", "event_name", "parameter_name"]
        a = {tuple(r[k] for k in key): r.session_seq for r in fast.collect()}
        b = {tuple(r[k] for k in key): r.session_seq for r in windowed.collect()}
        assert a == b
        assert max(a.values()) == res.n_cycles
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_presorted_multifile_directory(spark, tmp_path):
    """r2 VERDICT #3: a directory of date-named daily files (the
    reference's real layout, one file per machine-day arriving in
    batches) takes the no-global-shuffle path; session ids must be
    continuous ACROSS file boundaries in lexicographic (== time) order,
    even though Spark packs splits into partitions by SIZE (the three
    days below have deliberately different sizes so size order != time
    order)."""
    days = [("2024-07-01", 0.05), ("2024-07-02", 0.02), ("2024-07-03", 0.08)]
    total_cycles = 0
    for day, hours in days:
        res = simulate_day("M_solo", day, hours=hours, seed=int(day[-2:]))
        write_csv(res, tmp_path / f"{day}.csv")
        total_cycles += res.n_cycles

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
    try:
        events = da.cleanse(da.read_events_csv(spark, str(tmp_path)))
        assert events.rdd.getNumPartitions() > 3

        marker = F.col("event_name") == "Cycle_Start"
        fast = with_session_seq_presorted(events, is_marker=marker)

        windowed = with_session_seq(
            events.withColumn("marker_rank", da._marker_rank()),
            partition_by=["machine_id"],
            order_by=["event_timestamp", "marker_rank", "parameter_name"],
            is_marker=marker,
        ).drop("marker_rank")

        key = ["event_timestamp", "event_name", "parameter_name"]
        a = {tuple(r[k] for k in key): r.session_seq for r in fast.collect()}
        b = {tuple(r[k] for k in key): r.session_seq for r in windowed.collect()}
        assert a == b
        assert max(a.values()) == total_cycles
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_presorted_rejects_post_shuffle_file_frame(spark, tmp_path):
    """r2 ADVICE: input_file_name() returns '' downstream of an exchange,
    which previously made a repartitioned multi-file frame look like the
    in-memory case and silently misorder. File-backed frames with empty
    file names must be rejected."""
    res = simulate_day("M_solo", "2024-07-01", hours=0.02, seed=5)
    write_csv(res, tmp_path / "day.csv")
    events = da.cleanse(da.read_events_csv(spark, str(tmp_path))).repartition(4)
    with pytest.raises(ValueError, match="exchange"):
        with_session_seq_presorted(
            events, is_marker=F.col("event_name") == "Cycle_Start"
        )


def test_presorted_in_memory_frame_still_allowed(spark):
    """Pure in-memory frames carry no file lineage; the caller owns the
    ordering contract and the operator must keep working (per-partition
    order == data order for a parallelized local list)."""
    rows = [("start",), ("e",), ("start",), ("e",), ("e",), ("start",)]
    df = spark.createDataFrame(rows, "event_name string").coalesce(1)
    out = with_session_seq_presorted(df, is_marker=F.col("event_name") == "start")
    assert [r.session_seq for r in out.collect()] == [1, 1, 2, 2, 2, 3]
