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
