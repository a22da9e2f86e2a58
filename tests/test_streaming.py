"""Structured Streaming tests: stream results must match batch semantics.

A parquet-backed file stream drives each query to completion synchronously
(memory sink + processAllAvailable), then the result is pinned to the
equivalent batch computation — the streaming analog of the DuckDB oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.config import DEFAULT_RULES
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)
from projekt_data_engineering_iubh_spark.streaming.hourly_stream import (
    hourly_rollup_stream,
)
from projekt_data_engineering_iubh_spark.streaming.sessionize_stream import (
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    stream_src = str(tmp_path / "events_stream")
    events.write.parquet(stream_src)
    schema = spark.read.parquet(stream_src).schema

    stream = spark.readStream.schema(schema).parquet(stream_src)
    q = (
        hourly_rollup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("hourly_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.sql(
        "SELECT hour_window.start AS h, user_id, n_events, n_purchases, n_errors "
        "FROM hourly_out"
    ).collect()
    # append mode only emits windows fully older than the final watermark
    # (max event time - 1h); trailing windows stay in state forever.
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    emit_cutoff = max_ts - dt.timedelta(hours=1)
    want = [
        r
        for r in (
            hourly_rollup_stream(events)  # same plan on the batch frame
            .select(
                F.col("hour_window.start").alias("h"),
                F.col("hour_window.end").alias("hend"),
                "user_id",
                "n_events",
                "n_purchases",
                "n_errors",
            )
            .collect()
        )
        if r.hend <= emit_cutoff
    ]
    want_tuples = sorted((r.h, r.user_id, r.n_events, r.n_purchases, r.n_errors)
                         for r in want)
    assert sorted(map(tuple, got)) == want_tuples
    assert len(got) > 0


def test_sessionize_stream_matches_batch_cycles(spark, tmp_path):
    res = simulate_day("M_stream", "2024-03-01", hours=0.02, seed=5)
    csv_path = tmp_path / "day.csv"
    write_csv(res, csv_path)
    raw = da.read_events_csv(spark, str(csv_path))
    events = da.cleanse(raw)

    stream_src = str(tmp_path / "stream_parquet")
    events.write.parquet(stream_src)
    schema = spark.read.parquet(stream_src).schema

    stream = spark.readStream.schema(schema).parquet(stream_src)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    closed = spark.sql(
        "SELECT session_seq, session_start, session_end, n_events "
        "FROM sessions_out WHERE closed"
    ).collect()

    _, cycle_times = da.compute_cycles(events)
    batch = {
        r.cycle_seq: r.cycle_start_ts
        for r in cycle_times.collect()
        if r.cycle_time_seconds and r.cycle_time_seconds > 0
    }
    got = {r.session_seq: r.session_start for r in closed}
    assert got == batch
    # every closed cycle carries the full 8-row shape
    assert all(r.n_events == 8 for r in closed)


def test_stream_idempotent_sink(spark, tmp_path):
    from projekt_data_engineering_iubh_spark.streaming.hourly_stream import (
        write_idempotent_hourly,
    )

    events = load_table(spark, SF_DIR, "events")
    agg = hourly_rollup_stream(events)
    out = str(tmp_path / "hourly_parquet")
    write_idempotent_hourly(agg, 0, out)
    n1 = spark.read.parquet(out).count()
    write_idempotent_hourly(agg, 1, out)  # rerun replaces, not duplicates
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0
