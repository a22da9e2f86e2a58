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


def test_sessionize_stream_event_time_eviction(spark, tmp_path):
    """r2 VERDICT #5: an unterminated session must be force-closed once
    the watermark passes session_start + max duration, its state removed
    (bounded across triggers), and a late Cycle_End for the evicted
    session ignored. Multi-drop: 4 files, drained one micro-batch at a
    time so the watermark advances between triggers."""
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    schema = "machine_id string, event_timestamp timestamp, event_name string"

    def drop(name, rows):
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(staging))
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))  # atomic appear

    import datetime as dt

    def ts(h, m, s):
        return dt.datetime(2024, 3, 1, h, m, s)

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = sessionize_stream(
        stream,
        max_open_session_event_ms=30 * 60 * 1000,  # 30 min bound
        watermark_delay="10 minutes",
    )
    # first drop must exist before start (empty-dir schema is provided,
    # but an empty first batch would stall the watermark anyway)
    drop(
        "b1",
        [
            ("M_A", ts(0, 0, 0), "Cycle_Start"),  # stays open forever
            ("M_A", ts(0, 0, 1), "AS_Check"),
            ("M_B", ts(0, 0, 0), "Cycle_Start"),
            ("M_B", ts(0, 0, 30), "Cycle_End"),
        ],
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("evict_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # wm after b1: 00:00:30 - 10min (pre-midnight) — M_A not yet due
        drop(
            "b2",
            [("M_B", ts(1, 0, 0), "Cycle_Start"), ("M_B", ts(1, 0, 30), "Cycle_End")],
        )
        q.processAllAvailable()  # wm -> 00:50:30 > due(00:30) after batch
        drop(
            "b3",
            [("M_B", ts(2, 0, 0), "Cycle_Start"), ("M_B", ts(2, 0, 30), "Cycle_End")],
        )
        q.processAllAvailable()  # timer fires THIS trigger: M_A evicted
        # late End for the evicted session: state is gone, must be a no-op
        drop("b4", [("M_A", ts(2, 30, 0), "Cycle_End")])
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM evict_out").collect()
    dangling = [r for r in rows if not r.closed]
    closed = [r for r in rows if r.closed]

    # exactly one eviction: M_A's open session, original start, 2 events
    assert len(dangling) == 1
    assert dangling[0].machine_id == "M_A"
    assert dangling[0].session_start == ts(0, 0, 0)
    assert dangling[0].n_events == 2 and dangling[0].session_end is None
    # M_B's three complete cycles all closed; the late M_A End closed
    # nothing (its state was reclaimed — bounded across >=3 triggers)
    assert sorted((r.machine_id, r.session_seq) for r in closed) == [
        ("M_B", 1),
        ("M_B", 2),
        ("M_B", 3),
    ]


def test_exact_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path):
    """Ingest-side dedup: duplicates within the watermark horizon are
    dropped across micro-batches (state carries the hash between
    triggers); first arrivals always pass. Multi-drop so cross-batch
    state is actually exercised."""
    import datetime as dt
    import glob
    import shutil

    from projekt_data_engineering_iubh_spark.streaming.dedup_stream import (
        exact_dedup_stream,
    )

    src = tmp_path / "docs_src"
    src.mkdir()
    schema = "doc_id long, text string, ingest_ts timestamp"

    def drop(name, rows):
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(staging))
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    def ts(m):
        return dt.datetime(2024, 3, 1, 0, m, 0)

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = exact_dedup_stream(stream, dedup_horizon="30 minutes")

    drop(
        "b1",
        [
            (1, "alpha doc", ts(0)),
            (2, "beta doc", ts(1)),
            (3, "alpha doc", ts(2)),  # in-batch duplicate of 1
        ],
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        drop(
            "b2",
            [
                (4, "alpha doc", ts(5)),  # cross-batch dup, in horizon
                (5, "gamma doc", ts(6)),  # first arrival
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert kept == {1, 2, 5}

    # batch mode: same operator, same hash, plain dropDuplicates
    batch = spark.createDataFrame(
        [(1, "alpha doc", ts(0)), (3, "alpha doc", ts(2)), (5, "gamma doc", ts(6))],
        schema,
    )
    got = {r.text for r in exact_dedup_stream(batch).collect()}
    assert got == {"alpha doc", "gamma doc"}


def test_sessionize_stream_state_survives_restart(spark, tmp_path):
    """Checkpoint recovery: a session OPEN when the query stops must be
    closed correctly by a NEW query started from the same checkpoint —
    original session_start, event count spanning the restart, continued
    numbering. This is the exactly-once story a production deployment
    leans on; nothing else pins it."""
    import datetime as dt
    import glob
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = "machine_id string, event_timestamp timestamp, event_name string"

    def drop(name, rows):
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(staging))
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    def ts(m, s=0):
        return dt.datetime(2024, 3, 1, 0, m, s)

    out = str(tmp_path / "out")

    def start():
        # file sink, not memory: the memory sink refuses checkpoint
        # recovery, and recovery is exactly what this test pins
        stream = spark.readStream.schema(schema).parquet(str(src))
        return (
            sessionize_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # life 1: one closed session (seq 1), one still open at shutdown
    drop(
        "b1",
        [
            ("M_R", ts(0), "Cycle_Start"),
            ("M_R", ts(0, 30), "Cycle_End"),
            ("M_R", ts(1), "Cycle_Start"),  # open across the restart
            ("M_R", ts(1, 10), "AS_Check"),
        ],
    )
    q1 = start()
    try:
        q1.processAllAvailable()
        first = spark.read.parquet(out).where("closed").collect()
        assert [(r.session_seq, r.n_events) for r in first] == [(1, 2)]
    finally:
        q1.stop()

    # life 2: same checkpoint, new query — the End must close the
    # restored open session with its ORIGINAL start and full count
    drop("b2", [("M_R", ts(1, 40), "Cycle_End")])
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    closed = {
        r.session_seq: r
        for r in spark.read.parquet(out).where("closed").collect()
    }
    assert set(closed) == {1, 2}
    r = closed[2]
    assert r.session_start == ts(1)  # start from BEFORE the restart
    assert r.session_end == ts(1, 40)
    assert r.n_events == 3  # Start + AS_Check (life 1) + End (life 2)


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
