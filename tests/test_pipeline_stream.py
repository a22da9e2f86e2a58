"""End-to-end continuous pipeline: CSV drop-dir → error rollup →
idempotent parquet summary, pinned to the batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators.rules import with_error_flag
from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.config import (
    DEFAULT_RULES,
    PARAMETER_EVENT_MAPPING,
)
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)
from projekt_data_engineering_iubh_spark.streaming import pipeline_stream as ps


def test_streaming_pipeline_end_to_end(spark, tmp_path):
    drop_dir = tmp_path / "incoming"
    drop_dir.mkdir()
    res = simulate_day("M_cont", "2024-08-01", hours=2.5, seed=3)
    write_csv(res, drop_dir / "day.csv")

    out = str(tmp_path / "summary")
    q = ps.start_pipeline(
        spark,
        str(drop_dir),
        out,
        DEFAULT_RULES,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        # deterministically flush closed windows: emission happens in a
        # batch AFTER the watermark advances, so nudge the source with a
        # later-in-time row (a second machine reporting hours later)
        nudge = simulate_day("M_nudge", "2024-08-01", hours=0.01, seed=4)
        nudge.rows = [
            [r[0].replace("T00:", "T06:"), *r[1:]] for r in nudge.rows[:8]
        ]
        write_csv(nudge, drop_dir / "nudge.csv")
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r.summary_date), r.hour_of_day, r.machine_id): (
            r.n_events,
            r.total_error_count,
        )
        for r in spark.read.parquet(out).collect()
    }
    assert got, "stream produced no summary rows"

    # batch equivalent, restricted to windows the watermark closed
    events = da.cleanse(da.read_events_csv(spark, str(drop_dir / "day.csv")))
    flagged = with_error_flag(events, DEFAULT_RULES, PARAMETER_EVENT_MAPPING)
    max_ts = events.agg(F.max("event_timestamp")).collect()[0][0]
    import datetime as dt

    cutoff = max_ts - dt.timedelta(hours=1)
    batch = {
        (str(r.d), r.h, r.machine_id): (r.n_events, r.total_error_count)
        for r in (
            flagged.groupBy(
                F.to_date("event_timestamp").alias("d"),
                F.hour("event_timestamp").alias("h"),
                "machine_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("is_error").alias("total_error_count"),
            )
            .collect()
        )
        if dt.datetime.combine(
            dt.date.fromisoformat(str(r.d)), dt.time(hour=r.h)
        ) + dt.timedelta(hours=1) <= cutoff
    }
    assert got.keys() >= batch.keys()
    for k, v in batch.items():
        assert got[k] == v, k
    # errors flowed through: the 2.5h day should flag some
    assert sum(v[1] for v in got.values()) > 0
