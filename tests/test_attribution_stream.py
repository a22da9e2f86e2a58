"""Stream-stream watermarked interval join (attribution), pinned to the
batch plan: multi-drop live run == the same `attribute()` builder on the
static union of all drops (restricted to pairs the watermark could have
emitted). Also exercises the LEFT OUTER variant's emit-on-watermark
semantics and the bounded-state contract (the join accepts the plan —
Spark rejects stream-stream joins without watermark + time bound)."""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.streaming import attribution_stream as ats

SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _ts(m: int) -> dt.datetime:
    return dt.datetime(2024, 6, 1, 0, 0, 0) + dt.timedelta(minutes=m)


def _drop(spark, src, tmp_path, name, rows) -> None:
    staging = tmp_path / f"stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(staging))
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.move(part, str(src / f"{name}.parquet"))


DROP1 = [
    (1, _ts(0), "view", 1.0),
    (1, _ts(10), "purchase", 50.0),  # attributed to the minute-0 view
    (2, _ts(1), "view", 2.0),  # never converts
    (3, _ts(2), "purchase", 9.0),  # no prior view
]
DROP2 = [
    (2, _ts(50), "view", 3.0),
    (2, _ts(55), "purchase", 70.0),  # attributed to the minute-50 view
    (1, _ts(59), "purchase", 5.0),  # minute-0 view outside 30-min horizon
    (9, _ts(120), "view", 0.0),  # watermark nudge
]


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = ats.start_attribution_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    try:
        _drop(spark, src, tmp_path, "d1", DROP1)
        q.processAllAvailable()
        _drop(spark, src, tmp_path, "d2", DROP2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.user_id, r.view_ts, r.purchase_ts)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }

    static = spark.createDataFrame(DROP1 + DROP2, SCHEMA)
    views, purchases = ats.split_events(static)
    want = {
        (r.user_id, r.view_ts, r.purchase_ts)
        for r in ats.attribute(views, purchases).collect()
    }
    assert want == {
        (1, _ts(0), _ts(10)),
        (2, _ts(50), _ts(55)),
    }  # fixture sanity: horizon excludes the minute-59 purchase
    assert got == want


def test_left_outer_emits_unconverted_views_on_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    q = ats.start_attribution_stream(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        how="left_outer",
    )
    try:
        _drop(spark, src, tmp_path, "d1", DROP1)
        q.processAllAvailable()
        # advance BOTH sides' watermarks far past every view's interval
        # end (the global watermark is the MIN across the two inputs — a
        # views-only nudge leaves the purchases watermark, and thus null
        # emission, stuck); emission also needs a batch AFTER the
        # watermark moves, hence two drops
        nudge = [(8, _ts(300), "view", 0.0), (9, _ts(300), "purchase", 0.0)]
        _drop(spark, src, tmp_path, "d2", nudge)
        q.processAllAvailable()
        nudge2 = [(8, _ts(600), "view", 0.0), (9, _ts(600), "purchase", 0.0)]
        _drop(spark, src, tmp_path, "d3", nudge2)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    matched = {
        (r.user_id, r.view_ts, r.purchase_ts)
        for r in rows
        if r.purchase_ts is not None and r.user_id < 8  # nudge users excluded
    }
    unmatched = {
        (r.user_id, r.view_ts) for r in rows if r.purchase_ts is None
    }
    assert matched == {(1, _ts(0), _ts(10))}
    # user 2's minute-1 view never converted and its horizon has passed
    assert (2, _ts(1)) in unmatched


def test_batch_mode_is_plain_interval_join(spark):
    # watermark=None → the same builder runs as a batch plan (parity
    # anchor); the join must be a ranged equi-join on user, never a
    # cartesian product
    static = spark.createDataFrame(DROP1 + DROP2, SCHEMA)
    views, purchases = ats.split_events(static)
    df = ats.attribute(views, purchases)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r.user_id, r.view_ts, r.purchase_ts) for r in df.collect()}
    assert got == {(1, _ts(0), _ts(10)), (2, _ts(50), _ts(55))}
