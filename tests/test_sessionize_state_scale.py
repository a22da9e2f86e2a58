"""Streaming sessionizer state-scale guard (r4 VERDICT #7).

Many keys, many triggers: the state store must hold ≤ one row per LIVE
key (open session, or idle counter still inside the event-time
retention horizon) — not one row per key ever seen. Without idle-key
reclamation a year of machines cycling through would pin state forever;
with it, the watermark sweeps both dangling sessions (emitted
closed=false) and idle seq counters (removed silently) once the stream
provably moves past them. Measured from the engine's own
stateOperators.numRowsTotal metric per trigger.
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

from projekt_data_engineering_iubh_spark.streaming.sessionize_stream import (
    sessionize_stream,
)

N_OPEN = 40  # machines that never send Cycle_End in trigger 1
N_CLOSED = 20  # machines whose one session closes in trigger 1
SCHEMA = "machine_id string, event_timestamp timestamp, event_name string"


def _ts(h, m, s=0):
    return dt.datetime(2024, 3, 1, h, m, s)


def test_state_rows_bounded_by_live_keys(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def drop(name, rows):
        staging = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(staging)
        )
        part = glob.glob(str(staging / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))  # atomic appear

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = sessionize_stream(
        stream,
        max_open_session_event_ms=30 * 60 * 1000,  # 30 min bound
        watermark_delay="10 minutes",
    )

    rows1 = []
    for i in range(N_OPEN):
        rows1.append((f"OPEN_{i:03d}", _ts(0, 0, i % 50), "Cycle_Start"))
    for i in range(N_CLOSED):
        rows1.append((f"DONE_{i:03d}", _ts(0, 0), "Cycle_Start"))
        rows1.append((f"DONE_{i:03d}", _ts(0, 1), "Cycle_End"))
    drop("b1", rows1)

    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_scale_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def state_rows():
        ops = (q.lastProgress or {}).get("stateOperators") or []
        return ops[0]["numRowsTotal"] if ops else None

    try:
        q.processAllAvailable()
        # every key seen holds exactly one state row after trigger 1
        assert state_rows() == N_OPEN + N_CLOSED

        # two fresh machines two hours later: watermark -> 01:50, past
        # every original key's due point (<= 00:31 + 30 min)
        drop(
            "b2",
            [
                ("FRESH_A", _ts(2, 0), "Cycle_Start"),
                ("FRESH_B", _ts(2, 0), "Cycle_Start"),
            ],
        )
        q.processAllAvailable()
        # one more trigger so timers registered against the new watermark
        # all fire and the metric reflects the post-eviction store
        drop("b3", [("FRESH_A", _ts(2, 5), "AS_Check")])
        q.processAllAvailable()

        # THE bound: state rows ≤ live keys (2 open sessions), not the
        # 62 keys ever seen
        final = state_rows()
        assert final is not None and final <= 2, final
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM state_scale_out").collect()
    dangling = [r for r in rows if not r.closed]
    closed = [r for r in rows if r.closed]
    # every never-ending session was force-closed exactly once…
    assert sorted(r.machine_id for r in dangling) == sorted(
        f"OPEN_{i:03d}" for i in range(N_OPEN)
    )
    # …every completed one emitted normally, and idle counters vanished
    # WITHOUT emitting anything
    assert sorted(r.machine_id for r in closed) == sorted(
        f"DONE_{i:03d}" for i in range(N_CLOSED)
    )
