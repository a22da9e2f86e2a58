"""Streaming quality gate: live multi-drop runs through foreachBatch —
quarantine mode routes tagged violators aside and publishes clean rows;
fail mode fails the trigger and the retried batch (after the upstream
fix) lands idempotently."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators import expectations as ex
from projekt_data_engineering_iubh_spark.streaming.quality_gate import (
    QualityGateViolation,
    gated_writer,
)

SCHEMA = "id long, category string, value double"

ROW_RULES = lambda: [  # noqa: E731 — built per test (needs live session)
    ex.row_not_null("id"),
    ex.row_in_range("value", 0, 100),
    ex.row_accepted_values("category", ["A", "B"]),
]


def _drop(spark, src, tmp_path, name, rows) -> None:
    staging = tmp_path / f"stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(staging))
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.move(part, str(src / f"{name}.parquet"))


def _writer(out_dir: str):
    def write(df, batch_id):
        df.withColumn("_b", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    return write


def _start(spark, src, body):
    return (
        spark.readStream.schema(SCHEMA)
        .parquet(str(src))
        .writeStream.outputMode("append")
        .foreachBatch(body)
        .start()
    )


def test_quarantine_mode_splits_and_tags(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    quar = str(tmp_path / "quarantine")
    body = gated_writer(
        _writer(out),
        row_rules=ROW_RULES(),
        on_violation="quarantine",
        quarantine_dir=quar,
    )
    q = _start(spark, src, body)
    try:
        _drop(spark, src, tmp_path, "d1", [(1, "A", 5.0), (2, "Z", 5.0)])
        q.processAllAvailable()
        _drop(
            spark, src, tmp_path, "d2",
            [(3, "B", 50.0), (None, "A", 500.0)],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    clean = {r.id for r in spark.read.parquet(out).collect()}
    assert clean == {1, 3}
    quarantined = {
        (r.id, tuple(sorted(r._violations)))
        for r in spark.read.parquet(quar).collect()
    }
    assert quarantined == {
        (2, ("accepted_values:category",)),
        (None, ("in_range:value", "not_null:id")),
    }


def test_fail_mode_blocks_then_retry_lands_once(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    body = gated_writer(
        _writer(out),
        row_rules=ROW_RULES(),
        batch_rules=[ex.unique("id")],
        on_violation="fail",
    )
    q = _start(spark, src, body)
    try:
        _drop(spark, src, tmp_path, "good", [(1, "A", 5.0)])
        q.processAllAvailable()
        # a batch violating uniqueness: the trigger must FAIL the query
        _drop(spark, src, tmp_path, "dup", [(7, "A", 1.0), (7, "B", 2.0)])
        with pytest.raises(Exception) as ei:
            q.processAllAvailable()
        assert "unique:id" in str(ei.value)
    finally:
        q.stop()
    assert {r.id for r in spark.read.parquet(out).collect()} == {1}

    # direct-body retry semantics: the same violating batch raises again
    bad = spark.createDataFrame([(7, "A", 1.0), (7, "B", 2.0)], SCHEMA)
    with pytest.raises(QualityGateViolation):
        body(bad, 99)
    # after the upstream fix, the retried batch writes exactly once
    fixed = spark.createDataFrame([(7, "A", 1.0), (8, "B", 2.0)], SCHEMA)
    body(fixed, 99)
    assert {r.id for r in spark.read.parquet(out).collect()} == {1, 7, 8}


def test_gate_rejects_bad_config():
    with pytest.raises(ValueError):
        gated_writer(lambda df, b: None, on_violation="nope")
    with pytest.raises(ValueError):
        gated_writer(lambda df, b: None, on_violation="quarantine")
