"""Custom Python data source (sources/machine_sim_source.py): CSV-path
parity, per-machine partition planning, machine_id filter pushdown
(pruned machines are never generated), and the streaming source's
one-day-per-trigger offsets."""

from __future__ import annotations

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
    simulate_day,
    write_csv,
)
from projekt_data_engineering_iubh_spark.sources import machine_sim_source as ms


def _read(spark, **opts):
    ms.register(spark)
    r = spark.read.format("machine_sim")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_rows_match_csv_roundtrip(spark, tmp_path):
    """format('machine_sim') == write_csv + read_events_csv for the same
    seeded day (the byte-parity contract with the file-based path)."""
    df = _read(spark, machines=1, date="2024-05-01", hours=0.2, seed=42)

    res = simulate_day("M_000", "2024-05-01", hours=0.2, seed=42)
    p = tmp_path / "day.csv"
    write_csv(res, p)
    want = da.read_events_csv(spark, str(p))

    got_rows = sorted(map(tuple, df.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    assert df.schema == want.schema


def test_one_partition_per_machine(spark):
    df = _read(spark, machines=5, hours=0.05)
    assert df.rdd.getNumPartitions() == 5
    assert df.select("machine_id").distinct().count() == 5


def test_machine_filter_prunes_partitions(spark):
    """A machine_id equality predicate must reach pushFilters and prune
    the other machines' partitions — the plan's scan runs ONE task."""
    df = _read(spark, machines=6, hours=0.05).filter(
        F.col("machine_id") == "M_003"
    )
    assert df.select("machine_id").distinct().collect()[0][0] == "M_003"
    assert df.rdd.getNumPartitions() == 1  # five of six splits pruned


def test_streaming_source_advances_one_day_per_trigger(spark, tmp_path):
    ms.register(spark)
    stream = (
        spark.readStream.format("machine_sim")
        .option("machines", 2)
        .option("hours", 0.05)
        .option("max_days", 2)
        .load()
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out)
    days = {
        r.d for r in got.select(F.substring("timestamp", 1, 10).alias("d")).distinct().collect()
    }
    # at least two distinct simulated days arrived (one per trigger)
    assert {"2024-05-01", "2024-05-02"} <= days
    # both machines present every day
    assert got.select("machine_id").distinct().count() == 2
