"""The die-bonder daily batch pipeline, reimplemented Spark-first.

Semantics match ``/root/reference/src/daily_aggregator.py`` stage for
stage — CSV cleanse (:161-168), cycle sessionization (:32-67), threshold
errors (:70-116), enriched-event output (:173-188), hourly summary
(:193-265) — with the four deliberate fixes SURVEY.md §7C calls out:

1. **Stable ordering** — the reference tiebreaks equal timestamps with
   ``monotonically_increasing_id`` (:33), which varies with partitioning.
   Here the order is (event_timestamp, marker_rank, parameter_name): a
   ``Cycle_End`` sharing a millisecond with the next ``Cycle_Start`` (the
   generator emits exactly that) sorts End < measurements < Start, which
   reproduces file order deterministically on any partitioning.
2. **Cached shared subtree** — the reference recomputes the whole lineage
   for its second write action (SURVEY.md §3 step 7); ``run`` persists the
   enriched events once.
3. **Idempotent summary** — the README documents a staging+merge the code
   never had (D1/D4); the parquet sink overwrites per ``summary_date``
   partition (re-running a day replaces it, byte-identical), and the JDBC
   sink does staging-overwrite + ``INSERT … ON CONFLICT DO UPDATE``
   (sources/jdbc.py).
4. **Exact durations** — cycle time is integer-µs difference / 1e6 (not a
   double-epoch subtraction), then rounded to 3dp like the reference.

Two further OUTPUT-SCHEMA deviations, also deliberate:

5. **``total_error_count`` is kept** in the hourly summary — the
   reference computes it (:256) and then drops it from the final select
   (:256-265); keeping it costs nothing (same aggregation pass) and the
   serving layer uses it.
6. **``value`` is rounded to 2dp** in the enriched-event output — the
   reference writes the raw float and lets Postgres ``NUMERIC(7,2)``
   round on insert (:173-188 + init_db.sql); the parquet sink has no
   column type to do that, so the rounding is applied in the plan to
   keep both sinks byte-equivalent.

Scale: the only shuffles are the per-machine window sort and the two
hourly aggregations; the cycle-times side of both joins is broadcast
(8× smaller than events, per the fixed cycle shape). One machine-day is
~1.15 M rows; the machine_id key domain is what parallelizes a fleet.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from projekt_data_engineering_iubh_spark.operators.rules import with_error_flag
from projekt_data_engineering_iubh_spark.operators.sessionize import (
    with_session_seq,
    with_session_seq_presorted,
)
from projekt_data_engineering_iubh_spark.pipeline.config import (
    CYCLE_END_EVENT,
    CYCLE_START_EVENT,
    PARAMETER_EVENT_MAPPING,
    TIMESTAMP_FORMAT_INPUT,
)

INPUT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("machine_id", T.StringType(), True),
        T.StructField("event_name", T.StringType(), True),
        T.StructField("parameter_name", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

SUMMARY_COLUMNS = [
    "summary_date",
    "hour_of_day",
    "machine_id",
    "avg_pick_force",
    "max_pick_force",
    "min_pick_force",
    "avg_place_force",
    "max_place_force",
    "min_place_force",
    "as_vacuum_error_count",
    "pp_vacuum_error_count",
    "as_release_error_count",
    "pp_release_error_count",
    "pick_force_error_count",
    "place_force_error_count",
    "cycle_count",
    "min_cycle_time_seconds",
    "max_cycle_time_seconds",
    "avg_cycle_time_seconds",
]


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: schema'd CSV scan — no inference, bad rows surface as NULLs."""
    return spark.read.csv(path, header=True, schema=INPUT_SCHEMA)


def cleanse(raw: DataFrame) -> DataFrame:
    """P1-P6: parse timestamp, numeric cast (invalid → NULL), NULL policy.

    Under ANSI mode (Spark 4 default) plain to_timestamp/cast THROW on bad
    input; the reference ran Spark 3.5 non-ANSI where they yield NULL. The
    ``try_`` variants restore the reference's bad-row-tolerant semantics
    without disabling ANSI for everything else.
    """
    return (
        raw.withColumn(
            "event_timestamp",
            F.try_to_timestamp("timestamp", F.lit(TIMESTAMP_FORMAT_INPUT)),
        )
        .withColumn("value_num", F.col("value").try_cast("double"))
        .fillna("", subset=["parameter_name"])
        .dropna(subset=["event_timestamp", "machine_id", "event_name"])
        .drop("timestamp", "value")
        .withColumnRenamed("value_num", "value")
    )


def _marker_rank() -> F.Column:
    """Total-order rank for same-millisecond events: a Cycle_End that shares
    its timestamp with the following Cycle_Start must sort first so the
    running count assigns it to the *previous* cycle (file-order parity)."""
    return (
        F.when(F.col("event_name") == CYCLE_END_EVENT, 0)
        .when(F.col("event_name") == CYCLE_START_EVENT, 2)
        .otherwise(1)
    )


def compute_cycles(
    events: DataFrame, *, presorted: bool = False
) -> tuple[DataFrame, DataFrame]:
    """W1 + A1 + P11: assign cycle_seq by running count of Cycle_Start per
    machine; derive per-cycle start timestamp and duration from the marker
    rows. Returns (events_with_cycle_seq, cycle_times).

    ``presorted=True`` selects the two-level prefix-sum sessionizer for
    time-ordered single-machine files (the reference's actual input shape):
    ~4× faster on a 1.1M-row machine-day here, and unlike the window it
    parallelizes across splits instead of serializing on the hot machine
    key. Only valid when file order == time order.
    """
    if presorted:
        with_seq = with_session_seq_presorted(
            events,
            is_marker=F.col("event_name") == CYCLE_START_EVENT,
            session_col="cycle_seq",
        )
    else:
        with_seq = with_session_seq(
            events.withColumn("marker_rank", _marker_rank()),
            partition_by=["machine_id"],
            order_by=["event_timestamp", "marker_rank", "parameter_name"],
            is_marker=F.col("event_name") == CYCLE_START_EVENT,
            session_col="cycle_seq",
        ).drop("marker_rank")

    boundaries = (
        with_seq.filter(F.col("cycle_seq") > 0)
        .filter(F.col("event_name").isin(CYCLE_START_EVENT, CYCLE_END_EVENT))
        .groupBy("machine_id", "cycle_seq")
        .agg(
            F.min("event_timestamp").alias("cycle_start_ts"),
            F.max("event_timestamp").alias("cycle_end_ts"),
        )
    )
    cycle_times = boundaries.withColumn(
        "cycle_time_seconds",
        F.round(
            (
                F.unix_micros("cycle_end_ts") - F.unix_micros("cycle_start_ts")
            )
            / F.lit(1000000.0),
            3,
        ),
    ).select("machine_id", "cycle_seq", "cycle_start_ts", "cycle_time_seconds")
    return with_seq, cycle_times


def flag_errors(events: DataFrame, rules: dict[str, Any]) -> DataFrame:
    """P12: compile the threshold config to one Column predicate."""
    return with_error_flag(events, rules, PARAMETER_EVENT_MAPPING)


def enriched_events(events_err: DataFrame, cycle_times: DataFrame) -> DataFrame:
    """J1 + P13 + P5: attach per-cycle duration to every event row."""
    return (
        events_err.join(
            F.broadcast(
                cycle_times.select("machine_id", "cycle_seq", "cycle_time_seconds")
            ),
            on=["machine_id", "cycle_seq"],
            how="left",
        )
        .select(
            "event_timestamp",
            "machine_id",
            "event_name",
            "parameter_name",
            F.round("value", 2).alias("value"),
            "is_error",
            "cycle_seq",
            "cycle_time_seconds",
        )
    )


def _force(name: str, param: str) -> F.Column:
    return F.when(
        (F.col("event_name") == name) & (F.col("parameter_name") == param),
        F.col("value"),
    )


def _err_count(param: str, event: str) -> F.Column:
    return F.sum(
        F.when(
            (F.col("parameter_name") == param)
            & (F.col("event_name") == event)
            & (F.col("is_error") == 1),
            1,
        ).otherwise(0)
    )


def hourly_summary(events_err: DataFrame, cycle_times: DataFrame) -> DataFrame:
    """A2 + A3 + J2 + J3 + P14/P15/P13: the 19-column wide hourly rollup.

    Events bucket into the hour their *cycle started* (reference joins
    cycle_start_ts back before extracting date/hour, :207-214)."""
    cyc = (
        cycle_times.withColumn("summary_date", F.to_date("cycle_start_ts"))
        .withColumn("hour_of_day", F.hour("cycle_start_ts"))
        .filter(F.col("summary_date").isNotNull())
    )
    cycle_summary = cyc.groupBy("summary_date", "hour_of_day", "machine_id").agg(
        F.countDistinct("cycle_seq").alias("cycle_count"),
        F.avg("cycle_time_seconds").alias("avg_cycle_time_seconds"),
        F.min("cycle_time_seconds").alias("min_cycle_time_seconds"),
        F.max("cycle_time_seconds").alias("max_cycle_time_seconds"),
    )

    ev = (
        events_err.join(
            F.broadcast(
                cycle_times.select("machine_id", "cycle_seq", "cycle_start_ts")
            ),
            on=["machine_id", "cycle_seq"],
            how="left",
        )
        .withColumn("summary_date", F.to_date("cycle_start_ts"))
        .withColumn("hour_of_day", F.hour("cycle_start_ts"))
        .filter(F.col("summary_date").isNotNull())
    )
    event_summary = ev.groupBy("summary_date", "hour_of_day", "machine_id").agg(
        F.avg(_force("Pick_Check", "PP_Force")).alias("avg_pick_force"),
        F.max(_force("Pick_Check", "PP_Force")).alias("max_pick_force"),
        F.min(_force("Pick_Check", "PP_Force")).alias("min_pick_force"),
        F.avg(_force("Place_Check", "PP_Force")).alias("avg_place_force"),
        F.max(_force("Place_Check", "PP_Force")).alias("max_place_force"),
        F.min(_force("Place_Check", "PP_Force")).alias("min_place_force"),
        _err_count("AS_VacuumUnits", "AS_Check").alias("as_vacuum_error_count"),
        _err_count("PP_VacuumUnits", "Pick_Check").alias("pp_vacuum_error_count"),
        _err_count("AS_VacuumUnits", "AS_Blowoff_Check").alias(
            "as_release_error_count"
        ),
        _err_count("PP_VacuumUnits", "Place_Check").alias("pp_release_error_count"),
        _err_count("PP_Force", "Pick_Check").alias("pick_force_error_count"),
        _err_count("PP_Force", "Place_Check").alias("place_force_error_count"),
        F.sum("is_error").alias("total_error_count"),
    )

    summary = (
        cycle_summary.join(
            event_summary,
            on=["summary_date", "hour_of_day", "machine_id"],
            how="outer",
        )
        .fillna(
            0,
            subset=[
                "cycle_count",
                "avg_cycle_time_seconds",
                "min_cycle_time_seconds",
                "max_cycle_time_seconds",
                "avg_pick_force",
                "max_pick_force",
                "min_pick_force",
                "avg_place_force",
                "max_place_force",
                "min_place_force",
                "as_vacuum_error_count",
                "pp_vacuum_error_count",
                "as_release_error_count",
                "pp_release_error_count",
                "pick_force_error_count",
                "place_force_error_count",
                "total_error_count",
            ],
        )
    )
    for col, scale in [
        ("min_cycle_time_seconds", 3),
        ("max_cycle_time_seconds", 3),
        ("avg_cycle_time_seconds", 3),
        ("avg_pick_force", 2),
        ("max_pick_force", 2),
        ("min_pick_force", 2),
        ("avg_place_force", 2),
        ("max_place_force", 2),
        ("min_place_force", 2),
    ]:
        summary = summary.withColumn(col, F.round(F.col(col), scale))
    return summary.select(*SUMMARY_COLUMNS, "total_error_count")


def transform(
    raw: DataFrame, rules: dict[str, Any]
) -> tuple[DataFrame, DataFrame]:
    """Full logical pipeline: raw CSV rows → (enriched events, hourly summary)."""
    events = cleanse(raw)
    with_seq, cycle_times = compute_cycles(events)
    events_err = flag_errors(with_seq, rules)
    return enriched_events(events_err, cycle_times), hourly_summary(
        events_err, cycle_times
    )


def run(
    spark: SparkSession,
    input_csv: str,
    output_dir: str,
    rules: dict[str, Any],
) -> dict[str, int]:
    """Execute the job against parquet sinks.

    * enriched events → append, partitioned by event date (a daily rerun
      appends duplicates, like the reference DB table — see note in D4);
    * hourly summary → **dynamic partition overwrite** on
      (summary_date, machine_id): re-running a machine-day replaces exactly
      that pair — the idempotent merge the reference documents but never
      implemented (D1), at the granularity its per-machine daily files
      actually arrive in.
    """
    events_err_cached = None
    raw = read_events_csv(spark, input_csv)
    events = cleanse(raw)
    with_seq, cycle_times = compute_cycles(events)
    events_err_cached = flag_errors(with_seq, rules).persist()
    cycle_times = cycle_times.persist()
    try:
        enriched = enriched_events(events_err_cached, cycle_times)
        summary = hourly_summary(events_err_cached, cycle_times)

        (
            enriched.withColumn("event_date", F.to_date("event_timestamp"))
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(f"{output_dir}/processed_machine_events")
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # partition by (date, machine): a rerun of one machine-day replaces
        # exactly that pair — partitioning by date alone would clobber other
        # machines' rows for the same day when jobs run per machine-file
        (
            summary.write.mode("overwrite")
            .partitionBy("summary_date", "machine_id")
            .parquet(f"{output_dir}/hourly_machine_summary")
        )
        n_events = spark.read.parquet(
            f"{output_dir}/processed_machine_events"
        ).count()
        n_summary = spark.read.parquet(
            f"{output_dir}/hourly_machine_summary"
        ).count()
        return {"events": n_events, "summary_rows": n_summary}
    finally:
        events_err_cached.unpersist()
        cycle_times.unpersist()


def validate_input_filename(name: str) -> str | None:
    """CLI arg validation (reference P19, daily_aggregator.py:292-301):
    bare ``*.csv`` filename — returns an error string or None."""
    if not name or "/" in name or "\\" in name or not name.lower().endswith(".csv"):
        return f"invalid file name {name!r}: expected a bare *.csv filename"
    return None


def main(argv: list[str]) -> int:
    """``python -m …pipeline.daily_aggregator <file.csv> [data_dir] [out_dir]``

    The reference's spark-submit entry point (§3 entry 1), against parquet
    sinks: file lives under ``data_dir`` (default ./raw_data), outputs
    under ``out_dir`` (default ./warehouse), rules from
    ``SCHWELLWERTE_PATH`` env or built-in defaults.
    """
    import os

    from projekt_data_engineering_iubh_spark.pipeline.config import load_rules
    from projekt_data_engineering_iubh_spark.session import get_spark

    if len(argv) < 2:
        print("usage: daily_aggregator.py <file.csv> [data_dir] [out_dir]")
        return 1
    err = validate_input_filename(argv[1])
    if err:
        print(err)
        return 1
    data_dir = argv[2] if len(argv) > 2 else "./raw_data"
    out_dir = argv[3] if len(argv) > 3 else "./warehouse"
    rules_path = os.environ.get("SCHWELLWERTE_PATH")
    rules = load_rules(rules_path) if rules_path else load_rules(None)
    spark = get_spark(f"daily_aggregator_{argv[1]}")
    try:
        counts = run(spark, os.path.join(data_dir, argv[1]), out_dir, rules)
        print(counts)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv))
