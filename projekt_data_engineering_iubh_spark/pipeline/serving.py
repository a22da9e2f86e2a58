"""Serving-layer queries over the hourly summary store.

The reference serves its summary through a Streamlit dashboard issuing
two SQL shapes against Postgres (``src/dashboard.py``): available dates
(S5, :30-35) and a parameterized day slice ordered by hour (S6, :47-61),
plus client-side machine filtering (P17) and a derived hour timestamp
(P16). Here those are DataFrame plans over the date-partitioned summary
parquet — S6 prunes to a single partition, which is the point of the
storage layout at scale.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def summary_table(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    from projekt_data_engineering_iubh_spark.pipeline import store

    # resolve() pins the scan to the current snapshot when the summary dir
    # is a manifest store (compaction-safe); no-op for plain dirs
    return spark.read.parquet(
        store.resolve(f"{warehouse_dir}/hourly_machine_summary")
    )


def available_dates(summary: DataFrame) -> DataFrame:
    """S5: distinct summary dates, newest first."""
    return (
        summary.select("summary_date").distinct().orderBy(F.desc("summary_date"))
    )


def day_slice(
    summary: DataFrame,
    day: dt.date | str,
    *,
    machine_ids: Sequence[str] | None = None,
) -> DataFrame:
    """S6 + P16 + P17: one day's rows ordered by hour, with the derived
    ``timestamp_hour`` column the dashboard plots, optionally filtered to
    selected machines. The equality filter on the partition column prunes
    the scan to one partition."""
    out = summary.where(F.col("summary_date") == F.lit(str(day)).cast("date"))
    if machine_ids:
        out = out.where(F.col("machine_id").isin(list(machine_ids)))
    return out.withColumn(
        "timestamp_hour",
        F.col("summary_date").cast("timestamp")
        + F.make_interval(hours=F.col("hour_of_day")),
    ).orderBy("hour_of_day", "machine_id")
