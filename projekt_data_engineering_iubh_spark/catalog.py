"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; normalizes `events.ts` to TimestampType.

    The driver has shipped ``events.ts`` in two parquet flavors across
    rounds, both normalized here to plain TimestampType so every operator
    and physical-plan test sees one type:

    * TIMESTAMP(NANOS) — unmappable for Spark ([PARQUET_TYPE_ILLEGAL]);
      with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
      epoch-nanos LongType and is truncated here to µs — exactly what
      DuckDB does when it casts TIMESTAMP_NS to its µs TIMESTAMP;
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) — Spark 4 infers
      TIMESTAMP_NTZ, which unix_micros()/window functions reject; cast to
      TIMESTAMP, value-preserving because the session timezone is pinned
      to UTC (session.py:38) — the same wall-clock instants DuckDB reads.
    """
    from projekt_data_engineering_iubh_spark.pipeline import store

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # resolve() is a no-op for the driver's plain parquet files, and makes
    # manifest-store table dirs (pipeline/store.py) readable here too
    df = spark.read.parquet(store.resolve(os.path.join(sf_dir, f"{name}.parquet")))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, *key: str, n: int | None = None) -> DataFrame:
    """Small-file rescue for CPU-heavy map-side pipelines.

    The driver tables are single-row-group parquet files, so a scan
    decodes in ONE task and everything narrow downstream (interpreted
    HOFs, explode→md5, plane-dot folds) serializes on one core until the
    first exchange. Shuffling the small base rows first costs little and
    unlocks full parallelism for the expensive expressions (measured:
    MinHash signature pipeline 0.99s → 0.66s at sf0.1/local[32]).

    With ``key``, the shuffle is hash partitioning on those columns, so a
    later groupBy on the same key needs no second exchange.

    At real scale scans produce many splits and this becomes the
    guard's no-op: inputs already at least as parallel as the target are
    returned unchanged (never coalesced).
    """
    if n is None:
        n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, *key) if key else df.repartition(n)
