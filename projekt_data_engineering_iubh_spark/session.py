"""SparkSession factory.

The reference sets only ``spark.sql.session.timeZone=UTC``
(``src/daily_aggregator.py:125-129``); everything else is Spark defaults.
For a 100 TB deployment the session must additionally enable AQE (runtime
join re-planning + skew splitting + partition coalescing) and size shuffle
parallelism to the cluster, so those are baked in here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "projekt-data-engineering-iubh-spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this host.

    On a real cluster the same conf block applies unchanged except
    ``master`` — AQE then coalesces/splits the static shuffle partition
    count at runtime, so the exact number only needs to be "roughly
    cores × 2-3" rather than hand-tuned per query.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp,
        # so read as long and convert (catalog.load_table truncates to µs,
        # matching DuckDB's ns→µs handling).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # cluster deployments point this at a DFS/object-store prefix so the
    # iterative operators' checkpoint() swap (connected_components) has a
    # durable target — deploy/spark-defaults-template.conf runbook entry
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    The verification driver creates its own SparkSession and hands it to
    ``__spark_entry__``; this applies the confs our plans rely on that can
    be toggled at runtime.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
