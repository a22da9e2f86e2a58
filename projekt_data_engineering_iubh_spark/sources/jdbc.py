"""JDBC scan / sink, including the idempotent upsert (reference D1 fix).

The reference appends and swallows duplicate-key errors by string-matching
the exception (``src/daily_aggregator.py:266-275``). Its README instead
documents: overwrite a staging table, then ``INSERT … ON CONFLICT DO
UPDATE`` into the final table (``README.md:36-37``). ``upsert`` implements
exactly that, executing the merge through the JVM's ``java.sql.DriverManager``
so no Python DB driver is needed — only the JDBC driver jar Spark already
requires for the write.

No Postgres exists in this container, but both dialects still execute
against real engines (``tests/test_jdbc_upsert.py``): the whole flow —
Spark JDBC staging write, DriverManager connection, staging→final merge
(ANSI ``MERGE INTO`` dialect), row-level idempotency across reruns —
runs end-to-end on embedded Derby, and the generated Postgres
``ON CONFLICT`` statement itself runs verbatim on DuckDB (which
implements the Postgres syntax incl. ``EXCLUDED``), pinning column
lists, conflict target, and update semantics — the remaining
live-Postgres risk is connection plumbing, not SQL.

Scale notes: reads should set ``partitionColumn/lowerBound/upperBound/
numPartitions`` so the scan parallelizes; writes batch via ``batchsize``
and should ``coalesce`` to a connection count the database tolerates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: Mapping[str, str],
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .options(**dict(properties))
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def write_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: Mapping[str, str],
    *,
    batchsize: int = 10_000,
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**dict(properties))
        .mode("append")
        .save()
    )


def merge_sql(
    table: str,
    staging_table: str,
    columns: Sequence[str],
    key_columns: Sequence[str],
    *,
    dialect: str = "postgres",
) -> str:
    """Staging→final merge statement.

    ``dialect="postgres"`` (the reference's target DB,
    ``src/init_db.sql:41`` PRIMARY KEY): ``INSERT … ON CONFLICT (keys)
    DO UPDATE`` — requires a unique constraint on the keys.

    ``dialect="ansi"``: SQL-standard ``MERGE INTO`` (Derby/DB2/Oracle/
    SQL Server family) — needs no constraint and is what the embedded
    Derby integration test executes end-to-end.
    """
    cols = ", ".join(columns)
    keys = ", ".join(key_columns)
    non_keys = [c for c in columns if c not in key_columns]
    if dialect == "postgres":
        updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in non_keys)
        return (
            f"INSERT INTO {table} ({cols}) SELECT {cols} FROM {staging_table} "
            f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
        )
    if dialect == "ansi":
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_columns)
        updates = ", ".join(f"{c} = s.{c}" for c in non_keys)
        values = ", ".join(f"s.{c}" for c in columns)
        return (
            f"MERGE INTO {table} t USING {staging_table} s ON {on} "
            f"WHEN MATCHED THEN UPDATE SET {updates} "
            f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({values})"
        )
    raise ValueError(f"unknown merge dialect: {dialect!r}")


def upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_columns: Sequence[str],
    properties: Mapping[str, str],
    *,
    staging_table: str | None = None,
    dialect: str = "postgres",
    truncate_staging: bool = False,
) -> None:
    """Idempotent write: overwrite staging, merge into the final table.

    ``truncate_staging=True`` makes the overwrite TRUNCATE a pre-created
    staging table instead of drop-and-recreate — use it when the DDL is
    DBA-owned (the reference's ``init_db.sql`` model) or when Spark's
    dialect type mapping is unsuitable as a merge source (Derby maps
    StringType→CLOB, which cannot appear in a MERGE ON comparison).
    """
    staging = staging_table or f"{table}_staging"
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("truncate", "true" if truncate_staging else "false")
        .options(**dict(properties))
        .mode("overwrite")
        .save()
    )
    spark = df.sparkSession
    jvm = spark._jvm  # noqa: SLF001 — DriverManager lives in the running JVM
    conn = jvm.java.sql.DriverManager.getConnection(
        url, properties.get("user", ""), properties.get("password", "")
    )
    try:
        stmt = conn.createStatement()
        stmt.execute(
            merge_sql(table, staging, df.columns, key_columns, dialect=dialect)
        )
        stmt.close()
    finally:
        conn.close()
