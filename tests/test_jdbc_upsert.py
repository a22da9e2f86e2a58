"""End-to-end integration test of the idempotent JDBC upsert (reference D1).

The reference's primary sink is Postgres (``src/daily_aggregator.py:266-275``
appends and swallows duplicate-key errors; its README documents the proper
staging + merge fix this repo implements). No Postgres exists in this
container, but Spark ships the embedded Derby JDBC driver, so the ENTIRE
``upsert()`` path — Spark JDBC staging write (overwrite+truncate), JVM
``DriverManager`` connection, staging→final merge — runs here against a
real database, with the ANSI ``MERGE INTO`` dialect standing in for
Postgres's ``ON CONFLICT`` (same orchestration, different merge string;
the Postgres string itself stays pinned by a unit test).

DDL mirrors ``/root/reference/src/init_db.sql:21-42``
(``hourly_machine_summary``, PRIMARY KEY (summary_date, hour_of_day,
machine_id)); the upserted frame is the REAL golden-pipeline summary
(``da.transform`` over the golden fixture), not synthetic rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline.config import DEFAULT_RULES
from projekt_data_engineering_iubh_spark.sources import jdbc

from tests.test_pipeline_golden import FIXTURE_ROWS

KEYS = ["summary_date", "hour_of_day", "machine_id"]

_COL_DDL = {
    "summary_date": "DATE NOT NULL",
    "hour_of_day": "INTEGER NOT NULL",
    "machine_id": "VARCHAR(50) NOT NULL",  # init_db.sql:24
    **{
        c: "DOUBLE"
        for c in (
            "avg_pick_force",
            "max_pick_force",
            "min_pick_force",
            "avg_place_force",
            "max_place_force",
            "min_place_force",
            "min_cycle_time_seconds",
            "max_cycle_time_seconds",
            "avg_cycle_time_seconds",
        )
    },
    **{
        c: "BIGINT"
        for c in (
            "as_vacuum_error_count",
            "pp_vacuum_error_count",
            "as_release_error_count",
            "pp_release_error_count",
            "pick_force_error_count",
            "place_force_error_count",
            "cycle_count",
            "total_error_count",
        )
    },
}


def _ddl(cols, *, with_pk):
    body = ", ".join(f"{c} {_COL_DDL[c]}" for c in cols)
    pk = f", PRIMARY KEY ({', '.join(KEYS)})" if with_pk else ""
    return body + pk


@pytest.fixture(scope="module")
def summary(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("jdbc_golden") / "day.csv"
    p.write_text("\n".join(FIXTURE_ROWS) + "\n")
    _, summary = da.transform(da.read_events_csv(spark, str(p)), DEFAULT_RULES)
    return summary

@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory, summary):
    """Embedded Derby database with the reference DDL pre-created.

    Staging is pre-created too (truncate_staging=True path): Spark's
    DerbyDialect maps StringType→CLOB, and CLOB cannot appear in a MERGE
    ON comparison — the DBA-owned-DDL mode exists for exactly this.
    """
    db = tmp_path_factory.mktemp("derby") / "upsertdb"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    cols = summary.columns
    conn = spark._jvm.java.sql.DriverManager.getConnection(url, "", "")
    try:
        stmt = conn.createStatement()
        stmt.execute(
            f"CREATE TABLE hourly_machine_summary ({_ddl(cols, with_pk=True)})"
        )
        stmt.execute(
            f"CREATE TABLE hourly_machine_summary_staging ({_ddl(cols, with_pk=False)})"
        )
        stmt.close()
    finally:
        conn.close()
    return url, props


def _upsert(df, url, props):
    jdbc.upsert(
        df,
        url,
        "hourly_machine_summary",
        KEYS,
        props,
        dialect="ansi",
        truncate_staging=True,
    )


def _read_back(spark, url, props):
    df = jdbc.read_table(spark, url, "hourly_machine_summary", props)
    # Derby uppercases unquoted identifiers; fold back for comparison
    rows = df.toDF(*[c.lower() for c in df.columns]).collect()
    return {
        (str(r.summary_date), r.hour_of_day, r.machine_id): r.asDict() for r in rows
    }


def test_upsert_twice_is_row_level_idempotent(spark, summary, derby):
    url, props = derby
    expected = {
        (str(r.summary_date), r.hour_of_day, r.machine_id): r.asDict()
        for r in summary.collect()
    }

    _upsert(summary, url, props)
    first = _read_back(spark, url, props)
    assert first == expected

    # rerun of the same day (the D1 scenario: job retried after failure):
    # no duplicate rows, no value drift
    _upsert(summary, url, props)
    second = _read_back(spark, url, props)
    assert second == first


def test_upsert_updates_conflicting_rows_in_place(spark, summary, derby):
    url, props = derby
    before = _read_back(spark, url, props)

    # recomputed day with different numbers (late-arriving data):
    # same keys must UPDATE in place, not append
    bumped = summary.withColumn("cycle_count", F.col("cycle_count") + F.lit(7))
    _upsert(bumped, url, props)
    after = _read_back(spark, url, props)

    assert set(after) == set(before)  # same key set, no extra rows
    for key, row in after.items():
        assert row["cycle_count"] == before[key]["cycle_count"] + 7
        unchanged = {k: v for k, v in row.items() if k != "cycle_count"}
        assert unchanged == {
            k: v for k, v in before[key].items() if k != "cycle_count"
        }


def test_upsert_inserts_new_keys_alongside_updates(spark, summary, derby):
    url, props = derby
    before = _read_back(spark, url, props)

    # one brand-new machine appears in the rerun: merge must INSERT it
    # while UPDATE-ing the existing keys from the same staging batch
    newbie = summary.limit(1).withColumn("machine_id", F.lit("M_NEW"))
    _upsert(summary.unionByName(newbie), url, props)
    after = _read_back(spark, url, props)

    assert len(after) == len(before) + 1
    assert any(k[2] == "M_NEW" for k in after)


# ---------------------------------------------------------------------------
# Postgres-dialect contract, executed by DuckDB (r3 VERDICT #4)
# ---------------------------------------------------------------------------
#
# The Derby tests above exercise upsert() orchestration with the ANSI MERGE
# string; the reference's actual target dialect is Postgres
# `INSERT ... ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c`
# (README.md:36-37 — fixing daily_aggregator.py:266-275's swallow-the-error
# append). DuckDB implements exactly this Postgres syntax, so the GENERATED
# STATEMENT runs here verbatim — no quoting shim needed (merge_sql emits
# unquoted lowercase identifiers, case-insensitive in both engines) —
# validating column lists, conflict target, and EXCLUDED update semantics
# end-to-end against a real SQL engine.

_DUCK_TYPES = {"DOUBLE": "DOUBLE", "BIGINT": "BIGINT"}


@pytest.fixture()
def duck_pg(summary):
    import duckdb

    con = duckdb.connect()
    cols = summary.columns
    con.execute(
        f"CREATE TABLE hourly_machine_summary ({_ddl(cols, with_pk=True)})"
    )
    con.execute(
        f"CREATE TABLE hourly_machine_summary_staging ({_ddl(cols, with_pk=False)})"
    )
    pdf = summary.toPandas()
    con.register("spark_summary", pdf)
    con.execute(
        "INSERT INTO hourly_machine_summary_staging SELECT * FROM spark_summary"
    )
    yield con, cols
    con.close()


def _pg_merge(cols):
    return jdbc.merge_sql(
        "hourly_machine_summary",
        "hourly_machine_summary_staging",
        cols,
        KEYS,
        dialect="postgres",
    )


def _duck_rows(con):
    cur = con.execute(
        "SELECT * FROM hourly_machine_summary ORDER BY summary_date, hour_of_day, machine_id"
    )
    names = [d[0] for d in cur.description]
    return [dict(zip(names, r)) for r in cur.fetchall()]


def test_postgres_on_conflict_statement_runs_and_is_idempotent(duck_pg):
    con, cols = duck_pg
    sql = _pg_merge(cols)
    assert "ON CONFLICT (summary_date, hour_of_day, machine_id) DO UPDATE" in sql

    con.execute(sql)
    first = _duck_rows(con)
    assert len(first) == con.execute(
        "SELECT count(*) FROM hourly_machine_summary_staging"
    ).fetchone()[0]

    con.execute(sql)  # the D1 rerun: every row conflicts, all must UPDATE
    assert _duck_rows(con) == first


def test_postgres_on_conflict_updates_and_inserts(duck_pg):
    con, cols = duck_pg
    sql = _pg_merge(cols)
    con.execute(sql)
    before = {(str(r["summary_date"]), r["hour_of_day"], r["machine_id"]): r
              for r in _duck_rows(con)}

    # recomputed numbers + one new machine in the same staging batch
    con.execute("UPDATE hourly_machine_summary_staging SET cycle_count = cycle_count + 7")
    con.execute(
        "INSERT INTO hourly_machine_summary_staging "
        "SELECT summary_date, hour_of_day, 'M_NEW', "
        + ", ".join(c for c in cols if c not in KEYS)
        + " FROM hourly_machine_summary_staging LIMIT 1"
    )
    con.execute(sql)
    after = {(str(r["summary_date"]), r["hour_of_day"], r["machine_id"]): r
             for r in _duck_rows(con)}

    assert len(after) == len(before) + 1
    assert any(k[2] == "M_NEW" for k in after)
    for key, row in before.items():
        assert after[key]["cycle_count"] == row["cycle_count"] + 7
