"""Z-order interleave kernel: Spark / DuckDB / Python three-way parity
plus the tile-locality property the registered query asserts."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.operators.zorder import (
    zvalue,
    zvalue_py,
    zvalue_sql,
)


def _independent_morton(x: int, y: int, bits: int) -> int:
    # independent formulation: build the bit string directly
    bx = format(x, f"0{bits}b")
    by = format(y, f"0{bits}b")
    inter = "".join(b + a for a, b in zip(bx, by))
    return int(inter, 2)


@pytest.mark.parametrize(
    "x,y,bits",
    [(0, 0, 8), (1, 0, 8), (0, 1, 8), (3, 5, 4), (255, 255, 8), (170, 85, 8),
     (65535, 1, 16), (12345, 54321, 16)],
)
def test_python_reference_matches_independent_formulation(x, y, bits):
    assert zvalue_py(x, y, bits) == _independent_morton(x, y, bits)


def test_zvalue_py_interleaves_even_odd():
    # x occupies even bits, y odd bits
    assert zvalue_py(0b11, 0b00, 2) == 0b0101
    assert zvalue_py(0b00, 0b11, 2) == 0b1010


def test_spark_kernel_matches_python(spark):
    pairs = [(x, y) for x in (0, 1, 7, 100, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", zvalue(F.col("x"), F.col("y"), 8).alias("z")
    )
    for row in df.collect():
        assert row.z == zvalue_py(row.x, row.y, 8), (row.x, row.y)


def test_duckdb_sql_matches_python():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT x, y, "
        + zvalue_sql("x", "y", 8)
        + " AS z FROM (SELECT unnest(range(0, 256, 17)) AS x,"
        " unnest(range(255, -1, -17)) AS y)"
    ).fetchall()
    assert rows
    for x, y, z in rows:
        assert z == zvalue_py(x, y, 8), (x, y)


def test_bits_cap_enforced():
    with pytest.raises(ValueError):
        zvalue_sql("x", "y", 32)
    with pytest.raises(ValueError):
        zvalue(F.lit(1).cast("long"), F.lit(1).cast("long"), 32)


def test_registered_blocks_are_tight_tiles(spark):
    from projekt_data_engineering_iubh_spark.plans import all_queries

    q = all_queries()["lineitem_zorder_blocks"]
    df = q.fn(spark, "/root/testdata/sf0.001")
    row = df.agg(
        F.max("part_span").alias("ps"),
        F.max("supp_span").alias("ss"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # 256-z-value blocks are 16x16 tiles: tight in BOTH dimensions
    assert row.ps <= 16 and row.ss <= 16
    assert row.n <= 256
