"""functions/numeric.py — the sign-robust integer HALF_UP average.

Three-way pin: Spark expression == DuckDB mirror == Python's exact
Fraction-based HALF_UP (round half away from zero), across positive,
negative, zero, and exact-boundary numerators (r6 ADVICE: the previous
formulation silently required a non-negative sum — Spark DIV truncates
toward zero, DuckDB // floors, so negative sums diverged)."""

from __future__ import annotations

from fractions import Fraction

import duckdb
import pytest

from projekt_data_engineering_iubh_spark.functions import numeric

# (cents, n) — includes half-boundary cases in both signs:
# 125/2 cents = 62.5 cents = 0.00625 → HALF_UP at 4dp hits the boundary
CASES = [
    (0, 1),
    (125, 2),  # 0.00625 → 0.0063
    (-125, 2),  # -0.00625 → -0.0063 (away from zero)
    (5664625, 1000),  # the r6 sf1 regression boundary (56.64625 → 56.6463)
    (-5664625, 1000),
    (999999999, 7),
    (-999999999, 7),
    (1, 3),
    (-1, 3),
    (50, 4),  # 12.5 cents avg → 0.0013 /  -0.0013
    (-50, 4),
    (3, 2),  # 1.5 cents → 0.0002 (half up)
    (-3, 2),
]


def _py_half_up_4dp(cents: int, n: int) -> float:
    """Exact HALF_UP (round half away from zero) of cents/(100·n) at 4dp."""
    x = Fraction(cents, 100 * n) * 10_000
    fl = x.numerator // x.denominator
    rem = x - fl
    if x >= 0:
        r = fl + (1 if rem >= Fraction(1, 2) else 0)
    else:
        # away from zero for negatives: -0.5 fractional part rounds down
        r = fl + (1 if rem > Fraction(1, 2) else 0)
    return r / 10_000.0


@pytest.mark.parametrize("cents,n", CASES)
def test_three_way_half_up_agreement(spark, cents, n):
    expected = _py_half_up_4dp(cents, n)

    df = spark.createDataFrame([(cents, n)], "c long, n long").select(
        numeric.half_up_4dp("c", "n").alias("v")
    )
    got_spark = df.collect()[0].v
    assert got_spark == expected, (cents, n, got_spark, expected)

    # BIGINT-typed literals (the real oracles feed CAST(... AS BIGINT);
    # a bare int literal is INT32 in DuckDB and overflows at 200×)
    got_duck = duckdb.sql(
        "SELECT "
        + numeric.half_up_4dp_sql(
            f"CAST({cents} AS BIGINT)", f"CAST({n} AS BIGINT)"
        )
        + " AS v"
    ).fetchone()[0]
    assert got_duck == expected, (cents, n, got_duck, expected)
