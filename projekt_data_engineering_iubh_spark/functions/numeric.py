"""Cross-engine-exact numeric kernels.

The one lesson that keeps re-proving itself (r6 sf1 audit): any rounded
average that an oracle compares hash-exact must be computed in integer
arithmetic end-to-end. ``ROUND(double_sum / n, 4)`` diverges between
engines AT ROUNDING BOUNDARIES even with bit-identical operands — Spark
rounds the exact binary value (BigDecimal HALF_UP) while DuckDB rounds
``round(x * 1e4) / 1e4`` where the multiply itself can land ON the .5.

``half_up_4dp`` is the shared formulation: the true HALF_UP (round half
AWAY FROM ZERO, java.math semantics) of the exact rational cents/n at 4
decimals, valid for EITHER SIGN of the numerator (r6 ADVICE: the old
``(200c + n) DIV (2n)`` relied on a non-negative sum — Spark's DIV
truncates toward zero while DuckDB's ``//`` floors, so a negative sum
diverged cross-engine). Both branches divide non-negative integers, on
which truncation == floor, so Spark DIV and DuckDB // agree exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def half_up_4dp(cents_col: str, n_col: str) -> F.Column:
    """HALF_UP(cents/n, 4 dp) as a DOUBLE, exact for either sign of the
    integer ``cents_col`` (``n_col`` must be a positive count)."""
    return F.expr(
        f"CASE WHEN {cents_col} >= 0 THEN "
        f"  CAST((200 * {cents_col} + {n_col}) DIV (2 * {n_col}) AS DOUBLE)"
        f"  / 10000.0 "
        f"ELSE "
        f"  -CAST((200 * -{cents_col} + {n_col}) DIV (2 * {n_col}) AS DOUBLE)"
        f"  / 10000.0 "
        f"END"
    )


def half_up_4dp_sql(cents_sql: str, n_sql: str) -> str:
    """The DuckDB mirror of :func:`half_up_4dp` (``//`` in place of DIV;
    identical on the non-negative operands both branches guarantee)."""
    return (
        f"CASE WHEN ({cents_sql}) >= 0 THEN "
        f"  CAST((200 * ({cents_sql}) + ({n_sql})) // (2 * ({n_sql})) AS DOUBLE)"
        f"  / 10000.0 "
        f"ELSE "
        f"  -CAST((200 * -({cents_sql}) + ({n_sql})) // (2 * ({n_sql})) AS DOUBLE)"
        f"  / 10000.0 "
        f"END"
    )


def floordiv_expr(a: str, b: str) -> str:
    """Spark SQL text for exact FLOOR division of bigints (``b`` must be
    positive; either sign of ``a``). Spark's DIV truncates toward zero,
    so a bare ``a DIV b`` diverges from floor on negative numerators
    (the r6 ADVICE trap). Subtracting ``pmod`` first makes the operand
    exactly divisible, where truncation == floor — pure bigint
    arithmetic, no double roundtrip, no 2^53 ceiling."""
    return f"((({a}) - pmod(({a}), ({b}))) DIV ({b}))"


def floordiv_sql(a: str, b: str) -> str:
    """The DuckDB mirror of :func:`floordiv_expr`. DuckDB's ``//`` ALSO
    truncates toward zero on integers (measured: ``(-7) // 2 = -3``,
    not floor's -4 — it is NOT Python's operator), so the same
    subtract-positive-remainder formulation is required; ``pmod`` is
    spelled out as ``((a % b) + b) % b``."""
    return (
        f"((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"
    )
