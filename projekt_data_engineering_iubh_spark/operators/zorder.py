"""Z-order (Morton) interleaving for multi-dimensional data layout.

The 100 TB problem this solves: a fact table physically sorted by ONE
key prunes parquet row groups perfectly for that key and not at all for
any other. Interleaving the bits of two keys into one sort key gives
row-group min/max stats that are tight in BOTH dimensions — the layout
trick behind Delta Lake's OPTIMIZE ZORDER BY, here as a plain column
expression any writer can ``orderBy`` (``repartitionByRange(zval)`` +
in-partition sort at cluster scale, so file N's z-range is disjoint
from file N+1's and file-level pruning composes with row-group-level).

The kernel is pure integer arithmetic — shift/mask/or terms only, no
UDF, no JVM helper — expressed identically in Spark and DuckDB so the
registered layout query is oracle-checkable bit for bit.

No reference analog (the reference writes unordered daily CSV/JDBC
appends); this is a scale-path addition. Pruning effect is measured by
``tools/zorder_layout_audit.py`` against parquet row-group metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_BITS = 16


def morton(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of each non-negative integer column
    into one Morton key: bit i of column j lands at position
    i*len(cols)+j. Pure bitwise Column arithmetic — codegen'd, no UDF.

    The canonical kernel: ``zvalue`` below is its 2-column
    specialization (x on even bits, y on odd), and
    ``pipeline/maintenance.py::zorder_write`` uses it for the N-column
    range-normalized write path. len(cols)·bits ≤ 62 keeps the result
    in a signed bigint.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(
            f"len(cols)*bits must be <= 62, got {n}*{bits}"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return z


def zvalue(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value of two non-negative integer columns:
    z = Σ_i ((x>>i)&1)<<(2i) | ((y>>i)&1)<<(2i+1).

    Inputs wider than ``bits`` must be masked/bucketed by the caller —
    silently dropping high bits would interleave garbage; the layout
    query buckets with an explicit ``% (1<<bits)``.
    """
    return morton([x, y], bits)


def zvalue_sql(x_expr: str, y_expr: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB rendering of :func:`zvalue` — the identical shift/mask/add
    chain so both engines compute the same bigint."""
    if 2 * bits > 62:
        raise ValueError(f"2*bits must be <= 62, got bits={bits}")
    # every term fully parenthesized: SQL gives << LOWER precedence than
    # +, so an unwrapped "a << 0 + b << 1" chain parses as cascading
    # shifts (a << (0 + (b << 1))) and overflows
    terms = []
    for i in range(bits):
        terms.append(f"(((({x_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + "\n     + ".join(terms) + ")"


def zvalue_py(x: int, y: int, bits: int = DEFAULT_BITS) -> int:
    """Pure-Python reference for tests."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z
