"""Vector math over ``array<float>`` embedding columns.

All computations cast elements to double *before* arithmetic and fold
strictly left-to-right (Spark ``aggregate`` / DuckDB ``list_reduce``), so
both engines execute the identical IEEE-754 operation sequence and produce
bit-identical doubles — no tolerance needed in oracle comparisons.

At 100 TB scale these run JVM-side (no Python); for very high dimensions
a Pandas-UDF + numpy BLAS path wins on constant factors — see
operators/similarity.py for that variant (measured crossover ~dim 256;
this fold stays the oracle-comparable formulation because its operation
order is reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def dot_sql(a: str, b: str) -> str:
    prods = (
        f"list_transform(range(1, len({a}) + 1), "
        f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE))"
    )
    return f"coalesce(list_reduce({prods}, (x, y) -> x + y), 0.0)"


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
