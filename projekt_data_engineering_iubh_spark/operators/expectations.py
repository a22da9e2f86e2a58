"""Declarative data-quality expectations — the dbt-test / Great-
Expectations-style gate a production pipeline runs before publishing a
table, compiled to ONE aggregation pass.

Engine-breadth rationale: the reference validates its input implicitly
(cleanse() drops malformed rows, the threshold rules flag values); a
complete engine also needs the explicit contract check — "this table has
no null keys, keys are unique, values are in range, categories are
known" — as a first-class, cheap operator. Every row-level rule becomes
a conditional SUM and every uniqueness rule a COUNT/COUNT DISTINCT pair
inside the SAME single-scan aggregate, so checking N rules costs one
table pass regardless of N (map-side combined, 1-row shuffle).
Referential integrity is the one rule that needs a second table; it is
a separate anti-join count unioned into the same report shape.

Output contract: one row per rule — (rule, violations, passed) — so the
report is itself a small DataFrame a pipeline can sink, alert on, or
join against run metadata. Deterministic: counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (
        f"not_null:{col}",
        F.sum(F.col(col).isNull().cast("long")),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations: non-null values outside [lo, hi] (nulls are the
    not_null rule's business, not double-counted here)."""
    c = F.col(col)
    return (
        f"in_range:{col}",
        F.sum(
            (c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))).cast("long")
        ),
    )


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"accepted_values:{col}",
        F.sum((c.isNotNull() & ~c.isin(*values)).cast("long")),
    )


def matches(col: str, regex: str) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"matches:{col}",
        F.sum((c.isNotNull() & ~c.rlike(regex)).cast("long")),
    )


def unique(col: str) -> tuple[str, Column]:
    """Violations: rows beyond the first of each duplicated value
    (count(col) - count(distinct col); null rows are not counted —
    SQL-standard UNIQUE semantics)."""
    return (
        f"unique:{col}",
        F.count(F.col(col)) - F.countDistinct(F.col(col)),
    )


def check(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate row-level/uniqueness rules in ONE aggregation pass.
    Returns (rule, violations, passed), one row per rule, in the given
    rule order (explode of a literal-keyed map keeps the single scan)."""
    agg = df.agg(
        *[expr.cast("long").alias(f"_v{i}") for i, (_, expr) in enumerate(rules)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(F.col(f"_v{i}"), F.lit(0)).alias("violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("r"))
        .select(
            "r.rule",
            "r.violations",
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def referential(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Orphan check: child rows whose non-null key has no parent row.
    One anti-join + count, same (rule, violations, passed) report shape.
    At scale the parent side reduces to its distinct key column before
    the join (column-pruned scan; broadcast when dimension-sized)."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    return orphans.select(
        F.lit(f"referential:{child_key}->{parent_key}").alias("rule"),
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


# ---------------------------------------------------------------------------
# Row-level variants — the quarantine path (streaming/quality_gate.py)
# ---------------------------------------------------------------------------
# The aggregate rules above COUNT violations; quarantining needs to know
# WHICH rows violated and WHY. Only row-local rules qualify (not_null /
# in_range / accepted_values / matches); uniqueness and referential
# integrity are cross-row properties — a gate checks those via the
# aggregate report and fails the batch instead of quarantining.


def row_not_null(col: str) -> tuple[str, Column]:
    return (f"not_null:{col}", F.col(col).isNull())


def row_in_range(col: str, lo, hi) -> tuple[str, Column]:
    c = F.col(col)
    return (
        f"in_range:{col}",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def row_accepted_values(col: str, values: list) -> tuple[str, Column]:
    c = F.col(col)
    return (f"accepted_values:{col}", c.isNotNull() & ~c.isin(*values))


def row_matches(col: str, regex: str) -> tuple[str, Column]:
    c = F.col(col)
    return (f"matches:{col}", c.isNotNull() & ~c.rlike(regex))


def with_violations(
    df: DataFrame, row_rules: list[tuple[str, Column]]
) -> DataFrame:
    """Append ``_violations`` — the array of violated rule names (empty =
    clean row). One projection, no shuffle; the split into clean vs
    quarantined is a filter on ``size(_violations)``."""
    tags = F.array_compact(
        F.array(
            *[
                F.when(pred, F.lit(name)).otherwise(F.lit(None))
                for name, pred in row_rules
            ]
        )
    )
    return df.withColumn("_violations", tags)
