"""Streaming quality gate — expectations enforced per micro-batch.

Composes the declarative contract checks (operators/expectations.py)
with the foreachBatch sink pattern: every trigger's batch is validated
BEFORE anything is published. Two enforcement modes, both standard
production patterns:

* ``on_violation="fail"`` — raise, failing the trigger. Structured
  Streaming retries the batch; because the underlying writers are
  idempotent per batch (the repo-wide dynamic-partition-overwrite
  convention), the retry after a fixed upstream is clean. This is the
  circuit-breaker for contract rules that make the whole batch suspect
  (cross-row rules like uniqueness belong here).
* ``on_violation="quarantine"`` — split the batch on the row-level
  rules: clean rows flow to the wrapped writer, violating rows land in
  a quarantine directory WITH their violated-rule tags
  (``_violations`` array) and the batch id — the triage feed. Only
  row-local rules can quarantine; cross-row rules (unique/referential)
  still fail the batch, since no single row is "the" violator.

The gate itself costs one tiny aggregate over the (already-read) batch
plus, in quarantine mode, one extra projection — no second source scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F

from projekt_data_engineering_iubh_spark.operators import expectations as ex


class QualityGateViolation(RuntimeError):
    """Raised in fail mode; message carries the per-rule counts."""


def gated_writer(
    write_fn: Callable[[DataFrame, int], None],
    *,
    row_rules: list[tuple[str, Column]] | None = None,
    batch_rules: list[tuple[str, Column]] | None = None,
    on_violation: str = "fail",
    quarantine_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch body with the gate.

    ``row_rules``: expectations.row_* pairs (name, violation predicate).
    ``batch_rules``: expectations aggregate pairs (e.g. unique) — always
    fail-mode. ``quarantine_dir`` required when on_violation is
    "quarantine".
    """
    if on_violation not in ("fail", "quarantine"):
        raise ValueError(f"unknown on_violation: {on_violation!r}")
    if on_violation == "quarantine" and quarantine_dir is None:
        raise ValueError("quarantine mode needs quarantine_dir")
    row_rules = row_rules or []
    batch_rules = batch_rules or []

    def run(batch: DataFrame, batch_id: int) -> None:
        # cross-row rules: aggregate report, fail on any violation
        if batch_rules:
            bad = [
                (r.rule, r.violations)
                for r in ex.check(batch, batch_rules).collect()
                if not r.passed
            ]
            if bad:
                raise QualityGateViolation(
                    f"batch {batch_id} failed batch rules: {bad}"
                )
        if not row_rules:
            write_fn(batch, batch_id)
            return
        tagged = ex.with_violations(batch, row_rules)
        if on_violation == "fail":
            counts = [
                (r.rule, r.violations)
                for r in ex.check(
                    batch,
                    [
                        (name, F.sum(pred.cast("long")))
                        for name, pred in row_rules
                    ],
                ).collect()
                if not r.passed
            ]
            if counts:
                raise QualityGateViolation(
                    f"batch {batch_id} failed row rules: {counts}"
                )
            write_fn(batch, batch_id)
            return
        # quarantine mode: one materialization so the split reads the
        # tagged batch once instead of re-evaluating the source twice
        tagged = tagged.localCheckpoint(eager=True)
        dirty = tagged.filter(F.size("_violations") > 0)
        clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
        (
            dirty.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(quarantine_dir)
        )
        write_fn(clean, batch_id)

    return run
