"""Shared wiring for BAND-DELTA-maintained index stores (r12, VERDICT
r11 #5): the text near-dup signature index (streaming/neardup_stream.py)
and the semantic vector index (streaming/vector_stream.py) share the
delta PROTOCOL (pipeline/band_delta.py: atomic single-file appends,
live/folded listing with a one-cycle grace window, the fold crash
contract) but each hand-rolled its own store-aware rebuild, full-view
read, and idempotent-integrate fold — three near-verbatim copies per
tier. The r11 review found the same bootstrap bug independently on two
ANN tiers; this module makes the next such bug impossible here by
giving the band-delta tiers ONE implementation, parameterized by the
only thing that differs: the row KEY columns (``(doc_id, band_no)`` for
band rows, ``(vec_id,)`` for bucket rows).

The snapshot-generation ANN roots (ivfpq/routed) have their own shared
wiring (streaming/ann_ingest_stream._make_append_processor + the
vq generation primitives); the four-store lifecycle matrix test
(tests/test_stream_store_matrix.py) pins all four behind one contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from projekt_data_engineering_iubh_spark.pipeline import band_delta as _delta


def rebuild_index(
    rows: DataFrame, index_path: str, *, compact_hint: str
) -> None:
    """Materialize (or re-materialize) an index from batch-derived
    ``rows`` — the batch pipeline's job, shared by both tiers.

    Store-aware (r4 ADVICE lineage): a blind ``mode('overwrite')`` on a
    manifest store would delete the manifest, every committed version
    and the ``_appends`` delta OUTSIDE the commit protocol. On a store
    the rebuild commits a snapshot — and REFUSES while live delta files
    exist, because those streamed appends are not part of ``rows`` and
    would be silently orphaned (``compact_hint`` names the tier's fold
    entry point in the error). On a plain path it is a parquet
    overwrite."""
    from projekt_data_engineering_iubh_spark.pipeline import store

    if store.is_store(index_path):
        # the delta module's own liveness definition: ledger-folded
        # files kept for the one-cycle reader grace window are NOT live
        live = _delta.live_files(index_path)
        if live:
            raise RuntimeError(
                f"{index_path} has {len(live)} live append delta "
                f"file(s); rebuilding now would orphan them — run "
                f"{compact_hint} first"
            )
        store.commit_snapshot(
            index_path, lambda d: rows.write.mode("overwrite").parquet(d)
        )
        return
    rows.write.mode("overwrite").parquet(index_path)


def load_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The full index view: current snapshot (manifest-resolved) plus
    the streaming delta area."""
    from projekt_data_engineering_iubh_spark.pipeline import store

    base = spark.read.parquet(store.resolve(index_path))
    delta = _delta.read_delta(spark, index_path)
    return base if delta is None else base.unionByName(delta)


def fold_index(
    spark: SparkSession,
    index_path: str,
    key_cols: Sequence[str],
    *,
    _on_listed=None,
):
    """Fold the streaming delta into the next index snapshot via the
    shared fold protocol (band_delta.fold: live-file listing, one-cycle
    folded grace window, racing appends stay live). Idempotent by
    construction under the crash contract: delta rows dedup within the
    listing and anti-join the base on ``key_cols``, so re-listed files
    from a crashed cycle — whose rows are already in the snapshot — add
    zero rows (and retry-duplicate advisory files cost nothing).
    Concurrent folds serialize through the store's CommitConflict.
    ``_on_listed`` is a test seam fired between listing and folding."""
    from projekt_data_engineering_iubh_spark.pipeline import store

    store.init_store(index_path)  # no-op when already a manifest store
    keys = list(key_cols)

    def integrate(listed: list[str]) -> None:
        base = spark.read.parquet(store.resolve(index_path))
        if listed:
            delta = (
                spark.read.parquet(*listed)
                .dropDuplicates(keys)
                .join(base.select(*keys), keys, "left_anti")
            )
            merged = base.unionByName(delta)
        else:
            merged = base
        # snapshot the fold before files move
        merged = merged.localCheckpoint(eager=True)
        store.commit_snapshot(
            index_path,
            lambda d: merged.write.mode("overwrite").parquet(d),
        )

    return _delta.fold(spark, index_path, integrate, _on_listed=_on_listed)
