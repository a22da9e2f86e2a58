"""Streaming NEAR-dup tier: foreachBatch LSH against a persisted
signature index — the composed design the dedup docstrings promise
(streaming/dedup_stream.py handles in-horizon exact copies; this drops
near-duplicates of already-ingested corpus at the trigger boundary).

Per micro-batch:

    batch docs → MinHash signatures (plans/text_queries.signatures_from —
    bit-identical to the batch/oracle pipeline)
      → LSH band rows (same xxhash64 band keys as docs_minhash_lsh_pairs)
      → EQUI-join on (band_no, band_key) against the persisted index
      → signature-agreement gate (est Jaccard ≥ τ) → drop near-dups
      → surviving docs appended to the store AND their band rows appended
        to the index, so a near-dup arriving N triggers later is dropped
        whether its twin came from the original corpus or the stream.

Scale shape: the index side is bucketed by band key (an equi-join,
plan-asserted in tests — never a cross join); the per-trigger cost is
linear in batch size plus one shuffle of the (small) batch against the
index. State lives in parquet, not stream state: the watermark bounds
nothing here because the index is content-addressed and append-only.

Semantics and limits, stated plainly:

* near-dups WITHIN one micro-batch are dropped by a pairwise self-join
  tier (keep the lowest doc_id — the batch tier's min-representative
  convention); full TRANSITIVE clustering of in-batch chains remains
  the periodic batch job's (``pipeline.corpus.run``) — standard
  two-tier ingest/compaction, same contract as the exact tier.
* foreachBatch retries can append duplicate index rows; band rows are
  advisory (they only generate candidate matches), so duplicates cost
  bytes, not correctness — the batch compaction tier may rewrite the
  index through ``pipeline.store`` for a transactional cleanup.

Reference scope note: the reference engine has no streaming tier at all
(SURVEY.md §2.9 is engine breadth); this module extends its dedup
semantics (D-family) to ingest time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from projekt_data_engineering_iubh_spark.functions import hashing
from projekt_data_engineering_iubh_spark.plans.text_queries import (
    _LSH_BANDS,
    _LSH_ROWS,
    _MINHASH_K,
    signatures_from,
)
from projekt_data_engineering_iubh_spark.streaming.corpus_stream import (
    curate_stream,
)

NEAR_TAU = 0.5  # signature-agreement drop gate (matches the batch tier)


def band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, minhash) → (doc_id, band_no, band_key, minhash) band rows.

    Same xxhash64 band keys as the batch LSH queries; sentinel (empty
    shingle) signatures are excluded — a short doc can never be dropped
    by the near tier (r2 ADVICE rule, carried over from the batch path).
    """
    no_sentinel = sig.filter(
        F.element_at(F.col("minhash"), 1) < F.lit(hashing.MERSENNE_P)
    )
    band = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_no"),
                    F.xxhash64(
                        F.lit(b),
                        F.slice("minhash", b * _LSH_ROWS + 1, _LSH_ROWS),
                    ).alias("band_key"),
                )
                for b in range(_LSH_BANDS)
            ]
        )
    )
    return no_sentinel.select("doc_id", "minhash", band.alias("b")).select(
        "doc_id", "b.band_no", "b.band_key", "minhash"
    )


def build_signature_index(docs: DataFrame, index_path: str) -> None:
    """Materialize the corpus signature index (the batch pipeline's job):
    band rows of every corpus doc, written as plain parquet.

    Guarded against a migrated index (r4 ADVICE): a blind
    ``mode('overwrite')`` on a manifest store would delete
    ``_MANIFEST.json``, every committed version dir, and the ``_appends``
    delta — destroying snapshots OUTSIDE the commit protocol every other
    writer in this module routes through. On a store the rebuild goes
    through :func:`store.commit_snapshot` (old snapshots stay readable
    until vacuum), and it REFUSES while live delta files exist — those
    appends are not part of ``docs`` and would be silently orphaned;
    run :func:`compact_signature_index` first."""
    from projekt_data_engineering_iubh_spark.pipeline import store

    rows = band_rows(signatures_from(docs))
    if store.is_store(index_path):
        # the module's own liveness definition: ledger-folded files kept
        # for the one-cycle reader grace window are NOT live — a raw glob
        # would spuriously refuse a rebuild right after a compaction
        live = _append_files(index_path)
        if live:
            raise RuntimeError(
                f"{index_path} has {len(live)} live append delta file(s); "
                "rebuilding now would orphan them — run "
                "compact_signature_index() first"
            )
        store.commit_snapshot(
            index_path, lambda d: rows.write.mode("overwrite").parquet(d)
        )
        return
    rows.write.mode("overwrite").parquet(index_path)


def neardup_filter_batch(
    batch: DataFrame,
    index: DataFrame,
    *,
    tau: float = NEAR_TAU,
    within_batch: bool = True,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Drop batch docs whose signature agrees ≥ ``tau`` with any index doc
    sharing an LSH band, and (``within_batch``) docs near-duplicating a
    LOWER-doc_id doc of the same micro-batch (the same min-representative
    convention as the batch tier's connected components; the greedy
    pairwise rule here — full transitive clustering stays the batch
    job's). Returns the surviving batch rows unchanged. ``bands`` lets
    the caller reuse already-computed batch band rows (the per-trigger
    processor computes them once for every consumer)."""
    bb = (
        bands if bands is not None else band_rows(signatures_from(batch))
    ).withColumnRenamed("minhash", "b_minhash")

    def _est(a: str, b: str) -> F.Column:
        return hashing.signature_agreement(F.col(a), F.col(b), _MINHASH_K)

    drops = (
        bb.join(
            index.withColumnRenamed("doc_id", "idx_doc_id"),
            ["band_no", "band_key"],
        )
        .filter(F.col("idx_doc_id") != F.col("doc_id"))
        .filter(_est("b_minhash", "minhash") >= tau)
        .select("doc_id")
    )
    if within_batch:
        a = bb.select("doc_id", "band_no", "band_key", "b_minhash")
        b = (
            bb.withColumnRenamed("doc_id", "hi_doc")
            .withColumnRenamed("b_minhash", "hi_minhash")
        )
        intra = (
            a.join(b, ["band_no", "band_key"])
            .filter(F.col("doc_id") < F.col("hi_doc"))
            .filter(_est("b_minhash", "hi_minhash") >= tau)
            .select(F.col("hi_doc").alias("doc_id"))
        )
        drops = drops.unionByName(intra)
    return batch.join(drops.distinct(), "doc_id", "left_anti")


# Streaming appends live in an LSM-style delta area NEXT TO the index
# snapshots: Spark/Hadoop readers skip underscore-prefixed paths, so the
# delta never leaks into a plain scan of the index root — readers union
# it in explicitly via load_index(), and compact_signature_index() folds
# exactly the delta files it listed into the next snapshot (appends that
# race the compaction stay in the delta and remain visible — no lost
# rows, the property a resolved-dir append could not give).
_APPENDS_SUBDIR = "_appends"


def _appends_dir(index_path: str) -> str:
    import os

    return os.path.join(index_path, _APPENDS_SUBDIR)


_FOLDED_LEDGER = ".folded.json"


def _folded_names(index_path: str) -> set[str]:
    import json
    import os

    ledger = os.path.join(_appends_dir(index_path), _FOLDED_LEDGER)
    if not os.path.isfile(ledger):
        return set()
    return set(json.load(open(ledger)))


def _append_files(index_path: str, *, include_folded: bool = False) -> list[str]:
    """Live delta files: on disk and not yet marked folded. Folded files
    stay on disk until the NEXT compaction (one-cycle retention) so a
    reader whose plan listed them before the fold can still scan them —
    the delta-side analog of vacuum's snapshot retention."""
    import glob as _glob
    import os

    folded = set() if include_folded else _folded_names(index_path)
    return sorted(
        f
        for f in _glob.glob(os.path.join(_appends_dir(index_path), "*.parquet"))
        if os.path.isfile(f) and os.path.basename(f) not in folded
    )


def load_index(spark, index_path: str) -> DataFrame:
    """The full index view: current snapshot (manifest-resolved) plus the
    streaming delta area."""
    from projekt_data_engineering_iubh_spark.pipeline import store

    base = spark.read.parquet(store.resolve(index_path))
    delta_files = _append_files(index_path)
    if not delta_files:
        return base
    # ignoreMissingFiles: a delta file purged after this listing (its
    # grace window ended mid-plan) degrades to fewer advisory rows, never
    # a failed trigger
    return base.unionByName(
        spark.read.option("ignoreMissingFiles", "true").parquet(*delta_files)
    )


def compact_signature_index(spark, index_path: str, *, _on_listed=None):
    """Fold the streaming delta into the next index snapshot (the batch
    tier's maintenance job). Lists the LIVE delta files first, commits
    snapshot+listed-delta as a new version, then marks the folded files
    in a ledger — they stay on disk until the NEXT compaction physically
    purges them, so an in-flight reader whose plan listed them before
    the fold never hits FileNotFoundError (the delta-side analog of
    vacuum's version retention). A concurrent trigger's new append lands
    after the listing and stays live. Concurrent compactions serialize
    through the store's CommitConflict. ``_on_listed`` is a test seam
    fired between listing and folding."""
    import json
    import os

    from projekt_data_engineering_iubh_spark.pipeline import store

    store.init_store(index_path)  # no-op when already a manifest store
    # purge the PREVIOUS cycle's folded files — their grace window ends now
    for name in _folded_names(index_path):
        try:
            os.remove(os.path.join(_appends_dir(index_path), name))
        except FileNotFoundError:
            pass
    listed = _append_files(index_path)
    if _on_listed is not None:
        _on_listed()
    base = spark.read.parquet(store.resolve(index_path))
    merged = (
        base.unionByName(spark.read.parquet(*listed)) if listed else base
    ).localCheckpoint(eager=True)  # snapshot the fold before files move

    store.commit_snapshot(
        index_path,
        lambda d: merged.write.mode("overwrite").parquet(d),
    )
    ledger_tmp = os.path.join(
        _appends_dir(index_path), f".{_FOLDED_LEDGER}.tmp.{os.getpid()}"
    )
    os.makedirs(_appends_dir(index_path), exist_ok=True)
    with open(ledger_tmp, "w") as fh:
        json.dump(sorted(os.path.basename(f) for f in listed), fh)
    os.replace(
        ledger_tmp, os.path.join(_appends_dir(index_path), _FOLDED_LEDGER)
    )


def start_neardup_corpus_stream(
    docs: DataFrame,
    out_path: str,
    checkpoint: str,
    index_path: str,
    *,
    tau: float = NEAR_TAU,
    cluster_root: str | None = None,
    **curate_kwargs,
):
    """Corpus curation stream with the near-dup tier wired in:
    quality lane + in-horizon exact dedup (curate_stream) run INSIDE the
    stream plan, then each micro-batch near-dup-filters against the full
    index view (snapshot + delta), writes survivors idempotently to the
    (split, lang)-partitioned store, and appends their band rows to the
    index delta area. ``cluster_root`` additionally maintains the
    transitive cluster map per trigger (see make_batch_processor)."""
    curated = curate_stream(docs, **curate_kwargs)
    processor = make_batch_processor(
        out_path, index_path, tau=tau, cluster_root=cluster_root
    )
    return (
        curated.writeStream.outputMode("append")
        .foreachBatch(processor)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def make_batch_processor(
    out_path: str,
    index_path: str,
    *,
    tau: float = NEAR_TAU,
    cluster_root: str | None = None,
):
    """The foreachBatch body, exposed for direct (retry-semantics) tests.

    Exactly-once store writes under foreachBatch's at-least-once contract:
    survivors carry an ``_ingest_batch`` partition column and the write is
    a DYNAMIC partition overwrite — a retried trigger rewrites exactly its
    own (split, lang, batch) leaf dirs instead of appending duplicates.
    The bookkeeping column rides along in the store (readers that don't
    select it never pay for it; a compaction pass may fold it away by
    repartitioning on (split, lang) and dropping the column). Index delta
    appends stay at-least-once — band rows are advisory (duplicates cost
    bytes, never correctness).

    ``cluster_root``: per-trigger transitive cluster-map maintenance
    (pipeline/cluster_index.py) over the FULL curated batch — dropped
    near-dups still enter the map as members of their match's cluster,
    the bridge-merge information. Safe under foreachBatch's replay:
    ingest_batch is idempotent (prior rows for the batch's ids are
    recomputed) and the map commit is atomic; a CommitConflict from a
    concurrently-running batch-tier ingest fails the trigger, and the
    stream's retry replays cleanly.
    """
    import os
    import uuid

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        index = load_index(spark, index_path)
        # ONE stable snapshot of the batch and ONE signature pass for
        # every consumer below (filter, delta append, cluster ingest) —
        # the batch plan must never recompute through the stream source
        stable = batch_df.localCheckpoint(eager=True)
        bb = band_rows(signatures_from(stable)).localCheckpoint(eager=True)
        kept = neardup_filter_batch(stable, index, tau=tau, bands=bb)
        kept = kept.localCheckpoint(eager=True)
        (
            kept.drop("text_hash")
            .withColumn("_ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            # writer-scoped, NOT spark.conf.set: mutating the session conf
            # would silently flip every later partitioned overwrite in the
            # same session to dynamic semantics (review finding)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("split", "lang", "_ingest_batch")
            .parquet(out_path)
        )
        delta = _appends_dir(index_path)
        os.makedirs(delta, exist_ok=True)
        # one delta file per trigger, landed by ATOMIC rename out of a
        # hidden temp dir (readers list *.parquet files only — they never
        # see a half-written file); unique names mean concurrent triggers
        # never collide and a retry adds a duplicate advisory file at worst
        import glob as _glob
        import shutil

        tmp = os.path.join(delta, f".tmp-{uuid.uuid4().hex}")
        kept_bands = bb.join(
            kept.select("doc_id"), "doc_id", "left_semi"
        )
        kept_bands.coalesce(1).write.parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))
        if part:  # empty batches write no part file
            os.replace(part[0], os.path.join(delta, f"{uuid.uuid4().hex}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

        if cluster_root is not None:
            # lazy import: cluster_index imports band_rows from THIS
            # module at load time
            from projekt_data_engineering_iubh_spark.pipeline import (
                cluster_index,
            )

            cluster_index.ingest_batch(
                spark, stable, cluster_root, tau=tau, bands=bb
            )

    return _process
