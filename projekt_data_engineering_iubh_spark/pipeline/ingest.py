"""Composed incremental corpus ingest — the applied batch-tier pipeline
that ties the dedup storage pieces together:

    arriving batch
      → EXACT tier: content-hash join against the text_hash-bucketed
        corpus table (corpus_store.exact_matches — corpus side reads
        exchange-free)
      → NEAR tier: LSH band join against the band_key-bucketed index
        (corpus_store.near_matches — ditto)
      → survivors ingested into the transitive CLUSTER MAP
        (cluster_index.ingest_batch — bridge-merging, atomic commit)
      → survivors appended to the corpus table and the band index

Returns a per-doc status frame (kept / dup_exact / dup_near with the
matched corpus doc), mirroring docs_dedup_incremental's output contract,
plus ingest counters.

Scale shape: every stage is an equi-join whose BIG side is pre-bucketed
on the join key (shuffle paid once at write time); the cluster-map CC
runs over the touched subgraph only. Per-batch cost is linear in batch
size — nothing rescans corpus text, and nothing in the pipeline is
all-pairs (the LSH candidate generator upstream of the stored index
carries the hot-bucket cap).

Note the policy difference from the streaming near-dup tier
(streaming/neardup_stream.py): that tier DROPS near-dups at the trigger
boundary and keeps no cluster state; this batch tier drops them too but
ALSO maintains the transitive cluster map, so a later batch that bridges
two existing clusters merges them (cluster_index.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from projekt_data_engineering_iubh_spark.pipeline import cluster_index, corpus_store


@dataclass(frozen=True)
class IngestStats:
    n_batch: int
    n_dup_exact: int
    n_dup_near: int
    n_kept: int


def ingest(
    spark: SparkSession,
    batch: DataFrame,
    *,
    corpus_table: str,
    band_table: str,
    cluster_root: str,
    tau: float = cluster_index.DEFAULT_TAU,
) -> tuple[DataFrame, IngestStats]:
    """Run one batch through exact → near → cluster-map ingest, append
    survivors to both bucketed stores, and return (status frame, stats).

    The status frame has (doc_id, status, match_doc_id) with
    status ∈ {'dup_exact', 'dup_near', 'kept'} — exact beats near, the
    match is the lowest matching corpus doc (deterministic), same
    contract as the docs_dedup_incremental diagnostic query.
    """
    batch = batch.localCheckpoint(eager=True)  # one stable input snapshot

    exact = corpus_store.exact_matches(spark, batch, corpus_table).select(
        "doc_id", F.col("match_doc_id").alias("exact_match")
    )
    near = corpus_store.near_matches(spark, batch, band_table, tau=tau).select(
        "doc_id", F.col("match_doc_id").alias("near_match")
    )
    status = (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_match").isNotNull(), "dup_exact")
            .when(F.col("near_match").isNotNull(), "dup_near")
            .otherwise("kept")
            .alias("status"),
            F.coalesce("exact_match", "near_match").alias("match_doc_id"),
        )
        .localCheckpoint(eager=True)
    )

    kept = batch.join(
        status.filter(F.col("status") == "kept").select("doc_id"),
        "doc_id",
        "left_semi",
    ).localCheckpoint(eager=True)

    # cluster map first (atomic snapshot commit; crash here → re-run the
    # batch, see cluster_index's crash contract), then the bucketed
    # stores. The full batch — kept AND dropped — goes into the cluster
    # map: a dropped near-dup still belongs to its match's cluster, which
    # is exactly the bridge-merge information the map exists to carry.
    cluster_index.ingest_batch(spark, batch, cluster_root, tau=tau)
    corpus_cols = [c for c in spark.table(corpus_table).columns if c != "text_hash"]
    corpus_store.append_bucketed_corpus(kept.select(*corpus_cols), corpus_table)
    corpus_store.append_band_index(kept, band_table)

    by = {
        r["status"]: r["n"]
        for r in status.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    stats = IngestStats(
        n_batch=batch.count(),
        n_dup_exact=by.get("dup_exact", 0),
        n_dup_near=by.get("dup_near", 0),
        n_kept=by.get("kept", 0),
    )
    return status, stats


def main(argv: list[str]) -> int:
    """``python -m …pipeline.ingest <batch.parquet> <corpus_table>
    <band_table> <cluster_root>`` — run one batch through the composed
    ingest (deploy runbook's incremental-ingest step). Prints the
    counters as one JSON line."""
    import json

    from pyspark.sql import SparkSession

    from projekt_data_engineering_iubh_spark.session import get_spark

    if len(argv) < 5:
        print(
            "usage: ingest.py <batch.parquet> <corpus_table> <band_table>"
            " <cluster_root>"
        )
        return 1
    borrowed = SparkSession.getActiveSession() is not None
    spark = get_spark("ingest")
    try:
        batch = spark.read.parquet(argv[1])
        _, stats = ingest(
            spark,
            batch,
            corpus_table=argv[2],
            band_table=argv[3],
            cluster_root=argv[4],
        )
        print(json.dumps(stats.__dict__))
        return 0
    finally:
        if not borrowed:
            spark.stop()


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv))
