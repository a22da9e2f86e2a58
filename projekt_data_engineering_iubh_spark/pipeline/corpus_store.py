"""Bucketed corpus storage: shuffle once at write time, never at read.

The gap this closes (r4 VERDICT #5): tests/test_bucketing.py proved
zero-exchange bucketed joins in the abstract, but the corpus pipeline
wrote plain partitioned parquet, so every later dedup/index join
re-shuffled the full corpus at read time. At 100 TB the corpus is the
big side of every incremental-ingest join — paying its shuffle once, at
write time, is the storage-level lever (the same reason warehouses
bucket fact tables).

The bucket key is the CONTENT HASH (md5 of text), not doc_id: the
incremental exact-dedup tier joins arriving batches against the corpus
on content equality (plans/curation_queries.py::docs_dedup_incremental's
exact tier), so bucketing by text_hash makes the corpus side of that
join exchange-free — the (small) batch side shuffles into the corpus's
bucketing. ``sortBy`` the same key so the sort-merge join's corpus-side
sort is also satisfied from storage.

Bucketed writes require the table catalog (``saveAsTable``) — Spark
records bucket metadata in the catalog, plain ``parquet(path)`` cannot
carry it. Tables land in the session's warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_BUCKETS = 16  # sized for tests; production sizes to ~executor count


def write_bucketed_corpus(
    df: DataFrame, table: str, *, buckets: int = DEFAULT_BUCKETS
) -> None:
    """Write a curated-corpus frame as a text_hash-bucketed catalog table
    (idempotent overwrite)."""
    (
        df.withColumn("text_hash", F.md5("text"))
        .write.mode("overwrite")
        .bucketBy(buckets, "text_hash")
        .sortBy("text_hash")
        .saveAsTable(table)
    )


def exact_matches(
    spark: SparkSession, batch: DataFrame, table: str
) -> DataFrame:
    """The incremental exact-dedup tier against the bucketed store: for
    each batch doc, the lowest corpus doc_id with identical text (absent
    → no row). The corpus side reads pre-bucketed and pre-sorted on the
    join key — NO exchange, no sort (plan-pinned by
    tests/test_corpus_bucketed.py); only the batch side shuffles, and the
    batch is the small side by construction."""
    corpus = spark.table(table).select(
        "text_hash", F.col("doc_id").alias("match_doc_id")
    )
    bh = batch.select("doc_id", F.md5("text").alias("text_hash"))
    return (
        bh.join(corpus, "text_hash")
        .groupBy("doc_id")
        .agg(F.min("match_doc_id").alias("match_doc_id"))
    )
