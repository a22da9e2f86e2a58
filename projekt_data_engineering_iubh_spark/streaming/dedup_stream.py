"""Streaming exact deduplication — the ingest-side twin of
``docs_dedup_exact``.

A training-data pipeline ingests documents continuously; waiting for a
batch dedup over the full corpus means duplicates land in storage first
and get re-read later. This drops them at ingest: hash the text
(the same ``md5`` the batch/oracle path uses, so batch re-dedup agrees),
then ``dropDuplicatesWithinWatermark`` on the hash.

State story at 100 TB: plain streaming ``dropDuplicates`` keeps every
key seen FOREVER (state grows with corpus size — a non-starter).
``dropDuplicatesWithinWatermark`` evicts a hash once the watermark
passes its last-seen event time, bounding state to the dedup horizon
(duplicates in crawls cluster in time: re-crawls, mirror bursts,
pipeline retries). Exact global dedup across horizons remains the batch
operator's job (``docs_dedup_exact`` / ``docs_dedup_apply``) — this is
the standard two-tier design, not a shortcut. The shuffle key is the
16-byte hash, never the document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_COL = "text_hash"


def with_text_hash(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The batch/stream-shared hash projection (md5 — oracle-portable,
    identical to the batch exact-dedup and the DuckDB oracle)."""
    return docs.withColumn(HASH_COL, F.md5(F.col(text_col)))


def exact_dedup_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    dedup_horizon: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct text within the horizon.

    Works identically on a batch frame (dropDuplicates semantics match
    for in-horizon data), which is how tests pin the stream to batch.
    """
    hashed = with_text_hash(docs, text_col=text_col)
    if not docs.isStreaming:
        return hashed.dropDuplicates([HASH_COL])
    return hashed.withWatermark(ts_col, dedup_horizon).dropDuplicatesWithinWatermark(
        [HASH_COL]
    )
