"""Compaction: many small streaming-append files → few per partition,
identical content, partition pruning preserved."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.pipeline.maintenance import compact


def test_compact_reduces_files_preserves_content(spark, tmp_path):
    out = str(tmp_path / "store")
    # simulate many tiny appends: 6 batches x 4 shuffle files per batch
    for b in range(6):
        (
            spark.range(b * 100, (b + 1) * 100)
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") % 5 < 4, "train").otherwise("test").alias("split"),
                F.concat(F.lit("lang"), F.col("id") % 2).alias("lang"),
                (F.col("id") * 3).alias("payload"),
            )
            .repartition(4)
            .write.mode("append")
            .partitionBy("split", "lang")
            .parquet(out)
        )

    before_df = spark.read.parquet(out)
    want = {(r.doc_id, r.split, r.lang, r.payload) for r in before_df.collect()}
    n_before = len(before_df.inputFiles())
    assert n_before >= 24  # the small-file problem is real in this fixture

    stats = compact(spark, out, ("split", "lang"))
    assert stats.n_files_before == n_before
    # one file per (split, lang) partition: 2 splits x 2 langs
    assert stats.n_files_after == 4
    assert stats.n_rows == 600

    after_df = spark.read.parquet(out)
    got = {(r.doc_id, r.split, r.lang, r.payload) for r in after_df.collect()}
    assert got == want

    # partition layout intact → pruning still works
    assert glob.glob(out + "/split=train/lang=lang0/*.parquet")
    pruned = after_df.where("split = 'test'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert pruned.count() == 120


def test_compact_splits_oversized_partitions(spark, tmp_path):
    out = str(tmp_path / "store2")
    (
        spark.range(0, 1000)
        .select(F.col("id"), F.lit("a").alias("p"))
        .repartition(10)
        .write.mode("append")
        .partitionBy("p")
        .parquet(out)
    )
    stats = compact(spark, out, ("p",), max_records_per_file=300)
    # 1000 rows / 300 per file -> 4 files, still fewer than the 10 before
    assert stats.n_files_before == 10
    assert stats.n_files_after == 4


def _file_stats(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(f"{path}/*.parquet"):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.names.index(col)
        mn = min(pf.metadata.row_group(g).column(idx).statistics.min
                 for g in range(pf.metadata.num_row_groups))
        mx = max(pf.metadata.row_group(g).column(idx).statistics.max
                 for g in range(pf.metadata.num_row_groups))
        out.append((mn, mx))
    return out


def _overlap_frac(stats: list[tuple], lo: int, hi: int) -> float:
    hit = sum(1 for mn, mx in stats if mx >= lo and mn <= hi)
    return hit / len(stats)


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    from projekt_data_engineering_iubh_spark.pipeline.maintenance import (
        zorder_write,
    )

    # two independent uniform dimensions (7919 is coprime to 1000)
    df = spark.range(50_000).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    xsorted, zordered = str(tmp_path / "xsort"), str(tmp_path / "zorder")
    (
        df.repartitionByRange(F.col("x"))
        .sortWithinPartitions("x")
        .write.option("maxRecordsPerFile", "2000")
        .parquet(xsorted)
    )
    zorder_write(df, zordered, ("x", "y"), max_records_per_file=2000)

    assert spark.read.parquet(zordered).count() == 50_000
    assert len(_file_stats(zordered, "x")) >= 10  # multi-file layout is real

    # a narrow slice on each dimension: which files could contain it?
    x_on_xsort = _overlap_frac(_file_stats(xsorted, "x"), 100, 120)
    y_on_xsort = _overlap_frac(_file_stats(xsorted, "y"), 100, 120)
    x_on_z = _overlap_frac(_file_stats(zordered, "x"), 100, 120)
    y_on_z = _overlap_frac(_file_stats(zordered, "y"), 100, 120)

    # single-key sort: own column prunes hard, the other not at all
    assert x_on_xsort <= 0.2
    assert y_on_xsort >= 0.9
    # Z-order: BOTH dimensions prune substantially
    assert x_on_z <= 0.5
    assert y_on_z <= 0.5


def test_zorder_empty_and_null_inputs(spark, tmp_path):
    """r3 ADVICE guards: empty input (min/max aggregate to None) writes an
    unsorted store instead of crashing; nulls in a layout column land in
    the min bucket instead of becoming null Morton keys."""
    from projekt_data_engineering_iubh_spark.pipeline.maintenance import (
        zorder_write,
    )

    empty = spark.range(0).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    out_empty = str(tmp_path / "z_empty")
    zorder_write(empty, out_empty, ("x", "y"))
    assert spark.read.parquet(out_empty).count() == 0

    with_nulls = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("x"),
        (F.col("id") % 97).alias("y"),
        F.col("id").alias("payload"),
    )
    out_nulls = str(tmp_path / "z_nulls")
    zorder_write(with_nulls, out_nulls, ("x", "y"), max_records_per_file=200)
    back = spark.read.parquet(out_nulls)
    assert back.count() == 1000
    assert back.where(F.col("x").isNull()).count() == 100


def test_zorder_many_columns_scales_bits_down(spark, tmp_path):
    """bits * n_cols must stay inside the 63 usable long bits: 6 columns at
    the default bits=12 would hit bit 71 and silently corrupt keys; the
    guard scales to 10 bits/column and the write succeeds losslessly."""
    from projekt_data_engineering_iubh_spark.pipeline.maintenance import (
        zorder_write,
    )

    df = spark.range(2000).select(
        *[((F.col("id") * p) % 500).alias(f"c{i}")
          for i, p in enumerate([1, 7, 11, 13, 17, 19])]
    )
    out = str(tmp_path / "z_six")
    zorder_write(df, out, tuple(f"c{i}" for i in range(6)))
    assert spark.read.parquet(out).count() == 2000
