"""Streaming embedding ingest: multi-drop live run against a persisted
hyperplane-bucketed vector index — exact-copy and in-batch semantic dups
dropped, cross-trigger dups dropped via the index delta, retried
triggers land once, compaction folds the delta idempotently."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.plans.vector_queries import EMB_DIM
from projekt_data_engineering_iubh_spark.streaming import vector_stream as vs

SCHEMA = "vec_id long, embedding array<float>, label string"


def _basis(i: int) -> list[float]:
    v = [0.0] * EMB_DIM
    v[i] = 1.0
    return v


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _drop(spark, src_dir, tmp_path, name, rows):
    staging = tmp_path / f"stage_{name}"
    _df(spark, rows).coalesce(1).write.parquet(str(staging))
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.move(part, str(src_dir / f"{name}.parquet"))


def test_vector_stream_drops_dups_across_and_within_triggers(spark, tmp_path):
    idx = str(tmp_path / "index")
    src = tmp_path / "src"
    src.mkdir()

    # corpus index: two orthogonal basis vectors (cosine 0 between them)
    vs.build_vector_index(
        _df(spark, [(1, _basis(0), "a"), (2, _basis(1), "a")]), idx
    )

    q = vs.start_vector_ingest_stream(
        spark.readStream.schema(SCHEMA).parquet(str(src)),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        idx,
    )
    try:
        _drop(
            spark,
            src,
            tmp_path,
            "b1",
            [
                (101, _basis(0), "s"),  # exact copy of indexed 1 → drop
                (102, _basis(5), "s"),  # new direction → keep
                (103, _basis(5), "s"),  # in-batch dup of 102 → drop
                (104, _basis(7), "s"),  # new → keep
            ],
        )
        q.processAllAvailable()
        _drop(
            spark,
            src,
            tmp_path,
            "b2",
            [
                (201, _basis(5), "s"),  # dup of STREAMED 102 → drop
                (202, _basis(9), "s"),  # new → keep
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(str(tmp_path / "out"))
    assert {r.vec_id for r in out.collect()} == {102, 104, 202}

    # the index delta carries exactly the survivors' bucket rows
    delta = vs._delta.read_delta(spark, idx)
    assert {r.vec_id for r in delta.collect()} == {102, 104, 202}

    # compaction folds the delta into the snapshot, once
    vs.compact_vector_index(spark, idx)
    folded = vs.load_index(spark, idx)
    assert {r.vec_id for r in folded.collect()} == {1, 2, 102, 104, 202}
    # fold is idempotent: a second cycle with no new appends changes nothing
    vs.compact_vector_index(spark, idx)
    again = vs.load_index(spark, idx)
    assert again.count() == 5
    assert again.select("vec_id").distinct().count() == 5

    # post-compaction: a dup of a folded stream vector is still dropped
    kept = vs.semdedup_filter_batch(
        _df(spark, [(301, _basis(9), "s"), (302, _basis(11), "s")]),
        vs.load_index(spark, idx),
    )
    assert {r.vec_id for r in kept.collect()} == {302}


def test_vector_stream_retried_trigger_lands_once(spark, tmp_path):
    idx = str(tmp_path / "index")
    vs.build_vector_index(_df(spark, [(1, _basis(0), "a")]), idx)
    proc = vs.make_batch_processor(str(tmp_path / "out"), idx)

    batch = _df(spark, [(10, _basis(3), "s"), (11, _basis(4), "s")])
    proc(batch, 7)
    proc(batch, 7)  # foreachBatch at-least-once replay

    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.vec_id for r in out.collect()) == [10, 11]  # not doubled

    # delta may hold duplicate advisory rows; compaction dedups on vec_id
    vs.compact_vector_index(spark, idx)
    snap = vs.load_index(spark, idx)
    assert snap.count() == 3
    assert snap.select("vec_id").distinct().count() == 3


def test_filter_batch_matches_pairwise_reference(spark):
    """The bucketed filter's drop set must equal a brute-force pairwise
    cosine reference over the same candidate scope (same bucket)."""
    rows = [(i, _basis(i % 6), "x") for i in range(12)]  # 6 dup pairs
    batch = _df(spark, rows[6:])
    index_rows = vs.bucket_rows(_df(spark, rows[:6]))
    kept = vs.semdedup_filter_batch(
        batch, index_rows, within_batch=True
    )
    # every batch vector duplicates an indexed one (same basis) → all drop
    assert kept.count() == 0

    # with an empty index, only the in-batch lower-id rule applies
    empty = index_rows.filter(F.lit(False))
    kept2 = vs.semdedup_filter_batch(
        _df(spark, [(20, _basis(1), "x"), (21, _basis(1), "x"),
                    (22, _basis(2), "x")]),
        empty,
    )
    assert {r.vec_id for r in kept2.collect()} == {20, 22}
