"""Trained-IVF recall@k at scale, with an nprobe sweep (r6 VERDICT #7).

The registered harness (emb_ann_recall_trained) measures nprobe=1 at the
driver correctness scale; this tool re-runs the same trained index —
identical k-means rounds (operators/kmeans.py::kmeans_train, the exact
fixed-point arithmetic the oracle verifies) — at larger SFs and sweeps
the probe budget, so the "trained cells double recall at the same probe
budget" claim carries measured scale points (recorded in BASELINE.md).

Ground truth is the registered brute-force top-k (emb_knn_brute) over
the same _IVF_QUERIES query set: at sf1 that is queries × corpus exact
cosines — small enough to be exact, which is the point of a recall
harness (at 100 TB the truth set comes from a sampled query set, the
same pattern).

Usage: python tools/ann_recall_at_scale.py [--sf-dir DIR ...]
       [--nprobes 1,2,4,8]
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from projekt_data_engineering_iubh_spark.catalog import load_table, spread  # noqa: E402
from projekt_data_engineering_iubh_spark.functions import vectors as vx  # noqa: E402
from projekt_data_engineering_iubh_spark.operators import kmeans as km  # noqa: E402
from projekt_data_engineering_iubh_spark.plans.vector_queries import (  # noqa: E402
    _IVF_QUERIES,
    _KM_ITERS,
    _KM_K,
    _KNN_K,
    EMB_DIM,
    emb_knn_brute,
)
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402


def recall_sweep(spark, sf_dir: str, nprobes: list[int], k: int = _KM_K) -> dict:
    e = spread(load_table(spark, sf_dir, "embeddings")).withColumn(
        "nrm", vx.norm(F.col("embedding"))
    )
    vectors = e.select("vec_id", km.quantize(F.col("embedding")).alias("qemb"))
    cents = kmeans_cached = km.kmeans_train(vectors, k, _KM_ITERS, EMB_DIM)
    asg = km.assign_cells(vectors, kmeans_cached).select("vec_id", "cell")
    corpus = e.join(asg, "vec_id").localCheckpoint(eager=True)

    # per-query centroid ranking (probe order): queries × k centroid rows
    q = corpus.filter(F.col("vec_id") < _IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
        km.quantize(F.col("embedding")).alias("q_qemb"),
    )
    pw = Window.partitionBy("query_id").orderBy("cdist", "cell")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "cdist",
            F.aggregate(
                F.zip_with(
                    F.col("q_qemb"), F.col("cq"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("pr", F.row_number().over(pw))
        .select("query_id", "cell", "pr")
        .localCheckpoint(eager=True)
    )

    truth = (
        emb_knn_brute(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )

    out: dict = {}
    for np_ in nprobes:
        probed = probes.filter(F.col("pr") <= np_).select("query_id", "cell")
        cand = (
            corpus.join(probed.hint("broadcast"), "cell")
            .join(
                F.broadcast(q.select("query_id", "qe", "qnrm")), "query_id"
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                (
                    vx.dot(F.col("qe"), F.col("embedding"))
                    / (F.col("qnrm") * F.col("nrm"))
                ).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        topk = cand.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= _KNN_K
        )
        approx = topk.select(
            F.col("query_id").alias("a_query"),
            F.col("neighbor_id").alias("a_neighbor"),
        )
        hits = truth.join(
            approx,
            (truth.query_id == approx.a_query)
            & (truth.neighbor_id == approx.a_neighbor),
            "left_semi",
        ).count()
        out[f"recall@{_KNN_K}_nprobe{np_}"] = round(
            hits / (len(truth.select("query_id").distinct().collect()) * _KNN_K),
            4,
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        action="append",
        default=None,
        help="repeatable; default sf0.01 + sf0.1",
    )
    ap.add_argument("--nprobes", default="1,2,4,8")
    ap.add_argument(
        "--k",
        type=int,
        default=_KM_K,
        help="trained cell count (production sizing grows k with the "
        "corpus; the registered queries pin k=%d)" % _KM_K,
    )
    args = ap.parse_args()
    dirs = args.sf_dir or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    nprobes = [int(x) for x in args.nprobes.split(",")]

    spark = get_spark("ann-recall-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        t0 = time.perf_counter()
        res = recall_sweep(spark, d, nprobes, k=args.k)
        res.update(
            {
                "sf_dir": d,
                "k_cells": args.k,
                "queries": _IVF_QUERIES,
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
        print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
