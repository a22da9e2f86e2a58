"""1M-corpus lane point for the STORED routed index (r12, VERDICT r11
#3): build the production-geometry root (cells ∝ n, two-level router)
on a replica corpus and measure each build term, the warm serve wall,
and candidates/query — the numbers that decide whether the routed
serve's ~2× premium over flat IVF at sf0.1 stays FLAT as cells grow
with the corpus.

Training uses km.kmeans_train_ranked_routed (router-assisted Lloyd):
exact Lloyd's assignment is O(n·k) folds and at k = n/64 that is the
quadratic term (47B folds at 1M — hours); the routed trainer pays
~(√k + 2k/√k) folds/vector/iter. The stored REGISTRY roots keep the
exact trainer (their oracles replicate it); this tool measures the
scale path.

Phases timed per corpus point (interleaved in one session, canary
bracketed): train (router-assisted Lloyd, 2 iters), router (final
router over trained centroids), assign (route full corpus, write
codes), serve_warm (min of --runs re-executions of the stored-serve
plan), plus analytic candidates/query (probes ⋈ cell occupancy — the
exact counter validated in r10).

Usage:
  python tools/routed_scale_point.py [--src /root/testdata/sf0.1]
      [--points 5,50] [--runs 3]
--points are replica counts over the src embeddings (20k rows at
sf0.1): 5 → 100k, 50 → 1M. Prints one JSON line per point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--points", default="5,50")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--target-cell", type=int, default=64)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from ann_scale_point import build_embeddings_replicas

    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.operators import kmeans as km
    from projekt_data_engineering_iubh_spark.plans import (
        vector_queries as vq,
    )
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("routed_scale_point")
    spark.sparkContext.setLogLevel("ERROR")

    def canary() -> float:
        t0 = time.perf_counter()
        load_table(spark, args.src, "embeddings").agg(
            F.count(F.lit(1))
        ).collect()
        return round(time.perf_counter() - t0, 4)

    src_tag = os.path.basename(os.path.normpath(args.src))
    for copies in (int(x) for x in args.points.split(",")):
        # encode BOTH src and copies in the replica dir name — a stale
        # dir from another src would silently change n
        out = f"/tmp/embR_{src_tag}_x{copies}"
        if not os.path.isdir(os.path.join(out, "embeddings.parquet")):
            build_embeddings_replicas(spark, args.src, out, copies)
        e = load_table(spark, out, "embeddings").select(
            "vec_id", km.quantize(F.col("embedding")).alias("qemb")
        )
        n = e.count()
        k = max(vq._IVFR_MIN_CELLS, n // args.target_cell)
        c_pre = canary()

        root = os.path.join(out, f"_routed_root_t{args.target_cell}")
        if not os.path.isdir(os.path.join(root, "codes")):
            t0 = time.perf_counter()
            cents = km.kmeans_train_ranked_routed(
                e, k, args.iters, vq.EMB_DIM
            )
            t_train = time.perf_counter() - t0
            t0 = time.perf_counter()
            router = km.train_router(cents, vq.EMB_DIM)
            router.supers = router.supers.localCheckpoint(eager=True)
            router.cent_super = router.cent_super.localCheckpoint(
                eager=True
            )
            t_router = time.perf_counter() - t0
            t0 = time.perf_counter()
            cents.coalesce(1).write.parquet(os.path.join(root, "centroids"))
            router.supers.coalesce(1).write.parquet(
                os.path.join(root, "supers")
            )
            router.cent_super.coalesce(1).write.parquet(
                os.path.join(root, "cent_super")
            )
            km.route_top_cells(router, e, "vec_id", [], 1).select(
                "vec_id", F.col("cell").cast("int").alias("cell")
            ).write.parquet(os.path.join(root, "codes"))
            t_assign = time.perf_counter() - t0
        else:
            t_train = t_router = t_assign = None  # reusing a prior build

        # warm serve: the stored-serve plan (#158's shape) re-executed
        serve = vq._routed_serve_from_dir(spark, out, root)
        walls = []
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            serve = vq._routed_serve_from_dir(spark, out, root)
            serve.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))

        # analytic candidates/query (r10-validated counter):
        # Σ over probed cells of cell occupancy, averaged over queries
        router = km.TwoLevelRouter(
            spark.read.parquet(os.path.join(root, "supers")),
            spark.read.parquet(os.path.join(root, "cent_super")),
        )
        q = e.filter(F.col("vec_id") < vq._IVF_QUERIES).select(
            F.col("vec_id").alias("query_id"), "qemb"
        )
        probes = km.route_top_cells(
            router, q, "query_id", [], vq._IVFR_NPROBE
        )
        occ = (
            spark.read.parquet(os.path.join(root, "codes"))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("occ"))
        )
        cand = (
            probes.join(occ, "cell")
            .groupBy("query_id")
            .agg(F.sum("occ").alias("cands"))
            .agg(F.avg("cands"))
            .collect()[0][0]
        )
        print(
            json.dumps(
                {
                    "n_vectors": n,
                    "k_cells": k,
                    "target_cell": args.target_cell,
                    "iters": args.iters,
                    "train_sec": round(t_train, 1) if t_train else None,
                    "router_sec": round(t_router, 1) if t_router else None,
                    "assign_write_sec": (
                        round(t_assign, 1) if t_assign else None
                    ),
                    "serve_walls": walls,
                    "serve_warm_min": min(walls),
                    "cand_per_query": round(float(cand), 1),
                    "canary_pre": c_pre,
                    "canary_post": canary(),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
