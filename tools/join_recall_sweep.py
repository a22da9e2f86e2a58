"""Recall/compute table for the kNN-join family (r12, VERDICT r11 #4):
sweep the two dials — nprobe for the trained join (#153), ADC shortlist
for the compressed-domain join (#155) — against the SAME exact panel
truth emb_knn_join_recall (#161) certifies, and time each arm.

The dials are module constants read at plan-build time, so each arm
sets them before composing the registered function (measurement only —
the registry entries themselves keep their certified constants). Arms
are interleaved with a fixed canary so box drift is visible (NEXT.md
trap: never compare across sessions).

Usage:
  python tools/join_recall_sweep.py [--sf /root/testdata/sf0.1]
      [--nprobes 2,4,8] [--shortlists 10,30,100] [--runs 2]
Prints one JSON line per arm plus a summary line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--nprobes", default="2,4,8")
    ap.add_argument("--shortlists", default="10,30,100")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F, Window

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.functions import vectors as vx
    from projekt_data_engineering_iubh_spark.plans import (
        vector_queries as vq,
    )
    from projekt_data_engineering_iubh_spark.catalog import spread
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("join_recall_sweep")
    spark.sparkContext.setLogLevel("ERROR")

    # panel truth, computed ONCE and pinned (identical to #161's truth)
    e = spread(load_table(spark, args.sf, "embeddings")).withColumn(
        "nrm", vx.norm(F.col("embedding"))
    )
    q = e.filter(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") < vq._KJR_QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    tw = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    truth = (
        e.filter(F.col("vec_id") % 2 == 1)
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                vx.dot(F.col("qe"), F.col("embedding"))
                / (F.col("qnrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(tw))
        .filter(F.col("rn") <= vq._ADCJ_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )

    def canary() -> float:
        t0 = time.perf_counter()
        truth.count()
        return round(time.perf_counter() - t0, 4)

    def recall_of(join_df) -> tuple[float, float]:
        # per-query n_hits/k averaged over the panel — the SAME
        # definition emb_knn_join_recall (#161) certifies, so rows from
        # this sweep and from the registry entry are directly comparable
        # in BASELINE.md. (The two definitions disagree whenever a panel
        # query has fewer than k exact neighbors: pooled total-hits /
        # total-truth-rows weighs those queries less — ADVICE r12.)
        a = join_df.filter(F.col("query_id") < vq._KJR_QUERY_CAP).select(
            "query_id", F.col("neighbor_id").alias("a_neighbor")
        )
        t0 = time.perf_counter()
        rec = (
            truth.join(
                a,
                (truth.query_id == a.query_id)
                & (truth.neighbor_id == a.a_neighbor),
                "left",
            )
            .drop(a.query_id)
            .groupBy("query_id")
            .agg(
                (F.count("a_neighbor") / F.lit(float(vq._ADCJ_K))).alias(
                    "recall"
                )
            )
            .agg(F.avg("recall"))
            .collect()[0][0]
        )
        return round(rec, 4), round(time.perf_counter() - t0, 3)

    rows = []
    arms = [("trained_nprobe", int(x)) for x in args.nprobes.split(",")] + [
        ("adc_shortlist", int(x)) for x in args.shortlists.split(",")
    ]
    for dial, val in arms:
        if dial == "trained_nprobe":
            saved, vq._KJT_NPROBE = vq._KJT_NPROBE, val
        else:
            saved, vq._ADCJ_SHORTLIST = vq._ADCJ_SHORTLIST, val
        try:
            walls, rec = [], None
            for _ in range(args.runs):
                fn = (
                    vq.emb_knn_join_trained
                    if dial == "trained_nprobe"
                    else vq.emb_knn_join_adc
                )
                rec, wall = recall_of(fn(spark, args.sf))
                walls.append(wall)
            row = {
                "dial": dial,
                "value": val,
                # mean over panel of per-query n_hits/k (matches #161)
                "recall_at_10": rec,
                "recall_def": "mean_per_query_hits_over_k",
                "wall_min_sec": min(walls),
                "walls": walls,
                "canary": canary(),
            }
        finally:
            if dial == "trained_nprobe":
                vq._KJT_NPROBE = saved
            else:
                vq._ADCJ_SHORTLIST = saved
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"sf": args.sf, "panel_queries": truth.select(
        "query_id").distinct().count(), "table": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
