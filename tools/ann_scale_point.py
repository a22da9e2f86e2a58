"""Larger-corpus ANN point: does the stored-index serve gap OPEN with
corpus size?

At sf1 (20 k vectors) serve and brute sit near the box's fixed job
floor, so the matrix can't show the asymptotic argument for persisting
codes: brute scans 64 float32s per vector (~256 B) while lean IVF-PQ
serve scans a 4-int16-code row (and probes nprobe/k of them). This tool
builds an embeddings-only corpus of ``--copies`` dim-rotated,
id-offset replicas of a source dir's embeddings (the scale_sweep
content-disjoint scheme, so bucket occupancies keep their scaling law),
then times brute vs the serve entries min-of-``--runs`` on it. The
first serve run pays the one-off index build (reported separately as
build_sec).

Usage:
  python tools/ann_scale_point.py --src /tmp/sf1 --out /tmp/emb10 \
      [--copies 10] [--runs 3]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from scale_sweep import OFFSET  # noqa: E402

METHODS = [
    "emb_knn_brute",
    "emb_ivf_serve",
    "emb_ivfpq_serve_lean",
    # r9: the cosine-faithful + exact-refine serve pair — the refine's
    # corpus join is |queries| x L point lookups, so its cost should
    # stay near the lean floor as the corpus grows
    "emb_ivfpq_serve_lean_cos",
    "emb_ivfpq_serve_rerank",
]


def build_embeddings_replicas(spark, src_dir: str, out_dir: str, k: int) -> int:
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table

    e = load_table(spark, src_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    out = None
    for c in range(k):
        # cyclic dim rotation per copy: norms and pairwise geometry are
        # preserved WITHIN a copy, while cross-copy cosine structure is
        # scrambled — the scale_sweep scheme
        rot = (
            F.col("embedding")
            if c == 0
            else F.concat(
                F.slice("embedding", c % dim + 1, dim - c % dim),
                F.slice("embedding", 1, c % dim),
            )
        )
        part = e.select(
            (F.col("vec_id") + F.lit(c * OFFSET)).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )
        out = part if out is None else out.unionByName(part)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    return dim


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/emb10")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.plans import all_queries
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("ann_scale_point")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_build:
        build_embeddings_replicas(spark, args.src, args.out, args.copies)
    n = spark.read.parquet(
        os.path.join(args.out, "embeddings.parquet")
    ).count()

    qs = all_queries()
    rows = {}
    for name in METHODS:
        has_build = "serve" in name  # brute has no index build step
        times = []
        for r in range(args.runs + (1 if has_build else 0)):
            t0 = time.time()
            qs[name].fn(spark, args.out).count()
            times.append(round(time.time() - t0, 3))
        if has_build:
            rows[name] = {
                "build_plus_first_run_sec": times[0],
                "serve_sec_min": min(times[1:]),
                "runs": times[1:],
            }
        else:
            rows[name] = {"serve_sec_min": min(times), "runs": times}
    print(
        json.dumps(
            {"out": args.out, "n_vectors": n, "copies": args.copies,
             "methods": rows}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
