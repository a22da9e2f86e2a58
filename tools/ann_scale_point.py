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


def refine_bucketed_point(spark, out_dir: str, n: int, runs: int) -> int:
    """The rerank entry with the refine join against a vec_id-bucketed
    corpus (the deployment layout): shortlist from the stored cos index,
    then _rerank_refine over the bucketed table. Reports min-of-runs
    wall for the bucketed AND the plain-parquet refine in the same
    session (paired — box state hits both), plus the Exchange delta of
    the bucketed joined plan over the shortlist's own."""
    import re as _re

    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.pipeline import ann_index
    from projekt_data_engineering_iubh_spark.plans import vector_queries as vq

    # stored index + bucketed corpus table (one-off, memoized)
    t_build0 = time.time()
    root = vq._ensure_ivfpq_index(
        spark, out_dir, normalized=True, pq_m=vq._PQ_COS_M
    )
    build_sec = round(time.time() - t_build0, 3)
    corpus = load_table(spark, out_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    codes = ann_index.read_artifact(spark, root, "codes")
    # a previous session's warehouse dir survives while the catalog
    # entry does not (fresh metastore) -> LOCATION_ALREADY_EXISTS;
    # clear both sides first (the known trap, tests/test_ann_index.py)
    import shutil

    wh_base = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("refine400k_corpus", "refine400k_codes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh_base, t), ignore_errors=True)
    ct, _kt = ann_index.write_bucketed_serving(
        spark, corpus, codes, "refine400k"
    )

    def shortlist():
        return vq._ivfpq_serve_lean_impl(
            spark, out_dir, normalized=True, pq_m=vq._PQ_COS_M,
            topk=vq._RR_SHORTLIST,
        ).select("query_id", "neighbor_id")

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        return len(_re.findall(r"\bExchange hashpartitioning", plan))

    def pruned():
        # the true deployment shape: the shortlist is FIXED-K (|Q| x L
        # ids — same driver-state class as the codebooks), so gather its
        # keys and push them as an IN filter on the bucketed corpus —
        # bucket pruning + parquet row-group stats turn the refine into
        # point lookups instead of a corpus scan
        rows = shortlist().collect()
        ids = sorted(
            {r.neighbor_id for r in rows} | {r.query_id for r in rows}
        )
        short_df = spark.createDataFrame(
            [(r.query_id, r.neighbor_id) for r in rows],
            "query_id long, neighbor_id long",
        )
        corpus_f = spark.table(ct).filter(F.col("vec_id").isin(ids))
        return vq._rerank_refine(short_df, corpus_f)

    arms = {
        "bucketed": lambda: vq._rerank_refine(shortlist(), spark.table(ct)),
        "plain": lambda: vq._rerank_refine(
            shortlist(), load_table(spark, out_dir, "embeddings")
        ),
        "pruned": pruned,
    }
    times: dict[str, list[float]] = {k: [] for k in arms}
    for k, mk in arms.items():
        mk().count()  # warm (plan compile + page cache)
    for _r in range(runs):
        for k, mk in arms.items():  # interleaved: box drift hits both
            t0 = time.time()
            mk().count()
            times[k].append(round(time.time() - t0, 3))

    pruned_plan = pruned()._jdf.queryExecution().executedPlan().toString()
    buckets_pruned = "SelectedBucketsCount" in pruned_plan

    # plan pin at THIS scale: bucketed refine adds exactly one Exchange
    # (the shortlist re-key) over the shortlist plan's own
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        d_exch = n_exchanges(
            spark.table(ct).join(
                shortlist().select(
                    "query_id", F.col("neighbor_id").alias("vec_id")
                ),
                "vec_id",
            )
        ) - n_exchanges(shortlist())
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            str(10 * 1024 * 1024),
        )

    print(
        json.dumps(
            {
                "out": out_dir,
                "n_vectors": n,
                "build_sec_first_touch": build_sec,
                "refine_bucketed_min": min(times["bucketed"]),
                "refine_plain_min": min(times["plain"]),
                "refine_pruned_min": min(times["pruned"]),
                "runs": times,
                "bucketed_exchange_delta_vs_shortlist": d_exch,
                "pruned_plan_bucket_pruning": buckets_pruned,
            }
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/sf1")
    ap.add_argument("--out", default="/tmp/emb10")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--refine-bucketed",
        action="store_true",
        help="measure ONLY the rerank entry with its refine join wired "
        "through a vec_id-bucketed corpus table (the deployment layout; "
        "r9 headroom #1) and report the joined plan's Exchange count",
    )
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

    if args.refine_bucketed:
        return refine_bucketed_point(spark, args.out, n, args.runs)

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
