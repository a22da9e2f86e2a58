"""Third scale point for the dedup family (r8 VERDICT #6): replicate the
sf0.1 documents corpus k x (content-disjoint token remap, the
scale_sweep scheme) and time docs_minhash_lsh_pairs -> docs_dedup_apply
on it, recording pair counts and survivor counts against the linearity
laws (tests/test_scale_linearity.py measures to sf0.1 x 3; the recorded
lane extends to sf1=10x; this tool adds the 100x point so the
extrapolation is a 3-point curve like the r8 ANN serve one).

Documents ONLY: the embedding replica scheme (dimension rotation) is
undefined past 64 copies, and the dedup family never reads embeddings.

Usage:
    python tools/dedup_scale_point.py [--out /tmp/sf10docs] [--copies 100]
        [--runs 3] [--skip-build]
Prints one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tools"))

from pyspark.sql import functions as F  # noqa: E402

from scale_sweep import OFFSET  # noqa: E402


def build_doc_replicas(spark, src_dir: str, out_dir: str, k: int) -> None:
    """documents.parquet with k content-disjoint copies (same remap
    invariants as scale_sweep.build_replicas, documents only, and a
    union built once over a copy-index dimension instead of a k-branch
    plan — at k=100 a 100-way unionByName is a plan-compile hazard)."""
    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.functions import text as tx

    d = load_table(spark, src_dir, "documents")
    copies = d.crossJoin(
        spark.range(k).select(F.col("id").cast("int").alias("c"))
    )
    prefix = F.concat(F.lit("c"), F.col("c").cast("string"), F.lit("x"))
    remapped = F.when(F.col("c") == 0, F.col("text")).otherwise(
        F.concat_ws(
            " ",
            F.transform(
                tx.tokens(F.col("text")), lambda t: F.concat(prefix, t)
            ),
        )
    )
    out = copies.select(
        (F.col("doc_id") + F.col("c").cast("long") * OFFSET).alias(
            "doc_id"
        ),
        remapped.alias("text"),
        "lang",
        "source",
        F.length(remapped).alias("n_chars"),
    )
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf10docs")
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.plans import all_queries
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("dedup_scale_point")
    spark.sparkContext.setLogLevel("ERROR")
    if not args.skip_build:
        t0 = time.time()
        build_doc_replicas(spark, args.src, args.out, args.copies)
        build_sec = round(time.time() - t0, 3)
    else:
        build_sec = None
    n_docs = spark.read.parquet(
        os.path.join(args.out, "documents.parquet")
    ).count()

    qs = all_queries()
    rows = {}
    for name in ("docs_minhash_lsh_pairs", "docs_dedup_apply"):
        times, counts = [], []
        for _ in range(args.runs):
            t0 = time.time()
            counts.append(qs[name].fn(spark, args.out).count())
            times.append(round(time.time() - t0, 3))
        rows[name] = {
            "sec_min": min(times),
            "runs": times,
            "rows": counts[0],
        }
    print(
        json.dumps(
            {
                "out": args.out,
                "copies": args.copies,
                "n_docs": n_docs,
                "build_sec": build_sec,
                "queries": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
