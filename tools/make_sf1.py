"""Build a ~sf1 test-data directory by replicating sf0.1 k× (default 10)
with per-copy key offsets, so the headline bench has a 6 M-lineitem
scale point (r4 VERDICT #8).

Replication keeps every copy internally consistent — all join keys
(orderkey, custkey, suppkey, doc/vec/event/user ids) are offset by
copy·OFFSET, so q3/q5 join chains resolve within a copy and results
scale exactly k×; the small dimensions (nation, region, part) are shared
across copies unchanged, matching how a real 10× fact growth leaves
dimension cardinality alone. documents/embeddings reuse
tools/scale_sweep.py's content-disjoint replicas (token remap / dim
rotation), so the dedup/ANN queries keep their scaling-law behavior
instead of collapsing all copies into one near-dup cluster.

Usage:
    python tools/make_sf1.py --out /tmp/sf1            # build
    SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py        # measure
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from scale_sweep import OFFSET, build_replicas  # noqa: E402


def build_relational_replicas(spark, src_dir: str, out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table

    plans = {
        "lineitem": {"l_orderkey", "l_suppkey"},
        "orders": {"o_orderkey", "o_custkey"},
        "customer": {"c_custkey"},
        "supplier": {"s_suppkey"},
        "events": {"event_id", "user_id"},
    }
    for table, keys in plans.items():
        d = load_table(spark, src_dir, table)
        out = None
        for c in range(k):
            part = d.select(
                *[
                    (F.col(col) + F.lit(c * OFFSET)).alias(col)
                    if col in keys
                    else F.col(col)
                    for col in d.columns
                ]
            )
            out = part if out is None else out.unionByName(part)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )
    for dim in ("nation", "region", "part"):
        load_table(spark, src_dir, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    build_replicas(spark, args.src, args.out, args.copies)  # docs + embeddings
    build_relational_replicas(spark, args.src, args.out, args.copies)
    print(f"built {args.copies}x {args.src} -> {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
