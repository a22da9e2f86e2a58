"""Multi-config oracle sweep: the driver's correctness gate at several
core/partition counts.

Round-1 lesson (VERDICT r1 #1-2): ``ROUND(AVG(double))`` hash-matched at
8 cores / 200 shuffle partitions and failed at 32 — partition-order luck
can mask FP-summation-order sensitivity. This script reruns the full
oracle-differential check at sf0.01 under several (cores, shuffle
partitions) configurations so such bugs surface locally before the driver
sees them.

Usage (each config needs its own JVM, so one invocation per config):

    for cfg in 8:8 32:32 32:200; do
        SPARK_GRAFT_CPUS=${cfg%%:*} python tools/sweep.py \
            --partitions ${cfg##*:} --sf-dir /root/testdata/sf0.01 || exit 1
    done

Exit code 0 iff every oracle query matches.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument(
        "--queries", default=None, help="comma-separated subset (default: all)"
    )
    args = ap.parse_args()

    from projekt_data_engineering_iubh_spark.plans import all_queries
    from projekt_data_engineering_iubh_spark.session import (
        default_parallelism,
        get_spark,
    )

    from oracle_harness import compare, duckdb_connection  # noqa: E402

    spark = get_spark("sweep", shuffle_partitions=args.partitions)
    con = duckdb_connection(args.sf_dir)
    qs = all_queries()
    subset = set(args.queries.split(",")) if args.queries else None

    cores = default_parallelism()
    parts = spark.conf.get("spark.sql.shuffle.partitions")
    print(f"== sweep cores={cores} shuffle_partitions={parts} sf={args.sf_dir}")

    failures: list[str] = []
    t0 = time.time()
    for name, q in qs.items():
        if subset and name not in subset:
            continue
        if q.oracle is None:
            continue
        t = time.time()
        problems = compare(name, q.fn(spark, args.sf_dir), q.oracle, con)
        status = "ok" if not problems else "FAIL"
        print(f"  {name:40s} {status} ({time.time() - t:.1f}s)", flush=True)
        failures.extend(problems)
    print(f"== done in {time.time() - t0:.0f}s, {len(failures)} failure(s)")
    for p in failures:
        print("   ", p)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
