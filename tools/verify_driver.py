"""Driver-contract simulation: what the external verification driver does,
runnable locally in one command.

Creates a VANILLA SparkSession (no engine confs — prepare_session must
rescue it, exactly like the real driver), smoke-checks entry(), then runs
selected queries() against their oracle_sql() on DuckDB at the driver's
correctness scale (sf0.01).

Usage:
    python tools/verify_driver.py                       # core smoke set
    python tools/verify_driver.py q1_pricing_summary docs_dedup_apply
    python tools/verify_driver.py --all                 # every driver entry
    python tools/verify_driver.py --tz America/New_York # non-UTC probe

Exit 0 iff everything matches.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

CORE = [
    "q1_pricing_summary",
    "events_flagship_session_rollup",
    "docs_minhash_lsh_pairs",
    "docs_dedup_apply",
    "emb_knn_brute",
    "emb_lsh_ann_pairs",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: core set)")
    ap.add_argument("--all", action="store_true", help="run every driver entry")
    ap.add_argument(
        "--include-local",
        action="store_true",
        help="extend the query universe to the FULL registry (local-only "
        "entries included) — for scale audits beyond the driver window",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default=None, help="session timezone probe")
    ap.add_argument(
        "--conf-file",
        default=None,
        help="spark-defaults-style conf file to apply (e.g. "
        "deploy/spark-defaults-template.conf; <placeholder> values and "
        "comments are skipped) — proves the deploy confs don't change "
        "query results",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]").appName("driver-sim")
    if args.conf_file:
        for line in open(args.conf_file):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            value = value.strip()
            if not value or "<" in value:
                continue  # site-specific placeholder
            b = b.config(key, value)
            print(f"conf: {key}={value}")
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare, duckdb_connection

    n = e.entry(spark).count()
    print(f"entry() smoke: {n} rows")
    assert n > 0

    qs, osql = e.queries(), e.oracle_sql()
    if args.include_local:
        from projekt_data_engineering_iubh_spark.plans.registry import (
            all_queries,
        )

        for name, q in all_queries().items():
            if name not in qs:
                qs[name] = e._wrap(q.fn)
                if q.oracle is not None:
                    osql[name] = q.oracle
    names = list(qs) if args.all else (args.queries or CORE)
    con = duckdb_connection(args.sf_dir)
    failures = []
    for name in names:
        if name not in qs:
            failures.append(f"{name}: not a driver query")
            print(name, "NOT A DRIVER QUERY")
            continue
        r = compare(name, qs[name](spark, args.sf_dir), osql[name], con)
        print(name, r or "MATCH")
        if r:
            failures.append(f"{name}: {r}")
    spark.stop()
    print(f"{len(names) - len(failures)}/{len(names)} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
