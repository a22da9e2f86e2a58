"""Same-box A/B of two repo trees on the headline bench lane (r13,
VERDICT r12 #1): the r12 driver bench recorded +14% raw / +3-36%
canary-normalized over r11 on ALL TEN headline queries while the
headline plans' diff was rotation-flag flips only and the builder's own
quiet-box anchors showed band parity — so either a real regression hid
in the round's commits, or the scan-agg canary under-models box state
(shuffle/scheduler/page-cache) and cannot close cross-round disputes.

This harness removes every cross-session variable: BOTH trees run in
ONE tool session on ONE box, arms interleaved (A B A B ...) so slow
box drift hits both arms equally, each arm a fresh subprocess (the
package import must come from that arm's tree) with the IDENTICAL
timing code below (the arm script, not each tree's bench.py — harness
deltas between the trees are excluded by construction). Two canary
classes bracket every arm:

* scan  — the bench.py lineitem full-scan 4-agg (CPU + page cache)
* shuffle — a 200k-row synthetic sessionize (groupBy window + shuffle
  exchange; scheduler + shuffle-path state the scan canary misses)

Decision rule (recorded in BASELINE.md): if the interleaved normalized
gap reproduces, bisect the r12 commits; if the arms tie, the r12 driver
numbers were box state and the canary gets the shuffle class added.

Usage:
  python tools/ab_headline.py --a /tmp/ab_r11 --b /root/repo \
      [--rounds 3] [--sf /root/testdata/sf0.1]
  python tools/ab_headline.py --arm <tree> --sf <dir>   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _scan_canary(spark, sf_dir: str) -> list[float]:
    from pyspark.sql import functions as F

    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        _force(
            df.agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count(F.lit(1)),
            )
        )
        out.append(round(time.perf_counter() - t0, 4))
    return out


def _shuffle_canary(spark) -> list[float]:
    """Constant synthetic shuffle+window micro-task: 200k rows over 1k
    keys, groupBy-count plus a per-key row_number window — exercises the
    shuffle write/read path and the scheduler at a fixed size, with NO
    dependence on any repo plan code (safe to run identically under both
    trees and in bench.py from r13 on)."""
    from pyspark.sql import Window, functions as F

    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = (
            spark.range(200_000)
            .select(
                (F.col("id") % 1000).alias("k"),
                (F.col("id") * 2654435761 % 1_000_003).alias("v"),
            )
        )
        w = Window.partitionBy("k").orderBy("v")
        _force(
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .groupBy("k")
            .agg(F.sum("v"), F.count(F.lit(1)))
        )
        out.append(round(time.perf_counter() - t0, 4))
    return out


def run_arm(tree: str, sf_dir: str) -> None:
    sys.path.insert(0, tree)
    from projekt_data_engineering_iubh_spark.plans import headline_queries
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("ab_headline")
    spark.sparkContext.setLogLevel("ERROR")
    for q in headline_queries().values():
        _force(q.fn(spark, "/root/testdata/sf0.001"))
    scan_pre = _scan_canary(spark, sf_dir)
    shuf_pre = _shuffle_canary(spark)
    timings, runs = {}, {}
    for name, q in headline_queries().items():
        rs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(q.fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 4))
        runs[name] = rs
        timings[name] = round(min(rs), 3)
    scan_post = _scan_canary(spark, sf_dir)
    shuf_post = _shuffle_canary(spark)
    scan_best = round(min(scan_pre + scan_post), 4)
    shuf_best = round(min(shuf_pre + shuf_post), 4)
    print(
        json.dumps(
            {
                "tree": tree,
                "total": round(sum(timings.values()), 3),
                "queries": timings,
                "runs": runs,
                "scan_canary": {
                    "pre": scan_pre, "post": scan_post, "best": scan_best
                },
                "shuffle_canary": {
                    "pre": shuf_pre, "post": shuf_post, "best": shuf_best
                },
                "ratios_scan": {
                    n: round(t / scan_best, 3) for n, t in timings.items()
                },
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm")
    ap.add_argument("--a")
    ap.add_argument("--b")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if args.arm:
        run_arm(args.arm, args.sf)
        return 0

    results: dict[str, list[dict]] = {args.a: [], args.b: []}
    for rnd in range(args.rounds):
        for tree in (args.a, args.b):
            print(f"== round {rnd} arm {tree}", file=sys.stderr, flush=True)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--arm", tree, "--sf", args.sf],
                capture_output=True, text=True, check=True,
            )
            line = out.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            results[tree].append(rec)
            print(line, flush=True)

    summary = {}
    for tree, recs in results.items():
        per_q: dict[str, float] = {}
        for name in recs[0]["queries"]:
            per_q[name] = round(min(r["queries"][name] for r in recs), 3)
        summary[tree] = {
            "best_total": round(min(r["total"] for r in recs), 3),
            "min_per_query_total": round(sum(per_q.values()), 3),
            "per_query_min": per_q,
            "scan_canary_best": min(
                r["scan_canary"]["best"] for r in recs
            ),
            "shuffle_canary_best": min(
                r["shuffle_canary"]["best"] for r in recs
            ),
        }
    print(json.dumps({"summary": summary}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
