"""Interleaved cross-tree A/B for docs_dedup_apply (r9 VERDICT #2).

The driver bench series read 2.03 -> 2.15 -> 2.50 s across r7 -> r9 while
the box canary got QUIETER — three rounds of one-directional drift
exhausted the "noise" explanation. This settles it with the protocol
r7/r8 established for exactly this call (always interleave A/B on a
shared box):

* each RUN is its own PROCESS with its own JVM (no shared-plan-cache or
  shared-codegen contamination between arms — the r8 in-session A/B ran
  both arms in one JVM and its absolute numbers were inflated by it);
* arms alternate A B A B ... so slow box phases hit both arms equally;
* every run records its own canary (bench.py's lineitem full-scan
  4-agg) so a run on a loaded box is visible as such;
* per-run Spark JOB COUNT is recorded (the r9 VERDICT's suspect is
  fixed job-count accretion, not per-row work — count the jobs, don't
  guess);
* min-of-N per arm is the compared statistic.

Usage:
    git worktree add /tmp/ab_r8 <r8-end-sha>
    python tools/ab_dedup_apply.py --other /tmp/ab_r8 [--rounds 3] \
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line with per-arm runs {wall, canary, jobs} and mins.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

_ARM_SNIPPET = r"""
import json, sys, time
tree = sys.argv[1]
sf_dir = sys.argv[2]
sys.path.insert(0, tree)
from projekt_data_engineering_iubh_spark.plans import all_queries
from projekt_data_engineering_iubh_spark.session import get_spark

spark = get_spark("ab-dedup-apply")
spark.sparkContext.setLogLevel("ERROR")

def force(df):
    df.write.format("noop").mode("overwrite").save()

def jobs_done():
    # completed-job count from the status store; best-effort (0 if the
    # private API moves) — the A/B stands on wall time either way
    try:
        return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()
    except Exception:
        return 0

q = all_queries()["docs_dedup_apply"].fn
# warm-up at the smallest SF: JIT + codegen out of the measurement
force(q(spark, "/root/testdata/sf0.001"))

from pyspark.sql import functions as F
c0 = time.perf_counter()
force(
    spark.read.parquet(sf_dir + "/lineitem.parquet").agg(
        F.sum("l_quantity"), F.sum("l_extendedprice"),
        F.avg("l_discount"), F.count(F.lit(1)),
    )
)
canary = round(time.perf_counter() - c0, 4)

j0 = jobs_done()
t0 = time.perf_counter()
force(q(spark, sf_dir))
wall = round(time.perf_counter() - t0, 4)
jobs = jobs_done() - j0

print(json.dumps({"wall": wall, "canary": canary, "jobs": jobs}))
spark.stop()
"""


def run_arm(tree: str, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _ARM_SNIPPET, tree, sf_dir],
        capture_output=True,
        text=True,
        cwd=tree,
        timeout=600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def warm_lane(sf_dir: str) -> None:
    """Page-cache warm (r9 fact: the canary indexes CPU/JVM state, not
    cold-read I/O — warm the lane files before anchoring)."""
    for p in Path(sf_dir).rglob("*.parquet"):
        if p.is_file():
            p.read_bytes()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--other", required=True, help="path to the other tree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    here = str(Path(__file__).resolve().parent.parent)
    warm_lane(args.sf_dir)

    arms = {"this": here, "other": str(Path(args.other).resolve())}
    runs: dict[str, list[dict]] = {"this": [], "other": []}
    for i in range(args.rounds):
        for name in ("other", "this") if i % 2 else ("this", "other"):
            r = run_arm(arms[name], args.sf_dir)
            runs[name].append(r)
            print(f"# round {i} {name}: {r}", file=sys.stderr)

    summary = {
        "query": "docs_dedup_apply",
        "sf_dir": args.sf_dir,
        "arms": {
            name: {
                "tree": arms[name],
                "runs": rs,
                "min_wall": min(r["wall"] for r in rs),
                "min_canary": min(r["canary"] for r in rs),
                "jobs": sorted({r["jobs"] for r in rs}),
            }
            for name, rs in runs.items()
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
