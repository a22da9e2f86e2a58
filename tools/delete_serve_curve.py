"""Tombstone-fraction serve curve + the compaction crossover.

emb_ivfpq_delete_serve (#151) pins CORRECTNESS of serve-after-delete at a
fixed ~14% dead fraction. This tool measures the COST side at scale: how
does the lean ADC serve wall move as the live tombstone set grows (1% ->
10% -> 50% of the corpus dead), and what does ivfpq_compact buy back?

The serve plan's delete term is one broadcast anti-join of the codes scan
against the tombstone key set, so the expected shape is: flat-ish wall
while tombstones are broadcast-sized, with the anti-join build cost
growing linearly in dead keys. The deployment rule this curve calibrates:
compact when the tombstone set stops being broadcast-small relative to
executor memory OR when the dead fraction makes the codes scan itself
wasteful (scan reads dead rows only to drop them) — at 50% dead,
compaction halves the scan.

Tombstoning is CUMULATIVE (1% ⊂ 10% ⊂ 50%: a corpus shrinking over time),
each step one delete generation over the same snapshot root; serve wall is
min-of-runs after a warm run. After the last fraction, compact and
re-measure: post-compact serve reads only surviving codes with no
anti-join at all.

Usage:
  python tools/delete_serve_curve.py --dir /tmp/knnjoin_50x \
      [--fractions 0.01 0.1 0.5] [--runs 3]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/knnjoin_50x")
    ap.add_argument(
        "--fractions", type=float, nargs="+", default=[0.01, 0.10, 0.50]
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_INDEX_DIR",
        os.path.join(tempfile.mkdtemp(prefix="delcurve_"), "idx"),
    )

    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.pipeline import store
    from projekt_data_engineering_iubh_spark.plans import (
        vector_queries as vq,
    )
    from projekt_data_engineering_iubh_spark.session import get_spark

    spark = get_spark("delete_serve_curve")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, args.dir, "embeddings")
    n = emb.count()

    t0 = time.time()
    root = vq._ensure_ivfpq_appended_index(spark, args.dir)
    build_sec = round(time.time() - t0, 3)

    def serve_wall() -> list[float]:
        vq._IVFPQ_CLIENT_CACHE.clear()
        walls = []
        vq._serve_adc_from_snapshot(spark, args.dir, root).count()  # warm
        for _ in range(args.runs):
            t = time.time()
            vq._serve_adc_from_snapshot(spark, args.dir, root).count()
            walls.append(round(time.time() - t, 3))
        return walls

    points = []
    base = serve_wall()
    points.append(
        {"dead_fraction": 0.0, "dead_keys": 0, "serve_min": min(base),
         "runs": base}
    )
    print(json.dumps(points[-1]), file=sys.stderr)

    for frac in sorted(args.fractions):
        # cumulative prefix by hash bucket: frac of all vec_ids dead
        keys = emb.select("vec_id").filter(
            F.pmod(F.xxhash64("vec_id"), 10_000) < int(frac * 10_000)
        )
        t = time.time()
        committed = vq.ivfpq_delete_generation(spark, root, keys)
        del_sec = round(time.time() - t, 3)
        dead = n - vq.read_live_codes(
            spark, store.resolve(root)
        ).count()
        walls = serve_wall()
        points.append(
            {
                "dead_fraction": frac, "dead_keys": dead,
                "delete_commit_sec": del_sec, "committed": committed,
                "serve_min": min(walls), "runs": walls,
            }
        )
        print(json.dumps(points[-1]), file=sys.stderr)

    t = time.time()
    compacted = vq.ivfpq_compact(spark, root)
    compact_sec = round(time.time() - t, 3)
    post = serve_wall()
    live_after = vq.read_live_codes(spark, store.resolve(root)).count()

    print(
        json.dumps(
            {
                "dir": args.dir, "n_vectors": n,
                "build_sec_first_touch": build_sec,
                "points": points,
                "compact": {
                    "committed": compacted, "compact_sec": compact_sec,
                    "live_rows_after": live_after,
                    "serve_min": min(post), "runs": post,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
