"""Per-query noop-sink timing sweep over the driver window (r13 opt round).

The bench times the headline + serve lanes only; this tool measures EVERY
driver-window query (or any named subset) the same way bench.py does
(noop sink forces full execution, min-of-N) so the optimization checklist
has a number per entry, plus the scan canary for box-state context.

    python tools/query_times.py [--sf-dir /root/testdata/sf0.1] [--n 3] \
        [--skip name ...] [query ...] > /tmp/query_times.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from projekt_data_engineering_iubh_spark.plans import all_queries  # noqa: E402
from projekt_data_engineering_iubh_spark.plans.registry import (  # noqa: E402
    driver_queries,
)
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--warm-sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    aq = all_queries()
    names = args.queries or sorted(driver_queries())
    spark = get_spark("query-times")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up at the smallest sf: JIT/codegen/footer caches out of the numbers
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _force(aq[name].fn(spark, args.warm_sf))

    from pyspark.sql import functions as F

    def canary() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = spark.read.parquet(str(Path(args.sf_dir) / "lineitem.parquet"))
            _force(
                df.agg(
                    F.sum("l_quantity"),
                    F.sum("l_extendedprice"),
                    F.avg("l_discount"),
                    F.count(F.lit(1)),
                )
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    pre = canary()
    out: dict[str, dict] = {}
    import gc

    for name in names:
        rs = []
        for _ in range(args.n):
            # drop the previous run's py4j plan references BEFORE timing:
            # uncollected Python-side handles pin JVM-side plan/RDD state
            # alive, and for the training-chain queries that measured as
            # monotonically GROWING run times (16 -> 33 -> 57 s) that
            # vanish entirely with a collect between runs
            gc.collect()
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            _force(aq[name].fn(spark, args.sf_dir))
            rs.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(rs), "runs": rs}
        print(f"{name}: {min(rs)}", file=sys.stderr)
    post = canary()

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "canary": {"pre": pre, "post": post},
                "queries": {n: v["min"] for n, v in out.items()},
                "runs": {n: v["runs"] for n, v in out.items()},
                "total": round(sum(v["min"] for v in out.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
