"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced to full execution with a noop-format write (runs the
whole plan, materializes nothing on the driver). One warm-up pass of a tiny
query amortizes JVM/codegen startup out of the numbers; each timing is the
MIN of 3 runs (single-shot timings vary ±0.3s/query from scheduler and GC
interference on the shared 32-core box — min is the standard
interference-robust statistic for a deterministic workload).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from projekt_data_engineering_iubh_spark.plans import all_queries, headline_queries
from projekt_data_engineering_iubh_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: run every headline once at the smallest SF so JVM JIT,
    # whole-stage codegen compilation, and parquet footer caching are out
    # of the measured numbers (they are per-process, not per-data costs)
    for q in headline_queries().values():
        _force(q.fn(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    for name, q in headline_queries().items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _force(q.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
