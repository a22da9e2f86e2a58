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


def _canary(spark, sf_dir: str) -> list[float]:
    """Fixed box-state micro-task (r6 VERDICT #3): a constant full-column
    aggregation scan of lineitem — no joins, no windows, no Python, and
    untouched by any plan work in this repo — so its round-over-round
    drift measures the BOX (scheduler load, page cache, cpufreq), not
    the code. Regression calls on the query series should be made on
    canary-normalized ratios; the r5→r6 series swung ±35% uniformly on
    identical plans, which a canary would have attributed to the machine
    in one glance."""
    from pyspark.sql import functions as F

    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = spark.read.parquet(str(Path(sf_dir) / "lineitem.parquet"))
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


# The production ANN deployment path (r9 VERDICT #6): a second recorded
# lane so BENCH_r{N} tracks the stored-index serve queries round-over-
# round, not just the r3-era headline set. Index builds happen in the
# warm-up pass (ensure() memoizes into $SPARK_GRAFT_INDEX_DIR — later
# runs reuse the committed snapshots); timings below are pure serve.
SERVE_LANE = (
    "emb_ivf_serve",
    "emb_ivfpq_serve_lean_cos",
    "emb_ivfpq_serve_rerank",
    "emb_ivfpq_delete_serve",
    # r11: the stored ROUTED index (cells ∝ n + persisted router) —
    # additive lane member; earlier rounds' per-query values stay
    # comparable, the lane total gains this row from r11 on
    "emb_ivf_routed_serve",
    # r12: the routed tier's tombstone-aware serve (grow-then-shrink
    # lifecycle root) — additive from r12 on, same comparability note
    "emb_ivf_routed_delete_serve",
)


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

    canary_pre = _canary(spark, sf_dir)

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, q in headline_queries().items():
        rs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(q.fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 4))
        runs[name] = rs
        timings[name] = round(min(rs), 3)

    canary_post = _canary(spark, sf_dir)

    # serve lane: pre-build the stored indexes at THIS sf (one untimed
    # pass — ensure() + plan warm), then min-of-3 pure-serve timings
    aq = all_queries()
    serve_timings: dict[str, float] = {}
    serve_runs: dict[str, list[float]] = {}
    for name in SERVE_LANE:
        _force(aq[name].fn(spark, sf_dir))
    serve_canary_pre = _canary(spark, sf_dir)
    for name in SERVE_LANE:
        rs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(aq[name].fn(spark, sf_dir))
            rs.append(round(time.perf_counter() - t0, 4))
        serve_runs[name] = rs
        serve_timings[name] = round(min(rs), 3)
    serve_canary_post = _canary(spark, sf_dir)

    canary_best = round(min(canary_pre + canary_post), 4)
    serve_canary_best = round(
        min(serve_canary_pre + serve_canary_post), 4
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                # canary-normalized ratios (VERDICT r11 #7): query_min /
                # canary_best — the cross-round comparable number. Raw
                # seconds move with the box; these move with the plan.
                "ratios": {
                    n: round(t / canary_best, 3) for n, t in timings.items()
                },
                "sf": sf,
                # per-query all-3 raw timings: spread within a triple is
                # in-process interference; spread between rounds at equal
                # canary is a real plan delta
                "runs": runs,
                # box-state canary before and after the measured block
                # (min is the comparable statistic; pre/post disagreement
                # means the box changed state mid-bench)
                "canary": {
                    "task": "lineitem full-scan 4-agg",
                    "pre": canary_pre,
                    "post": canary_post,
                    "best": canary_best,
                },
                # production stored-index serve path (indexes pre-built
                # in the untimed warm pass; see SERVE_LANE note above)
                "serve_lane": {
                    "total": round(sum(serve_timings.values()), 3),
                    "queries": serve_timings,
                    "ratios": {
                        n: round(t / serve_canary_best, 3)
                        for n, t in serve_timings.items()
                    },
                    "runs": serve_runs,
                    "canary": {
                        "pre": serve_canary_pre,
                        "post": serve_canary_post,
                        "best": serve_canary_best,
                    },
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
