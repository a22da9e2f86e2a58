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


def _shuffle_canary(spark) -> list[float]:
    """Second canary CLASS (r13, VERDICT r12 #1): a constant synthetic
    shuffle+window micro-task — 200k rows over 1k keys, per-key
    row_number window then groupBy — exercising the shuffle write/read
    path and the scheduler, which the scan-agg canary (CPU + page
    cache) does not. The r12→r13 adjudication showed the scan canary
    alone under-models box state for shuffle-heavy queries; regression
    calls should check the query against the MATCHING canary class.
    No repo plan code is touched, so drift measures the box."""
    from pyspark.sql import Window, functions as F

    out = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = spark.range(200_000).select(
            (F.col("id") % 1000).alias("k"),
            (F.col("id") * 2654435761 % 1_000_003).alias("v"),
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


def _cpu_probe(spark) -> "object":
    """Scaling-legible CPU probe (r14, VERDICT r13 #2b): a fixed-shape,
    fixed-64-partition md5-chain over a constant synthetic range — no
    input data, no shuffle, (almost) pure executor CPU. Unlike the
    headline queries, whose sf0.1 cost is the per-job scheduler/codegen
    floor (their 8-vs-32-core ratios sit at ~1 and made PERF's scaling
    heuristic conclude the bench ignores $SPARK_GRAFT_CPUS), this row's
    wall time is work/cores: 64 constant partitions run as 2 waves on
    local[32] and 8 waves on local[8], so its 8-vs-32 ratio ≈ the core
    ratio whenever the env var is honored. Timed exactly like a query
    (noop sink, min-of-3) and ADDED to the queries dict from r14 on —
    `value_probe_free` preserves the r1–r13-comparable headline total."""
    from pyspark.sql import functions as F

    df = spark.range(0, 8_000_000, 1, 64)
    h = F.col("id").cast("string")
    for _ in range(4):
        h = F.md5(h)
    # map-side-combined scalar agg: the only shuffle is 64 partial rows
    return df.select(F.substring(h, 1, 8).alias("h8")).agg(
        F.count(F.lit(1)).alias("n"), F.max("h8").alias("mx")
    )


CPU_PROBE_NAME = "cpu_probe_fixed64"


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


# ---------------------------------------------------------------------------
# Streaming micro-lane (r13, VERDICT r12 #6): ten streaming modules were
# correctness-pinned but performance-invisible — no BENCH row ever
# tracked trigger latency/throughput, so a 2x ingest regression would
# ship silently. Three representative tiers run a fixed N-trigger drive
# each: the stateful sessionizer (applyInPandasWithState — the Python
# state path), the watermarked hourly rollup (SQL-native streaming agg
# + idempotent sink), and the IVF-PQ codes ingest (the ANN append
# lifecycle). Sizes are CONSTANT (not sf-scaled) so round-over-round
# numbers compare; the lane is canary-bracketed like the others.
# ---------------------------------------------------------------------------

STREAM_TRIGGERS = 4


def _trigger_stats(q) -> dict:
    """rows/s + per-trigger walls from the query's own progress events
    (data-carrying triggers only; staging cost excluded)."""
    rows, walls = 0, []
    for p in q.recentProgress:
        n = p.get("numInputRows") or 0
        if not n:
            continue
        ms = (p.get("durationMs") or {}).get("triggerExecution") or 0
        rows += n
        walls.append(ms)
    walls.sort()
    secs = sum(walls) / 1000.0
    return {
        "input_rows": rows,
        "triggers": len(walls),
        "trigger_exec_sec": round(secs, 3),
        "p50_trigger_ms": walls[len(walls) // 2] if walls else None,
        "rows_per_sec": round(rows / secs) if secs else None,
    }


def _stage_drop(df, src_dir: str, name: str) -> None:
    """Land one parquet drop file atomically (stage + rename)."""
    import glob
    import shutil

    staging = os.path.join(src_dir, f".stage_{name}")
    df.coalesce(1).write.parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.replace(part, os.path.join(src_dir, f"{name}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)


def _bench_sessionize(spark, work: str) -> dict:
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.streaming.sessionize_stream import (
        sessionize_stream,
    )

    src = os.path.join(work, "src")
    os.makedirs(src)
    per, machines = 40, 256  # 40 events x 256 machines = 10,240 rows/trigger

    def batch(t: int):
        return spark.range(machines * per).select(
            F.format_string("M%03d", (F.col("id") % machines).cast("int")).alias(
                "machine_id"
            ),
            (
                F.to_timestamp(F.lit("2024-08-01 00:00:00"))
                + F.make_interval(
                    secs=(t * per + F.col("id") / machines).cast("int")
                )
            ).alias("event_timestamp"),
            F.when(
                (F.col("id") / machines).cast("int") % 2 == 0, "Cycle_Start"
            )
            .otherwise("Cycle_End")
            .alias("event_name"),
        )

    stream = spark.readStream.schema(
        "machine_id string, event_timestamp timestamp, event_name string"
    ).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    try:
        for t in range(STREAM_TRIGGERS):
            _stage_drop(batch(t), src, f"b{t}")
            q.processAllAvailable()
        stats = _trigger_stats(q)
    finally:
        q.stop()
    return {"tier": "sessionize_stream", **stats}


def _bench_hourly(spark, work: str) -> dict:
    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.streaming.hourly_stream import (
        hourly_rollup_stream,
        write_idempotent_hourly,
    )

    src = os.path.join(work, "src")
    os.makedirs(src)
    rows = 10_000  # per trigger; ts advances 2h/trigger so windows close

    def batch(t: int):
        return spark.range(rows).select(
            (
                F.to_timestamp(F.lit("2024-08-01 00:00:00"))
                + F.make_interval(
                    secs=(t * 7200 + F.col("id") % 7200).cast("int")
                )
            ).alias("ts"),
            (F.col("id") % 500).cast("int").alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("purchase"), F.lit("error")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
        )

    stream = spark.readStream.schema(
        "ts timestamp, user_id int, event_type string, value double"
    ).parquet(src)
    out_dir = os.path.join(work, "out")
    q = (
        hourly_rollup_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: write_idempotent_hourly(df, bid, out_dir)
        )
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    try:
        for t in range(STREAM_TRIGGERS):
            _stage_drop(batch(t), src, f"b{t}")
            q.processAllAvailable()
        stats = _trigger_stats(q)
    finally:
        q.stop()
    return {"tier": "hourly_stream", **stats}


def _bench_codes_ingest(spark, work: str) -> dict:
    """IVF-PQ codes ingest over the sf0.001 corpus: bootstrap trains on
    the first half (untimed one-off), then each trigger commits one
    O(delta) append generation. numInputRows counts both source scans
    the processor performs (empty pre-check + encode), so rows/s here is
    a consistent round-over-round index, not absolute delivered rows."""
    from pyspark.sql import Window, functions as F

    from projekt_data_engineering_iubh_spark.catalog import load_table
    from projekt_data_engineering_iubh_spark.streaming.ann_ingest_stream import (
        bootstrap_codes_index,
        start_codes_ingest_stream,
    )

    embs = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .withColumn("rk", F.row_number().over(Window.orderBy("vec_id")) - 1)
        .select("vec_id", "embedding", "rk")
        .localCheckpoint(eager=True)
    )
    n = embs.count()
    half = n // 2
    root = os.path.join(work, "root")
    bootstrap_codes_index(
        spark,
        embs.filter(F.col("rk") < half).select("vec_id", "embedding"),
        root,
    )
    src = os.path.join(work, "src")
    os.makedirs(src)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(src)
    q = start_codes_ingest_stream(
        stream, os.path.join(work, "ckpt"), root
    )
    step = (n - half) // STREAM_TRIGGERS or 1
    try:
        lo = half
        for t in range(STREAM_TRIGGERS):
            hi = n if t == STREAM_TRIGGERS - 1 else min(lo + step, n)
            _stage_drop(
                embs.filter(
                    (F.col("rk") >= lo) & (F.col("rk") < hi)
                ).select("vec_id", "embedding"),
                src,
                f"b{t}",
            )
            lo = hi
            q.processAllAvailable()
        stats = _trigger_stats(q)
    finally:
        q.stop()
    return {"tier": "codes_ingest_stream", **stats}


def _stream_lane(spark) -> dict:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bench_stream_")
    lane = {}
    try:
        for name, fn in (
            ("sessionize", _bench_sessionize),
            ("hourly", _bench_hourly),
            ("codes_ingest", _bench_codes_ingest),
        ):
            sub = os.path.join(work, name)
            os.makedirs(sub)
            lane[name] = fn(spark, sub)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return lane


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
    shuffle_pre = _shuffle_canary(spark)

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

    # scaling-legible CPU probe row (r14): additive queries entry, same
    # noop/min-of-3 methodology — see _cpu_probe
    probe_rs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _force(_cpu_probe(spark))
        probe_rs.append(round(time.perf_counter() - t0, 4))
    runs[CPU_PROBE_NAME] = probe_rs
    timings[CPU_PROBE_NAME] = round(min(probe_rs), 3)

    shuffle_post = _shuffle_canary(spark)
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

    # streaming micro-lane, bracketed by BOTH canary classes (the
    # stream tiers are shuffle/scheduler-bound, so the shuffle canary
    # is their matching class)
    stream_shuf_pre = _shuffle_canary(spark)
    stream_scan_pre = _canary(spark, sf_dir)
    stream_lane = _stream_lane(spark)
    stream_shuf_post = _shuffle_canary(spark)
    stream_scan_post = _canary(spark, sf_dir)

    canary_best = round(min(canary_pre + canary_post), 4)
    serve_canary_best = round(
        min(serve_canary_pre + serve_canary_post), 4
    )
    # r1–r13-comparable headline total: the cpu probe row (r14) is a
    # constant-work scaling reference, not corpus work — exclude it here
    value_probe_free = round(
        sum(v for k, v in timings.items() if k != CPU_PROBE_NAME), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "value_probe_free": value_probe_free,
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
                    # second canary class (r13): shuffle+window micro-
                    # task — normalize shuffle-heavy queries against
                    # THIS one (the r12→r13 adjudication found the
                    # scan canary alone under-models box state)
                    "shuffle_task": "200k-row window+groupBy shuffle",
                    "shuffle_pre": shuffle_pre,
                    "shuffle_post": shuffle_post,
                    "shuffle_best": round(
                        min(shuffle_pre + shuffle_post), 4
                    ),
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
                # streaming micro-lane (r13): fixed-size N-trigger
                # drives; compare rows_per_sec / p50_trigger_ms against
                # the shuffle-canary-normalized band across rounds
                "stream_lane": {
                    **stream_lane,
                    "canary": {
                        "scan_pre": stream_scan_pre,
                        "scan_post": stream_scan_post,
                        "shuffle_pre": stream_shuf_pre,
                        "shuffle_post": stream_shuf_post,
                        "scan_best": round(
                            min(stream_scan_pre + stream_scan_post), 4
                        ),
                        "shuffle_best": round(
                            min(stream_shuf_pre + stream_shuf_post), 4
                        ),
                    },
                },
            }
        )
    )
    # Compact contract line, printed LAST (r14, VERDICT r13 #2a): the
    # driver records a bounded TAIL of stdout, and by r12 the full
    # payload line above had grown past it — BENCH_r12.json came back
    # `parsed: null` because the line was truncated at the FRONT and the
    # round-over-round comparison was lost. Everything the cross-round
    # contract needs (metric/value/queries/ratios/sf/canary bests, lane
    # summaries) is therefore re-emitted in one SHORT final line that
    # survives any tail window; the full line above keeps the r1–r13
    # detail (runs, canary triples, lane runs) for when it fits.
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "value_probe_free": value_probe_free,
                "unit": "sec",
                "queries": timings,
                "ratios": {
                    n: round(t / canary_best, 3) for n, t in timings.items()
                },
                "sf": sf,
                "canary": {
                    "best": canary_best,
                    "shuffle_best": round(min(shuffle_pre + shuffle_post), 4),
                },
                "serve_lane": {
                    "total": round(sum(serve_timings.values()), 3),
                    "queries": serve_timings,
                    "ratios": {
                        n: round(t / serve_canary_best, 3)
                        for n, t in serve_timings.items()
                    },
                    "canary": {"best": serve_canary_best},
                },
                "stream_lane": {
                    tier: {
                        k: v
                        for k, v in stats.items()
                        if k in (
                            "input_rows",
                            "triggers",
                            "trigger_exec_sec",
                            "p50_trigger_ms",
                            "rows_per_sec",
                        )
                    }
                    for tier, stats in stream_lane.items()
                },
                "compact": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
