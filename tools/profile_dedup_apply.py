"""Controlled phase decomposition of docs_dedup_apply (r6 VERDICT #2).

The driver bench series showed 1.80 -> 1.99 -> 3.14 s across rounds with
no plan change the audits could blame; this tool decides machine-state
vs plan cost by DATA: it times each phase of the dedup pipeline
separately (min-of-N), brackets the measurement with the same fixed
box-state canary bench.py emits, and prints one JSON line for the
record. Phases:

  canary        fixed lineitem full-scan 4-agg (box state, code-free)
  signatures    tokens -> shingles -> md5 -> 16 min-aggs (one shuffle)
  edges         + band explode + self-join + est_jaccard filter
  cc            connected components given the edges (checkpoint + rounds)
  full          the registered docs_dedup_apply end to end
  residual      full - (edges + cc interior) ~ final doc semi-join

Usage: python tools/profile_dedup_apply.py [--sf-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from projekt_data_engineering_iubh_spark.catalog import load_table  # noqa: E402
from projekt_data_engineering_iubh_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from projekt_data_engineering_iubh_spark.plans import text_queries as tq  # noqa: E402
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf = args.sf_dir

    spark = get_spark("profile-dedup-apply")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: plans compiled, codegen cached, parquet footers read
    _force(tq.docs_dedup_apply(spark, "/root/testdata/sf0.001"))

    def canary():
        _force(
            spark.read.parquet(str(Path(sf) / "lineitem.parquet")).agg(
                F.sum("l_quantity"),
                F.sum("l_extendedprice"),
                F.avg("l_discount"),
                F.count(F.lit(1)),
            )
        )

    def edges_df():
        return tq._lsh_pairs(spark, sf, max_bucket=None).filter(
            F.col("est_jaccard") >= 0.5
        )

    out: dict = {"sf_dir": sf, "reps": args.reps}
    out["canary_pre"] = _best(canary, args.reps)
    out["signatures"] = _best(lambda: _force(tq._signatures(spark, sf)), args.reps)
    out["edges"] = _best(lambda: _force(edges_df()), args.reps)

    def cc_only():
        d = load_table(spark, sf, "documents")
        stats: dict = {}
        comp = connected_components(
            d.select("doc_id"),
            edges_df(),
            id_col="doc_id",
            src_col="doc_a",
            dst_col="doc_b",
            component_col="cluster_id",
            stats=stats,
        )
        _force(comp)
        out["cc_rounds"] = stats.get("rounds")

    out["edges_plus_cc"] = _best(cc_only, args.reps)
    out["full"] = _best(
        lambda: _force(tq.docs_dedup_apply(spark, sf)), args.reps
    )
    out["canary_post"] = _best(canary, args.reps)
    out["cc_interior"] = round(out["edges_plus_cc"] - out["edges"], 3)
    out["final_join_residual"] = round(out["full"] - out["edges_plus_cc"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
