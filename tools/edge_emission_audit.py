"""Capped-vs-uncapped LSH edge-emission audit (r7 headroom #1).

The probe-gated text path (plans/text_queries.py::_max_band_occupancy)
re-enables the uncapped plan — which applies the earlier_bands_disagree
dedup predicate, emitting each candidate pair ONCE — whenever no band
bucket exceeds LSH_MAX_BUCKET. The capped plan may emit a pair once per
agreeing band (the dedup predicate is unsound under capping; the CC
consumer is multigraph-safe either way). This audit measures what is
actually at stake in bytes at each scale: emitted edge rows, distinct
pairs, and the duplication factor, for both plans.

Usage: python tools/edge_emission_audit.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 /root/testdata/sf0.1 (add /tmp/sf1 —
build with tools/make_sf1.py — for the 10x point). Results → BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from projekt_data_engineering_iubh_spark.plans.text_queries import (
    LSH_MAX_BUCKET,
    _lsh_pairs,
    _max_band_occupancy,
)
from projekt_data_engineering_iubh_spark.session import get_spark


def audit(spark, sf_dir: str) -> dict:
    occ = _max_band_occupancy(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir, "max_band_occupancy": occ,
                 "cap": LSH_MAX_BUCKET}
    for label, cap in (("uncapped", None), ("capped", LSH_MAX_BUCKET)):
        t0 = time.perf_counter()
        pairs = _lsh_pairs(spark, sf_dir, max_bucket=cap)
        row = pairs.agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("doc_a", "doc_b").alias("pairs"),
        ).first()
        out[label] = {
            "emitted_rows": row["rows"],
            "distinct_pairs": row["pairs"],
            "dup_factor": round(row["rows"] / max(row["pairs"], 1), 4),
            "sec": round(time.perf_counter() - t0, 3),
        }
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark("edge-emission-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        print(json.dumps(audit(spark, d)))
    spark.stop()


if __name__ == "__main__":
    main()
