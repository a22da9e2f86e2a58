"""One-table ANN method comparison: latency + recall@10 for every
registered ANN variant against the brute-force truth, same query set,
same scale — the judgment artifact ("which index do I deploy?") the
per-method registry entries imply but never line up side by side.

Methods: brute (truth), IVF flat / multiprobe / trained, PQ-ADC /
trained-PQ, Hamming-sketch prefilter. All are the REGISTERED plans —
this measures exactly what the oracle verifies, no variant drift.
Latency is min-of-3 of a full materialization (count of the top-k
output); recall@10 is |method∩truth| / |truth| over the shared
_IVF_QUERIES query ids.

Usage: python tools/ann_method_matrix.py [--sf-dir /root/testdata/sf0.1]
Prints one JSON line (recorded in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from projekt_data_engineering_iubh_spark.plans import all_queries  # noqa: E402
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402

# name -> the metric the method RANKS by. recall@10 against the
# brute-force COSINE truth is the deployment lens for the cosine
# rankers; the PQ rows rank by L2-ADC distance (their registry purpose
# is quantization-error measurement — abs_err in their own output) and
# the Hamming row ranks by sketch distance whose tie bands at 60 planes
# make direct top-10 a prefilter lens, not a ranker lens (see the #111
# economics section in BASELINE.md) — their low cosine-recall here is a
# METRIC statement, not a defect.
METHODS = {
    "emb_knn_brute": "cosine (truth)",
    "emb_ivf_ann": "cosine",
    "emb_ivf_ann_multiprobe": "cosine",
    "emb_ivf_ann_trained": "cosine",
    "emb_pq_adc": "l2_adc",
    "emb_pq_adc_trained": "l2_adc",
    "emb_ivfpq_residual": "l2_adc (nprobe=2, residual codes)",
    "emb_hamming_ann": "hamming_sketch",
    # r8 build/serve split: the serve halves answer from the committed
    # snapshot-store index. The FIRST timing run pays the (memoized)
    # build, so min-of-runs is the pure serve latency — the deployment
    # number the split exists for.
    "emb_ivf_serve": "cosine (stored index)",
    "emb_ivfpq_serve": "l2_adc (stored index, nprobe=2)",
    "emb_ivfpq_serve_lean": "l2_adc (stored codes ONLY — production serve)",
    # r9: the cosine-faithful lean serve — unit-normalized index, so
    # L2-ADC order == cosine order; this row is graded as a RANKER
    # (recall@10 target: within 0.1 of IVF-flat at the same nprobe)
    "emb_ivfpq_serve_lean_cos": "cosine-as-l2_adc (normalized stored codes)",
    # r9: lean cos serve + exact refine over the ADC top-100 shortlist —
    # the production deployment shape (recall == shortlist coverage)
    "emb_ivfpq_serve_rerank": "exact cosine over ADC shortlist (refine)",
}
K = 10


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("ann_method_matrix")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def topk(name: str) -> set[tuple[int, int]]:
        df = qs[name].fn(spark, args.sf_dir).filter(f"rn <= {K}")
        return {
            (r.query_id, r.neighbor_id)
            for r in df.select("query_id", "neighbor_id").collect()
        }

    truth = topk("emb_knn_brute")
    n_truth = len(truth)

    rows = {}
    for name in METHODS:
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            qs[name].fn(spark, args.sf_dir).count()
            times.append(time.time() - t0)
        got = topk(name)
        rows[name] = {
            "sec": round(min(times), 3),
            "ranking_metric": METHODS[name],
            "recall_at_10_vs_cosine": round(
                len(got & truth) / n_truth, 3
            ),
        }

    print(
        json.dumps(
            {"sf_dir": args.sf_dir, "k": K, "n_truth_pairs": n_truth,
             "methods": rows}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
