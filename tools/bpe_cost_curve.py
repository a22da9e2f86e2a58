"""Per-round cost curve for BPE training to a vocabulary budget.

The question r7's VERDICT asked: a real tokenizer needs hundreds of
merge rounds and each round is a driver-sequenced action
(operators/bpe.py::bpe_train) — does round cost stay flat as the merge
count grows, or does lineage/segmentation growth bend the curve? This
measures it: wall time per round (via the on_round hook) for
``--merges`` rounds at ``--sf-dir``, for one or more checkpoint
cadences, plus the one-off corpus pass (word counts + initial
segmentation checkpoint).

Expected shape (and what BASELINE.md records): cost per round is one
vocabulary-sized pair-stats aggregate + a 1-row collect + a map-side
fold — flat in the round index as long as checkpointing truncates the
fold-upon-fold lineage; a cadence of "never" shows the divergence the
default cadence exists to prevent.

Usage: python tools/bpe_cost_curve.py [--sf-dir /root/testdata/sf0.1]
       [--merges 32] [--checkpoint-every 4 8 1000000]
Prints one JSON line per cadence.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from projekt_data_engineering_iubh_spark.catalog import load_table  # noqa: E402
from projekt_data_engineering_iubh_spark.operators import bpe  # noqa: E402
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--merges", type=int, default=32)
    ap.add_argument(
        "--checkpoint-every", type=int, nargs="+", default=[4]
    )
    args = ap.parse_args()

    spark = get_spark("bpe_cost_curve")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, args.sf_dir, "documents")
    vocab = bpe.word_counts(docs).count()

    for cadence in args.checkpoint_every:
        marks = [time.time()]

        def on_round(i, merge, _marks=marks):
            _marks.append(time.time())

        t0 = time.time()
        merges, seg = bpe.bpe_train(
            docs,
            args.merges,
            checkpoint_every=cadence,
            on_round=on_round,
        )
        seg.count()  # materialize the final frame
        total = time.time() - t0
        per_round = [
            round(b - a, 3) for a, b in zip(marks, marks[1:])
        ]
        print(
            json.dumps(
                {
                    "sf_dir": args.sf_dir,
                    "vocab_words": vocab,
                    "merges_learned": len(merges),
                    "checkpoint_every": cadence,
                    "total_sec": round(total, 3),
                    "per_round_sec": per_round,
                    "first4_mean": round(
                        sum(per_round[:4]) / max(len(per_round[:4]), 1), 3
                    ),
                    "last4_mean": round(
                        sum(per_round[-4:]) / max(len(per_round[-4:]), 1), 3
                    ),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
