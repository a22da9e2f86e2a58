"""Build a LARGE-VOCABULARY synthetic documents table for BPE training
measurement (r8 VERDICT #3).

The driver fixture's documents table has only 31 distinct words, so the
r8 BPE cost curve measured pure scheduling overhead — the checkpoint
cadence lever exists for DATA-SIZED segmentation frames and was
unmeasured in that regime. This tool generates a corpus whose
word-count table is ≥50k distinct words with Zipf-like skew and real
morphological structure (shared stems + a small suffix pool), which is
the regime where per-round pair-stats aggregates and merge folds touch
frames that no longer fit in a single task comfortably.

Everything is deterministic Spark expressions (xxhash64-seeded), no
driver-side data generation; the vocabulary table is V rows built from
spark.range. Word shape: 4-letter base-26 stem + one of 8 suffixes
('', s, ed, ing, er, est, ly, ion) — suffix mass is what makes early
BPE merges meaningful (the 'est'/'ing' merges the toy corpus pins).

Usage:
    python tools/make_bpe_corpus.py [--out /tmp/bpe_bigvocab]
        [--vocab 60000] [--docs 20000] [--words-per-doc 60] [--verify 8]

--verify N: after writing, recompute word counts, run BOTH the engine
trainer (operators/bpe.py) and the pure-Python reference
(tests/test_bpe.py::_ref_bpe — the same pin the unit suite uses) for N
merges and assert the learned sequences are IDENTICAL. The word-count
pull to the driver is a tool-only verification collect (vocab-sized,
never part of an engine plan).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
sys.path.insert(0, str(_REPO / "tests"))

from pyspark.sql import functions as F  # noqa: E402

from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402

SUFFIXES = ["", "s", "ed", "ing", "er", "est", "ly", "ion"]


def build(spark, out: str, vocab: int, docs: int, wpd: int) -> None:
    # vocabulary: wid -> stem+suffix. stem is base-26 of a Knuth-scattered
    # (wid // 8) — without the scatter, Zipf-frequent low ids all share an
    # 'aaaa' prefix and the early merges degenerate into one run-merge
    # chain; 8 consecutive ids share a stem and differ by suffix, the
    # morphology BPE merges exploit.
    stem_id = F.pmod(
        (F.col("id") / 8).cast("long") * F.lit(2654435761), F.lit(26**4)
    )
    chars = [
        F.char(
            (F.floor(stem_id / (26**i)) % 26 + 97).cast("int")
        )
        for i in range(3, -1, -1)
    ]
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in SUFFIXES]),
        (F.col("id") % 8).cast("int") + 1,
    )
    voc = spark.range(vocab).select(
        F.col("id").alias("wid"),
        F.concat(*chars, suffix).alias("word"),
    )

    # token stream: (doc_id, pos) -> Zipf-ish wid via cubed uniform
    toks = (
        spark.range(docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(wpd - 1))).alias("pos"),
        )
        .withColumn(
            "u",
            (
                F.pmod(
                    F.xxhash64(
                        F.col("doc_id") * wpd + F.col("pos"), F.lit(42)
                    ),
                    F.lit(1_000_000),
                )
                / 1_000_000.0
            ),
        )
        .withColumn(
            "wid",
            F.floor(
                F.lit(float(vocab)) * F.col("u") * F.col("u") * F.col("u")
            ).cast("long"),
        )
    )
    text = (
        toks.join(voc, "wid")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda s: s["word"],
                ),
            ).alias("text")
        )
        .select("doc_id", "text", F.lit("bpe_bigvocab").alias("source"))
    )
    text.repartition(8).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bpe_bigvocab")
    ap.add_argument("--vocab", type=int, default=60_000)
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--words-per-doc", type=int, default=60)
    ap.add_argument("--verify", type=int, default=0, metavar="N_MERGES")
    args = ap.parse_args()

    spark = get_spark("make_bpe_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build(spark, args.out, args.vocab, args.docs, args.words_per_doc)

    from projekt_data_engineering_iubh_spark.operators import bpe

    d = spark.read.parquet(f"{args.out}/documents.parquet")
    wc = bpe.word_counts(d)
    n_vocab = wc.count()
    report = {
        "out": args.out,
        "docs": d.count(),
        "distinct_words": n_vocab,
        "build_sec": round(time.time() - t0, 3),
    }

    if args.verify:
        from test_bpe import _ref_bpe  # the unit suite's reference pin

        counts = {r["word"]: r["n"] for r in wc.collect()}
        t1 = time.time()
        ref_merges, _ = _ref_bpe(counts, args.verify)
        t2 = time.time()
        eng_merges, _ = bpe.bpe_train(d, args.verify)
        report.update(
            {
                "verify_merges": args.verify,
                "sequences_match": eng_merges == ref_merges,
                "ref_sec": round(t2 - t1, 3),
                "engine_sec": round(time.time() - t2, 3),
                "first_merges": eng_merges[:5],
            }
        )
        if eng_merges != ref_merges:
            print(json.dumps(report))
            print("MISMATCH", file=sys.stderr)
            return 1

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
