"""Interleaved A/B of the shared-signature cache (r7 headroom #2).

Times the signature-consuming query family (docs_minhash_lsh_pairs →
docs_dedup_apply, the two headline queries that recompute signatures)
with spark.graft.shareSignatures off vs on, interleaved OFF/ON per round
so box-state drift hits both arms equally (r7 fact #4: always interleave
A/B on a shared box). The ON arm's first consumer pays the persist
materialization; the win is every consumer after it.

Usage: python tools/sig_share_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from projekt_data_engineering_iubh_spark.plans import text_queries as tq
from projekt_data_engineering_iubh_spark.session import get_spark


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def family(spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    _force(tq.docs_minhash_lsh_pairs(spark, sf_dir))
    _force(tq.docs_dedup_apply(spark, sf_dir))
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("sig-share-ab")
    spark.sparkContext.setLogLevel("ERROR")
    family(spark, "/root/testdata/sf0.001")  # warm-up

    off, on = [], []
    for _ in range(rounds):
        spark.conf.set("spark.graft.shareSignatures", "false")
        off.append(family(spark, sf_dir))
        spark.conf.set("spark.graft.shareSignatures", "true")
        on.append(family(spark, sf_dir))
        # drop the persisted frame between rounds so every ON round pays
        # its own materialization (measures the steady per-session win,
        # not a warm cache from the previous round)
        for k in list(tq._SIG_SHARE_CACHE):
            tq._SIG_SHARE_CACHE.pop(k).unpersist()
    print({"sf_dir": sf_dir, "off": off, "on": on,
           "off_min": min(off), "on_min": min(on)})
    spark.stop()


if __name__ == "__main__":
    main()
