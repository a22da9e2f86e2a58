"""Dump ``explain("formatted")`` for registry queries to plans/r14/.

Optimization-round evidence artifact: one ``<query>_<tag>.txt`` per query
(tag = before/after), at the bench scale so the plan matches what the
driver times. Usage:

    python tools/dump_plans.py --tag before [--sf-dir /root/testdata/sf0.1] \
        [query ...]            # default: headline + serve lane
    python tools/dump_plans.py --tag before --all   # every driver entry
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from projekt_data_engineering_iubh_spark.plans import all_queries  # noqa: E402
from projekt_data_engineering_iubh_spark.plans.registry import (  # noqa: E402
    driver_queries,
)
from projekt_data_engineering_iubh_spark.session import get_spark  # noqa: E402

SERVE_LANE = (
    "emb_ivf_serve",
    "emb_ivfpq_serve_lean_cos",
    "emb_ivfpq_serve_rerank",
    "emb_ivfpq_delete_serve",
    "emb_ivf_routed_serve",
    "emb_ivf_routed_delete_serve",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--all", action="store_true", dest="all_driver")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    aq = all_queries()
    if args.queries:
        names = args.queries
    elif args.all_driver:
        names = sorted(set(driver_queries()) | set(SERVE_LANE))
    else:
        names = [n for n, q in aq.items() if q.headline] + list(SERVE_LANE)

    out_dir = Path(args.out or Path(__file__).resolve().parent.parent / "plans" / "r14")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = aq[name].fn(spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.tag}.txt"
        path.write_text(
            f"# {name} @ {args.sf_dir} ({args.tag})\n\n{text}"
        )
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
