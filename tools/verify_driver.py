"""Driver-contract simulation: what the external verification driver does,
runnable locally in one command.

Creates a VANILLA SparkSession (no engine confs — prepare_session must
rescue it, exactly like the real driver), smoke-checks entry(), then runs
selected queries() against their oracle_sql() on DuckDB at the driver's
correctness scale (sf0.01).

Usage:
    python tools/verify_driver.py                       # core smoke set
    python tools/verify_driver.py q1_pricing_summary docs_dedup_apply
    python tools/verify_driver.py --all                 # every driver entry
    python tools/verify_driver.py --tz America/New_York # non-UTC probe
    python tools/verify_driver.py --changed-since main --sf-dir /tmp/sf1

--changed-since <git-ref> (r8) makes the full-registry scale sweep
diff-aware: it maps the files changed since <ref> (committed AND
working-tree) onto registry entries through the package's import graph
and sweeps only those — the full 142-query sf1 sweep costs ~55 min,
while a typical one-module change touches a handful of entries. Shared
infrastructure (catalog/session/functions/registry/__spark_entry__/
oracle_harness) falls back to the full registry, because every entry
depends on it.

Exit 0 iff everything matches.
"""

from __future__ import annotations

import argparse
import ast
import os
import pathlib
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

CORE = [
    "q1_pricing_summary",
    "events_flagship_session_rollup",
    "docs_minhash_lsh_pairs",
    "docs_dedup_apply",
    "emb_knn_brute",
    "emb_lsh_ann_pairs",
]


_PKG = "projekt_data_engineering_iubh_spark"

# Files every registry entry depends on: a change here invalidates the
# whole registry, so the subset selection falls back to --all.
_SHARED_FILES = {"__spark_entry__.py", "tests/oracle_harness.py"}
_SHARED_MODULE_PREFIXES = (
    f"{_PKG}.catalog",
    f"{_PKG}.session",
    f"{_PKG}.functions",
    f"{_PKG}.plans.registry",
    f"{_PKG}.plans.__init__",
    f"{_PKG}.__init__",
)


def _module_of(rel_path: str) -> str | None:
    if not rel_path.startswith(_PKG + "/") or not rel_path.endswith(".py"):
        return None
    return rel_path[:-3].replace("/", ".")


def _package_import_graph() -> dict[str, set[str]]:
    """module -> package-internal modules it imports (AST, no execution)."""
    deps: dict[str, set[str]] = {}
    for py in pathlib.Path(_REPO, _PKG).rglob("*.py"):
        rel = py.relative_to(_REPO).as_posix()
        mod = _module_of(rel)
        if mod is None:
            continue
        s: set[str] = set()
        for node in ast.walk(ast.parse(py.read_text())):
            if isinstance(node, ast.Import):
                s.update(a.name for a in node.names if a.name.startswith(_PKG))
            elif isinstance(node, ast.ImportFrom):
                target = node.module or ""
                if node.level:
                    base = mod.split(".")[: -node.level]
                    target = ".".join(base + ([target] if target else []))
                if target.startswith(_PKG):
                    s.add(target)
                    # `from pkg.operators import zorder` names a MODULE in
                    # node.names; record both interpretations (the
                    # non-module one is harmlessly absent from the graph)
                    s.update(f"{target}.{a.name}" for a in node.names)
        deps[mod] = s
    return deps


def _changed_selection(ref: str) -> tuple[list[str] | None, str]:
    """Registry names affected by files changed since ``ref``.

    Returns (names, rationale); names=None means fall back to the full
    registry (shared infra changed).
    """
    out = subprocess.run(
        ["git", "diff", "--name-only", ref, "--"],
        capture_output=True,
        text=True,
        cwd=_REPO,
        check=True,
    ).stdout.split()
    changed_py = [f for f in out if f.endswith(".py")]
    if any(f in _SHARED_FILES for f in changed_py):
        return None, "shared driver-contract file changed -> full registry"
    changed_mods = {m for m in map(_module_of, changed_py) if m}
    # __init__.py maps to pkg.sub.__init__; normalize to the package name
    changed_mods |= {
        m.removesuffix(".__init__") for m in list(changed_mods)
    }
    if any(
        m.startswith(_SHARED_MODULE_PREFIXES) or m in (_PKG, f"{_PKG}.plans")
        for m in changed_mods
    ):
        return None, "shared package module changed -> full registry"
    if not changed_mods:
        return [], "no package modules changed"

    deps = _package_import_graph()
    affected = set(changed_mods)
    # fixpoint: X is affected if it imports an affected module (by exact
    # name or as a parent package)
    while True:
        grew = False
        for mod, ds in deps.items():
            if mod in affected:
                continue
            if any(
                d == a or d.startswith(a + ".") or a.startswith(d + ".")
                for d in ds
                for a in affected
            ):
                affected.add(mod)
                grew = True
        if not grew:
            break

    from projekt_data_engineering_iubh_spark.plans.registry import all_queries

    names = [
        n for n, q in all_queries().items() if q.fn.__module__ in affected
    ]
    rationale = (
        f"changed modules: {sorted(changed_mods)} -> affected plans "
        f"modules: {sorted(m for m in affected if m.startswith(_PKG + '.plans'))}"
    )
    return names, rationale


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: core set)")
    ap.add_argument("--all", action="store_true", help="run every driver entry")
    ap.add_argument(
        "--include-local",
        action="store_true",
        help="extend the query universe to the FULL registry (local-only "
        "entries included) — for scale audits beyond the driver window",
    )
    ap.add_argument(
        "--changed-since",
        default=None,
        metavar="GIT_REF",
        help="sweep only registry entries affected by files changed since "
        "GIT_REF (committed + working tree), mapped through the package "
        "import graph; implies --include-local; falls back to the full "
        "registry when shared infra changed",
    )
    ap.add_argument(
        "--select-only",
        action="store_true",
        help="with --changed-since: print the selection and exit without "
        "running anything",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default=None, help="session timezone probe")
    ap.add_argument(
        "--conf-file",
        default=None,
        help="spark-defaults-style conf file to apply (e.g. "
        "deploy/spark-defaults-template.conf; <placeholder> values and "
        "comments are skipped) — proves the deploy confs don't change "
        "query results",
    )
    args = ap.parse_args()

    if args.changed_since:
        selected, rationale = _changed_selection(args.changed_since)
        print(f"--changed-since {args.changed_since}: {rationale}")
        args.include_local = True
        if selected is None:
            args.all = True
        elif not selected:
            print("0/0 matched (no registry entries affected)")
            return 0
        else:
            args.queries = selected
            print(f"selected {len(selected)} entries: {sorted(selected)}")
        if args.select_only:
            return 0

    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]").appName("driver-sim")
    if args.conf_file:
        for line in open(args.conf_file):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition(" ")
            value = value.strip()
            if not value or "<" in value:
                continue  # site-specific placeholder
            b = b.config(key, value)
            print(f"conf: {key}={value}")
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare, duckdb_connection

    n = e.entry(spark).count()
    print(f"entry() smoke: {n} rows")
    assert n > 0

    qs, osql = e.queries(), e.oracle_sql()
    driver_names = set(qs)  # entries the external driver actually runs
    if args.include_local:
        from projekt_data_engineering_iubh_spark.plans.registry import (
            all_queries,
        )

        for name, q in all_queries().items():
            if name not in qs:
                qs[name] = e._wrap(q.fn)
                if q.oracle is not None:
                    osql[name] = q.oracle
    names = list(qs) if args.all else (args.queries or CORE)
    con = duckdb_connection(args.sf_dir)
    failures = []
    for name in names:
        if name not in qs:
            failures.append(f"{name}: not a driver query")
            print(name, "NOT A DRIVER QUERY")
            continue
        r = compare(
            name,
            qs[name](spark, args.sf_dir),
            osql[name],
            con,
            driver_contract=name in driver_names,
        )
        print(name, r or "MATCH")
        if r:
            failures.append(f"{name}: {r}")
    spark.stop()
    print(f"{len(names) - len(failures)}/{len(names)} matched")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
