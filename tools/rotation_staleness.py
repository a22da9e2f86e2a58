"""Staleness clock for driver-rotation planning (r13, VERDICT r12 #5).

With the never-externally-checked backlog at zero (r12), rotation's job
changed: every registry entry HAS held an external driver row, but the
oldest rows are many rounds stale and the code under them keeps moving.
The entries that matter are the STALE-AND-CHANGED ones — last checked in
round R, with some module in their import closure modified since the
round-R tree. This tool computes that table from first principles:

* last external green round per entry: the CORRECTNESS_r*.json history
  (a red or errored row does not count as coverage);
* the round-R reference tree: the `round {R}: verdict/...` commit the
  driver made right after recording CORRECTNESS_rR;
* changed-since mapping: git diff <round-R commit> → package modules →
  import-graph closure → registry entries (exactly the machinery
  tools/verify_driver.py --changed-since uses, imported from there).

Output: one JSON line per entry, stalest first, with the promotion
shortlist (stale AND changed, driver=False today). Feed the shortlist
to the rotation edit; tests/test_registry_budget.py enforces the
ceiling on the same computation.

Usage: python tools/rotation_staleness.py [--top 15]
"""

from __future__ import annotations

import argparse
import glob
import importlib.util
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _load_verify_driver():
    spec = importlib.util.spec_from_file_location(
        "verify_driver", os.path.join(_REPO, "tools", "verify_driver.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def last_green_rounds() -> dict[str, int]:
    """entry -> highest round whose CORRECTNESS file carries a fully
    green row for it (rows/schema/hash all true where present)."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            checks = [
                row.get(k)
                for k in ("rows_match", "schema_match", "hash_match")
                if k in row
            ]
            if checks and all(c is True for c in checks):
                out[name] = max(out.get(name, 0), rnd)
    return out


def current_round() -> int:
    rounds = [
        int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))
    ]
    return max(rounds) if rounds else 0


def round_commit(rnd: int) -> str | None:
    """The `round {rnd}: ...` commit — the tree the driver's round-rnd
    artifacts were recorded against."""
    out = subprocess.run(
        ["git", "log", "--format=%H %s", "--all"],
        capture_output=True, text=True, cwd=_REPO, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith(f"round {rnd}:"):
            return sha
    return None


def changed_entries_since(vd, ref: str) -> set[str] | None:
    """Registry entries affected by changes since ``ref`` (None = shared
    infra changed → everything is affected)."""
    names, _ = vd._changed_selection(ref)
    return None if names is None else set(names)


def staleness_table() -> list[dict]:
    vd = _load_verify_driver()
    from projekt_data_engineering_iubh_spark.plans.registry import (
        all_queries,
    )

    greens = last_green_rounds()
    cur = current_round()
    qs = all_queries()
    # one changed-set per distinct round (the git diff is per-ref)
    changed_cache: dict[int, set[str] | None] = {}
    rows = []
    for name, q in qs.items():
        last = greens.get(name, 0)
        if last and last not in changed_cache:
            ref = round_commit(last)
            changed_cache[last] = (
                changed_entries_since(vd, ref) if ref else None
            )
        changed = changed_cache.get(last)
        rows.append(
            {
                "entry": name,
                "driver": q.driver,
                "last_green_round": last or None,
                "staleness": (cur - last) if last else None,
                "changed_since_checked": (
                    True
                    if last == 0
                    else (True if changed is None else name in changed)
                ),
            }
        )
    rows.sort(
        key=lambda r: (
            -(r["staleness"] if r["staleness"] is not None else 999),
            r["entry"],
        )
    )
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()
    rows = staleness_table()
    shortlist = [
        r
        for r in rows
        if r["changed_since_checked"] and not r["driver"]
    ][: args.top]
    never = [r for r in rows if r["last_green_round"] is None]
    for r in rows:
        print(json.dumps(r))
    print(
        json.dumps(
            {
                "current_round": current_round(),
                "never_checked": [r["entry"] for r in never],
                "stale_changed_local": sum(
                    1
                    for r in rows
                    if r["changed_since_checked"] and not r["driver"]
                ),
                "promotion_shortlist": [r["entry"] for r in shortlist],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
