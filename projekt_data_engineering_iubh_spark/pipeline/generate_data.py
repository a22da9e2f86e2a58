"""Deterministic die-bonder event-log simulator.

Produces the same row schema, event sequence, value domains, and timing
model as the reference generator (``/root/reference/generate_data.py``):
8 rows per cycle (Cycle_Start → AS_Check → Pick_Check×2 → AS_Blowoff_Check
→ Place_Check×2 → Cycle_End), inter-event gaps delta1..delta5
(:48-52), ok/error value ranges (:35-46), per-run error rates drawn from
U(0, 0.03) (:28-33), ISO-8601 ms timestamps with 'Z' (:74).

Differences, deliberate: a seeded ``random.Random`` (reproducible fixtures
— the reference seeds nothing), a library API returning rows (so tests
can introspect ground truth), and configurable duration.
"""

from __future__ import annotations

import csv
import datetime as dt
import random
import sys
from dataclasses import dataclass, field
from pathlib import Path

HEADER = ["timestamp", "machine_id", "event_name", "parameter_name", "value"]

AS_VACUUM_OK, AS_VACUUM_ERR = (40.0, 70.0), (70.1, 100.0)
PP_VACUUM_OK, PP_VACUUM_ERR = (50.0, 75.0), (75.01, 120.0)
PICK_FORCE_OK, PICK_FORCE_ERR = (60.0, 120.0), (120.01, 250.0)
PLACE_FORCE_OK, PLACE_FORCE_ERR = (60.0, 120.0), (120.01, 250.0)
AS_BLOW_OK, AS_BLOW_ERR = (450.0, 550.0), (350.0, 449.99)
PP_BLOW_OK, PP_BLOW_ERR = (450.0, 550.0), (350.0, 449.99)

DELTAS_MS = [(130, 150), (95, 105), (50, 55), (220, 250), (80, 100)]


@dataclass
class SimResult:
    rows: list[list]
    error_rates: dict[str, float]
    n_cycles: int = 0
    injected_errors: dict[str, int] = field(default_factory=dict)


def _iso_ms(t: dt.datetime) -> str:
    return t.isoformat(timespec="milliseconds").replace("+00:00", "Z")


def simulate_day(
    machine_id: str,
    start_date: str,
    *,
    hours: float = 24.0,
    seed: int = 42,
) -> SimResult:
    rng = random.Random(seed)
    rates = {
        k: round(rng.uniform(0, 0.03), 3)
        for k in ("as_vacuum", "pp_vacuum", "as_blow", "pp_blow", "pick", "place")
    }
    start = dt.datetime.strptime(start_date, "%Y-%m-%d").replace(tzinfo=dt.timezone.utc)
    end = start + dt.timedelta(hours=hours)

    injected = {k: 0 for k in rates}

    def draw(kind: str, ok, err) -> float:
        is_err = rng.random() <= rates[kind]
        if is_err:
            injected[kind] += 1
        return round(rng.uniform(*(err if is_err else ok)), 2)

    rows: list[list] = []
    t = start
    n_cycles = 0
    while t < end:
        rows.append([_iso_ms(t), machine_id, "Cycle_Start", None, None])
        t += dt.timedelta(milliseconds=rng.uniform(*DELTAS_MS[0]))
        rows.append(
            [_iso_ms(t), machine_id, "AS_Check", "AS_VacuumUnits",
             draw("as_vacuum", AS_VACUUM_OK, AS_VACUUM_ERR)]
        )
        t += dt.timedelta(milliseconds=rng.uniform(*DELTAS_MS[1]))
        rows.append(
            [_iso_ms(t), machine_id, "Pick_Check", "PP_VacuumUnits",
             draw("pp_vacuum", PP_VACUUM_OK, PP_VACUUM_ERR)]
        )
        rows.append(
            [_iso_ms(t), machine_id, "Pick_Check", "PP_Force",
             draw("pick", PICK_FORCE_OK, PICK_FORCE_ERR)]
        )
        t += dt.timedelta(milliseconds=rng.uniform(*DELTAS_MS[2]))
        rows.append(
            [_iso_ms(t), machine_id, "AS_Blowoff_Check", "AS_VacuumUnits",
             draw("as_blow", AS_BLOW_OK, AS_BLOW_ERR)]
        )
        t += dt.timedelta(milliseconds=rng.uniform(*DELTAS_MS[3]))
        rows.append(
            [_iso_ms(t), machine_id, "Place_Check", "PP_Force",
             draw("place", PLACE_FORCE_OK, PLACE_FORCE_ERR)]
        )
        rows.append(
            [_iso_ms(t), machine_id, "Place_Check", "PP_VacuumUnits",
             draw("pp_blow", PP_BLOW_OK, PP_BLOW_ERR)]
        )
        t += dt.timedelta(milliseconds=rng.uniform(*DELTAS_MS[4]))
        rows.append([_iso_ms(t), machine_id, "Cycle_End", None, None])
        n_cycles += 1

    return SimResult(rows=rows, error_rates=rates, n_cycles=n_cycles,
                     injected_errors=injected)


def write_csv(result: SimResult, path: str | Path) -> Path:
    """Write the simulated day atomically (temp file + rename).

    Atomicity matters when the target directory is watched by a Structured
    Streaming file source: the engine polls continuously and will read a
    half-written file, silently losing the not-yet-flushed tail of that
    batch (observed: ~5k rows vanished from an hourly window). Rename
    within the same directory is atomic on POSIX.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # leading dot: Spark file sources ignore hidden files, so the temp name
    # is invisible to a watching stream even before the rename
    tmp = path.parent / f".{path.name}.tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(result.rows)
    tmp.rename(path)
    return path


def main(argv: list[str]) -> int:
    if len(argv) != 3 and len(argv) != 4:
        print("usage: generate_data.py <machine_id> <YYYY-MM-DD> [out_dir]")
        return 1
    machine_id, date = argv[1], argv[2]
    out_dir = Path(argv[3]) if len(argv) == 4 else Path("./raw_data")
    res = simulate_day(machine_id, date)
    out = out_dir / f"machine_event_logs_{machine_id}_{date}.csv"
    write_csv(res, out)
    print(f"{out}: {len(res.rows)} rows, {res.n_cycles} cycles, rates={res.error_rates}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
