"""Custom Python data source (Spark 4 `pyspark.sql.datasource` API):
the machine-event simulator as a first-class readable format.

Why this exists: the reference ships its generator as a script that
writes CSVs to disk (`/root/reference/generate_data.py`); re-expressed
Spark-first, the generator IS a data source — `spark.read.format(
"machine_sim")` with options, no intermediate files, with generation
parallelized ACROSS EXECUTORS (one input partition per machine) instead
of a driver-side loop. The rows are byte-identical to the CSV path
(same seeded `pipeline/generate_data.simulate_day`), pinned by the
parity test.

Capabilities demonstrated, each load-bearing at scale:

* **partition planning** — `partitions()` returns one split per
  machine-day, so a 1,000-machine fleet generates on 1,000 tasks;
* **filter pushdown** (Spark 4.1 `pushFilters`) — `machine_id`
  equality/IN predicates prune entire partitions BEFORE generation
  (asserted: pruned machines are never simulated);
* **streaming source** — `spark.readStream.format("machine_sim")`
  emits one simulated day per micro-batch via `DataSourceStreamReader`
  offsets ({"day": n}), giving tests and demos a self-advancing live
  feed with exactly-once replay semantics (offsets are deterministic
  seeds, so a replayed batch regenerates identical rows).

Options: machines (int, default 2), date (YYYY-MM-DD, default
2024-05-01), hours (float, default 1.0), seed (int, default 42;
per-partition seed = seed + machine index + day*10_000 so splits are
independent streams), max_days (stream only — cap the number of
simulated days so drain-style consumers terminate; 0/absent =
unbounded live feed).
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "timestamp string, machine_id string, event_name string, "
    "parameter_name string, value string"
)


def _machine_name(i: int) -> str:
    return f"M_{i:03d}"


def _rows(machine: str, date: str, hours: float, seed: int):
    # imported lazily: executors deserialize this module without needing
    # the package import at module scope
    from projekt_data_engineering_iubh_spark.pipeline.generate_data import (
        simulate_day,
    )

    for r in simulate_day(machine, date, hours=hours, seed=seed).rows:
        ts, mid, ev, param, value = r
        yield (
            ts,
            mid,
            ev,
            param,
            None if value is None else str(value),
        )


class _Split(InputPartition):
    def __init__(self, machine: str, date: str, hours: float, seed: int):
        self.machine = machine
        self.date = date
        self.hours = hours
        self.seed = seed


class MachineSimReader(DataSourceReader):
    def __init__(self, options):
        self.n_machines = int(options.get("machines", 2))
        self.date = options.get("date", "2024-05-01")
        self.hours = float(options.get("hours", 1.0))
        self.seed = int(options.get("seed", 42))
        self._keep: set[str] | None = None  # pushFilters result

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept machine_id equality/IN filters by pruning partitions;
        everything else is evaluated by Spark above us (returned)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("machine_id",):
                keep = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("machine_id",):
                keep = {str(v) for v in f.value}
            else:
                yield f  # unsupported → Spark keeps it
                continue
            self._keep = keep if self._keep is None else self._keep & keep

    def partitions(self):
        out = []
        for i in range(self.n_machines):
            m = _machine_name(i)
            if self._keep is not None and m not in self._keep:
                continue  # pruned BEFORE any generation happens
            out.append(_Split(m, self.date, self.hours, self.seed + i))
        return out

    def read(self, partition: _Split):
        yield from _rows(
            partition.machine, partition.date, partition.hours, partition.seed
        )


class MachineSimStreamReader(DataSourceStreamReader):
    """One simulated day per micro-batch. Offsets are {"day": n} — pure
    metadata; a replayed (start, end) range regenerates bit-identical
    rows because the per-day seed derives from the offset."""

    def __init__(self, options):
        self.n_machines = int(options.get("machines", 2))
        self.start_date = options.get("date", "2024-05-01")
        self.hours = float(options.get("hours", 1.0))
        self.seed = int(options.get("seed", 42))
        # advancement bound: without it, latestOffset grows on every
        # poll and processAllAvailable() NEVER drains (a live deployment
        # wants an endless feed — tests and demos want a horizon)
        self.max_days = int(options.get("max_days", 0)) or None
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"day": 0}

    def latestOffset(self) -> dict:
        nxt = self._latest + 1  # one new day becomes available per poll
        if self.max_days is not None:
            nxt = min(nxt, self.max_days)
        self._latest = nxt
        return {"day": self._latest}

    def _date_of(self, day: int) -> str:
        d = dt.date.fromisoformat(self.start_date) + dt.timedelta(days=day)
        return d.isoformat()

    def partitions(self, start: dict, end: dict):
        return [
            _Split(
                _machine_name(i),
                self._date_of(day),
                self.hours,
                self.seed + i + day * 10_000,
            )
            for day in range(start["day"], end["day"])
            for i in range(self.n_machines)
        ]

    def read(self, partition: _Split):
        yield from _rows(
            partition.machine, partition.date, partition.hours, partition.seed
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are deterministic seeds; nothing to clean up

    def stop(self) -> None:
        pass


class MachineSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "machine_sim"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> MachineSimReader:
        return MachineSimReader(self.options)

    def streamReader(self, schema: StructType) -> MachineSimStreamReader:
        return MachineSimStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: spark.read.format('machine_sim'). Also
    enables `spark.sql.python.filterPushdown.enabled` (runtime conf,
    default false in Spark 4.1) — a reader implementing pushFilters()
    FAILS hard without it, rather than silently skipping pushdown."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(MachineSimDataSource)
