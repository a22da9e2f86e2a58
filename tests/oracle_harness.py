"""Local replica of the driver's oracle-differential check.

Runs a registered query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive canonical form of the values. Used by tests at sf0.001
(fast) — the driver does the same at sf0.01.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd

from projekt_data_engineering_iubh_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # driver data is single parquet files; Spark-written replicas
        # (tools/make_sf1.py) are part-file directories — glob those
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # full precision — comparison is exact by design
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(str(_canon_value(x)) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def _canon_temporal(x: Any) -> Any:
    import datetime

    if x is None:
        return None
    if isinstance(x, datetime.datetime):
        return x.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(x, datetime.date):
        return f"{x} 00:00:00.000000"
    return x


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    out = df.copy()
    for c in out.columns:
        s = out[c]
        # unify timestamp flavors (ns vs µs) and date vs midnight-timestamp
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            sample = s.dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime, pd.Timestamp)
            ):
                out[c] = s.map(_canon_temporal)
    return out


def driver_canon_violations(name: str, df: pd.DataFrame) -> list[str]:
    """Replicate the EXTERNAL driver's canonicalization (raw pandas
    sort_values over every column, then hash) and report anything it
    would crash on. The local canon above stringifies lists; the
    driver's does not (CORRECTNESS_r08: docs_inverted_index red row,
    ``TypeError: unhashable type: 'list'`` in factorize) — so driver
    entries must survive THIS path, not just ours."""
    try:
        df.sort_values(by=sorted(df.columns))
    except TypeError as exc:
        return [f"{name}: driver canon would crash: {exc}"]
    bad = [
        c
        for c in df.columns
        if df[c].map(lambda v: isinstance(v, (list, dict, set))).any()
        or df[c].map(lambda v: type(v).__name__ == "ndarray").any()
    ]
    if bad:
        return [f"{name}: non-scalar cells in driver entry columns {bad}"]
    return []


def compare(
    name: str, spark_df, oracle: str, con, *, driver_contract: bool = False
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    if driver_contract:
        problems += driver_canon_violations(name, sp)
        problems += driver_canon_violations(f"{name} (oracle)", du)
        if problems:
            return problems
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(sp.columns)} duck={sorted(du.columns)}"
        )
        return problems
    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
    a = canonical_rows(_normalize(sp))
    b = canonical_rows(_normalize(du))
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        only_a = [r for r in a[:2000] if r not in set(b[:2000])][:2]
        problems.append(
            f"{name}: values differ; first aligned diffs={diffs!r} sample_only_spark={only_a!r}"
        )
    return problems
