"""Smoke tests for the static dashboard artifact (r2 VERDICT #7).

Both reference figures (error counts over time, min/avg/max cycle time
over time — ``/root/reference/src/dashboard.py:158-196``) must build
from golden-pipeline output routed through the serving layer's day
slice, as one self-contained HTML file.
"""

from __future__ import annotations

import pytest

from projekt_data_engineering_iubh_spark.pipeline import daily_aggregator as da
from projekt_data_engineering_iubh_spark.pipeline import serving
from projekt_data_engineering_iubh_spark.pipeline.config import DEFAULT_RULES
from projekt_data_engineering_iubh_spark.pipeline.dashboard import (
    CYCLE_TIME_COLUMNS,
    ERROR_COLUMNS,
    _LABELS,
    build_dashboard_html,
    render_timeseries_svg,
    write_dashboard,
)

from tests.test_pipeline_golden import FIXTURE_ROWS


@pytest.fixture(scope="module")
def day_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("dash") / "day.csv"
    p.write_text("\n".join(FIXTURE_ROWS) + "\n")
    _, summary = da.transform(da.read_events_csv(spark, str(p)), DEFAULT_RULES)
    return serving.day_slice(summary, "2024-05-01")


def test_dashboard_builds_both_figures_and_table(day_df, tmp_path):
    out = str(tmp_path / "dashboard.html")
    write_dashboard(day_df, "2024-05-01", out)
    html = open(out, encoding="utf-8").read()

    assert html.count("<svg") == 2  # no plotly in this container
    assert "Error counts over time" in html
    assert "Cycle time (min/avg/max) over time" in html
    # legend names every series — identity is never color-alone
    for c in (*ERROR_COLUMNS, *CYCLE_TIME_COLUMNS):
        assert _LABELS[c] in html, c
    # table view present (contrast relief + reference table render)
    assert "<table>" in html and "machine_id" in html
    # both fixture machines appear in the table
    assert ">M1<" in html and ">M2<" in html
    # the golden day spans hours 00 and 01 — both x labels render
    assert "00:00" in html and "01:00" in html


def test_dashboard_machine_filter(day_df, spark):
    html = build_dashboard_html(
        day_df.where("machine_id = 'M1'"), "2024-05-01"
    )
    assert ">M1<" in html and ">M2<" not in html


def test_svg_renderer_handles_empty_and_flat_series():
    svg = render_timeseries_svg(
        ["00:00", "01:00"],
        [("flat", [0.0, 0.0]), ("empty", [])],
        title="t",
        y_title="y",
    )
    assert svg.startswith("<svg") and svg.endswith("</svg>")


def test_svg_geometry_in_bounds():
    """No headless browser in this container — assert geometry
    structurally: every element coordinate inside the viewBox (catches
    legend overflow / NaN coordinates), six wrapped legend entries."""
    import re
    import xml.etree.ElementTree as ET

    names = [
        "AS vacuum errors", "PP vacuum errors", "AS release errors",
        "PP release errors", "Pick force errors", "Place force errors",
    ]
    svg = render_timeseries_svg(
        [f"{h:02d}:00" for h in range(24)],
        [(n, [float((i * 7 + j) % 9) for j in range(24)]) for i, n in enumerate(names)],
        title="Error counts over time",
        y_title="count",
    )
    root = ET.fromstring(svg)
    w, h = float(root.get("width")), float(root.get("height"))
    for el in root.iter():
        for attr in ("x", "y", "x1", "y1", "x2", "y2", "cx", "cy"):
            v = el.get(attr)
            if v is not None:
                assert 0 <= float(v) <= max(w, h) + 1e-6, (el.tag, attr, v)
                axis = w if attr in ("x", "x1", "x2", "cx") else h
                assert float(v) <= axis + 1e-6, (el.tag, attr, v)
        pts = el.get("points")
        if pts:
            for pair in pts.split():
                px, py = map(float, pair.split(","))
                assert 0 <= px <= w and 0 <= py <= h, (px, py)
    # all six series named in the legend text nodes
    texts = "".join(t.text or "" for t in root.iter() if t.tag.endswith("text"))
    for n in names:
        assert n in texts


def test_machine_series_mode_one_series_per_machine(day_df):
    """Reference-parity mode (r3 VERDICT #7): each figure draws one
    series per (metric, machine) — geometry-asserted as polyline count
    and per-machine legend labels.

    Gap semantics (r4 ADVICE): the fixture day gives M1 rows in both
    hours but M2 only in hour 00 — M2's series must BREAK at the missing
    hour (marker at its one real point, no line, no fabricated 0.0 that
    would drag cycle-time mins to the axis). So only M1 contributes
    polylines; M2 contributes markers + legend entries."""
    import re

    html = build_dashboard_html(day_df, "2024-05-01", machine_series=True)
    svgs = re.findall(r"<svg.*?</svg>", html, flags=re.S)
    assert len(svgs) == 2
    err_svg, cyc_svg = svgs
    # only M1 spans ≥2 hours → one polyline per metric; M2's single
    # point draws no line segment
    assert err_svg.count("<polyline") == len(ERROR_COLUMNS)
    assert cyc_svg.count("<polyline") == len(CYCLE_TIME_COLUMNS)
    for c in ERROR_COLUMNS:
        assert f"{_LABELS[c]} — M1" in err_svg
        assert f"{_LABELS[c]} — M2" in err_svg
    for c in CYCLE_TIME_COLUMNS:
        assert f"{_LABELS[c]} — M1" in cyc_svg
        assert f"{_LABELS[c]} — M2" in cyc_svg
        # M1: marker in both hours + legend = 3 mentions; M2: one marker
        # + legend = 2 (the missing hour draws NOTHING for M2)
        assert cyc_svg.count(f"{_LABELS[c]} — M1") == 3
        assert cyc_svg.count(f"{_LABELS[c]} — M2") == 2


def test_dashboard_cli_builds_artifact(spark, tmp_path):
    """The deploy-recipe entry point end-to-end: golden pipeline →
    warehouse → `python -m pipeline.dashboard` (in-process main)."""
    from projekt_data_engineering_iubh_spark.pipeline.dashboard import main

    p = tmp_path / "day.csv"
    p.write_text("\n".join(FIXTURE_ROWS) + "\n")
    warehouse = str(tmp_path / "warehouse")
    da.run(spark, str(p), warehouse, DEFAULT_RULES)

    out = str(tmp_path / "dash.html")
    assert main(["dashboard.py", warehouse, "2024-05-01", out,
                 "--machine-series"]) == 0
    html = open(out, encoding="utf-8").read()
    assert html.count("<svg") == 2 and "— M1" in html


def test_live_dashboard_server(spark, tmp_path):
    """The always-on serving process (reference parity for the Streamlit
    app, stdlib-only): index lists available days, the day view renders
    the same artifact with machine multiselect and per-machine mode as
    query parameters."""
    import urllib.request

    from projekt_data_engineering_iubh_spark.pipeline import dashboard_server

    p = tmp_path / "day.csv"
    p.write_text("\n".join(FIXTURE_ROWS) + "\n")
    warehouse = str(tmp_path / "warehouse")
    da.run(spark, str(p), warehouse, DEFAULT_RULES)

    server = dashboard_server.serve(spark, warehouse, port=0)
    try:
        port = server.server_address[1]

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=120
            ) as r:
                return r.status, r.read().decode()

        code, index = get("/")
        assert code == 200 and "2024-05-01" in index
        assert '/day?d=2024-05-01' in index

        code, day = get("/day?d=2024-05-01")
        assert code == 200
        assert "Error counts over time" in day and ">M1<" in day and ">M2<" in day

        # machine multiselect (the reference's P17 control)
        code, m1 = get("/day?d=2024-05-01&machines=M1")
        assert code == 200 and ">M1<" in m1 and ">M2<" not in m1

        # per-machine rendering mode
        code, pm = get("/day?d=2024-05-01&per-machine=1")
        assert code == 200 and "— M1" in pm

        code, _ = get("/day?d=1999-01-01")  # empty day still renders
        assert code == 200
    finally:
        server.shutdown()


def test_server_caches_day_and_invalidates_on_new_version(spark, tmp_path):
    """r5 VERDICT #6: a second identical request is served from the TTL
    cache with ZERO Spark jobs (reference parity:
    /root/reference/src/dashboard.py:27,44 — @st.cache_data(ttl=600));
    a newly COMMITTED summary-store version invalidates immediately
    (explicit invalidation the reference's pure-TTL cache lacks)."""
    import urllib.request

    from pyspark.sql import functions as F

    from projekt_data_engineering_iubh_spark.pipeline import (
        dashboard_server,
        store,
    )

    p = tmp_path / "day.csv"
    p.write_text("\n".join(FIXTURE_ROWS) + "\n")
    warehouse = str(tmp_path / "warehouse")
    da.run(spark, str(p), warehouse, DEFAULT_RULES)
    summary_path = f"{warehouse}/hourly_machine_summary"
    store.init_store(summary_path)  # versioned: enables invalidation

    def jobs() -> int:
        return spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()

    server = dashboard_server.serve(spark, warehouse, port=0)
    try:
        port = server.server_address[1]

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=120
            ) as r:
                return r.status, r.read().decode()

        code, first = get("/day?d=2024-05-01&machines=M1")
        assert code == 200
        n0 = jobs()
        code, second = get("/day?d=2024-05-01&machines=M1")
        assert code == 200 and second == first
        assert jobs() == n0, "cache hit must launch zero Spark jobs"
        assert server.page_cache.hits == 1

        # different params are a different cache entry (fresh render)
        code, _ = get("/day?d=2024-05-01")
        assert code == 200 and jobs() > n0

        # committing a new summary version invalidates: the next
        # identical request re-renders against the new snapshot
        current = spark.read.parquet(store.resolve(summary_path))
        patched = current.withColumn(
            "machine_id", F.concat(F.lit("NEW_"), F.col("machine_id"))
        )
        store.commit_snapshot(
            summary_path,
            lambda d: patched.write.mode("overwrite").parquet(d),
        )
        n1 = jobs()
        code, third = get("/day?d=2024-05-01&machines=M1")
        assert code == 200 and jobs() > n1  # re-rendered
        assert ">M1<" not in third  # old machine id is gone in v2
        code, renamed = get("/day?d=2024-05-01&machines=NEW_M1")
        assert code == 200 and ">NEW_M1<" in renamed
    finally:
        server.shutdown()


def test_ttl_cache_is_bounded_lru():
    """r6 ADVICE: cache keys are client-supplied query params — the cache
    must stay bounded under arbitrary distinct probes (LRU + expired/
    stale-version sweep), and a hot key must survive the eviction of
    colder ones."""
    from projekt_data_engineering_iubh_spark.pipeline.dashboard_server import (
        _TTLCache,
    )

    now = [0.0]
    c = _TTLCache(ttl=600, clock=lambda: now[0], max_entries=8)

    c.get(("hot",), 1, lambda: "hot-page")
    for i in range(100):
        c.get(("probe", i), 1, lambda: f"p{i}")
        c.get(("hot",), 1, lambda: "MUST NOT REBUILD")  # keep it recent
    assert len(c._entries) <= 8
    # the hot key was never evicted: its build ran exactly once
    assert c.get(("hot",), 1, lambda: "MUST NOT REBUILD") == "hot-page"

    # expired entries are swept on insert
    now[0] = 10_000.0
    c.get(("fresh",), 1, lambda: "f")
    assert len(c._entries) == 1

    # stale-version entries are swept on insert too
    c.get(("a",), 1, lambda: "a")
    c.get(("b",), 2, lambda: "b")
    assert ("a",) not in c._entries
