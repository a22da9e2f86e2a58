"""Static-HTML dashboard artifact over the serving layer.

The reference ships a Streamlit + plotly UI (``src/dashboard.py:71-196``):
a summary table and two time-series figures over one day's hourly
summary — error counts over time (six series, ``:158-175``) and
min/avg/max cycle time over time (three series, ``:177-196``). This
module reproduces those three artifacts from the SAME query surface
(:mod:`pipeline.serving` day-slice output) as a single self-contained
HTML file — no server, no external assets.

plotly is not in this container, so the figures are hand-rendered SVG
(2px lines, 8px markers, native ``<title>`` hover tooltips, legend,
recessive grid); when plotly IS importable the same series specs are
rendered through ``plotly.graph_objects`` instead (``_HAVE_PLOTLY``).

Colors are a CVD-validated 6-slot categorical palette (adjacent-pair
ΔE ≥ 9 under protan/deutan/tritan simulation; the three low-contrast
slots are relieved by the table view, which precedes the figures exactly
as in the reference). One y-axis per figure; series identity is carried
by the legend, not by text color.

Two multi-machine modes (``machine_series`` flag):

* default (aggregate): multi-machine slices are SUMMED per hour for
  error counts and min/avg/max-composed for cycle times — the chart the
  table implies (a deliberate deviation the r3 NEXT.md documents);
* ``machine_series=True`` (reference parity): one series per
  (metric, machine) — the faithful rendering of the reference's
  per-machine rows (``src/dashboard.py:125-127`` keeps machine_id rows
  separate and ``:71-88`` feeds them into one trace per metric, which
  zig-zags through the interleaved machines; splitting per machine is
  that data drawn without the interleaving artifact).
"""

from __future__ import annotations

import datetime as dt
import html as _html
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

try:  # optional renderer — absent in this container
    import plotly.graph_objects as go  # type: ignore

    _HAVE_PLOTLY = True
except ImportError:
    _HAVE_PLOTLY = False

# validated categorical palettes (dataviz six-checks): light on #fcfcfb,
# dark on #1a1a19 — each mode's steps validated against ITS surface (a
# dark mode is selected, never an automatic flip). Fixed assignment
# order, never cycled. The SVG renderer emits CSS variables so one
# artifact serves both prefers-color-scheme modes.
_PALETTE = ("#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300")
_PALETTE_DARK = ("#3987e5", "#d95926", "#199e70", "#c98500", "#d55181", "#008300")
_SURFACE, _SURFACE_DARK = "#fcfcfb", "#1a1a19"
_INK, _INK_DARK = "#0b0b0b", "#ffffff"
_INK_2, _INK_2_DARK = "#52514e", "#c3c2b7"
_GRID, _GRID_DARK = "#e4e3df", "#383835"

def _css_theme() -> str:
    """Both themes as CSS custom properties (SVG + page share them)."""
    def block(pal, surface, ink, ink2, grid, head):
        vars_ = "".join(f"--s{i}: {c}; " for i, c in enumerate(pal))
        return (f"{vars_}--surface: {surface}; --ink: {ink}; "
                f"--ink2: {ink2}; --grid: {grid}; --thead: {head};")
    return (
        ":root { " + block(_PALETTE, _SURFACE, _INK, _INK_2, _GRID, "#f0efec") + " }\n"
        "@media (prefers-color-scheme: dark) { :root { "
        + block(_PALETTE_DARK, _SURFACE_DARK, _INK_DARK, _INK_2_DARK,
                _GRID_DARK, "#262624")
        + " } }"
    )

ERROR_COLUMNS = (  # reference dashboard.py:160-163
    "as_vacuum_error_count",
    "pp_vacuum_error_count",
    "as_release_error_count",
    "pp_release_error_count",
    "pick_force_error_count",
    "place_force_error_count",
)
CYCLE_TIME_COLUMNS = (  # reference dashboard.py:179-183
    "min_cycle_time_seconds",
    "avg_cycle_time_seconds",
    "max_cycle_time_seconds",
)
TABLE_COLUMNS = (  # reference display_columns_map, dashboard.py:139-153
    "timestamp_hour",
    "machine_id",
    "cycle_count",
    *CYCLE_TIME_COLUMNS,
    *ERROR_COLUMNS,
    "avg_pick_force",
    "avg_place_force",
)

_LABELS = {
    "as_vacuum_error_count": "AS vacuum errors",
    "pp_vacuum_error_count": "PP vacuum errors",
    "as_release_error_count": "AS release errors",
    "pp_release_error_count": "PP release errors",
    "pick_force_error_count": "Pick force errors",
    "place_force_error_count": "Place force errors",
    "min_cycle_time_seconds": "Min cycle time (s)",
    "avg_cycle_time_seconds": "Avg cycle time (s)",
    "max_cycle_time_seconds": "Max cycle time (s)",
}


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def _nice_ticks(vmax: float, n: int = 4) -> list[float]:
    """<=n+1 round-numbered y ticks covering [0, vmax]."""
    if vmax <= 0:
        return [0.0, 1.0]
    import math

    raw = vmax / n
    mag = 10 ** math.floor(math.log10(raw))
    step = next(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    return [i * step for i in range(int(math.ceil(vmax / step)) + 1)]


def render_timeseries_svg(
    x_labels: Sequence[str],
    series: Sequence[tuple[str, Sequence[float]]],
    *,
    title: str,
    y_title: str,
    width: int = 860,
    height: int = 400,
) -> str:
    """One SVG line figure: 2px polylines, 8px hoverable markers with
    native ``<title>`` tooltips, legend (identity is never color-alone —
    the legend names every series), single y-axis, recessive grid."""
    ml, mr, mt = 56, 16, 44
    # legend wraps into rows that fit the width; reserve bottom margin
    items, rows_, lx = [], 1, ml
    for name, _ in series:
        w = 22 + 7 * len(name)
        if lx + w > width - mr and lx > ml:
            rows_, lx = rows_ + 1, ml
        items.append((name, lx, rows_))
        lx += w
    mb = 24 + 16 * rows_
    pw, ph = width - ml - mr, height - mt - mb
    vmax = max(
        max((v for v in vals if v is not None), default=0.0)
        for _, vals in series
    )
    ticks = _nice_ticks(float(vmax))
    top = ticks[-1] or 1.0
    nx = max(len(x_labels), 1)

    def X(i: int) -> float:
        return ml + (pw * (i + 0.5) / nx)

    def Y(v: float) -> float:
        return mt + ph * (1.0 - v / top)

    ink, ink2, grid, surface = (
        "var(--ink)", "var(--ink2)", "var(--grid)", "var(--surface)"
    )
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" role="img" '
        f'aria-label="{_html.escape(title)}">',
        f'<rect width="{width}" height="{height}" fill="{surface}"/>',
        f'<text x="{ml}" y="22" fill="{ink}" font-size="15" '
        f'font-weight="600" font-family="sans-serif">{_html.escape(title)}</text>',
    ]
    for t in ticks:  # recessive grid + y labels
        y = Y(t)
        parts.append(
            f'<line x1="{ml}" y1="{y:.1f}" x2="{ml + pw}" y2="{y:.1f}" '
            f'stroke="{grid}" stroke-width="1"/>'
            f'<text x="{ml - 6}" y="{y + 4:.1f}" fill="{ink2}" font-size="11" '
            f'text-anchor="end" font-family="sans-serif">{_fmt(t)}</text>'
        )
    step = max(1, nx // 8)  # <=9 x labels, no collisions
    for i, lab in enumerate(x_labels):
        if i % step:
            continue
        parts.append(
            f'<text x="{X(i):.1f}" y="{mt + ph + 16}" fill="{ink2}" '
            f'font-size="11" text-anchor="middle" font-family="sans-serif">'
            f"{_html.escape(str(lab))}</text>"
        )
    parts.append(
        f'<text x="14" y="{mt + ph / 2:.0f}" fill="{ink2}" font-size="11" '
        f'font-family="sans-serif" transform="rotate(-90 14 {mt + ph / 2:.0f})" '
        f'text-anchor="middle">{_html.escape(y_title)}</text>'
    )
    for si, (name, vals) in enumerate(series):
        color = f"var(--s{si % len(_PALETTE)})"
        # None = no measurement at that hour: BREAK the line into
        # per-segment polylines instead of plotting a fabricated value
        # (the single-point runs still get their marker below)
        runs: list[list[tuple[int, float]]] = [[]]
        for i, v in enumerate(vals):
            if v is None:
                if runs[-1]:
                    runs.append([])
            else:
                runs[-1].append((i, v))
        for run in runs:
            if len(run) < 2:
                continue
            pts = " ".join(f"{X(i):.1f},{Y(v):.1f}" for i, v in run)
            parts.append(
                f'<polyline points="{pts}" fill="none" stroke="{color}" '
                f'stroke-width="2" stroke-linejoin="round"/>'
            )
        for i, v in enumerate(vals):  # 8px markers, native hover tooltip
            if v is None:
                continue
            parts.append(
                f'<circle cx="{X(i):.1f}" cy="{Y(v):.1f}" r="4" fill="{color}" '
                f'stroke="{surface}" stroke-width="2">'
                f"<title>{_html.escape(f'{name} — {x_labels[i]}: {_fmt(v)}')}"
                f"</title></circle>"
            )
    base_ly = mt + ph + 36  # legend rows under the x labels
    for si, (name, lx0, row) in enumerate(items):
        color = f"var(--s{si % len(_PALETTE)})"
        ly = base_ly + 16 * (row - 1)
        parts.append(
            f'<circle cx="{lx0 + 5}" cy="{ly - 4}" r="5" fill="{color}"/>'
            f'<text x="{lx0 + 14}" y="{ly}" fill="{ink}" font-size="11" '
            f'font-family="sans-serif">{_html.escape(name)}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def _figure(x_labels, series, *, title, y_title) -> str:
    if _HAVE_PLOTLY:  # pragma: no cover — plotly absent in this container
        fig = go.Figure()
        for si, (name, vals) in enumerate(series):
            fig.add_trace(
                go.Scatter(
                    x=list(x_labels),
                    y=list(vals),
                    mode="lines+markers",
                    name=name,
                    line={"color": _PALETTE[si % len(_PALETTE)], "width": 2},
                )
            )
        fig.update_layout(
            title=title, yaxis_title=y_title, yaxis={"fixedrange": True}, height=400
        )
        return fig.to_html(full_html=False, include_plotlyjs="cdn")
    return render_timeseries_svg(x_labels, series, title=title, y_title=y_title)


def _collect_day(day_df: DataFrame) -> list[dict]:
    rows = (
        day_df.select(*TABLE_COLUMNS)
        .orderBy("timestamp_hour", "machine_id")
        .collect()
    )
    return [r.asDict() for r in rows]


def _machine_series(
    rows: list[dict], hours: list, cols: Sequence[str]
) -> list[tuple[str, list[float]]]:
    """Reference-parity mode: one series per (metric, machine); a machine
    with no row for an hour yields ``None`` and the renderers BREAK the
    line there (the reference draws nothing at that x position). A
    fabricated 0.0 would be indistinguishable from a real instant-cycle
    measurement and drag min/avg lines to the axis (r4 ADVICE)."""
    machines = sorted({r["machine_id"] for r in rows})
    cell = {
        (r["timestamp_hour"], r["machine_id"], c): r[c]
        for r in rows
        for c in cols
    }
    return [
        (
            f"{_LABELS[c]} — {m}",
            [
                None if cell.get((h, m, c)) is None else float(cell[(h, m, c)])
                for h in hours
            ],
        )
        for c in cols
        for m in machines
    ]


def build_dashboard_html(
    day_df: DataFrame, day: dt.date | str, *, machine_series: bool = False
) -> str:
    """The full artifact: summary table + the two reference figures,
    from a :func:`pipeline.serving.day_slice` frame (already day-pruned
    and machine-filtered). Collect is bounded: 24 h x #machines rows.
    ``machine_series=True`` switches both figures to one series per
    (metric, machine) — reference parity, see module docstring."""
    rows = _collect_day(day_df)
    hours = sorted({r["timestamp_hour"] for r in rows})
    x_labels = [h.strftime("%H:%M") for h in hours]
    by_hour: dict = {h: [r for r in rows if r["timestamp_hour"] == h] for h in hours}

    if machine_series:
        err_series = _machine_series(rows, hours, ERROR_COLUMNS)
        cyc_series = _machine_series(rows, hours, CYCLE_TIME_COLUMNS)
        return _render_page(day, rows, x_labels, err_series, cyc_series)

    err_series = [
        (
            _LABELS[c],
            [float(sum(r[c] or 0 for r in by_hour[h])) for h in hours],
        )
        for c in ERROR_COLUMNS
    ]
    agg = {"min_cycle_time_seconds": min, "max_cycle_time_seconds": max}
    cyc_series = []
    for c in CYCLE_TIME_COLUMNS:
        f = agg.get(c)
        vals = []
        for h in hours:
            xs = [r[c] for r in by_hour[h] if r[c] is not None]
            if not xs:
                vals.append(0.0)
            elif f is not None:
                vals.append(float(f(xs)))
            else:  # avg of avgs weighted by cycle_count
                w = [r["cycle_count"] or 0 for r in by_hour[h] if r[c] is not None]
                vals.append(
                    float(sum(x * k for x, k in zip(xs, w)) / sum(w))
                    if sum(w)
                    else float(sum(xs) / len(xs))
                )
        cyc_series.append((_LABELS[c], vals))
    return _render_page(day, rows, x_labels, err_series, cyc_series)


def _render_page(day, rows, x_labels, err_series, cyc_series) -> str:

    head = [
        f"<th>{_html.escape(c)}</th>" for c in TABLE_COLUMNS
    ]
    body = [
        "<tr>" + "".join(f"<td>{_fmt(r[c])}</td>" for c in TABLE_COLUMNS) + "</tr>"
        for r in rows
    ]
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Machine event dashboard — {_html.escape(str(day))}</title>
<style>
 {_css_theme()}
 body {{ background: var(--surface); color: var(--ink);
        font-family: sans-serif; margin: 24px; }}
 table {{ border-collapse: collapse; font-size: 12px; margin-bottom: 28px; }}
 th, td {{ border: 1px solid var(--grid); padding: 4px 8px;
           text-align: right; }}
 th {{ background: var(--thead); }}
 h1 {{ font-size: 20px; }} h2 {{ font-size: 15px; color: var(--ink2); }}
</style></head><body>
<h1>Machine event dashboard</h1>
<h2>Hourly aggregates for {_html.escape(str(day))}</h2>
<table><thead><tr>{''.join(head)}</tr></thead>
<tbody>{''.join(body)}</tbody></table>
{_figure(x_labels, err_series, title="Error counts over time", y_title="count")}
{_figure(x_labels, cyc_series, title="Cycle time (min/avg/max) over time",
         y_title="cycle time (s)")}
</body></html>"""


def write_dashboard(
    day_df: DataFrame,
    day: dt.date | str,
    path: str,
    *,
    machine_series: bool = False,
) -> str:
    html_text = build_dashboard_html(day_df, day, machine_series=machine_series)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html_text)
    return path


def main(argv: list[str]) -> int:
    """``python -m …pipeline.dashboard <warehouse> <day> <out.html>
    [--machine-series]`` — build the artifact from the serving layer
    (deploy/docker-compose.yml dashboard_service)."""
    from projekt_data_engineering_iubh_spark.pipeline import serving
    from projekt_data_engineering_iubh_spark.session import get_spark

    if len(argv) < 4:
        print("usage: dashboard.py <warehouse_dir> <YYYY-MM-DD> <out.html>"
              " [--machine-series]")
        return 1
    from pyspark.sql import SparkSession

    # only stop a session this CLI itself created (in-process callers —
    # tests, notebooks — keep theirs)
    borrowed = SparkSession.getActiveSession() is not None
    spark = get_spark("dashboard")
    try:
        day = serving.day_slice(serving.summary_table(spark, argv[1]), argv[2])
        write_dashboard(
            day, argv[2], argv[3], machine_series="--machine-series" in argv
        )
        print(argv[3])
        return 0
    finally:
        if not borrowed:
            spark.stop()


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv))
