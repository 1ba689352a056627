"""Dashboard surface: a dependency-free static HTML render of the four
canned serving queries — the engine-side answer to the reference's
Streamlit BI layer (`/root/reference/src/visualization/dashboard.py:261-463`:
KPI metric row, global trend chart, top-N bar chart, recent-activity
view, 1-hour result cache).

Design:

- **The engine computes; the browser only displays.** Each panel is a
  registry query (`global_stats`, `daily_rollup_7day`, `topk_orders`,
  `recent_days`) collected AFTER aggregation — the driver ships tens of
  rows, never the fact table. At 100 TB nothing changes: the heavy
  lifting stays in the cluster, the HTML stays kilobytes.
- **TTL snapshot cache.** ``write_dashboard`` routes every panel frame
  through the same parquet-snapshot TTL cache the serving layer uses
  (`serving.cached_query` ↔ reference ``@st.cache_data(ttl=3600)``,
  dashboard.py:68), so a dashboard refresh inside the TTL re-reads
  snapshots instead of re-running the queries.
- **No chart library.** Inline SVG with a hand-rolled hover layer
  (crosshair + tooltip on the line chart, per-mark tooltips on bars);
  every charted value is also in a ``<details>`` table, so the tooltip
  enhances and never gates. All dynamic strings are HTML-escaped.
- Light and dark render from the same two validated series hues
  (palette checked for lightness band, chroma, CVD separation, and
  surface contrast in both modes); single-series charts carry no
  legend, the two-series trend chart does.
"""

from __future__ import annotations

import html

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

#: Validated categorical slots (light, dark): blue, orange.
_SERIES = {
    "s1": ("#2a78d6", "#3987e5"),
    "s2": ("#eb6834", "#d95926"),
}

_W, _H = 640, 230
_ML, _MR, _MT, _MB = 56, 96, 12, 28


def _fmt(v: float | int) -> str:
    """Auto-compact value formatting: 1,284 / 12.9K / 4.2M."""
    v = float(v)
    a = abs(v)
    if a >= 1_000_000:
        return f"{v / 1_000_000:.1f}M"
    if a >= 10_000:
        return f"{v / 1_000:.1f}K"
    if v == int(v):
        return f"{int(v):,}"
    return f"{v:,.2f}"


def dashboard_frames(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The four canned panels as DataFrames (the reference dashboard's
    four cached loaders). Everything is aggregated engine-side; the
    recent-activity panel rolls the `recent_days` event slice up to
    per-type counts before it ever reaches the driver."""
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    return {
        "global_stats": REGISTRY["global_stats"].fn(spark, sf_dir),
        "daily_trend": REGISTRY["daily_rollup_7day"].fn(spark, sf_dir),
        "top_orders": REGISTRY["topk_orders"].fn(spark, sf_dir).limit(12),
        "recent_by_type": (
            REGISTRY["recent_days"].fn(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
            .orderBy(F.col("n_events").desc(), "event_type")
        ),
    }


def _css() -> str:
    s1l, s1d = _SERIES["s1"]
    s2l, s2d = _SERIES["s2"]
    return f"""
.viz-root {{
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f4f3f1;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #8a8883;
  --grid: #e7e6e2; --series-1: {s1l}; --series-2: {s2l};
  font-family: system-ui, -apple-system, "Segoe UI", sans-serif;
  background: var(--surface-1); color: var(--text-primary);
  margin: 0 auto; max-width: 720px; padding: 24px 16px;
}}
@media (prefers-color-scheme: dark) {{
  :root:where(:not([data-theme="light"])) .viz-root {{
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #242422;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8a8883;
    --grid: #33332f; --series-1: {s1d}; --series-2: {s2d};
  }}
}}
:root[data-theme="dark"] .viz-root {{
  color-scheme: dark;
  --surface-1: #1a1a19; --surface-2: #242422;
  --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8a8883;
  --grid: #33332f; --series-1: {s1d}; --series-2: {s2d};
}}
.viz-root h1 {{ font-size: 20px; font-weight: 600; margin: 0 0 2px; }}
.viz-root .sub {{ color: var(--text-secondary); font-size: 13px; margin: 0 0 20px; }}
.viz-root h2 {{ font-size: 14px; font-weight: 600; margin: 28px 0 2px; }}
.viz-root .desc {{ color: var(--text-secondary); font-size: 12px; margin: 0 0 10px; }}
.hero {{ font-size: 48px; font-weight: 600; line-height: 1.1; }}
.hero-label {{ color: var(--text-secondary); font-size: 13px; }}
.kpis {{ display: flex; gap: 12px; flex-wrap: wrap; margin-top: 16px; }}
.tile {{ background: var(--surface-2); border-radius: 8px; padding: 10px 14px; min-width: 108px; }}
.tile .label {{ color: var(--text-secondary); font-size: 12px; }}
.tile .value {{ font-size: 22px; font-weight: 600; }}
.legend {{ display: flex; gap: 16px; font-size: 12px; color: var(--text-secondary); margin: 6px 0; }}
.legend .key {{ display: inline-block; width: 14px; height: 0; border-top: 2px solid; margin-right: 5px; vertical-align: middle; }}
svg text {{ fill: var(--text-secondary); font-size: 11px; font-variant-numeric: tabular-nums; }}
svg .dlabel {{ fill: var(--text-primary); font-size: 11px; }}
svg .grid {{ stroke: var(--grid); stroke-width: 1; }}
details {{ margin: 6px 0 0; font-size: 12px; }}
details summary {{ color: var(--text-muted); cursor: pointer; }}
table {{ border-collapse: collapse; margin-top: 6px; }}
td, th {{ padding: 3px 10px; text-align: right; font-variant-numeric: tabular-nums; }}
th {{ color: var(--text-secondary); font-weight: 500; }}
td:first-child, th:first-child {{ text-align: left; }}
.tt {{ position: fixed; pointer-events: none; background: var(--surface-2);
  border: 1px solid var(--grid); border-radius: 6px; padding: 6px 9px;
  font-size: 12px; display: none; z-index: 9; }}
.tt b {{ font-variant-numeric: tabular-nums; }}
.tt .key {{ display: inline-block; width: 12px; height: 0; border-top: 2px solid; margin-right: 4px; vertical-align: middle; }}
"""


_JS = """
(function () {
  var tt = document.getElementById('tt');
  function show(x, y, html) {
    tt.innerHTML = html; tt.style.display = 'block';
    var w = tt.offsetWidth;
    tt.style.left = Math.min(x + 14, window.innerWidth - w - 8) + 'px';
    tt.style.top = (y + 14) + 'px';
  }
  function hide() { tt.style.display = 'none'; }
  function row(color, label, value) {
    var s = document.createElement('span');
    var k = document.createElement('span');
    k.className = 'key'; k.style.borderTopColor = color;
    var b = document.createElement('b'); b.textContent = value;
    var l = document.createElement('span'); l.textContent = ' ' + label;
    l.style.color = 'var(--text-secondary)';
    s.appendChild(k); s.appendChild(b); s.appendChild(l);
    return s.outerHTML;
  }
  document.querySelectorAll('[data-tip]').forEach(function (el) {
    el.addEventListener('pointermove', function (e) {
      var d = JSON.parse(el.getAttribute('data-tip'));
      show(e.clientX, e.clientY, d.map(function (r) {
        return row(r[0], r[1], r[2]);
      }).join('<br>'));
      el.setAttribute('opacity', '0.8');
    });
    el.addEventListener('pointerleave', function () {
      hide(); el.setAttribute('opacity', '1');
    });
  });
  document.querySelectorAll('svg[data-xs]').forEach(function (svg) {
    var xs = JSON.parse(svg.getAttribute('data-xs'));
    var tips = JSON.parse(svg.getAttribute('data-tips'));
    var cross = svg.querySelector('.crosshair');
    svg.addEventListener('pointermove', function (e) {
      var pt = svg.createSVGPoint(); pt.x = e.clientX; pt.y = e.clientY;
      var p = pt.matrixTransform(svg.getScreenCTM().inverse());
      var best = 0, bd = 1e9;
      xs.forEach(function (x, i) {
        var d = Math.abs(x - p.x); if (d < bd) { bd = d; best = i; }
      });
      cross.setAttribute('x1', xs[best]); cross.setAttribute('x2', xs[best]);
      cross.style.display = 'block';
      show(e.clientX, e.clientY, tips[best].map(function (r) {
        return row(r[0], r[1], r[2]);
      }).join('<br>'));
    });
    svg.addEventListener('pointerleave', function () {
      cross.style.display = 'none'; hide();
    });
  });
})();
"""


def _ticks(lo: float, hi: float, n: int = 4) -> list[float]:
    """Clean round-number axis ticks covering [0 or lo, hi]."""
    import math

    hi = max(hi, 1e-9)
    lo = min(0.0, lo)
    step = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(step))
    for m in (1, 2, 2.5, 5, 10):
        if mag * m >= step:
            step = mag * m
            break
    t0 = math.floor(lo / step) * step
    out = []
    t = t0
    while t <= hi + step * 0.5:
        out.append(round(t, 10))
        t += step
    return out


def _table(headers: list[str], rows: list[list[str]]) -> str:
    head = "".join(f"<th>{html.escape(h)}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(c)}</td>" for c in r) + "</tr>"
        for r in rows
    )
    return (
        "<details><summary>Table view</summary><table>"
        f"<tr>{head}</tr>{body}</table></details>"
    )


def _kpi_row(stats: list[Row]) -> str:
    counts = {r["table_name"]: r["n_rows"] for r in stats}
    total = sum(counts.values())
    tiles = "".join(
        f'<div class="tile"><div class="label">{html.escape(t)} rows</div>'
        f'<div class="value">{_fmt(counts[t])}</div></div>'
        for t in ("orders", "lineitem", "events", "documents")
        if t in counts
    )
    table = _table(
        ["table", "rows"],
        [[t, f"{n:,}"] for t, n in sorted(counts.items())],
    )
    return (
        '<div class="hero-label">Total rows under management</div>'
        f'<div class="hero">{_fmt(total)}</div>'
        f'<div class="kpis">{tiles}</div>{table}'
    )


def _scale(vals: list[float], lo: float, hi: float, a: float, b: float) -> list[float]:
    span = (hi - lo) or 1.0
    return [a + (v - lo) / span * (b - a) for v in vals]


def _line_chart(rows: list[Row]) -> str:
    """Two-series trend: daily total (slot 1) + 7-day avg (slot 2),
    crosshair tooltip listing both series at the nearest date."""
    import json as _json

    dates = [str(r["event_date"]) for r in rows]
    t = [float(r["total_value"]) for r in rows]
    avg = [float(r["value_7day_avg"]) for r in rows]
    ticks = _ticks(min(t + avg), max(t + avg))
    lo, hi = ticks[0], ticks[-1]
    xs = _scale(list(range(len(rows))), 0, max(len(rows) - 1, 1), _ML, _W - _MR)
    y_t = _scale(t, lo, hi, _H - _MB, _MT)
    y_a = _scale(avg, lo, hi, _H - _MB, _MT)

    grid = "".join(
        f'<line class="grid" x1="{_ML}" x2="{_W - _MR}" y1="{y:.1f}" y2="{y:.1f}"/>'
        f'<text x="{_ML - 6}" y="{y + 4:.1f}" text-anchor="end">{_fmt(v)}</text>'
        for v, y in zip(ticks, _scale(ticks, lo, hi, _H - _MB, _MT))
    )
    xlabels = "".join(
        f'<text x="{xs[i]:.1f}" y="{_H - 8}" text-anchor="middle">'
        f"{html.escape(dates[i][5:])}</text>"
        for i in (0, len(rows) // 2, len(rows) - 1)
    )

    def path(ys: list[float]) -> str:
        return "M" + "L".join(f"{x:.1f},{y:.1f}" for x, y in zip(xs, ys))

    # per-X tooltip payload: [color, label, value] rows (escaped JSON)
    tips = [
        [
            ["var(--series-1)", f"daily total · {d[5:]}", _fmt(tv)],
            ["var(--series-2)", "7-day avg", _fmt(av)],
        ]
        for d, tv, av in zip(dates, t, avg)
    ]
    data_xs = html.escape(_json.dumps([round(x, 1) for x in xs]))
    data_tips = html.escape(_json.dumps(tips))

    # end dots with a 2px surface ring; direct end labels in text ink —
    # but only when the endpoints separate enough to label cleanly
    # (converging ends would collide; the legend then carries identity)
    end = (
        f'<circle cx="{xs[-1]:.1f}" cy="{y_t[-1]:.1f}" r="4" fill="var(--series-1)"'
        ' stroke="var(--surface-1)" stroke-width="2"/>'
        f'<circle cx="{xs[-1]:.1f}" cy="{y_a[-1]:.1f}" r="4" fill="var(--series-2)"'
        ' stroke="var(--surface-1)" stroke-width="2"/>'
    )
    if abs(y_t[-1] - y_a[-1]) >= 12:
        end += (
            f'<text class="dlabel" x="{xs[-1] + 8:.1f}" y="{y_t[-1] + 4:.1f}">daily total</text>'
            f'<text class="dlabel" x="{xs[-1] + 8:.1f}" y="{y_a[-1] + 4:.1f}">7-day avg</text>'
        )
    legend = (
        '<div class="legend">'
        '<span><span class="key" style="border-top-color: var(--series-1)"></span>daily total</span>'
        '<span><span class="key" style="border-top-color: var(--series-2)"></span>7-day avg</span>'
        "</div>"
    )
    table = _table(
        ["date", "daily total", "7-day avg"],
        [[d, _fmt(tv), _fmt(av)] for d, tv, av in zip(dates, t, avg)],
    )
    return (
        legend
        + f'<svg viewBox="0 0 {_W} {_H}" width="100%" data-xs="{data_xs}" data-tips="{data_tips}">'
        + grid
        + xlabels
        + f'<path d="{path(y_t)}" fill="none" stroke="var(--series-1)"'
        ' stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/>'
        + f'<path d="{path(y_a)}" fill="none" stroke="var(--series-2)"'
        ' stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/>'
        + end
        + f'<line class="crosshair" x1="0" x2="0" y1="{_MT}" y2="{_H - _MB}"'
        ' stroke="var(--text-muted)" stroke-width="1" style="display:none"/>'
        "</svg>" + table
    )


def _bar_chart(labels: list[str], values: list[float], unit: str = "") -> str:
    """Horizontal single-hue magnitude bars: 18px thick, 4px rounded
    data-end (square at the baseline), value labels at the tip, 2px
    band air between bars, per-mark tooltip."""
    import json as _json

    band, bar_h = 24, 18
    h = _MT + band * len(labels) + 8
    hi = max(values) if values else 1.0
    x0, x1 = 150, _W - 70
    widths = _scale(values, 0.0, hi, 0.0, float(x1 - x0))
    parts = []
    for i, (lab, v, w) in enumerate(zip(labels, values, widths)):
        y = _MT + i * band + (band - bar_h) / 2
        w = max(w, 1.0)
        r = min(4.0, w)
        d = (
            f"M{x0},{y:.1f} h{w - r:.1f} a{r},{r} 0 0 1 {r},{r}"
            f" v{bar_h - 2 * r} a{r},{r} 0 0 1 -{r},{r} h-{w - r:.1f} z"
        )
        tip = html.escape(_json.dumps([[ "var(--series-1)", lab, _fmt(v) + unit ]]))
        parts.append(
            f'<text x="{x0 - 8}" y="{y + bar_h / 2 + 4:.1f}" text-anchor="end">'
            f"{html.escape(lab)}</text>"
            f'<path d="{d}" fill="var(--series-1)" data-tip="{tip}"/>'
            f'<text class="dlabel" x="{x0 + w + 6:.1f}" y="{y + bar_h / 2 + 4:.1f}">'
            f"{_fmt(v)}{unit}</text>"
        )
    table = _table(
        ["category", "value"],
        [[lab, _fmt(v) + unit] for lab, v in zip(labels, values)],
    )
    return (
        f'<svg viewBox="0 0 {_W} {h:.0f}" width="100%">' + "".join(parts) + "</svg>"
        + table
    )


def render_dashboard(
    stats: list[Row],
    trend: list[Row],
    top_orders: list[Row],
    recent_by_type: list[Row],
    source_label: str = "",
) -> str:
    """Pure renderer: four collected (small, post-aggregation) row sets
    → one self-contained HTML page. Deterministic for fixed input."""
    body = (
        '<h1>Engine serving dashboard</h1>'
        f'<p class="sub">Static snapshot rendered engine-side'
        f"{' · ' + html.escape(source_label) if source_label else ''}</p>"
        + _kpi_row(stats)
        + "<h2>Daily event value</h2>"
        '<p class="desc">Total value per day with its 7-day trailing average'
        " (daily_rollup_7day)</p>" + _line_chart(trend)
        + "<h2>Top orders by total price</h2>"
        '<p class="desc">Largest orders in the window (topk_orders)</p>'
        + _bar_chart(
            [f"order {r['o_orderkey']}" for r in top_orders],
            [float(r["o_totalprice"]) for r in top_orders],
        )
        + "<h2>Recent activity by event type</h2>"
        '<p class="desc">Events in the most recent days (recent_days)</p>'
        + _bar_chart(
            [str(r["event_type"]) for r in recent_by_type],
            [float(r["n_events"]) for r in recent_by_type],
        )
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<meta name='viewport' content='width=device-width, initial-scale=1'>"
        "<title>Engine dashboard</title>"
        f"<style>{_css()}</style></head>"
        f"<body class='viz-root'>{body}<div id='tt' class='tt'></div>"
        f"<script>{_JS}</script></body></html>"
    )


def write_dashboard(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    cache_root: str | None = None,
    ttl_seconds: int = 3600,
) -> str:
    """Compute (or TTL-cache-read) the four panels and write the HTML
    snapshot. ``cache_root`` routes each panel through the parquet
    snapshot cache (`serving.cached_frame`), so refreshes inside the
    TTL cost four snapshot reads, not four query executions."""
    frames = dashboard_frames(spark, sf_dir)
    if cache_root is not None:
        from covid19_etl_pipeline_spark.serving import cached_frame

        frames = {
            name: cached_frame(
                spark, f"dash_{name}", lambda df=df: df, cache_root, ttl_seconds
            )
            for name, df in frames.items()
        }
    page = render_dashboard(
        frames["global_stats"].collect(),
        frames["daily_trend"].collect(),
        frames["top_orders"].collect(),
        frames["recent_by_type"].collect(),
        source_label=sf_dir,
    )
    with open(out_path, "w") as fh:
        fh.write(page)
    return out_path
