"""Report sink (SURVEY.md §2.1 S6/S7).

The reference renders a Jinja2 markdown report of per-bucket objective
anomalies and their top-3 correlated candidates
(/root/reference/metrics_advisor.py:237-247, templates/report.tpl) plus
matplotlib PNGs (S6).  The ranked result is tiny (top-k per bucket ×
objective), so rendering is a driver-side collect; the PNG sink is gated
behind an import-try because matplotlib is optional.
"""

from __future__ import annotations

from datetime import datetime, timezone

import jinja2
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.plans.analyze import Analysis

_TEMPLATE = jinja2.Template(
    """\
# Metrics Advisor Report

## Summary

{% if slices %}There are {{ slices | length }} time slice(s) with anomalous \
objective metrics: {% for s in slices %}{{ s }}{{ ", " if not loop.last }}{% endfor %}.
{% else %}No anomalous objective metrics detected.
{% endif %}

## Details

{% for b in buckets %}
### Time slice {{ b.bucket_id }} ({{ b.start }} … {{ b.end }})

{% for obj in b.objectives %}
- **{{ obj.name }}** — top correlated candidates:
{% for c in obj.candidates %}
  {{ loop.index }}. `{{ c.name }}` (lag={{ c.lag }}, corr={{ "%.4f" | format(c.corr) }})
{% endfor %}
{% if obj.chart %}
  ![{{ obj.name }}]({{ obj.chart }})
{% endif %}
{% endfor %}
{% endfor %}
"""
)


def _fmt_ts(epoch: int) -> str:
    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def summary_slice_count(membership: DataFrame) -> DataFrame:
    """A6: the report Summary line's number — the count of time slices
    holding ≥1 anomalous OBJECTIVE series (templates/report.tpl "There
    are N time slice(s) with anomalous objective metrics"; reference
    summary math at /root/reference/metrics_advisor.py:237-247) —
    computed as a lazy aggregate over the SAME membership DF
    ``render_markdown`` renders, so the driver's oracle can check the
    rendered count without collecting the report."""
    return membership.filter("is_obj").agg(
        F.countDistinct("bucket_id").alias("n_anomalous_slices")
    )


def render_markdown(
    analysis: Analysis,
    bucket_seconds: int = 600,
    chart_paths: dict[tuple[int, str, str], str] | None = None,
) -> str:
    """S7: collect the (tiny) ranked result and render markdown.

    ``chart_paths`` optionally maps (bucket_id, obj_metric, obj_series)
    to a chart file (from ``save_charts``) embedded per objective."""
    rows = analysis.ranked.collect()
    obj_buckets = sorted(
        {
            (r["bucket_id"], r["obj_metric"], r["obj_series"])
            for r in rows
        }
    )
    buckets: dict[int, dict] = {}
    for bucket_id, obj_metric, obj_series in obj_buckets:
        start = analysis.tmin + bucket_id * bucket_seconds
        b = buckets.setdefault(
            bucket_id,
            {
                "bucket_id": bucket_id,
                "start": _fmt_ts(start),
                "end": _fmt_ts(start + bucket_seconds),
                "objectives": [],
            },
        )
        cands = sorted(
            (
                r
                for r in rows
                if (r["bucket_id"], r["obj_metric"], r["obj_series"])
                == (bucket_id, obj_metric, obj_series)
            ),
            key=lambda r: r["rank"],
        )
        b["objectives"].append(
            {
                "name": f"{obj_metric}/{obj_series}",
                "chart": (chart_paths or {}).get(
                    (bucket_id, obj_metric, obj_series)
                ),
                "candidates": [
                    {
                        "name": f"{c['cand_metric']}/{c['cand_series']}",
                        "lag": c["lag"],
                        "corr": c["corr"],
                    }
                    for c in cands
                ],
            }
        )
    ordered = [buckets[k] for k in sorted(buckets)]
    return _TEMPLATE.render(slices=sorted(buckets), buckets=ordered)


def save_report(
    analysis: Analysis,
    out_path: str,
    bucket_seconds: int = 600,
    charts_dir: str | None = None,
) -> str:
    """Write the markdown report; with ``charts_dir``, also render the
    SVG charts there and embed them (relative links) per objective."""
    import os

    chart_paths = None
    if charts_dir is not None:
        charts = save_charts(analysis, charts_dir, bucket_seconds=bucket_seconds)
        base = os.path.dirname(os.path.abspath(out_path)) or "."
        chart_paths = {
            key: os.path.relpath(p, base) for key, p in charts.items()
        }
    md = render_markdown(analysis, bucket_seconds, chart_paths)
    with open(out_path, "w") as f:
        f.write(md)
    return out_path


# --- SVG chart sink (S6) ----------------------------------------------------
# The reference renders one matplotlib PNG per (bucket, objective) with the
# normalized objective, its top-5 candidates and anomaly vlines
# (metrics_advisor.py:198-226).  matplotlib isn't available here, so the
# sink emits dependency-free SVG with the same content.  Colors: fixed-order
# categorical palette (objective always slot 1), CVD-validated; series
# identity also carried by the text legend, never color alone.

_SERIES_COLORS = [
    "#2a78d6",  # 1 blue — objective
    "#eb6834",  # 2 orange
    "#1baf7a",  # 3 aqua
    "#eda100",  # 4 yellow
    "#e87ba4",  # 5 magenta
    "#008300",  # 6 green
]
_W, _H = 720, 360
_PAD_L, _PAD_R, _PAD_T, _PAD_B = 50, 16, 34, 22


def _svg_chart(
    title: str,
    series: list[tuple[str, list[int], list[float]]],
    vlines: list[int],
) -> str:
    """One SVG line chart: normalized series + dashed anomaly vlines."""
    xs_all = [x for _, xs, _ in series for x in xs]
    ys_all = [y for _, _, ys in series for y in ys if y == y]
    if not xs_all or not ys_all:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}"></svg>'
    x0, x1 = min(xs_all), max(xs_all)
    y0, y1 = min(ys_all + [0.0]), max(ys_all + [0.0])
    if x1 == x0:
        x1 = x0 + 1
    if y1 == y0:
        y1 = y0 + 1
    # ph floored at 40px so ~20+ series cannot flip the sy() mapping
    # (save_charts caps at top_k+1, but this is a public helper;
    # mirrored in charts_png.png_chart — ADVICE r08)
    pw = _W - _PAD_L - _PAD_R
    ph = max(40, _H - _PAD_T - _PAD_B - 16 * len(series))

    def sx(x: float) -> float:
        return _PAD_L + (x - x0) / (x1 - x0) * pw

    def sy(y: float) -> float:
        return _PAD_T + (1 - (y - y0) / (y1 - y0)) * ph

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{_W}" height="{_H}" fill="#ffffff"/>',
        f'<text x="{_PAD_L}" y="18" font-size="13" fill="#1a1a19">{title}</text>',
    ]
    # recessive grid: 4 horizontal lines + y tick labels
    for i in range(5):
        gy = _PAD_T + ph * i / 4
        gv = y1 - (y1 - y0) * i / 4
        parts.append(
            f'<line x1="{_PAD_L}" y1="{gy:.1f}" x2="{_W - _PAD_R}" y2="{gy:.1f}" '
            f'stroke="#e8e8e4" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{_PAD_L - 6}" y="{gy + 4:.1f}" text-anchor="end" '
            f'fill="#6b6a62">{gv:.2f}</text>'
        )
    for v in vlines:
        parts.append(
            f'<line x1="{sx(v):.1f}" y1="{_PAD_T}" x2="{sx(v):.1f}" '
            f'y2="{_PAD_T + ph:.1f}" stroke="#6b6a62" stroke-width="1" '
            f'stroke-dasharray="4 3"/>'
        )
    for i, (label, xs, ys) in enumerate(series):
        color = _SERIES_COLORS[i % len(_SERIES_COLORS)]
        pts = " ".join(
            f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys) if y == y
        )
        parts.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="2"/>'
        )
        # legend: colored swatch + text in ink (identity never color-alone)
        ly = _PAD_T + ph + 16 + 16 * i
        parts.append(
            f'<rect x="{_PAD_L}" y="{ly - 9}" width="10" height="10" '
            f'fill="{color}"/>'
        )
        parts.append(
            f'<text x="{_PAD_L + 16}" y="{ly}" fill="#1a1a19">{label}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def save_charts(
    analysis: Analysis,
    out_dir: str,
    bucket_seconds: int = 600,
    top_k: int = 5,
    fmt: str = "svg",
) -> dict[tuple[int, str, str], str]:
    """S6: one chart per (bucket, objective): max-abs-normalized
    objective + top-k candidates + change-point vlines.

    ``fmt="svg"`` (default) emits dependency-free vector charts;
    ``fmt="png"`` emits genuine raster PNGs via the stdlib-zlib encoder
    in `plans/charts_png.py` — full reference-S6 format parity
    (metrics_advisor.py:221-223 writes matplotlib PNGs) without
    requiring matplotlib/PIL.  Both formats render the same content
    from the same geometry constants.

    Reference parity notes: top-5 for plots (K2, metrics_advisor.py:209);
    normalization is max(|x|) (the Q4 abs(max) quirk is NOT reproduced —
    documented deviation); anomaly vlines are the bucket's change points
    (Q1) across all of the bucket's objectives (Q6 bucket-level sharing,
    reproduced as the reference does).
    """
    import os

    from pyspark.sql import functions as F

    from metrics_advisor_spark.operators.xcorr import rank_correlations

    os.makedirs(out_dir, exist_ok=True)
    ranked = rank_correlations(analysis.best, top_k=top_k).collect()
    if not ranked:
        return {}
    keys = {(r["bucket_id"], r["obj_metric"], r["obj_series"]) for r in ranked}
    involved = {(r["cand_metric"], r["cand_series"]) for r in ranked} | {
        (m, s) for _, m, s in keys
    }
    buckets = {b for b, _, _ in keys}

    sig = analysis.signals.withColumn(
        "bucket_id",
        F.floor(
            (F.unix_timestamp("ts") - F.lit(analysis.tmin))
            / F.lit(bucket_seconds)
        ),
    ).filter(
        F.col("bucket_id").isin(*buckets)
        & F.concat_ws("\x00", "metric", "series").isin(
            *["\x00".join(p) for p in involved]
        )
    )
    samples: dict[tuple[int, str, str], list[tuple[int, float]]] = {}
    for r in sig.collect():
        samples.setdefault(
            (r["bucket_id"], r["metric"], r["series"]), []
        ).append((int(r["ts"].timestamp()), r["value"]))

    cp_rows = (
        analysis.anomalies.filter(F.col("kind") == "changepoint")
        .select("ts")
        .collect()
    )
    cp_by_bucket: dict[int, list[int]] = {}
    for r in cp_rows:
        e = int(r["ts"].timestamp())
        cp_by_bucket.setdefault(
            (e - analysis.tmin) // bucket_seconds, []
        ).append(e)

    def norm(pts: list[tuple[int, float]]) -> tuple[list[int], list[float]]:
        pts = sorted(pts)
        xs = [p[0] for p in pts]
        ys = [p[1] if p[1] is not None else float("nan") for p in pts]
        mx = max((abs(y) for y in ys if y == y), default=0.0)
        return xs, [y / (mx + 1e-10) for y in ys]

    paths: dict[tuple[int, str, str], str] = {}
    for bucket_id, obj_metric, obj_series in sorted(keys):
        chart_series = []
        obj_pts = samples.get((bucket_id, obj_metric, obj_series), [])
        if obj_pts:
            xs, ys = norm(obj_pts)
            chart_series.append((f"{obj_metric}/{obj_series} (objective)", xs, ys))
        cands = sorted(
            (
                r
                for r in ranked
                if (r["bucket_id"], r["obj_metric"], r["obj_series"])
                == (bucket_id, obj_metric, obj_series)
            ),
            key=lambda r: r["rank"],
        )
        for c in cands:
            pts = samples.get(
                (bucket_id, c["cand_metric"], c["cand_series"]), []
            )
            if pts:
                xs, ys = norm(pts)
                chart_series.append(
                    (
                        f"{c['cand_metric']}/{c['cand_series']} "
                        f"(lag={c['lag']}, corr={c['corr']:.3f})",
                        xs,
                        ys,
                    )
                )
        title = (
            f"bucket {bucket_id} — {obj_metric}/{obj_series} "
            f"vs top-{len(chart_series) - 1} candidates (max-abs normalized)"
        )
        safe = f"bucket{bucket_id}_{obj_metric}_{obj_series}".replace("/", "_")
        safe = "".join(ch if ch.isalnum() or ch in "._-" else "_" for ch in safe)
        cps = cp_by_bucket.get(bucket_id, [])
        if fmt == "png":
            from metrics_advisor_spark.plans.charts_png import png_chart

            path = os.path.join(out_dir, f"{safe}.png")
            with open(path, "wb") as f:
                f.write(
                    png_chart(title, chart_series, cps, _SERIES_COLORS)
                )
        else:
            path = os.path.join(out_dir, f"{safe}.svg")
            with open(path, "w") as f:
                f.write(_svg_chart(title, chart_series, cps))
        paths[(bucket_id, obj_metric, obj_series)] = path
    return paths
