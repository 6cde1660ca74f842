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
{% endfor %}
{% endfor %}
"""
)


def _fmt_ts(epoch: int) -> str:
    return datetime.fromtimestamp(epoch, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def render_markdown(analysis: Analysis, bucket_seconds: int = 600) -> str:
    """S7: collect the (tiny) ranked result and render markdown."""
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


def save_report(analysis: Analysis, out_path: str,
                bucket_seconds: int = 600) -> str:
    md = render_markdown(analysis, bucket_seconds)
    with open(out_path, "w") as f:
        f.write(md)
    return out_path


def save_charts(analysis: Analysis, out_dir: str) -> list[str]:
    """S6: one PNG per (bucket, objective) — optional, needs matplotlib."""
    try:
        import matplotlib  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "PNG sink requires matplotlib, which is not installed in this "
            "environment; the markdown sink (save_report) is the primary "
            "report path"
        ) from e
    raise NotImplementedError("chart rendering not yet implemented")
