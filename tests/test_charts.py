"""SVG chart sink (S6): files render with series, legend and vlines."""

from __future__ import annotations

import numpy as np

from metrics_advisor_spark import AdvisorConfig
from metrics_advisor_spark.plans import analyze
from metrics_advisor_spark.plans.report import save_charts

from conftest import make_signals_df


def test_save_charts_renders_svg(spark, tmp_path):
    rng = np.random.default_rng(11)
    n = 120
    obj = np.concatenate([np.full(60, 1.0), np.full(60, 8.0)])
    cand = np.concatenate([np.full(60, 2.0), np.full(60, 16.0)])
    cand = cand + rng.normal(0, 0.05, n)
    noise = rng.normal(0, 0.1, n)
    df = make_signals_df(
        spark,
        {
            ("tidb_p99_rt:total", "agg_val"): obj + rng.normal(0, 0.05, n),
            ("tikv_cpu", "node1"): cand,
            ("flat", "x"): noise,
        },
    )
    cfg = AdvisorConfig(cp_permutations=30, min_range=1e-6)
    res = analyze(df, cfg)
    paths = save_charts(res, str(tmp_path / "charts"), top_k=5)
    assert paths, "expected at least one chart"
    (bucket_id, obj_metric, _), first = sorted(paths.items())[0]
    assert obj_metric == "tidb_p99_rt:total"
    svg = open(first).read()
    assert svg.startswith("<svg")
    assert svg.count("<polyline") >= 2          # objective + ≥1 candidate
    assert "stroke-dasharray" in svg            # change-point vlines
    assert "(objective)" in svg and "corr=" in svg  # text legend

    # report with embedded charts: relative links appear in the markdown
    from metrics_advisor_spark.plans.report import save_report

    out = str(tmp_path / "report.md")
    save_report(res, out, charts_dir=str(tmp_path / "charts2"))
    md = open(out).read()
    assert "![tidb_p99_rt:total/" in md
    assert "charts2/" in md
