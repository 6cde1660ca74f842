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


def test_save_charts_renders_png(spark, tmp_path):
    # fmt="png" writes genuine raster PNGs (stdlib-zlib encoder —
    # reference S6 emits matplotlib PNGs; this is the same format
    # without the library): signature + CRC-checked chunks, decodable
    # back to the canvas with both series' palette colors painted.
    rng = np.random.default_rng(11)
    n = 120
    obj = np.concatenate([np.full(60, 1.0), np.full(60, 8.0)])
    cand = np.concatenate([np.full(60, 2.0), np.full(60, 16.0)])
    df = make_signals_df(
        spark,
        {
            ("tidb_p99_rt:total", "agg_val"): obj + rng.normal(0, 0.05, n),
            ("tikv_cpu", "node1"): cand + rng.normal(0, 0.05, n),
        },
    )
    cfg = AdvisorConfig(cp_permutations=30, min_range=1e-6)
    res = analyze(df, cfg)
    paths = save_charts(res, str(tmp_path / "charts"), top_k=5, fmt="png")
    assert paths, "expected at least one chart"
    first = sorted(paths.values())[0]
    assert first.endswith(".png")
    payload = open(first, "rb").read()
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"

    from metrics_advisor_spark.plans.charts_png import _hex_rgb, _parse_png
    from metrics_advisor_spark.plans.report import _SERIES_COLORS

    arr = _parse_png(payload)
    assert arr.shape == (360, 720, 3)
    # objective + >=1 candidate polylines in the fixed-order palette
    for color in _SERIES_COLORS[:2]:
        want = np.array(_hex_rgb(color), dtype=np.uint8)
        assert (arr == want).all(axis=2).sum() > 50, color
    # text ink (title/legend) and a mostly-white canvas
    ink = np.array(_hex_rgb("#1a1a19"), dtype=np.uint8)
    assert (arr == ink).all(axis=2).sum() > 100
    assert (arr == 255).all(axis=2).mean() > 0.5


def test_png_encoder_roundtrip():
    from metrics_advisor_spark.plans.charts_png import _encode_png, _parse_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
    assert (_parse_png(_encode_png(img)) == img).all()
