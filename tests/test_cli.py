"""CLI surface: reference-compatible -i/-o invocation end-to-end."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUNDLE = "/root/reference/metrics/full-index-lookup.tar.gz"


def test_cli_end_to_end(tmp_path):
    out_dir = str(tmp_path / "reports")
    proc = subprocess.run(
        [
            sys.executable, "-m", "metrics_advisor_spark.cli",
            "-i", BUNDLE, "-o", out_dir,
            "--permutations", "20",  # keep the E-Divisive stage quick
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = os.path.join(out_dir, "report_full-index-lookup.md")
    assert proc.stdout.strip().endswith("report_full-index-lookup.md")
    with open(report) as f:
        md = f.read()
    assert "# Metrics Advisor Report" in md
    assert "Time slice" in md


def test_cli_help_mentions_reference_flags():
    proc = subprocess.run(
        [sys.executable, "-m", "metrics_advisor_spark.cli", "--help"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode == 0
    for flag in ("-i", "-o", "--objectives", "--lag-max"):
        assert flag in proc.stdout


def test_cli_prom_source(tmp_path):
    out_dir = str(tmp_path / "prom_reports")
    proc = subprocess.run(
        [
            sys.executable, "-m", "metrics_advisor_spark.cli",
            "-i", BUNDLE, "-o", out_dir,
            "--source", "prom", "--permutations", "30",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = os.path.join(out_dir, "report_full-index-lookup.md")
    assert os.path.exists(report)
    assert "# Metrics Advisor Report" in open(report).read()
