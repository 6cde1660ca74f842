"""CLI entry point — drop-in for the reference's batch run.

The reference is invoked as ``python metrics_advisor.py -i <tar> -o
<dir>`` (/root/reference/metrics_advisor.py:90-97) and writes a markdown
report named ``report_<suffix>.md`` (:237-247).  This CLI keeps that
surface::

    python -m metrics_advisor_spark.cli -i metrics.tar.gz -o ./reports/

and adds the knobs the reference hard-codes (SURVEY.md §2.9 Q7):
objective metrics, bucket geometry, detection/correlation parameters.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="metrics_advisor_spark",
        description=(
            "detect intervals with abnormal points and find the most "
            "related metrics (PySpark engine)"
        ),
    )
    p.add_argument("-i", "--input", required=True,
                   help="input tar(.gz) of wide metric CSVs, or a directory")
    p.add_argument("-o", "--output", default="./reports/", help="output dir")
    p.add_argument("--objectives", default=None,
                   help="comma-separated objective metric names "
                        "(default: the reference's hard-coded list)")
    p.add_argument("--bucket-samples", type=int, default=40,
                   help="samples per bucket (reference count_bucket)")
    p.add_argument("--step-seconds", type=int, default=15,
                   help="sample cadence in seconds")
    p.add_argument("--lag-max", type=int, default=3,
                   help="correlation lag budget")
    p.add_argument("--permutations", type=int, default=100,
                   help="E-Divisive permutation count")
    p.add_argument("--top-k", type=int, default=3,
                   help="candidates per objective in the report")
    p.add_argument("--master", default=None,
                   help="Spark master (default local[cpus])")
    p.add_argument("--charts", action="store_true",
                   help="also render SVG charts and embed them in the report")
    p.add_argument("--source", choices=("csv", "prom"), default="csv",
                   help="ingest the reshaped wide CSVs (default) or the "
                        "raw Prometheus query_range JSON from the bundle")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    import shutil

    from metrics_advisor_spark import AdvisorConfig, get_spark
    from metrics_advisor_spark.plans.analyze import analyze
    from metrics_advisor_spark.plans.report import save_report
    from metrics_advisor_spark.sources.csv_tar import (
        extract_tar,
        read_wide_csv_dir,
    )

    kw = {}
    if args.objectives:
        kw["obj_signals"] = tuple(
            s.strip() for s in args.objectives.split(",") if s.strip()
        )
    cfg = AdvisorConfig(
        count_bucket=args.bucket_samples,
        sample_time_step=args.step_seconds,
        lag_max=args.lag_max,
        cp_permutations=args.permutations,
        top_k_report=args.top_k,
        **kw,
    )

    spark = get_spark("metrics_advisor_cli", master=args.master)
    scratch = None
    try:
        if args.source == "prom":
            from metrics_advisor_spark.sources.prom_json import (
                ingest_prom_tar,
                read_prometheus_json,
            )

            if os.path.isdir(args.input):
                signals = read_prometheus_json(spark, args.input)
            else:
                # ingest_prom_tar extracts to its own scratch and
                # unescapes the %3A metric names itself
                signals = ingest_prom_tar(spark, args.input)
        elif os.path.isdir(args.input):
            signals = read_wide_csv_dir(spark, args.input)
        else:
            scratch = extract_tar(args.input)  # S8: cleaned up below
            signals = read_wide_csv_dir(spark, scratch)

        result = analyze(signals, cfg)
        os.makedirs(args.output, exist_ok=True)
        suffix = os.path.splitext(os.path.basename(args.input.rstrip("/")))[0]
        if suffix.endswith(".tar"):
            suffix = suffix[: -len(".tar")]
        out_path = os.path.join(args.output, f"report_{suffix}.md")
        charts_dir = (
            os.path.join(args.output, f"charts_{suffix}") if args.charts else None
        )
        # save_report collects the ranked result, so every scan of the
        # scratch dir has happened by the time we delete it
        save_report(
            result, out_path,
            bucket_seconds=cfg.bucket_seconds, charts_dir=charts_dir,
        )
    finally:
        if scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    print(out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
