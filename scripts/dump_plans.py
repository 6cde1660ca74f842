#!/usr/bin/env python
"""Dump `.explain("formatted")` text for named contract queries.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX q1 q2 ...

Writes OUTDIR/<query>_<SUFFIX>.txt for each query — the plan evidence
files the optimization rounds commit under plans/r<NN>/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as em  # noqa: E402
from metrics_advisor_spark import get_spark  # noqa: E402


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_dump")
    fns = dict(em.queries())
    fns["flagship_analyze"] = em.flagship
    jvm = spark.sparkContext._jvm
    for name in names:
        df = fns[name](spark, sf_dir)
        txt = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
