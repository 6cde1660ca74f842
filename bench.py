#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect), after one warm-up of the session on a trivial action.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from metrics_advisor_spark import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("metrics_advisor_bench")
    spark.range(1).count()  # warm up JVM/session

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    # flagship end-to-end pipeline (detection UDFs + correlation + rank)
    t0 = time.perf_counter()
    force(entry_mod.flagship(spark, sf_dir))
    dt = time.perf_counter() - t0
    timings["flagship_analyze"] = round(dt, 3)
    total += dt

    # Full per-query line first (for logs/humans), then a compact summary
    # line LAST: the driver retains only an output tail, and with ~100
    # queries the full line exceeds it — the compact line always fits and
    # stays parseable (VERDICT r02 item 2: BENCH_r02 parsed=null).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "slowest15": slowest,
            }
        )
    )


if __name__ == "__main__":
    main()
