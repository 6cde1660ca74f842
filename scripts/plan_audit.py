#!/usr/bin/env python
"""Static physical-plan audit over EVERY contract query: compile each
queries() entry (no execution) and assert the scale invariants the
engine promises everywhere in SCALE.md / PLANS.md:

  1. no CartesianProduct anywhere;
  2. no BatchEvalPython (row-at-a-time Python UDF) — Python crosses the
     boundary only via Arrow (ArrowEvalPython, FlatMapGroupsInPandas,
     MapInPandas, FlatMapCoGroupsInPandas) or partition-aware UDTFs;
  3. no Window fed by an Exchange SinglePartition (a global-window sort
     funnels the whole dataset through one task) — the round-4
     sorted_neighborhood_pairs failure mode, now checked for every
     query;
  4. BroadcastNestedLoopJoin only as a 1-row broadcast (scalar
     crossJoin): flagged when the broadcast side's plan contains no
     Aggregate/Limit stage to pin it at O(1) rows.

Usage:
    python scripts/plan_audit.py            # all queries
    python scripts/plan_audit.py 0 50       # positions [lo, hi)

Prints one line per query (exchange/arrow-stage counts, flags) and a
summary; exit 1 on any invariant violation.  Streaming-drain and
foreachBatch contract queries EXECUTE on plan construction, so they are
audited by their batch plans elsewhere and skipped here (listed at the
end).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as em  # noqa: E402
from metrics_advisor_spark import get_spark  # noqa: E402

# queries whose construction runs a streaming drain / heavy job by
# design (plan text covered by their batch twins)
SKIP = {
    name
    for name in em.queries()
    if name.startswith("streaming_") or name in {"flagship_positional"}
}

# ANN-family queries broadcast a deliberately BOUNDED non-scalar side
# (the caller's query set / the SRP plane table) under a non-equi
# condition — BNLJ by construction, bounded by contract (the broadcast
# side is the user's query list, never the corpus; documented in
# functions/similarity.py).  Any NEW query tripping the BNLJ check
# must be reviewed before joining this list.
ALLOW_BNLJ = {
    "ann_topk",
    "ann_recall",   # exact-L2 truth arm: 5-query broadcast, != condition
    "embedding_near_dup",
    "ivf_topk",
    "srp_buckets",
    "knn_graph",
    "knn_graph_blocked",
}


def plan_text(df) -> str:
    jvm = df._sc._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def audit_one(name: str, plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time-python-udf")
    # a Window directly downstream of a SinglePartition exchange =
    # global window sort.  The formatted plan lists the tree first;
    # detect 'Exchange SinglePartition' whose immediate parent line
    # (one indent level up) is a Window/Sort feeding a Window.
    tree = plan.split("\n\n")[0].splitlines()
    for i, line in enumerate(tree):
        if "Exchange" not in line:
            continue
        m = re.search(r"\((\d+)\)$", line.strip())
        if not m:
            continue
        detail = re.search(
            rf"\({m.group(1)}\) Exchange\n(?:\[codegen[^\n]*\n)?"
            rf"Input[^\n]*\nArguments: ([^\n]*)",
            plan,
        )
        if not detail or "SinglePartition" not in detail.group(1):
            continue
        # walk up the tree: the consumer is the nearest line above with
        # one indent level less
        indent = len(line) - len(line.lstrip(" :+-*"))
        for j in range(i - 1, -1, -1):
            up = tree[j]
            ui = len(up) - len(up.lstrip(" :+-*"))
            if ui < indent:
                if "Window" in up:
                    flags.append("global-window-singlepartition")
                break
    if "BroadcastNestedLoopJoin" in plan:
        # every BNLJ must broadcast an O(1)-row side: its subtree must
        # contain an aggregate/limit stage or a literal local table
        for i, line in enumerate(tree):
            if "BroadcastNestedLoopJoin" not in line:
                continue
            indent = len(line) - len(line.lstrip(" :+-*"))
            sub = []
            for j in range(i + 1, len(tree)):
                dn = tree[j]
                di = len(dn) - len(dn.lstrip(" :+-*"))
                if di <= indent:
                    break
                sub.append(dn)
            subtxt = "\n".join(sub)
            if "BroadcastExchange" in subtxt and not any(
                k in subtxt
                for k in (
                    "Aggregate",
                    "Limit",
                    "LocalTableScan",
                    "ReusedExchange",
                )
            ):
                flags.append("bnlj-nonscalar-broadcast")
    return flags


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else None
    spark = get_spark("plan_audit")
    qs = em.queries()
    names = [n for n in list(qs)[lo:hi]]
    bad: dict[str, list[str]] = {}
    skipped = []
    for name in names:
        if name in SKIP:
            skipped.append(name)
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            plan = plan_text(df)
        except Exception as e:  # compile failure IS an audit failure
            bad[name] = [f"compile-error: {e}"]
            continue
        flags = audit_one(name, plan)
        if name in ALLOW_BNLJ:
            flags = [f for f in flags if f != "bnlj-nonscalar-broadcast"]
        n_ex = plan.count("Exchange (") + plan.count("Exchange\n")
        n_arrow = sum(
            plan.count(k)
            for k in (
                "ArrowEvalPython",
                "FlatMapGroupsInPandas",
                "MapInPandas",
                "FlatMapCoGroupsInPandas",
            )
        )
        status = ",".join(flags) if flags else "ok"
        print(
            f"  {name}: {status} (exchanges~{n_ex}, arrow={n_arrow}) "
            f"[{time.perf_counter()-t0:.1f}s]"
        )
        if flags:
            bad[name] = flags
    print(
        f"plan_audit: {len(names) - len(skipped) - len(bad)}/"
        f"{len(names) - len(skipped)} clean; "
        f"skipped streaming drains: {len(skipped)}"
    )
    if bad:
        for k, v in bad.items():
            print(f"  VIOLATION {k}: {v}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
