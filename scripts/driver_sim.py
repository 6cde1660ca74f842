#!/usr/bin/env python
"""Driver-correctness-gate simulator: runs every queries() entry and its
oracle_sql() on the same parquet tables and compares row counts, column
sets and EXACT (column-name-sorted, 6dp-rounded) values — the same
comparison the driver's CORRECTNESS gate hashes, unlike
tests/test_oracle_parity.py which allows a small float tolerance.

Usage:
    python scripts/driver_sim.py                # all queries
    python scripts/driver_sim.py 0 50           # positions [0, 50)
    python scripts/driver_sim.py ann_recall dsir_weights   # by name
    SPARK_GRAFT_ORACLE_SF_DIR=... python scripts/driver_sim.py

Exit code 1 if any query fails the exact compare.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from metrics_advisor_spark import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main() -> int:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    by_name = [a for a in sys.argv[1:] if not a.lstrip("-").isdigit()]
    lo = int(sys.argv[1]) if len(sys.argv) > 1 and not by_name else 0
    hi = (
        int(sys.argv[2])
        if len(sys.argv) > 2 and not by_name
        else None
    )

    spark = get_spark("driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = em.queries()
    oracles = em.oracle_sql()
    names = by_name if by_name else list(qs)[lo:hi]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1
    failed = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only ({len(srows)} rows) "
                      f"[{time.perf_counter()-t0:.1f}s]")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_rows = len(srows) == len(drows)
            ok_schema = sorted(scols) == sorted(dcols)
            a, b = canon(srows, scols), canon(drows, dcols)
            ok_hash = a == b
            if ok_rows and ok_schema and ok_hash:
                print(f"  {name}: OK ({len(srows)} rows) "
                      f"[{time.perf_counter()-t0:.1f}s]")
            else:
                failed.append(name)
                print(f"  {name}: FAIL rows={ok_rows}"
                      f"({len(srows)}/{len(drows)}) schema={ok_schema} "
                      f"hash={ok_hash}")
                if ok_rows and ok_schema and not ok_hash:
                    for x, y in [(x, y) for x, y in zip(a, b) if x != y][:2]:
                        print(f"      spark : {x}")
                        print(f"      oracle: {y}")
        except Exception as e:  # pragma: no cover - diagnostic path
            failed.append(name)
            print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
        spark.catalog.clearCache()
    print(f"driver_sim: {len(names) - len(failed)}/{len(names)} exact; "
          f"failed: {failed if failed else 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
