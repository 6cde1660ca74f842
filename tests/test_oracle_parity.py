"""Driver-style DuckDB oracle parity for every SQL-expressible query.

Mirrors what the driver's correctness gate does: run the Spark query and
the oracle SQL on the same parquet tables, then compare row counts,
column names and (column-name-sorted, row-sorted) values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(rows, cols):
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


CASES = sorted(set(entry_mod.queries()) & set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, ddb):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # The driver's value hash is dtype-sensitive: DuckDB integer sum()
    # returns HUGEINT (int128) which hashes differently from Spark's
    # BIGINT even when every value is equal (round-1 lesson:
    # session_stats/simhash/srp_buckets). Guard at the type level so a
    # new oracle can't reintroduce the drift silently.
    rel = ddb.sql(entry_mod.oracle_sql()[name])
    hugeint_cols = [
        c for c, t in zip(rel.columns, rel.types) if "HUGEINT" in str(t)
    ]
    assert not hugeint_cols, (
        f"{name}: oracle emits HUGEINT column(s) {hugeint_cols}; "
        f"add ::BIGINT casts in oracle_sql()"
    )

    res = ddb.execute(entry_mod.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column mismatch {spark_cols} vs {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"
    )
    # EXACT compare on the 6dp-canonized values — the same equality the
    # driver's value hash enforces.  The old isclose tolerance
    # (rel 1e-9 / abs 2e-6) passed while the driver flagged red twice
    # (dim_covariance r04, lag_features r05: round-half boundary
    # flips), so the builder gate now mirrors the driver gate
    # bit-for-bit.  A near-miss within the old tolerance is reported as
    # such to speed diagnosis: it means a rounding-boundary/expression-
    # tree problem, not a logic bug.
    a, b = _canon(spark_rows, spark_cols), _canon(ddb_rows, ddb_cols)
    mismatches = []
    near_only = True
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if va != vb:
                    if not math.isclose(
                        va, vb, rel_tol=1e-9, abs_tol=2e-6
                    ):
                        near_only = False
                    mismatches.append((i, ra, rb))
                    break
            elif va != vb:
                near_only = False
                mismatches.append((i, ra, rb))
                break
    hint = (
        " (all within the old float tolerance — a rounding-boundary/"
        "IEEE-expression-tree issue; see ROUND_NOTES round 5)"
        if mismatches and near_only
        else ""
    )
    assert not mismatches, (
        f"{name}: {len(mismatches)} rows differ{hint}; "
        f"first: {mismatches[:3]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
