"""Round-5 regression tests for the round-4 ADVICE items.

1. dim_covariance: partition-invariant hash-stable output (the r04 red
   was a partial-aggregation reassociation flipping a round(·,6) cell).
2. sorted_neighborhood_pairs: no partition-less global window (the
   whole corpus through one task); pairs identical to the global-sort
   semantics because tie groups are contiguous under
   orderBy(block_key, doc_id).
3. containment_pairs: with max_shingle_df set, denominators count only
   the shingles that survive the hot-shingle filter, so containment of
   an exact subset stays 1.0 even when a shared hot shingle is dropped.
"""

import pytest

from metrics_advisor_spark.functions.dedup import (
    containment_pairs,
    sorted_neighborhood_pairs,
)
from metrics_advisor_spark.functions.similarity import dim_covariance


@pytest.fixture(scope="module")
def emb_df(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_dim_covariance_partition_invariant(spark, emb_df):
    base = sorted(
        tuple(r)
        for r in dim_covariance(emb_df, max_dims=8).collect()
    )
    # repartitioning the input must not change a single rounded cell
    for parts in (1, 7, 32):
        got = sorted(
            tuple(r)
            for r in dim_covariance(
                emb_df.repartition(parts), max_dims=8
            ).collect()
        )
        assert got == base, f"cells changed at repartition({parts})"
    assert len(base) == 8 * 7 // 2


def test_dim_covariance_matches_closed_form(spark, emb_df):
    import math

    rows = {r["vec_id"]: list(r["embedding"]) for r in emb_df.collect()}
    xs = [float(v[0]) for v in rows.values()]
    ys = [float(v[1]) for v in rows.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / (n - 1)
    got = {
        (r["dim_a"], r["dim_b"]): (r["cov"], r["corr"])
        for r in dim_covariance(emb_df, max_dims=8).collect()
    }
    assert math.isclose(got[(0, 1)][0], cov, abs_tol=2e-6)


def test_snm_no_global_single_task_window(spark):
    df = spark.createDataFrame(
        [(i, f"doc body {i % 5} tail {i}") for i in range(40)],
        "doc_id long, text string",
    )
    plan = sorted_neighborhood_pairs(df)._jdf.queryExecution().executedPlan().toString()
    # a Window.orderBy with no partitionBy shows up as a SinglePartition
    # exchange feeding the Window node — the 100TB killer we removed
    assert "SinglePartition" not in plan, plan


def test_snm_pairs_match_global_sort_semantics(spark):
    # brute force: global sort by (key, doc_id); pairs = tied keys
    # within `window` positions of each other
    docs = [(i, f"prefix{i % 4:02d} body tail {i}") for i in range(24)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    window, key_len = 3, 24

    def norm(t):
        import re

        return re.sub("[^A-Za-z0-9]", "", t.lower())[:key_len]

    order = sorted(docs, key=lambda d: (norm(d[1]), d[0]))
    expect = set()
    for i, (ida, ta) in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            idb, tb = order[j]
            if norm(ta) == norm(tb):
                expect.add((min(ida, idb), max(ida, idb)))
    got = {
        (r["doc_lo"], r["doc_hi"])
        for r in sorted_neighborhood_pairs(
            df, window=window, key_len=key_len
        ).collect()
    }
    assert got == expect


def test_containment_cap_consistent_universe(spark):
    # B's shingles ⊂ A's; one shared shingle appears in EVERY doc and
    # is dropped by the cap.  Containment(B in A) over the surviving
    # universe must stay 1.0 (the old code divided by the uncapped
    # size, underestimating).
    hot = "x y z"  # the hot 3-gram every doc shares
    a_txt = f"{hot} a b c d e f"
    b_txt = f"{hot} a b c d"
    fill = [f"{hot} junk{i} junk{i} junk{i} pad{i}" for i in range(6)]
    df = spark.createDataFrame(
        [(0, a_txt), (1, b_txt)] + [(10 + i, t) for i, t in enumerate(fill)],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in containment_pairs(
            df, n=3, threshold=0.5, max_shingle_df=4
        ).collect()
    }
    r = rows[(0, 1)]
    assert r["containment_ba"] == pytest.approx(1.0)
