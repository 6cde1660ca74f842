"""Round-4 operators: funnel, CDC/SCD2 history, mixture planning,
Bloom-prefiltered decontamination, global shuffle, predict_linear,
resets."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_funnel_requires_step_order(spark):
    from metrics_advisor_spark.operators.sessions import funnel

    rows = [
        # user 1: full ordered funnel
        (1, _ts(100), "view"), (1, _ts(200), "click"), (1, _ts(300), "purchase"),
        # user 2: clicked BEFORE viewing — click must not count
        (2, _ts(100), "click"), (2, _ts(200), "view"),
        # user 3: view only
        (3, _ts(100), "view"),
        # user 4: never viewed; purchase can't count at any step
        (4, _ts(100), "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = {
        r["step"]: r
        for r in funnel(ev, steps=("view", "click", "purchase")).collect()
    }
    assert got["view"]["n_users"] == 3
    assert got["click"]["n_users"] == 1  # only user 1 clicked after viewing
    assert got["purchase"]["n_users"] == 1
    assert abs(got["click"]["pct_of_first"] - 1 / 3) < 1e-6


def test_latest_by_key_tiebreak(spark):
    from metrics_advisor_spark.operators.history import latest_by_key

    rows = [
        (1, _ts(100), 10, "a"),
        (1, _ts(100), 11, "b"),  # same ts — higher event_id wins
        (2, _ts(50), 5, "c"),
        (2, _ts(60), 4, "d"),    # later ts wins regardless of id
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {r["user_id"]: r for r in latest_by_key(df).collect()}
    assert got[1]["event_type"] == "b"
    assert got[2]["event_type"] == "d"


def test_scd2_intervals_adjacent_and_current(spark):
    from metrics_advisor_spark.operators.history import scd2_intervals

    rows = [(1, _ts(100), 1, "a"), (1, _ts(200), 2, "b"), (1, _ts(300), 3, "c")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    ivals = sorted(
        scd2_intervals(df).collect(), key=lambda r: r["valid_from"]
    )
    # adjacency: each interval ends where the next begins
    for a, b in zip(ivals, ivals[1:]):
        assert a["valid_to"] == b["valid_from"]
    # exactly one open (current) row, and it's the last change
    currents = [r for r in ivals if r["is_current"]]
    assert len(currents) == 1 and currents[0]["event_type"] == "c"
    assert currents[0]["valid_to"] is None


def test_mixture_plan_math(spark):
    from metrics_advisor_spark.functions.curation import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a " * 99 + "a", "web"), (2, "b " * 9 + "b", "wiki")],
        "doc_id long, text string, source string",
    )
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs, weights={"web": 0.5, "wiki": 0.5}, token_budget=1000
        ).collect()
    }
    assert plan["web"]["available_tokens"] == 100
    assert plan["web"]["target_tokens"] == 500
    assert abs(plan["web"]["sampling_rate"] - 5.0) < 1e-6
    assert plan["web"]["n_epochs"] == 5  # must repeat 5×
    assert plan["wiki"]["n_epochs"] == 50


def test_bloom_prefilter_is_lossless_and_selective(spark):
    from metrics_advisor_spark.functions.curation import (
        bloom_contamination_check,
        bloom_probe_col,
        build_bloom,
        contamination_check,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}_{j}" for j in range(30)))
            for i in range(40)
        ]
        + [(100, " ".join(f"b0_{j}" for j in range(30)))],  # contaminated
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, " ".join(f"b{k}_{j}" for j in range(30))) for k in range(3)],
        "doc_id long, text string",
    )
    exact = sorted(
        tuple(r) for r in contamination_check(docs, bench, n=5).collect()
    )
    bloomed = sorted(
        tuple(r)
        for r in bloom_contamination_check(docs, bench, n=5).collect()
    )
    assert bloomed == exact and len(exact) == 1  # lossless prefilter

    # the filter itself: zero false negatives, few false positives
    m, k = 1 << 16, 7
    members = spark.range(500).select(
        (F.col("id") * 7919 + 13).alias("shingle_hash")
    )
    bloom = build_bloom(members, m_bits=m, k=k)
    probe_hits = (
        members.crossJoin(F.broadcast(bloom))
        .filter(bloom_probe_col("shingle_hash", m, k))
        .count()
    )
    assert probe_hits == 500  # every member admitted
    outsiders = spark.range(5000).select(
        (F.col("id") * 104729 + 3).alias("shingle_hash")
    )
    fp = (
        outsiders.join(members, "shingle_hash", "left_anti")
        .crossJoin(F.broadcast(bloom))
        .filter(bloom_probe_col("shingle_hash", m, k))
        .count()
    )
    assert fp < 100  # ~0.1% expected at 500 items in 64 Kbit; allow 2%


def test_global_shuffle_permutation(spark):
    from metrics_advisor_spark.functions.corpus import global_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    s1 = global_shuffle(docs, n_shards=4, seed=0).collect()
    s2 = global_shuffle(docs, n_shards=4, seed=0).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # deterministic
    # a true permutation: every doc exactly once, positions dense per shard
    assert sorted(r["doc_id"] for r in s1) == list(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in s1:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # a different seed produces a different order
    s3 = global_shuffle(docs, n_shards=4, seed=1).collect()
    order1 = [r["doc_id"] for r in sorted(s1, key=lambda r: (r["shard"], r["shard_pos"]))]
    order3 = [r["doc_id"] for r in sorted(s3, key=lambda r: (r["shard"], r["shard_pos"]))]
    assert order1 != order3


def test_predict_linear_exact_on_linear_series(spark):
    from metrics_advisor_spark.operators.trend import predict_linear

    rows = [
        ("m", "s", _ts(1000 + 60 * i), 5.0 + 2.0 * i) for i in range(10)
    ]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = predict_linear(sig, horizon_s=600).collect()[0]
    # slope = 2 per 60 s; last sample value 23 → +600 s = +20
    assert abs(got["predicted"] - 43.0) < 1e-4


def test_resets_counts_drops(spark):
    from metrics_advisor_spark.operators.trend import resets

    vals = [1, 2, 3, 1, 2, 0, 5]  # two drops
    rows = [("m", "s", _ts(60 * i), float(v)) for i, v in enumerate(vals)]
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = resets(sig, bucket_s=10_000).collect()
    assert len(got) == 1
    assert got[0]["n_resets"] == 2
    assert got[0]["n_pairs"] == 6
