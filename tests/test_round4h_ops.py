"""Round-4h operators: containment pairs, path trigrams, user entropy,
weighted quantile, quantization audit, label centroid similarity,
SLO burn, rolling level shift."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_containment_catches_truncation(spark):
    from metrics_advisor_spark.functions.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    long = " ".join(f"w{i}" for i in range(40))
    short = " ".join(f"w{i}" for i in range(12))  # strict prefix: fully inside
    docs = spark.createDataFrame(
        [(1, long), (2, short), (3, "completely different text here now")],
        "doc_id long, text string",
    )
    cp = containment_pairs(docs, threshold=0.8).collect()
    assert len(cp) == 1
    r = cp[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment_ba"] == 1.0      # short fully inside long
    assert r["jaccard"] < 0.5              # Jaccard dilutes the signal
    # symmetric jaccard at 0.5 would have MISSED this pair
    assert jaccard_pairs(docs, threshold=0.5).count() == 0


def test_path_trigrams_session_boundary(spark):
    from metrics_advisor_spark.operators.sessions import path_trigrams

    rows = [
        # user 1 session A: a→b→c  (one trigram)
        (1, 1, _ts(0), "a"), (1, 2, _ts(10), "b"), (1, 3, _ts(20), "c"),
        # user 1 session B (gap > 1800): d→e — too short for a trigram,
        # and c→d→e must NOT count (crosses the session boundary)
        (1, 4, _ts(10000), "d"), (1, 5, _ts(10010), "e"),
        # user 2: a→b→c again
        (2, 6, _ts(0), "a"), (2, 7, _ts(5), "b"), (2, 8, _ts(9), "c"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {(r["e1"], r["e2"], r["e3"]): r for r in path_trigrams(ev).collect()}
    assert got[("a", "b", "c")]["n"] == 2
    assert got[("a", "b", "c")]["rank"] == 1
    assert ("c", "d", "e") not in got
    assert ("b", "c", "d") not in got


def test_user_entropy_uniform_vs_single(spark):
    from metrics_advisor_spark.operators.sessions import user_entropy

    rows = [(1, "a"), (1, "b"), (1, "c"), (1, "d"),
            (2, "a"), (2, "a"), (2, "a")]
    ev = spark.createDataFrame([
        (u, _ts(i), t) for i, (u, t) in enumerate(rows)
    ], "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r for r in user_entropy(ev).collect()}
    assert abs(got[1]["entropy"] - math.log(4)) < 1e-6  # uniform over 4
    assert got[2]["entropy"] == 0.0                      # single type
    assert got[1]["n_types"] == 4 and got[2]["n_events"] == 3


def test_weighted_quantile_weights_matter(spark):
    from metrics_advisor_spark.functions.curation import weighted_quantile

    # values 1..4; weight mass concentrated on 4 → weighted median = 4,
    # unweighted median would be 2.5
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 10)],
        "source string, v double, wt long",
    )
    got = weighted_quantile(df, "v", "wt", "source", q=0.5).collect()[0]
    assert got["wq50"] == 4.0
    assert got["total_weight"] == 13.0


def test_quantization_audit_error_bound(spark):
    from metrics_advisor_spark.functions.similarity import quantization_audit

    emb = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [255.0, 5.0]), (3, [128.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["dim"]: r for r in quantization_audit(emb).collect()}
    # dim 0: range [0, 255] → scale 1.0; all values integral → mse 0
    assert got[0]["scale"] == 1.0 and got[0]["mse"] == 0.0
    # dim 1: constant → scale fallback 1.0, zero error
    assert got[1]["lo"] == 5.0 and got[1]["hi"] == 5.0
    assert got[1]["mse"] == 0.0


def test_label_centroid_sim_opposed_clusters(spark):
    from metrics_advisor_spark.functions.similarity import label_centroid_sim

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
            (3, [-1.0, 0.0], 1),
            (4, [0.0, 1.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r["label_a"], r["label_b"]): r["cosine"]
           for r in label_centroid_sim(emb).collect()}
    assert got[(0, 1)] == -1.0
    assert got[(0, 2)] == 0.0
    assert got[(1, 2)] == 0.0


def test_slo_burn_rolling_share(spark):
    from metrics_advisor_spark.operators.trend import slo_burn

    rows = []
    # hour 0: 10 ok; hour 1: 9 ok + 1 error → 6h window at hour 1:
    # 1/20 errors = 5% → burn 1.0 at slo 5%
    for i in range(10):
        rows.append((_ts(i), "ok"))
    for i in range(9):
        rows.append((_ts(3600 + i), "ok"))
    rows.append((_ts(3600 + 20), "error"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r["slot"]: r for r in slo_burn(ev, slo=0.05, window_hours=6).collect()}
    assert got[0]["burn_rate"] == 0.0
    assert got[3600]["win_errors"] == 1 and got[3600]["win_total"] == 20
    assert got[3600]["burn_rate"] == 1.0


def test_rolling_level_shift_spikes_at_jump(spark):
    from metrics_advisor_spark.operators.trend import rolling_level_shift

    rows = [("m", h * 3600, 0.0 if h < 24 else 10.0) for h in range(48)]
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = rolling_level_shift(hourly, k=12, min_points=6).collect()
    best = max(got, key=lambda r: r["shift_score"])
    assert best["slot_epoch"] == 24 * 3600  # maximal right-at-the-jump
    assert best["shift_score"] > 1.5
