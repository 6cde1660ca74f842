"""Round-4j operators: LTV curve, trimmed mean, dim covariance,
freshness audit, CMS join-size estimate, distribution overlap, alert
episodes."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_ltv_curve_cumulative(spark):
    from metrics_advisor_spark.operators.sessions import ltv_curve

    day = 86400
    rows = [
        (1, _ts(0), 10.0), (1, _ts(2 * day), 5.0),   # user 1: 10 then +5@d2
        (2, _ts(0), 2.0),                             # user 2: 2 at d0
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["day_n"]: r for r in ltv_curve(ev, max_days=4).collect()}
    assert got[0]["cum_value"] == 12.0          # 10 + 2
    assert got[1]["cum_value"] == 12.0          # nothing new on day 1
    assert got[2]["cum_value"] == 17.0          # +5
    assert got[3]["ltv_per_user"] == 8.5        # 17 / 2 users
    # curve is monotone non-decreasing
    vals = [got[n]["cum_value"] for n in sorted(got)]
    assert vals == sorted(vals)


def test_trimmed_mean_robust(spark):
    from metrics_advisor_spark.operators.normalize import trimmed_mean

    vals = [10.0] * 18 + [0.0, 1000.0]  # two extreme tails
    sig = spark.createDataFrame(
        [("m", "s", _ts(i), v) for i, v in enumerate(vals)],
        "metric string, series string, ts timestamp, value double",
    )
    got = trimmed_mean(sig, trim=0.1).collect()[0]
    assert got["trimmed_mean"] == 10.0   # both tails cut
    assert got["n_kept"] == 18


def test_dim_covariance_known_structure(spark):
    from metrics_advisor_spark.functions.similarity import dim_covariance

    # dim0 = t, dim1 = -t (corr −1), dim2 = const (corr undefined → null)
    emb = spark.createDataFrame(
        [(i, [float(i), float(-i), 3.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    got = {(r["dim_a"], r["dim_b"]): r for r in
           dim_covariance(emb, max_dims=3).collect()}
    assert got[(0, 1)]["corr"] == -1.0
    assert got[(0, 2)]["cov"] == 0.0
    assert got[(0, 2)]["corr"] is None   # zero-variance side
    assert got[(0, 1)]["n_vecs"] == 10


def test_freshness_audit_staleness(spark):
    from metrics_advisor_spark.operators.quality import freshness_audit

    rows = [(_ts(100), "a"), (_ts(200), "a"), (_ts(50), "b")]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r["metric"]: r for r in freshness_audit(ev).collect()}
    assert got["a"]["staleness_s"] == 0       # holds the high-water mark
    assert got["b"]["staleness_s"] == 150
    assert got["b"]["n_events"] == 1


def test_cms_join_size_never_underestimates(spark):
    from metrics_advisor_spark.functions.sketch import cms_join_size

    counts = spark.createDataFrame(
        [(k, (k % 5) + 1) for k in range(200)], "k long, n long"
    )
    got = cms_join_size(counts, counts, "k", "n").collect()[0]
    exact = sum(((k % 5) + 1) ** 2 for k in range(200))
    assert got["exact_join_size"] == exact
    assert got["cms_join_size"] >= exact     # CMS inner product property
    assert got["over_ratio"] >= 1.0


def test_dist_overlap_identical_vs_disjoint(spark):
    from metrics_advisor_spark.operators.quality import dist_overlap

    rows = []
    for i in range(100):
        v = float(i)
        rows.append(("a", _ts(i), v))
        rows.append(("b", _ts(i), v))            # identical to a
        rows.append(("c", _ts(i), v + 10000.0))  # far away
    sig = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    got = {(r["metric_a"], r["metric_b"]): r["overlap"]
           for r in dist_overlap(sig).collect()}
    assert got[("a", "b")] == 1.0
    # c shares only the open top bin with a/b on the global grid
    assert got.get(("a", "c"), 0.0) <= 0.35


def test_alert_episodes_merge_and_split(spark):
    from metrics_advisor_spark.operators.trend import alert_episodes

    # hourly means: baseline 10, spikes at hours 30,31 (one episode)
    # and hour 40 (separate episode — gap 9 > cooldown 2)
    rows = []
    for h in range(48):
        v = 10.0
        if h in (30, 31):
            v = 100.0
        if h == 40:
            v = 120.0
        rows.append(("m", "s", _ts(h * 3600), v))
    sig = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    eps = alert_episodes(sig, n_sigmas=2.0).collect()
    assert len(eps) == 2
    spans = sorted((r["ep_start"] // 3600, r["ep_end"] // 3600, r["n_slots"])
                   for r in eps)
    assert spans[0] == (30, 31, 2)
    assert spans[1] == (40, 40, 1)
    assert all(r["peak_z"] > 2 for r in eps)
