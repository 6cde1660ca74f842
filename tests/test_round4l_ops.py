"""Round-4l operators: LSH scorecard, Mann–Kendall test, late-arrival
audit, wide-metrics pivot."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F


def _ts(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def test_lsh_eval_recovers_planted_dups(spark):
    from metrics_advisor_spark.functions.dedup import lsh_eval

    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten",
            "red green blue yellow purple orange pink brown black white"]
    rows = [(i, t) for i, t in enumerate(base)]
    rows += [(100 + i, t) for i, t in enumerate(base)]  # exact copies
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = lsh_eval(docs, threshold=0.5).collect()[0]
    # identical docs share every band → recall 1.0 on exact copies
    assert got["n_exact"] == 3
    assert got["recall"] == 1.0
    assert got["n_common"] <= got["n_lsh"]


def test_mann_kendall_direction_and_null(spark):
    from metrics_advisor_spark.operators.trend import mann_kendall

    rows = []
    for h in range(30):
        rows.append(("up", h * 3600, float(h)))
        rows.append(("down", h * 3600, float(-h)))
        rows.append(("flat", h * 3600, float((-1) ** h)))  # alternating
    hourly = spark.createDataFrame(
        rows, "metric string, slot_epoch long, value double"
    )
    got = {r["metric"]: r for r in mann_kendall(hourly).collect()}
    n_pairs = 30 * 29 // 2
    assert got["up"]["s_stat"] == n_pairs and got["up"]["z"] > 3
    assert got["down"]["s_stat"] == -n_pairs and got["down"]["z"] < -3
    assert abs(got["flat"]["z"]) < 1.0


def test_late_arrival_audit_lateness(spark):
    from metrics_advisor_spark.operators.trend import late_arrival_audit

    # arrival order (event_id): ts 100, 200, 150 (50s late), 300
    rows = [
        (1, _ts(100), "a"), (2, _ts(200), "a"),
        (3, _ts(150), "a"), (4, _ts(300), "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    got = late_arrival_audit(ev, thresholds_s=(10, 60)).collect()[0]
    assert got["max_late_s"] == 50
    assert abs(got["share_gt_10s"] - 0.25) < 1e-9
    assert got["share_gt_60s"] == 0.0


def test_wide_metrics_pivot_shape(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["wide_metrics"](
        spark, "/root/testdata/sf0.001"
    )
    cols = df.columns
    assert cols[0] == "slot_epoch"
    assert set(cols[1:]) == {"click", "error", "purchase", "signup", "view"}
    assert df.count() > 0


def test_holdout_leakage_planted_duplicates(spark):
    """Exact copies with independent ids split independently — leak
    groups must appear; a clean corpus shows only 'clean'."""
    from metrics_advisor_spark.functions.curation import holdout_leakage

    rows = [(i, f"unique doc number {i} with its own words") for i in range(40)]
    # plant 30 copies of one doc under fresh ids — some land cross-split
    rows += [(1000 + i, "the copied document text") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["kind"]: r["n_groups"] for r in holdout_leakage(docs).collect()}
    assert sum(got.values()) == 41  # 40 unique + 1 copy group
    assert any(k.endswith("_leak") for k in got)

    clean = spark.createDataFrame(rows[:40], "doc_id long, text string")
    gc = {r["kind"]: r["n_groups"] for r in holdout_leakage(clean).collect()}
    assert set(gc) == {"clean"}


def test_dedup_savings_accounting(spark):
    from metrics_advisor_spark.functions.curation import dedup_savings

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "d e")],
        "doc_id long, text string",
    )
    got = dedup_savings(docs).collect()[0]
    assert got["docs_before"] == 3 and got["docs_after"] == 2
    assert got["tokens_before"] == 8 and got["tokens_after"] == 5
    assert abs(got["token_savings"] - 0.375) < 1e-9


def test_pii_density_by_source(spark):
    from metrics_advisor_spark.functions.curation import pii_density_by_source

    docs = spark.createDataFrame(
        [
            (1, "contact me at jane@example.com today", "risky"),
            (2, "two hits: a@b.co and 10.0.0.1 here", "risky"),
            (3, "nothing sensitive at all", "clean"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in pii_density_by_source(docs).collect()}
    assert got["risky"]["n_docs_with_pii"] == 2
    assert got["risky"]["pii_doc_share"] == 1.0
    assert got["clean"]["pii_per_doc"] == 0.0
