"""As-of join: backward match semantics, ties, tolerance, null handling."""

from __future__ import annotations

from metrics_advisor_spark.operators.asof import asof_join

from conftest import epoch_dt


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_match(spark):
    left = _df(
        spark,
        [("a", epoch_dt(100), 1.0), ("a", epoch_dt(200), 2.0),
         ("a", epoch_dt(50), 0.5)],
        "series string, ts timestamp, value double",
    )
    right = _df(
        spark,
        [("a", epoch_dt(90), 9.0), ("a", epoch_dt(150), 15.0)],
        "series string, ts timestamp, value double",
    )
    got = {
        int(r["ts"].timestamp()): (r["value_asof"],
                                   r["ts_asof"] and int(r["ts_asof"].timestamp()))
        for r in asof_join(left, right, by=["series"]).collect()
    }
    assert got[50] == (None, None)       # nothing before t=50
    assert got[100] == (9.0, 90)         # latest right ≤ 100
    assert got[200] == (15.0, 150)       # latest right ≤ 200


def test_asof_inclusive_and_key_isolation(spark):
    left = _df(
        spark,
        [("a", epoch_dt(100), 1.0), ("b", epoch_dt(100), 1.0)],
        "series string, ts timestamp, value double",
    )
    right = _df(
        spark,
        [("a", epoch_dt(100), 7.0)],  # equal ts → inclusive match
        "series string, ts timestamp, value double",
    )
    rows = {r["series"]: r["value_asof"]
            for r in asof_join(left, right, by=["series"]).collect()}
    assert rows["a"] == 7.0
    assert rows["b"] is None  # other key never leaks


def test_asof_tolerance(spark):
    left = _df(
        spark,
        [("a", epoch_dt(1000), 1.0)],
        "series string, ts timestamp, value double",
    )
    right = _df(
        spark,
        [("a", epoch_dt(100), 9.0)],
        "series string, ts timestamp, value double",
    )
    ok = asof_join(left, right, by=["series"], tolerance_seconds=1000).collect()
    assert ok[0]["value_asof"] == 9.0
    stale = asof_join(left, right, by=["series"], tolerance_seconds=60).collect()
    assert stale[0]["value_asof"] is None
    assert stale[0]["ts_asof"] is None


def test_asof_matches_duckdb_asof(spark):
    import duckdb

    left_rows = [("s%d" % (i % 3), epoch_dt(i * 37 % 500), float(i))
                 for i in range(40)]
    right_rows = [("s%d" % (i % 3), epoch_dt(i * 61 % 500), float(100 + i))
                  for i in range(25)]
    # dedupe right per (series, ts): keep max value, mirroring the oracle
    left = _df(spark, left_rows, "series string, ts timestamp, lv double")
    right = (
        _df(spark, right_rows, "series string, ts timestamp, value double")
        .groupBy("series", "ts").max("value").withColumnRenamed("max(value)", "value")
    )
    got = sorted(
        (r["series"], int(r["ts"].timestamp()), r["lv"], r["value_asof"])
        for r in asof_join(left, right, by=["series"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (series VARCHAR, ts TIMESTAMP, lv DOUBLE)")
    con.execute("CREATE TABLE r0 (series VARCHAR, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", left_rows)
    con.executemany("INSERT INTO r0 VALUES (?,?,?)", right_rows)
    want = sorted(
        (s, int(t.timestamp()), lv, v)
        for s, t, lv, v in con.execute(
            """
            WITH r AS (SELECT series, ts, max(value) AS value
                       FROM r0 GROUP BY 1, 2)
            SELECT l.series, l.ts, l.lv, r.value
            FROM l ASOF LEFT JOIN r
              ON l.series = r.series AND l.ts >= r.ts
            """
        ).fetchall()
    )
    assert got == want
