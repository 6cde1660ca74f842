"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metrics-advisor pipeline on sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each SQL-expressible one.

Column aliases match between the Spark plan and the oracle SQL; float
outputs are rounded to 6 decimals on both sides so value hashes compare
across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrics_advisor_spark import AdvisorConfig
from metrics_advisor_spark.operators.detect import smooth_median
from metrics_advisor_spark.operators.normalize import get_relative
from metrics_advisor_spark.operators.resample import resample
from metrics_advisor_spark.operators.validity import series_stats
from metrics_advisor_spark.operators.xcorr import (
    best_lag,
    bucket_correlation,
    rank_correlations,
)
from metrics_advisor_spark.plans import analyze
from metrics_advisor_spark.sources.signals import signals_from_events

HOUR = 3600
# a bucket wider than any dataset span → bucket_id 0 everywhere (global corr)
GLOBAL_BUCKET = 10**12


def _signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return signals_from_events(spark, sf_dir)


def _hourly_by_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → per-metric hourly series (series collapsed to 'all')."""
    sig = _signals(spark, sf_dir).withColumn("series", F.lit("all"))
    return resample(sig, HOUR, "avg")


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------


def q_series_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: per-(metric, series) count/min/max/range."""
    return series_stats(_signals(spark, sf_dir)).select(
        "metric",
        "series",
        "n_samples",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
        F.round("value_range", 6).alias("value_range"),
    )


def q_valid_active_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+F2 composed: series surviving the validity and range gates."""
    return (
        series_stats(_signals(spark, sf_dir))
        .filter((F.col("n_samples") > 20) & (F.col("value_range") > 0.005))
        .select("metric", "series", "n_samples")
    )


def q_time_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/A2: global time extent in epoch seconds."""
    return _signals(spark, sf_dir).agg(
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    )


def q_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/T3: tumbling 600 s buckets anchored at the GLOBAL min timestamp."""
    sig = _signals(spark, sf_dir)
    ext = sig.agg(F.min(F.unix_timestamp("ts")).alias("tmin"))
    return (
        sig.crossJoin(F.broadcast(ext))
        .withColumn(
            "bucket_id",
            F.floor((F.unix_timestamp("ts") - F.col("tmin")) / F.lit(600)),
        )
        .groupBy("metric", "bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def q_bucket_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: deduplicated (bucket, metric, series) membership triples."""
    sig = _signals(spark, sf_dir)
    ext = sig.agg(F.min(F.unix_timestamp("ts")).alias("tmin"))
    return (
        sig.crossJoin(F.broadcast(ext))
        .withColumn(
            "bucket_id",
            F.floor((F.unix_timestamp("ts") - F.col("tmin")) / F.lit(600)),
        )
        .select("bucket_id", "metric", "series")
        .dropDuplicates(["bucket_id", "metric", "series"])
    )


def q_resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample operator: per-metric hourly average grid."""
    out = _hourly_by_metric(spark, sf_dir)
    return out.select(
        "metric",
        F.unix_timestamp("ts").alias("slot_epoch"),
        F.round("value", 6).alias("value"),
    )


def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: centered rolling median (window 5) over the hourly grid."""
    sm = smooth_median(_hourly_by_metric(spark, sf_dir), 5)
    return sm.select(
        "metric",
        F.unix_timestamp("ts").alias("slot_epoch"),
        F.round("smoothed", 6).alias("smoothed"),
    )


def q_ksigma_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/A5: hourly slots where |value − μ| > 2σ_pop within the metric."""
    hourly = _hourly_by_metric(spark, sf_dir)
    stats = hourly.groupBy("metric").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sd")
    )
    return (
        hourly.join(F.broadcast(stats), "metric")
        .filter((F.col("sd") > 0) & (F.abs(F.col("value") - F.col("mu")) > 2 * F.col("sd")))
        .select(
            "metric",
            F.unix_timestamp("ts").alias("slot_epoch"),
            F.round("value", 6).alias("value"),
        )
    )


def q_relative_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: max-abs normalization per series (fixed max(|x|) variant)."""
    rel = get_relative(_hourly_by_metric(spark, sf_dir))
    return rel.select(
        "metric",
        F.unix_timestamp("ts").alias("slot_epoch"),
        F.round("rel_value", 6).alias("rel_value"),
    )


def q_xcorr_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: lagged correlation of the 'error' metric vs all others (hourly grid)."""
    hourly = _hourly_by_metric(spark, sf_dir)
    obj = hourly.filter(F.col("metric") == "error")
    cand = hourly.filter(F.col("metric") != "error")
    corr = bucket_correlation(
        obj, cand, tmin=0, bucket_seconds=GLOBAL_BUCKET,
        lag_max=3, step_seconds=HOUR,
    )
    return corr.select(
        "cand_metric",
        "lag",
        F.round("corr", 6).alias("corr"),
        "n_pairs",
    )


def q_xcorr_best_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per candidate, the (lag, corr) maximizing |corr|."""
    hourly = _hourly_by_metric(spark, sf_dir)
    obj = hourly.filter(F.col("metric") == "error")
    cand = hourly.filter(F.col("metric") != "error")
    corr = bucket_correlation(
        obj, cand, tmin=0, bucket_seconds=GLOBAL_BUCKET,
        lag_max=3, step_seconds=HOUR,
    )
    return best_lag(corr).select(
        "cand_metric", "lag", F.round("corr", 6).alias("corr")
    )


def q_topk_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K3: candidates ranked by |corr| desc, top 3."""
    hourly = _hourly_by_metric(spark, sf_dir)
    obj = hourly.filter(F.col("metric") == "error")
    cand = hourly.filter(F.col("metric") != "error")
    corr = bucket_correlation(
        obj, cand, tmin=0, bucket_seconds=GLOBAL_BUCKET,
        lag_max=3, step_seconds=HOUR,
    )
    ranked = rank_correlations(best_lag(corr), top_k=3)
    return ranked.select(
        "cand_metric", "lag", F.round("corr", 6).alias("corr"), "rank"
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational agg coverage: TPC-H Q1-style pricing summary."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join coverage: orders ⨝ customer ⨝ nation, revenue per nation.

    customer/nation are small dims → broadcast both (J1 pattern)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-customer running order total."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SIG = (
    "SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS series, "
    "ts, value FROM events"
)
_HOURLY = (
    "SELECT event_type AS metric, "
    "CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS slot_epoch, "
    "avg(value) AS value FROM events GROUP BY 1, 2"
)
_XCORR = f"""
    WITH hourly AS ({_HOURLY}),
    obj AS (SELECT slot_epoch, value FROM hourly WHERE metric = 'error'),
    cand AS (SELECT metric, slot_epoch, value FROM hourly WHERE metric <> 'error'),
    lags AS (SELECT unnest(range(-3, 4)) AS lag),
    pairs AS (
      SELECT c.metric AS cand_metric, l.lag AS lag,
             corr(o.value, c.value) AS corr_raw,
             count(*) AS n_pairs
      FROM cand c
      CROSS JOIN lags l
      JOIN obj o ON o.slot_epoch = c.slot_epoch - l.lag * 3600
      GROUP BY 1, 2
      HAVING count(*) >= 2 AND corr(o.value, c.value) IS NOT NULL
    )
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "series_stats": q_series_stats,
        "valid_active_series": q_valid_active_series,
        "time_extent": q_time_extent,
        "bucket_agg": q_bucket_agg,
        "bucket_membership": q_bucket_membership,
        "resample_hourly": q_resample_hourly,
        "moving_median": q_moving_median,
        "ksigma_outliers": q_ksigma_outliers,
        "relative_normalize": q_relative_normalize,
        "xcorr_lagged": q_xcorr_lagged,
        "xcorr_best_lag": q_xcorr_best_lag,
        "topk_correlated": q_topk_correlated,
        "tpch_q1": q_tpch_q1,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "window_running_sum": q_window_running_sum,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "series_stats": f"""
            SELECT metric, series, count(value) AS n_samples,
                   round(min(value), 6) AS min_value,
                   round(max(value), 6) AS max_value,
                   round(max(value) - min(value), 6) AS value_range
            FROM ({_SIG}) GROUP BY metric, series
        """,
        "valid_active_series": f"""
            SELECT metric, series, count(value) AS n_samples
            FROM ({_SIG}) GROUP BY metric, series
            HAVING count(value) > 20 AND max(value) - min(value) > 0.005
        """,
        "time_extent": """
            SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS tmin,
                   CAST(floor(epoch(max(ts))) AS BIGINT) AS tmax
            FROM events
        """,
        "bucket_agg": f"""
            WITH sig AS ({_SIG}),
            ext AS (SELECT floor(epoch(min(ts))) AS tmin FROM sig)
            SELECT metric,
                   CAST(floor((floor(epoch(ts)) - tmin) / 600) AS BIGINT) AS bucket_id,
                   count(*) AS n_events,
                   round(avg(value), 6) AS avg_value
            FROM sig, ext GROUP BY 1, 2
        """,
        "bucket_membership": f"""
            WITH sig AS ({_SIG}),
            ext AS (SELECT floor(epoch(min(ts))) AS tmin FROM sig)
            SELECT DISTINCT
                   CAST(floor((floor(epoch(ts)) - tmin) / 600) AS BIGINT) AS bucket_id,
                   metric, series
            FROM sig, ext
        """,
        "resample_hourly": f"""
            SELECT metric, slot_epoch, round(value, 6) AS value
            FROM ({_HOURLY})
        """,
        "moving_median": f"""
            SELECT metric, slot_epoch,
                   round(median(value) OVER (
                       PARTITION BY metric ORDER BY slot_epoch
                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS smoothed
            FROM ({_HOURLY})
        """,
        "ksigma_outliers": f"""
            WITH hourly AS ({_HOURLY}),
            stats AS (
              SELECT metric, avg(value) AS mu, stddev_pop(value) AS sd
              FROM hourly GROUP BY metric
            )
            SELECT h.metric, h.slot_epoch, round(h.value, 6) AS value
            FROM hourly h JOIN stats s ON h.metric = s.metric
            WHERE s.sd > 0 AND abs(h.value - s.mu) > 2 * s.sd
        """,
        "relative_normalize": f"""
            SELECT metric, slot_epoch,
                   round(value / (max(abs(value)) OVER (PARTITION BY metric) + 1e-10),
                         6) AS rel_value
            FROM ({_HOURLY})
        """,
        "xcorr_lagged": f"""
            {_XCORR}
            SELECT cand_metric, lag, round(corr_raw, 6) AS corr, n_pairs
            FROM pairs
        """,
        "xcorr_best_lag": f"""
            {_XCORR}
            SELECT cand_metric, lag, round(corr_raw, 6) AS corr
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY cand_metric
                      ORDER BY abs(corr_raw) DESC, lag ASC) AS rn
                  FROM pairs)
            WHERE rn = 1
        """,
        "topk_correlated": f"""
            {_XCORR},
            best AS (
              SELECT cand_metric, lag, corr_raw
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY cand_metric
                        ORDER BY abs(corr_raw) DESC, lag ASC) AS rn
                    FROM pairs)
              WHERE rn = 1
            )
            SELECT cand_metric, lag, round(corr_raw, 6) AS corr,
                   CAST(row_number() OVER (
                       ORDER BY abs(corr_raw) DESC, cand_metric ASC) AS INT) AS rank
            FROM best
            QUALIFY rank <= 3
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 6) AS sum_qty,
                   round(sum(l_extendedprice), 6) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 6) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                       AS running_total
            FROM orders
        """,
    }


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full metrics-advisor pipeline (detect → bucket → correlate →
    rank) over the events stream, resampled to an hourly grid with 1-day
    buckets."""
    sig = resample(
        signals_from_events(spark, sf_dir).withColumn("series", F.lit("all")),
        HOUR,
        "avg",
    )
    cfg = AdvisorConfig(
        obj_signals=("error",),
        sample_time_step=HOUR,
        count_bucket=24,          # 1-day buckets
        min_rows=20,
        min_range=1e-9,
        cp_permutations=50,
        lag_max=3,
    )
    return analyze(sig, cfg).ranked


def entry(spark: SparkSession) -> DataFrame:
    """Driver smoke check: flagship pipeline at sf0.001."""
    return flagship(spark, "/root/testdata/sf0.001")
