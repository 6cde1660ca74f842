"""Canonical signals table (SURVEY.md §1.5).

Every operator in this engine consumes one long/tidy DataFrame:

    signals(metric STRING, series STRING, ts TIMESTAMP, value DOUBLE)

The reference builds the equivalent structure in driver memory as a list
of per-series dicts (/root/reference/metrics_advisor.py:38-48); here it is
a distributed table partitioned by (metric, series) so per-series
operators never shuffle more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIGNALS_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("series", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def signals_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``events`` table to the signals model.

    ``event_type`` plays the metric name, ``user_id`` the series key —
    the same (metric, series, ts, value) shape the reference builds from
    its wide CSVs (metrics_advisor.py:44-47).
    """
    # the events parquet stores TIMESTAMP(NANOS); a session built without
    # our get_spark() (e.g. the driver harness's own) would throw
    # PARQUET_TYPE_ILLEGAL — the legacy conf is runtime-settable, so heal
    # here instead of requiring a particular session factory
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # locked-down conf: proceed and let the read report it
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_type").alias("metric"),
        F.col("user_id").cast("string").alias("series"),
        _as_timestamp(ev, "ts").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )


def _as_timestamp(df: DataFrame, col: str) -> F.Column:
    """Normalize a timestamp column; the driver's parquet uses
    TIMESTAMP(NANOS), which arrives as a nanosecond LONG under
    spark.sql.legacy.parquet.nanosAsLong (exact integer µs conversion —
    going through double would lose precision at 2024-era epochs)."""
    if isinstance(df.schema[col].dataType, T.LongType):
        return F.timestamp_micros(
            F.floor(F.col(col) / F.lit(1000)).cast("long")
        )
    return F.col(col).cast("timestamp")


def read_signals_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read an already-long signals table, casting to the canonical schema."""
    df = spark.read.parquet(path)
    return df.select(
        F.col("metric").cast("string"),
        F.col("series").cast("string"),
        F.col("ts").cast("timestamp"),
        F.col("value").cast("double"),
    )
