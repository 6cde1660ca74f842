"""Time bucketing (SURVEY.md §2.3 T1–T5).

The reference builds fixed tumbling buckets of count_bucket × step seconds
anchored at the GLOBAL minimum timestamp across all signals
(/root/reference/metrics_advisor.py:123-136) and assigns an anomaly to
bucket ``(ts - tmin) // step // count_bucket`` (:158).  We reproduce that
exact floor arithmetic (not Spark's epoch-anchored ``window()``) so bucket
ids match the reference bit-for-bit; the global extent is one tiny
aggregate whose result is folded into the plan as a literal (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_extent_df(signals: DataFrame) -> DataFrame:
    """T1/A2 as a LAZY one-row (tmin, tmax) aggregate.

    crossJoin(broadcast(...)) this into any frame that needs the global
    extent — the whole pipeline then stays one Spark job with no driver
    action (the broadcast of a 1-row aggregate is free)."""
    return signals.agg(
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    )


def time_extent(signals: DataFrame) -> tuple[int, int]:
    """T1/A2: global (min, max) epoch-seconds across all signals,
    collected to driver ints.  Use :func:`time_extent_df` +
    :func:`attach_extent` when the extent only parameterizes further
    plan expressions — that form never syncs the driver.
    """
    row = time_extent_df(signals).first()
    return int(row["tmin"]), int(row["tmax"])


def attach_extent(df: DataFrame, extent: DataFrame) -> DataFrame:
    """Broadcast the 1-row extent aggregate onto every row of ``df``
    (adds ``tmin``/``tmax`` columns; drop them when done)."""
    return df.crossJoin(F.broadcast(extent))


def bucket_expr_col(bucket_seconds: int, tmin_col: str = "tmin") -> F.Column:
    """T3 bucket-id expression against an attached extent COLUMN (see
    :func:`attach_extent`) instead of a collected literal."""
    return F.floor(
        (F.unix_timestamp("ts") - F.col(tmin_col)) / F.lit(bucket_seconds)
    )


def bucket_expr(tmin: int, bucket_seconds: int) -> F.Column:
    """T3 bucket-id expression: floor((unix(ts) - tmin) / bucket_seconds).

    Exact-parity form of metrics_advisor.py:158
    ((ts - tmin) // step // count_bucket with step*count_bucket = bucket_seconds).
    """
    return F.floor((F.unix_timestamp("ts") - F.lit(tmin)) / F.lit(bucket_seconds))


def with_bucket_id(signals: DataFrame, tmin: int, bucket_seconds: int = 600) -> DataFrame:
    """T2/T3: add ``bucket_id`` to every sample row."""
    return signals.withColumn("bucket_id", bucket_expr(tmin, bucket_seconds))


def n_buckets(tmin: int, tmax: int, sample_time_step: int = 15,
              count_bucket: int = 40) -> int:
    """Reference bucket count: samples // count_bucket + 1 with
    samples = (tmax - tmin) // step + 1 (metrics_advisor.py:133-136)."""
    samples = (tmax - tmin) // sample_time_step + 1
    return samples // count_bucket + 1


def bucket_windows(signals: DataFrame, bucket_seconds: int = 600) -> DataFrame:
    """Idiomatic-Spark alternative: epoch-anchored tumbling window struct.

    Useful for the streaming re-skin (Structured Streaming understands
    ``window()`` natively); batch parity uses with_bucket_id instead.
    """
    return signals.withColumn(
        "window", F.window("ts", f"{bucket_seconds} seconds")
    )
