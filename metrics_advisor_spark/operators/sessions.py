"""Sessionization — gap-based event grouping, a standard events-table
operator beyond the reference's surface (the signals model is a superset
of an event stream, SURVEY.md §1.5).

Spark-first: a ``lag`` window flags gaps larger than the timeout, a
running sum of flags numbers the sessions — two window passes over ONE
shuffle on the series key, no self-join, no UDF.  Identical SQL runs on
any engine (the DuckDB oracle uses the same two windows).

Streaming note: the native streaming equivalent is
``session_window(ts, gap)`` in a watermarked groupBy; this module is the
batch form with explicit session ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    signals: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("series",),
) -> DataFrame:
    """Assign a 0-based per-key ``session_id``: a new session starts when
    the gap since the previous event exceeds ``gap_seconds``."""
    order = Window.partitionBy(*key_cols).orderBy("ts")
    prev = F.lag(F.unix_timestamp("ts")).over(order)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - prev) > gap_seconds),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return signals.withColumn(
        "session_id", (F.sum(is_new).over(run) - 1).cast("long")
    )


def session_stats(
    signals: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("series",),
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration, value sum."""
    s = sessionize(signals, gap_seconds, key_cols)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("session_start"),
        F.max(F.unix_timestamp("ts")).alias("session_end"),
        (
            F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
        ).alias("duration_s"),
        F.sum("value").alias("total_value"),
    )
