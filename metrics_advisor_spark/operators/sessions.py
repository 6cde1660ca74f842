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


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: for each step k, how many users
    performed steps 1..k IN ORDER (each step strictly after the
    previous one's first occurrence — the standard product-analytics
    funnel, the batch analogue of SQL MATCH_RECOGNIZE).

    Plan shape: one filtered min-aggregate per step, chained by
    co-partitioned equi-joins on the user key — every stage shuffles on
    the (uniform) user id and carries ONE row per qualifying user, so
    depth-k funnels cost k small aggregates over progressively shrinking
    sets, never a per-user event sort.  Returns (step_idx, step,
    n_users, pct_of_first) — pct is vs the step-1 population.
    """
    t_prev = None
    counts = []
    for idx, step in enumerate(steps):
        stage = events.filter(F.col(type_col) == step)
        if t_prev is not None:
            stage = stage.join(t_prev, user_col).filter(
                F.col("ts") > F.col("_t_prev")
            )
        t_prev = stage.groupBy(user_col).agg(
            F.min("ts").alias("_t_prev")
        )
        counts.append(
            t_prev.agg(
                F.lit(idx + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    first = out.filter(F.col("step_idx") == 1).select(
        F.col("n_users").alias("_n1")
    )
    return out.crossJoin(F.broadcast(first)).select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.try_divide(F.col("n_users"), F.col("_n1")), 6).alias(
            "pct_of_first"
        ),
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
