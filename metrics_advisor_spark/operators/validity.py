"""Validity + range gates (SURVEY.md §2 S3, F2/F3, A1–A3).

All pure hash aggregates — partial (map-side) combine then final, no UDFs.
The per-series stats aggregate is computed once and reused for both the
detection gate (F2) and the candidate re-check (F3), mirroring how the
reference re-evaluates the same predicate twice
(/root/reference/metrics_advisor.py:146,185).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_stats(signals: DataFrame) -> DataFrame:
    """A1+A3 per (metric, series): count, min, max, range.

    One shuffle on (metric, series); everything downstream that needs a
    per-series gate semi-joins against this (broadcast when small).
    """
    return signals.groupBy("metric", "series").agg(
        F.count("value").alias("n_samples"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        (F.max("value") - F.min("value")).alias("value_range"),
    )


def valid_signals(signals: DataFrame, min_rows: int = 20) -> DataFrame:
    """S3: drop series with ≤ min_rows samples (reference gates whole
    files at metrics_advisor.py:43; per-series is the stricter and more
    useful unit once the table is long).
    """
    keep = (
        series_stats(signals)
        .filter(F.col("n_samples") > min_rows)
        .select("metric", "series")
    )
    return signals.join(F.broadcast(keep), ["metric", "series"], "left_semi")


def range_filter(signals: DataFrame, min_range: float = 0.005) -> DataFrame:
    """F2/F3: drop near-constant series (max−min ≤ min_range,
    metrics_advisor.py:146). Cheap predicate FIRST — this gate runs before
    any expensive detection UDF, the same hand-optimization the reference
    applies."""
    keep = (
        series_stats(signals)
        .filter(F.col("value_range") > min_range)
        .select("metric", "series")
    )
    return signals.join(F.broadcast(keep), ["metric", "series"], "left_semi")
