"""Resample irregular signals onto a regular grid.

The reference assumes its upstream "reshape" stage already produced a
regular 15 s cadence (/root/reference/metrics_advisor.py:85-88 defers
discontinuity handling upstream).  This engine makes that stage explicit:
floor each timestamp to a step boundary and aggregate — one hash
aggregate, fully pushed down, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resample(signals: DataFrame, step_seconds: int, agg: str = "avg") -> DataFrame:
    """Aggregate samples into step-aligned slots.

    Output keeps the canonical schema: ts is the slot start, value the
    slot aggregate (avg/sum/min/max/count).
    """
    agg_fn = {
        "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
        "count": lambda c: F.count(c).cast("double"),
    }[agg]
    slot = F.floor(F.unix_timestamp("ts") / step_seconds) * step_seconds
    return (
        signals.groupBy(
            "metric", "series", slot.alias("slot_epoch")
        )
        .agg(agg_fn("value").alias("value"))
        .select(
            "metric",
            "series",
            F.timestamp_seconds("slot_epoch").alias("ts"),
            "value",
        )
    )
