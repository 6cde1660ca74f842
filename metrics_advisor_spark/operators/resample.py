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


def fill_gaps(
    signals: DataFrame,
    step_seconds: int,
    method: str = "ffill",
) -> DataFrame:
    """Densify a step-aligned series: emit every slot in each series'
    [min, max] extent and fill missing values.

    ``method``: 'ffill' carries the last observed value forward
    (``last(..., ignorenulls=True)`` over an unbounded-preceding frame —
    one window, one shuffle on the series key); 'null' leaves gaps NULL;
    'zero' fills 0.0.  Leading gaps before the first observation stay
    NULL under ffill.

    Scale: the grid explode is ``sequence(min, max, step)`` per series —
    a narrow transform over the per-series extent aggregate; grid size
    is the series' own span, never a global cross join.
    """
    from pyspark.sql import Window

    ext = signals.groupBy("metric", "series").agg(
        F.min(F.unix_timestamp("ts")).alias("tmin"),
        F.max(F.unix_timestamp("ts")).alias("tmax"),
    )
    grid = ext.select(
        "metric",
        "series",
        F.explode(
            F.sequence(
                (F.floor(F.col("tmin") / step_seconds) * step_seconds).cast("long"),
                (F.floor(F.col("tmax") / step_seconds) * step_seconds).cast("long"),
                F.lit(step_seconds).cast("long"),
            )
        ).alias("slot_epoch"),
    )
    obs = signals.select(
        "metric",
        "series",
        F.unix_timestamp("ts").alias("slot_epoch"),
        "value",
    )
    joined = grid.join(obs, ["metric", "series", "slot_epoch"], "left")
    if method == "ffill":
        w = (
            Window.partitionBy("metric", "series")
            .orderBy("slot_epoch")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        value = F.last("value", ignorenulls=True).over(w)
    elif method == "zero":
        value = F.coalesce(F.col("value"), F.lit(0.0))
    elif method == "null":
        value = F.col("value")
    else:
        raise ValueError(f"unknown fill method: {method}")
    return joined.select(
        "metric",
        "series",
        F.timestamp_seconds("slot_epoch").alias("ts"),
        value.alias("value"),
    )


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
