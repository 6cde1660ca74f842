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


def ohlc(
    signals: DataFrame,
    step_seconds: int,
    keys: tuple[str, ...] = ("metric",),
) -> DataFrame:
    """Open/high/low/close bars per key per step-aligned slot.

    open/close pick the value at the earliest/latest sample of the slot,
    with a deterministic (ts, value) tiebreak so duplicate timestamps
    cannot flake a comparison against an external oracle.

    Scale: ONE hash aggregate on (keys, slot) — `min_by`/`max_by` with a
    struct ordering key do the endpoint selection inside the partial
    aggregate, so no window sort and no second shuffle.  Slot keys are
    uniform; skew only if one key dominates, in which case the partial
    (map-side) aggregate already collapses each partition to one row per
    (key, slot).
    """
    slot = (F.floor(F.unix_timestamp("ts") / step_seconds) * step_seconds).cast(
        "long"
    )
    tie = F.struct(F.col("ts"), F.col("value"))
    return (
        signals.groupBy(*keys, slot.alias("slot_epoch"))
        .agg(
            F.min_by("value", tie).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tie).alias("close"),
            F.count("value").alias("n_ticks"),
        )
    )


def time_weighted_avg(
    signals: DataFrame,
    step_seconds: int,
    keys: tuple[str, ...] = ("metric", "series"),
) -> DataFrame:
    """Time-weighted average per key per slot (TWAP).

    Each sample is weighted by its holding time — the gap to the NEXT
    sample within the same slot.  The slot's last sample has no
    successor, so a single-sample slot degrades to the plain value and a
    multi-sample slot is the duration-weighted mean of all but the last
    sample (the standard "integrate the step function between observed
    points" definition, clipped at the last observation).

    Scale: one window (partitioned by key+slot, ordered by ts) to fetch
    `lead(ts)`, then one hash aggregate on the same key — the window and
    the aggregate share a partitioning, so Catalyst plans a single
    exchange.
    """
    from pyspark.sql import Window

    slot = (F.floor(F.unix_timestamp("ts") / step_seconds) * step_seconds).cast(
        "long"
    )
    with_slot = signals.withColumn("slot_epoch", slot)
    w = Window.partitionBy(*keys, "slot_epoch").orderBy("ts", "value")
    dur = (
        F.unix_timestamp(F.lead("ts").over(w)).cast("double")
        - F.unix_timestamp("ts").cast("double")
    )
    seg = with_slot.withColumn("dur", dur)
    return seg.groupBy(*keys, "slot_epoch").agg(
        F.when(
            F.sum("dur") > 0,
            F.sum(F.col("value") * F.col("dur")) / F.sum("dur"),
        )
        .otherwise(F.avg("value"))
        .alias("twap"),
        F.count("value").alias("n_samples"),
    )


def interpolate_hourly(signals: DataFrame) -> DataFrame:
    """Densify per-metric hourly averages and linearly interpolate
    interior gaps.

    Emits every hourly slot in each metric's [min, max] extent with
    ``value`` = the hourly average where observed, else the linear
    interpolation between the nearest observed neighbours, plus an
    ``is_interpolated`` flag.  Leading/trailing slots (no neighbour on
    one side) are dropped — interpolation is defined only between two
    observations.

    Scale: hourly pre-aggregation first (the only pass over the raw
    table), then the grid explode is `sequence()` over each metric's own
    extent — never a global cross join — and the neighbour lookup is two
    `last/first(ignorenulls)` windows over the same (metric → slot)
    partitioning, so the densified frame is shuffled once.
    """
    from pyspark.sql import Window

    hourly = (
        signals.groupBy(
            "metric",
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("slot_epoch"),
        )
        .agg(F.avg("value").alias("value"))
    )
    ext = hourly.groupBy("metric").agg(
        F.min("slot_epoch").alias("tmin"), F.max("slot_epoch").alias("tmax")
    )
    grid = ext.select(
        "metric",
        F.explode(
            F.sequence("tmin", "tmax", F.lit(3600).cast("long"))
        ).alias("slot_epoch"),
    )
    dense = grid.join(hourly, ["metric", "slot_epoch"], "left")
    wp = (
        Window.partitionBy("metric")
        .orderBy("slot_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("metric")
        .orderBy("slot_epoch")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_slot = F.when(F.col("value").isNotNull(), F.col("slot_epoch"))
    prev_v = F.last("value", ignorenulls=True).over(wp)
    prev_t = F.last(obs_slot, ignorenulls=True).over(wp)
    next_v = F.first("value", ignorenulls=True).over(wn)
    next_t = F.first(obs_slot, ignorenulls=True).over(wn)
    frac = (F.col("slot_epoch") - prev_t) / (next_t - prev_t)
    interp = F.when(
        F.col("value").isNotNull(), F.col("value")
    ).otherwise(prev_v + (next_v - prev_v) * frac)
    return (
        dense.select(
            "metric",
            "slot_epoch",
            interp.alias("value"),
            F.col("value").isNull().alias("is_interpolated"),
            prev_v.alias("_pv"),
            next_v.alias("_nv"),
        )
        .where(F.col("_pv").isNotNull() & F.col("_nv").isNotNull())
        .drop("_pv", "_nv")
    )


def lag_features(
    hourly: DataFrame,
    lags: tuple[int, ...] = (1, 24),
    rolling_mean_slots: int = 24,
) -> DataFrame:
    """Forecasting feature frame: per (metric, slot), the value plus
    positional lags and a trailing rolling mean over the step-aligned
    series — the standard supervised-training table for a per-metric
    forecaster.

    Positional semantics on the resampled grid: a gap slot simply isn't
    a row, so lag_1 is "previous OBSERVED slot" (densify with
    `fill_gaps`/`interpolate_hourly` first if calendar lags are
    needed — composability is the point of keeping this positional).

    Scale: all features ride ONE window sort per metric; output stays
    one row per input slot (no fan-out).

    Hash determinism (round-5 fix): ``avg().over(rowsBetween)`` sums
    engine-side doubles in an engine-chosen order, so a trailing mean
    sitting on a round(·, 6) half-boundary can flip between engines /
    parallelism levels (the r05 driver-sim caught exactly that).  The
    rolling mean is instead expanded as a FIXED left-associated sum of
    ``rolling_mean_slots`` lags of the 6dp-quantized value — the same
    IEEE expression tree the SQL oracle evaluates (the `_ewma_sql`
    pattern) — and still rides the same single window sort.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("metric").orderBy("slot_epoch")
    rv = F.round("value", 6)
    cols = [
        F.col("metric"),
        F.col("slot_epoch"),
        rv.alias("value"),
    ]
    for k in lags:
        cols.append(F.lag(rv, k).over(w).alias(f"lag_{k}"))
    num = F.lit(0.0) + rv
    den = F.lit(0.0) + F.lit(1.0)
    for k in range(1, rolling_mean_slots):
        lk = F.lag(rv, k).over(w)
        num = num + F.coalesce(lk, F.lit(0.0))
        den = den + F.when(lk.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    # floor-form 6dp rounding: engines disagree on round() of exact
    # decimal halves (Spark HALF_UP on the shortest repr vs DuckDB's
    # scaled-double round), but floor(x*1e6 + 0.5)/1e6 is plain IEEE
    # arithmetic — identical double in, identical double out
    cols.append(
        (
            F.floor((num / den) * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias(f"rmean_{rolling_mean_slots}")
    )
    return hourly.select(*cols)
