"""Max-abs normalization (SURVEY.md §2.6 P9).

Reference ``get_relative(xs) = x / (abs(max(xs)) + 1e-10)``
(/root/reference/metrics_advisor.py:78-80).  NOTE the reference quirk
(SURVEY Q4): it divides by abs(MAX), not max(ABS) — a negative-dominated
series flips sign.  ``parity=True`` reproduces that; the default fixes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_relative(signals: DataFrame, value_col: str = "value",
                 out_col: str = "rel_value", parity: bool = False) -> DataFrame:
    w = Window.partitionBy("metric", "series")
    if parity:
        denom = F.abs(F.max(value_col).over(w)) + F.lit(1e-10)
    else:
        denom = F.max(F.abs(F.col(value_col))).over(w) + F.lit(1e-10)
    return signals.withColumn(out_col, F.col(value_col) / denom)


def robust_scale(signals: DataFrame) -> DataFrame:
    """Robust per-series normalization: (value − median) / IQR.

    Outlier-resistant alternative to z-scoring (the reference's
    max-abs normalization, normalize.py:15, keeps its Q4 parity quirk;
    this is the statistics-grade variant).  Series with IQR = 0
    (constant or near-constant) yield NULL rather than ±inf.

    Scale: one per-series percentile aggregate (exact interpolated
    `percentile`, a single shuffle on the series key) broadcast-joined
    back onto the samples — the sample table is never sorted, and the
    stats side is one row per series.
    """
    stats = signals.groupBy("metric", "series").agg(
        F.percentile("value", F.lit(0.5)).alias("med"),
        (
            F.percentile("value", F.lit(0.75))
            - F.percentile("value", F.lit(0.25))
        ).alias("iqr"),
    )
    scaled = F.when(
        F.col("iqr") > 0, (F.col("value") - F.col("med")) / F.col("iqr")
    )
    return (
        signals.join(F.broadcast(stats), ["metric", "series"])
        .select(
            "metric",
            "series",
            "ts",
            F.round(scaled, 6).alias("scaled_value"),
        )
    )


def winsorize(
    signals: DataFrame,
    lower_p: float = 0.01,
    upper_p: float = 0.99,
) -> DataFrame:
    """Winsorization: clip each series' values to its own [p_lo, p_hi]
    exact interpolated percentiles — the standard tail-taming transform
    before means/regressions on heavy-tailed metrics.

    Same shape as `robust_scale` (normalize.py): one per-series
    percentile aggregate broadcast-joined back; the sample table is
    never sorted.  A ``was_clipped`` flag makes the transform auditable.
    """
    stats = signals.groupBy("metric", "series").agg(
        F.percentile("value", F.lit(lower_p)).alias("lo"),
        F.percentile("value", F.lit(upper_p)).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        signals.join(F.broadcast(stats), ["metric", "series"])
        .select(
            "metric",
            "series",
            "ts",
            F.round(clipped, 6).alias("value"),
            (
                (F.col("value") < F.col("lo"))
                | (F.col("value") > F.col("hi"))
            ).alias("was_clipped"),
        )
    )


def trimmed_mean(
    signals: DataFrame, trim: float = 0.1
) -> DataFrame:
    """Trimmed mean per metric: the mean over values strictly inside
    the [trim, 1−trim] exact-quantile bounds — the robust location
    estimate between median (throws away everything) and mean (throws
    away nothing).

    Two aggregates: exact percentile bounds per metric (6dp-rounded,
    engine-neutral), then a broadcast-join filter + mean.  Values
    EQUAL to a bound stay (closed interval) so ties don't flap
    membership across engines.
    """
    bounds = signals.groupBy("metric").agg(
        F.round(F.percentile("value", F.lit(trim)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(1 - trim)), 6).alias("hi"),
    )
    return (
        signals.join(F.broadcast(bounds), "metric")
        .where((F.col("value") >= F.col("lo")) & (F.col("value") <= F.col("hi")))
        .groupBy("metric")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.round(F.avg("value"), 6).alias("trimmed_mean"),
            F.round(F.max("lo"), 6).alias("lo"),
            F.round(F.max("hi"), 6).alias("hi"),
        )
    )


def quantile_align(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Quantile-mapping table between each group's value distribution
    and the corpus reference: for every interior quantile q, the
    group's value next to the corpus value — the lookup a
    quantile-normalization / distribution-matching stage applies (map
    a source's lengths onto the global shape before mixing).

    Two exact-percentile aggregates (per-group and global), the global
    array broadcast; output is groups × (n_bins−1) rows.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    qarr = F.array(*[F.lit(q) for q in qs])
    per = df.groupBy(group_col).agg(
        F.transform(
            F.percentile(F.col(value_col).cast("double"), qarr),
            lambda c: F.round(c, 6),
        ).alias("gq")
    )
    ref = df.agg(
        F.transform(
            F.percentile(F.col(value_col).cast("double"), qarr),
            lambda c: F.round(c, 6),
        ).alias("rq")
    )
    exploded = (
        per.crossJoin(F.broadcast(ref))
        .select(
            group_col,
            F.posexplode(F.arrays_zip("gq", "rq")).alias("i", "p"),
        )
        .select(
            group_col,
            ((F.col("i") + 1) * (100 // n_bins)).cast("int").alias("pct"),
            F.col("p.gq").alias("group_value"),
            F.col("p.rq").alias("ref_value"),
        )
    )
    return exploded
