"""Interval/range join via block-and-refine.

Spark has no native band/interval join; a raw ``a.ts BETWEEN b.lo AND
b.hi`` join degenerates to BroadcastNestedLoopJoin (per-row interval
scan).  The scale path used here is the standard block-and-refine
rewrite: explode each interval into the fixed-width blocks it touches,
hash-join events on (key, block) equality — uniform keys, ordinary
shuffle — then refine with the exact range predicate.  Intervals touch
ceil(len/block)+1 blocks, so the explode factor is bounded and tiny for
incident-sized intervals.

Beyond-reference operator (the reference's bucket membership,
``/root/reference/metrics_advisor.py:137``, is equality-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET_S = 600


def incident_intervals(
    events: DataFrame, factor: float = 1.5, pad_s: int = 300
) -> DataFrame:
    """Per-metric incident intervals: 600 s buckets whose mean value
    exceeds ``factor`` × the metric's global mean, padded by ``pad_s``
    on each side (so intervals genuinely straddle bucket boundaries).

    Returns (metric, lo, hi) in epoch seconds, hi exclusive.
    """
    sig = events.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp("ts").alias("epoch"),
        "value",
    )
    ext = sig.agg(F.min("epoch").alias("tmin"))
    bucketed = (
        sig.crossJoin(F.broadcast(ext))
        .withColumn("bucket_id", F.floor((F.col("epoch") - F.col("tmin")) / BUCKET_S))
        .groupBy("metric", "bucket_id")
        .agg(F.avg("value").alias("bucket_avg"), F.first("tmin").alias("tmin"))
    )
    gavg = sig.groupBy("metric").agg(F.avg("value").alias("metric_avg"))
    start = F.col("tmin") + F.col("bucket_id") * BUCKET_S
    return (
        bucketed.join(F.broadcast(gavg), "metric")
        .filter(F.col("bucket_avg") > F.lit(factor) * F.col("metric_avg"))
        .select(
            "metric",
            (start - pad_s).alias("lo"),
            (start + BUCKET_S + pad_s).alias("hi"),
        )
    )


def range_join_count(events: DataFrame, intervals: DataFrame) -> DataFrame:
    """Count distinct events inside any same-metric interval.

    Block-and-refine: intervals explode to the 600 s blocks they touch
    (``sequence`` on block ids), the join is pure (metric, block)
    equality, and the range predicate only refines matched pairs.
    Overlapping intervals are deduplicated by distinct event id.
    """
    blocked = intervals.select(
        "metric",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BUCKET_S),
                F.floor((F.col("hi") - 1) / BUCKET_S),
            )
        ).alias("blk"),
    )
    ev = events.select(
        F.col("event_type").alias("metric"),
        F.col("event_id"),
        F.unix_timestamp("ts").alias("epoch"),
    ).withColumn("blk", F.floor(F.col("epoch") / BUCKET_S))
    return (
        ev.join(blocked, ["metric", "blk"])
        .filter((F.col("epoch") >= F.col("lo")) & (F.col("epoch") < F.col("hi")))
        .groupBy("metric")
        .agg(F.countDistinct("event_id").alias("n_events"))
    )
