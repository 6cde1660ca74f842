"""Partitioning helpers for compute-heavy Python stages.

AQE's partition coalescing is byte-based: ``parallelismFirst`` (default)
still refuses to keep partitions below
``spark.sql.adaptive.coalescePartitions.minPartitionSize`` (1 MB), so a
small shuffle collapses to 1-4 post-shuffle partitions.  That is the
right call when the downstream operator is cheap JVM expressions — and
exactly wrong when it is a grouped/vectorized Python stage whose cost is
per-row COMPUTE (permutation tests, pairwise-cosine cells, NCC folds):
bytes-in say nothing about CPU-out, and the whole stage serializes onto
one task (measured: ``detect_anomalies`` ran its 5 per-series E-Divisive
groups on ONE post-coalesce task, 3.7 s; spread over the cores the same
work is 1.7 s — guide §2/§4).

``udf_fanout`` pins an explicit hash repartition (REPARTITION_BY_NUM —
AQE never coalesces a user-specified partition count) on the grouping
keys immediately before such a stage.  The count is derived from the
session (max of defaultParallelism and the configured shuffle
partitions), never a constant: on local[N] that is N, on a cluster it is
the executor-core total / configured shuffle width, so the stage keeps
full compute parallelism at every scale.  The grouped stage's own
clustering requirement is satisfied by the explicit exchange (same
keys), so this REPLACES the shuffle the groupBy would have inserted —
plan shuffle count is unchanged, results are partition-layout-invariant
by the operators' own contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def udf_parallelism(spark) -> int:
    """Compute parallelism for a grouped-Python stage: the larger of
    the scheduler's defaultParallelism and the session shuffle width."""
    try:
        shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        shuffle = 0
    return max(spark.sparkContext.defaultParallelism, shuffle, 1)


def udf_fanout(df: DataFrame, *keys: str) -> DataFrame:
    """Explicit AQE-coalesce-proof hash repartition on ``keys`` sized by
    `udf_parallelism` — place immediately before a compute-heavy
    ``groupBy(*keys).applyInPandas`` / cogroup stage."""
    return df.repartition(udf_parallelism(df.sparkSession), *keys)
