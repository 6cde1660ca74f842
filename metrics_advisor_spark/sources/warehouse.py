"""Bucketed warehouse tables — co-located joins without a shuffle.

SCALE.md §1 calls for pre-partitioning big join inputs; this module is
the concrete mechanism: persist the canonical tables bucketed (and
sorted) on their join keys, so every subsequent join/groupBy on those
keys reads co-located buckets and skips the Exchange entirely — the
standard Spark answer to "we join these two huge tables every hour".

Bucket-count guidance at 100 TB: pick buckets so one bucket of the
LARGER table ≈ 128–512 MB (e.g. 50 TB table → 2¹⁷ buckets); both sides
must use the same count for the shuffle-free plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    bucket_cols: Sequence[str] = ("metric", "series"),
    sort_cols: Sequence[str] = ("ts",),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed parquet table.

    Sorting within buckets makes per-series windowed reads (detection,
    as-of, sessionize) a sequential scan with no per-task sort."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def save_signals_partitioned(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """Persist signals date-partitioned (SCALE.md §1 layout): parquet
    under ``path/sig_date=YYYY-MM-DD/``.

    Any time-bounded read then prunes whole date directories at plan
    time (`PartitionFilters` in the scan) — the 100 TB prerequisite for
    interactive windows over years of history."""
    from pyspark.sql import functions as F

    (
        df.withColumn("sig_date", F.to_date("ts"))
        .write.mode(mode)
        .partitionBy("sig_date")
        .parquet(path)
    )


def read_signals_partitioned(
    spark: SparkSession,
    path: str,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Read back a date-partitioned signals store in canonical schema.

    Time bounds MUST go through ``start_date``/``end_date`` (inclusive,
    'YYYY-MM-DD') — they filter the ``sig_date`` partition column, so
    whole date directories are pruned at plan time.  A predicate on
    ``ts`` alone cannot prune partitions (Spark doesn't know ts and
    sig_date are linked)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if start_date is not None:
        df = df.filter(F.col("sig_date") >= start_date)
    if end_date is not None:
        df = df.filter(F.col("sig_date") <= end_date)
    return df.select("metric", "series", "ts", "value")
