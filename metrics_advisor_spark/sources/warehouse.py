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
