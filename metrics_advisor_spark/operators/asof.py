"""As-of (most-recent-match) join — a time-series primitive the
reference lacks (SURVEY.md §2.5 notes no as-of/range joins exist there)
but any metrics store needs, e.g. "for each error sample, the latest
preceding config-change value".

Spark-first implementation: NOT a join at all.  Both sides are unioned,
partitioned by key and ordered by (ts, side); the right side's payload
is carried forward with ``last(..., ignorenulls=True)`` over an
unbounded-preceding row frame, then left rows are kept.  One shuffle on
the key, no pair explosion, no range-condition nested-loop join — the
plan survives arbitrarily large sides as long as a single key's rows fit
a partition (same contract as any windowed op; salt hot keys upstream).

DuckDB expresses the identical semantics natively as ``ASOF LEFT JOIN
... ON l.key = r.key AND l.ts >= r.ts``, which is the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``by`` key (backward as-of).

    Right-side payload columns arrive as ``<col><suffix>`` plus
    ``ts<suffix>``; unmatched left rows keep them NULL.  If several right
    rows share one (key, ts), the last one in (ts) order wins —
    pre-aggregate the right side if that's ambiguous for your data.

    ``tolerance_seconds`` drops matches older than the window (the match
    columns become NULL, the left row survives).
    """
    by = list(by)
    left_payload = [c for c in left.columns if c not in by and c != ts_col]
    out_vals = [f"{c}{suffix}" for c in value_cols]
    out_ts = f"{ts_col}{suffix}"

    l_side = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r_side = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_payload],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(ts_col).alias("_r_ts"),
    )

    # right rows sort before left rows at equal ts → inclusive (<=) as-of
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_side.unionByName(r_side).select(
        *by,
        ts_col,
        "_is_left",
        *left_payload,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(out_ts),
    )
    out = carried.filter(F.col("_is_left") == 1).drop("_is_left")
    if tolerance_seconds is not None:
        stale = (
            F.col(out_ts).isNull()
            | (
                F.unix_timestamp(ts_col) - F.unix_timestamp(out_ts)
                > tolerance_seconds
            )
        )
        out = out.select(
            *by,
            ts_col,
            *left_payload,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in out_vals
            ],
            F.when(stale, F.lit(None)).otherwise(F.col(out_ts)).alias(out_ts),
        )
    return out
