"""Change-history operators: CDC compaction (latest record per key) and
SCD2 interval construction — the two materializations every warehouse
built from change streams needs (beyond the reference's surface; the
signals/events model is a change stream per SURVEY.md §1.5).

Spark-first shapes:

* ``latest_by_key`` — one ``row_number`` window over a single shuffle on
  the (uniform) business key.  This is the standard "compact a CDC/log
  table to current state" pattern; at 100 TB the key cardinality is the
  parallelism and no group outgrows an executor (one row per change).
* ``scd2_intervals`` — one ``lead`` window on the same partitioning:
  each change row becomes a [valid_from, valid_to) interval, the open
  row gets NULL valid_to.  Interval joins against it use the
  block-and-refine range join (``operators/rangejoin.py``).

Both take an explicit deterministic ``order_col`` tiebreak (change
streams carry a log sequence number; the driver's events table has
``event_id``) so duplicate timestamps cannot flake results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Keep the most recent row per business key (CDC compaction).

    ``order_col`` breaks equal-timestamp ties (latest wins on the higher
    sequence value), keeping the result deterministic under any
    partitioning."""
    order = [F.col(ts_col).desc()]
    if order_col is not None:
        order.append(F.col(order_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_intervals(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    order_col: str | None = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2: each change row becomes a
    [valid_from, valid_to) interval per key; the current row's
    ``valid_to`` is NULL and ``is_current`` is true.

    One ``lead`` window per key — the interval end is simply the next
    change's timestamp, so history construction is a single pass with
    no self-join."""
    order = [F.col(ts_col).asc()]
    if order_col is not None:
        order.append(F.col(order_col).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(F.unix_timestamp(ts_col)).over(w)
    return df.select(
        *key_cols,
        F.unix_timestamp(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
        *[c for c in df.columns if c not in (*key_cols, ts_col)],
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    order_cols: tuple[str, ...] = ("ts",),
    delete_col: str = "is_delete",
) -> DataFrame:
    """MERGE semantics: apply a CDC batch (upserts + deletes) to a base
    snapshot.

    Per key, the LAST change in ``order_cols`` order wins; if that
    change is a delete the key disappears, else its row replaces (or
    inserts over) the base row.  Keys untouched by the batch keep their
    base row.  This is the batch-apply counterpart of `latest_by_key`
    (operators/history.py:28).

    Precondition: ``order_cols[0]`` must be non-null on every change
    row — it doubles as the "a change exists for this key" sentinel
    after the full-outer join (a CDC feed without an event time is not
    a CDC feed).

    Scale: compact the change batch first (one window over the — much
    smaller — change set), then a single full-outer join on the key.
    The change side is usually a tiny fraction of the snapshot, so AQE
    broadcasts it; the base table is never windowed or re-sorted.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    data_cols = [c for c in base.columns if c not in key_cols]
    joined = base.alias("b").join(
        latest.alias("c"), list(key_cols), "full_outer"
    )
    picked = [
        F.when(F.col(f"c.{order_cols[0]}").isNotNull(), F.col(f"c.{col}"))
        .otherwise(F.col(f"b.{col}"))
        .alias(col)
        for col in data_cols
    ]
    return (
        joined.where(
            F.col(f"c.{delete_col}").isNull() | ~F.col(f"c.{delete_col}")
        )
        .select(*key_cols, *picked)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    compare_cols: tuple[str, ...] = ("event_type", "value"),
) -> DataFrame:
    """Reconciliation diff between two table versions: per-status row
    counts (added / removed / changed / unchanged) — the data-eng
    sanity check after a backfill, migration, or CDC replay.

    One full-outer join on the business key; change detection uses
    null-safe typed comparison on the raw columns (NO row-hash of
    stringified values — float→string formatting is engine- and
    locale-dependent, typed eqNullSafe is not).  Output is a tiny
    4-row aggregate; the join shuffles once on the (uniform) key.
    """
    o = old.select(
        *key_cols,
        F.lit(True).alias("_o_present"),
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_n_present"),
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    j = o.join(n, list(key_cols), "full")
    present_old = F.col("_o_present").isNotNull()
    present_new = F.col("_n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(~present_old, F.lit("added"))
        .when(~present_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
