"""Data-quality audits: referential integrity and column profiling.

The checks a warehouse runs before trusting a fresh load.  Everything
is a left-anti join or a single-pass aggregate — no sampling, exact
answers, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    check_name: str,
) -> DataFrame:
    """One referential-integrity check: child rows whose FK is null or
    matches no parent PK.  Returns a single (check, n_orphans, n_null)
    row — composable with unionByName into an audit report.

    Scale: a left-anti join keyed on the FK (null keys counted
    separately in the same pass via a 1-row aggregate).  The parent
    side projects to its key column only, so even a wide dimension
    broadcasts.
    """
    nulls = child.where(F.col(fk_col).isNull())
    orphans = child.where(F.col(fk_col).isNotNull()).join(
        parent.select(F.col(pk_col).alias(fk_col)).distinct(),
        fk_col,
        "left_anti",
    )
    return (
        orphans.agg(F.count("*").alias("n_orphans"))
        .crossJoin(nulls.agg(F.count("*").alias("n_null")))
        .select(
            F.lit(check_name).alias("check"), "n_orphans", "n_null"
        )
    )


def profile_columns(
    df: DataFrame, numeric_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Single-pass column profile: per column, null count and distinct
    count; numeric columns additionally min/max (6dp-rounded).

    All statistics for all columns compute in ONE aggregate over one
    scan (count_distinct per column folds into the same hash aggregate)
    and are unpivoted driver-side from a 1-row result — no per-column
    scan, no shuffle besides the aggregate's own.
    """
    aggs = []
    for c in df.columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in numeric_cols:
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(
                    f"{c}__min"
                )
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(
                    f"{c}__max"
                )
            )
    wide = df.agg(*aggs)
    parts = []
    for c in df.columns:
        min_e = f"`{c}__min`" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        max_e = f"`{c}__max`" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"('{c}', `{c}__nulls`, `{c}__distinct`, {min_e}, {max_e})"
        )
    stack = ", ".join(
        f"{p[1:-1]}" for p in parts
    )
    n = len(df.columns)
    return wide.select(
        F.expr(
            f"stack({n}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )
