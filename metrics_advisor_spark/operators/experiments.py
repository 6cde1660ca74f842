"""Experiment analysis: deterministic arm assignment and two-sample
z-statistics.

The A/B readout every event pipeline eventually needs.  Arm assignment
uses the same salted id-hash as `train_val_test_split`
(functions/curation.py) — re-runs and late events route identically,
and the DuckDB oracle reproduces the split bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import _hash56


def ab_assign(
    df: DataFrame, unit_col: str = "user_id", salt: str = "exp1"
) -> DataFrame:
    """Deterministic 50/50 arm split on the salted unit-id hash."""
    arm = (
        _hash56(F.concat(F.lit(salt + "_"), F.col(unit_col).cast("string")))
        % 2
    )
    return df.withColumn("arm", arm.cast("int"))


def ab_test_zscores(
    events: DataFrame,
    metric_col: str = "value",
    group_col: str = "event_type",
    unit_col: str = "user_id",
    salt: str = "exp1",
) -> DataFrame:
    """Per-group two-sample z statistic between the arms (Welch form:
    z = (mean_b − mean_a) / √(var_a/n_a + var_b/n_b), sample variance).

    NULL z when either arm is empty/degenerate rather than an error.

    Scale: ONE hash aggregate keyed (group, arm) — moments fold
    map-side — pivoted to a per-group row with a conditional re-
    aggregate (no join, no second scan).
    """
    assigned = ab_assign(events, unit_col, salt)
    per_arm = assigned.groupBy(group_col, "arm").agg(
        F.count(metric_col).alias("n"),
        F.avg(metric_col).alias("mean"),
        F.var_samp(metric_col).alias("var"),
    )

    def pick(col: str, arm: int):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    wide = per_arm.groupBy(group_col).agg(
        F.coalesce(pick("n", 0), F.lit(0)).alias("n_a"),
        F.coalesce(pick("n", 1), F.lit(0)).alias("n_b"),
        pick("mean", 0).alias("mean_a"),
        pick("mean", 1).alias("mean_b"),
        pick("var", 0).alias("var_a"),
        pick("var", 1).alias("var_b"),
    )
    se = F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    z = F.when(se > 0, (F.col("mean_b") - F.col("mean_a")) / se)
    return wide.select(
        group_col,
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(z, 6).alias("z"),
    )
