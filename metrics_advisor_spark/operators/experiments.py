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


def cuped_ab(
    events: DataFrame,
    metric_col: str = "value",
    unit_col: str = "user_id",
    salt: str = "exp1",
) -> DataFrame:
    """CUPED variance-reduced experiment readout: adjust each unit's
    post-period outcome by its PRE-period covariate, Y' = Y − θ(X − X̄)
    with θ = cov(X, Y)/var(X) — the industry-standard trick that cuts
    outcome variance (and experiment runtime) without biasing the
    treatment effect, since X predates assignment.

    Pre/post split at the global time midpoint (1-row broadcast); units
    without a post-period outcome drop (no outcome to adjust), units
    without pre data keep Y' = Y − θ(X̄₀…) via a zero-centered covariate
    of 0 (standard missing-covariate handling: no adjustment).  One
    per-unit aggregate, two 1-row moment aggregates, no windows.
    Returns a single row with raw and CUPED z alongside the variance
    reduction actually achieved.
    """
    ue = events.select(
        F.col(unit_col).alias("unit"),
        F.unix_timestamp("ts").alias("epoch"),
        F.col(metric_col).cast("double").alias("y"),
    )
    mid = ue.agg(((F.min("epoch") + F.max("epoch")) / 2.0).alias("mid"))
    per_unit = (
        ue.crossJoin(F.broadcast(mid))
        .groupBy("unit")
        .agg(
            F.avg(F.when(F.col("epoch") <= F.col("mid"), F.col("y")))
            .alias("pre"),
            F.avg(F.when(F.col("epoch") > F.col("mid"), F.col("y")))
            .alias("post"),
        )
        .where(F.col("post").isNotNull())
    )
    from metrics_advisor_spark.functions.dedup import _hash56

    arm = (
        _hash56(F.concat(F.lit(salt + "_"), F.col("unit").cast("string")))
        % 2
    ).cast("int")
    assigned = per_unit.select("unit", "pre", "post", arm.alias("arm"))
    moments = assigned.where(F.col("pre").isNotNull()).agg(
        F.try_divide(
            F.covar_samp("pre", "post"), F.var_samp("pre")
        ).alias("theta"),
        F.avg("pre").alias("pre_mean"),
    )
    adj = assigned.crossJoin(F.broadcast(moments)).select(
        "arm",
        "post",
        (
            F.col("post")
            - F.coalesce(
                F.col("theta") * (F.col("pre") - F.col("pre_mean")),
                F.lit(0.0),
            )
        ).alias("post_adj"),
        "theta",
    )
    per_arm = adj.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.avg("post").alias("m_raw"),
        F.var_samp("post").alias("v_raw"),
        F.avg("post_adj").alias("m_adj"),
        F.var_samp("post_adj").alias("v_adj"),
        F.max("theta").alias("theta"),
    )

    def pick(col: str, a: int):
        return F.max(F.when(F.col("arm") == a, F.col(col)))

    wide = per_arm.agg(
        pick("n", 0).alias("n_a"),
        pick("n", 1).alias("n_b"),
        pick("m_raw", 0).alias("mra"),
        pick("m_raw", 1).alias("mrb"),
        pick("v_raw", 0).alias("vra"),
        pick("v_raw", 1).alias("vrb"),
        pick("m_adj", 0).alias("maa"),
        pick("m_adj", 1).alias("mab"),
        pick("v_adj", 0).alias("vaa"),
        pick("v_adj", 1).alias("vab"),
        F.max("theta").alias("theta"),
    )
    # try_divide throughout: a CUPED adjustment that removes (almost)
    # all outcome variance makes the adjusted SE exactly 0 — NULL z
    # beats an ANSI divide-by-zero error (oracle mirrors with CASE).
    z_raw = F.try_divide(
        F.col("mrb") - F.col("mra"),
        F.sqrt(F.col("vra") / F.col("n_a") + F.col("vrb") / F.col("n_b")),
    )
    z_adj = F.try_divide(
        F.col("mab") - F.col("maa"),
        F.sqrt(F.col("vaa") / F.col("n_a") + F.col("vab") / F.col("n_b")),
    )
    pooled_raw = (F.col("vra") + F.col("vrb")) / 2
    pooled_adj = (F.col("vaa") + F.col("vab")) / 2
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("theta", 6).alias("theta"),
        F.round(z_raw, 6).alias("z_raw"),
        F.round(z_adj, 6).alias("z_cuped"),
        F.round(
            1 - F.try_divide(pooled_adj, pooled_raw), 6
        ).alias("var_reduction"),
    )
