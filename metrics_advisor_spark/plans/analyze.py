"""End-to-end analysis plan — the reference's __main__ pipeline
(/root/reference/metrics_advisor.py:83-247) as one lazy DataFrame dataflow.

    signals ──► validity (S3) ──► range gate (F2) ──► detect (P1–P7)
        └──► time extent (T1)          anomalies ──► bucket ids (T2/T3)
                                            │  dedup (T4) + routing (F4)
                    obj members ◄───────────┴──────────► cand members
                          │            J1 broadcast join + corr (P8)
                          └────────► correlations ──► best lag (A4)
                                               └──► ranked top-k (K1–K3)

Everything stays distributed until the final (tiny) ranked result.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.config import AdvisorConfig
from metrics_advisor_spark.operators.buckets import (
    attach_extent,
    bucket_expr_col,
    time_extent_df,
)
from metrics_advisor_spark.operators.detect import detect_anomalies
from metrics_advisor_spark.operators.validity import range_filter, valid_signals
from metrics_advisor_spark.operators.xcorr import (
    best_lag,
    bucket_correlation,
    positional_correlation,
    rank_correlations,
)


@dataclass
class Analysis:
    """Lazy handles on every stage's output (all DataFrames).

    ``extent`` is the LAZY 1-row (tmin, tmax) aggregate — building an
    Analysis triggers no Spark action; ``tmin``/``tmax`` collect it on
    first access (report-render time, alongside the ranked collect).
    """

    signals: DataFrame        # validated canonical input
    anomalies: DataFrame      # (metric, series, kind, idx, ts, value)
    membership: DataFrame     # (bucket_id, metric, series, is_obj)
    correlations: DataFrame   # per (bucket, obj, cand, lag)
    best: DataFrame           # best lag per pair (A4)
    ranked: DataFrame         # top-k per (bucket, objective) (K1–K3)
    extent: DataFrame         # lazy 1-row (tmin, tmax)

    def _extent_row(self):
        cached = getattr(self, "_extent_cache", None)
        if cached is None:
            cached = self.extent.first()
            object.__setattr__(self, "_extent_cache", cached)
        return cached

    @property
    def tmin(self) -> int:
        return int(self._extent_row()["tmin"])

    @property
    def tmax(self) -> int:
        return int(self._extent_row()["tmax"])


def analyze(
    signals: DataFrame,
    cfg: AdvisorConfig = AdvisorConfig(),
    *,
    eager: bool = False,
) -> Analysis:
    """``eager=True`` materializes the two internal caches (valid,
    anomalies) with one count() before returning.  Default stays lazy
    (the documented no-action contract).  Why the knob exists (r16):
    the membership/extent subtrees below are BROADCAST inputs of the
    correlation join, and Spark builds broadcasts on separate driver
    threads CONCURRENTLY with the probe job — when the shared caches
    are still unpopulated, those jobs race to compute the same cache
    partitions and serialize on block-manager locks while holding task
    slots (profiled: four 32-task broadcast-thread stages of ~4.6 s
    runTime at ≲0.25 s CPU in one flagship force).  A caller that will
    force the plan immediately (the contract queries, the bench) wants
    the caches populated first."""
    valid = valid_signals(signals, cfg.min_rows)
    # Cache: the validated table feeds detection, the extent aggregate and
    # both correlation sides.
    valid = valid.cache()
    # Lazy global extent (T1): broadcast onto consumers instead of a
    # driver-side collect — analyze() itself never runs a Spark action.
    ext = time_extent_df(valid)

    active = range_filter(valid, cfg.min_range)
    anomalies = detect_anomalies(
        active,
        median_window=cfg.median_window,
        step_seconds=float(cfg.sample_time_step),
        f_min=cfg.lowpass_fmin,
        sigma_level=cfg.sigma_level,
        cp_pvalue=cfg.cp_pvalue,
        cp_permutations=cfg.cp_permutations,
        lowpass_mode=cfg.lowpass_mode,
        lowpass_order=cfg.lowpass_order,
    ).cache()
    if eager:
        # one pass populates BOTH caches (detect reads valid), so the
        # correlation action's broadcast builds read populated blocks
        anomalies.count()

    # T3/T4/F4: anomaly → bucket membership.  Parity Q1: only change
    # points produce bucketed anomaly timestamps by default.
    bucketable = (
        anomalies.filter(F.col("kind") == "changepoint")
        if cfg.cp_only_anomaly_ts
        else anomalies
    )
    membership = (
        attach_extent(bucketable, ext)
        .withColumn("bucket_id", bucket_expr_col(cfg.bucket_seconds))
        .select("bucket_id", "metric", "series")
        .dropDuplicates(["bucket_id", "metric", "series"])
        .withColumn("is_obj", F.col("metric").isin(*cfg.obj_signals))
    )

    obj_keys = membership.filter("is_obj").select("bucket_id", "metric", "series")
    cand_keys = membership.filter(~F.col("is_obj")).select(
        "bucket_id", "metric", "series"
    )

    if cfg.positional_windows:
        # Parity Q3: the reference slices windows by sample POSITION on the
        # full series (metrics_advisor.py:186-187), so pass whole member
        # series and keep only (bucket, side) membership pairs afterwards.
        obj_full = valid.join(
            F.broadcast(obj_keys.select("metric", "series").distinct()),
            ["metric", "series"],
            "left_semi",
        )
        cand_full = valid.join(
            F.broadcast(cand_keys.select("metric", "series").distinct()),
            ["metric", "series"],
            "left_semi",
        )
        correlations = (
            positional_correlation(
                obj_full,
                cand_full,
                count_bucket=cfg.count_bucket,
                lag_max=cfg.lag_max,
            )
            .join(
                F.broadcast(
                    obj_keys.withColumnsRenamed(
                        {"metric": "obj_metric", "series": "obj_series"}
                    )
                ),
                ["bucket_id", "obj_metric", "obj_series"],
                "left_semi",
            )
            .join(
                F.broadcast(
                    cand_keys.withColumnsRenamed(
                        {"metric": "cand_metric", "series": "cand_series"}
                    )
                ),
                ["bucket_id", "cand_metric", "cand_series"],
                "left_semi",
            )
        )
    else:
        # Default: timestamp-aligned windows (documented Q3 fix).  Restrict
        # each side's sample rows to its membership (bucket, metric, series)
        # triples.  Membership is tiny (≤ #anomalous series × #buckets)
        # → broadcast the semi-joins.
        bucketed = attach_extent(valid, ext).withColumn(
            "bucket_id", bucket_expr_col(cfg.bucket_seconds)
        ).drop("tmin", "tmax")
        obj_samples = bucketed.join(
            F.broadcast(obj_keys), ["bucket_id", "metric", "series"], "left_semi"
        ).drop("bucket_id")
        cand_samples = bucketed.join(
            F.broadcast(cand_keys), ["bucket_id", "metric", "series"], "left_semi"
        ).drop("bucket_id")
        correlations = bucket_correlation(
            obj_samples,
            cand_samples,
            tmin=ext,
            bucket_seconds=cfg.bucket_seconds,
            lag_max=cfg.lag_max,
            step_seconds=cfg.sample_time_step,
        )
    best = best_lag(correlations)
    ranked = rank_correlations(best, top_k=cfg.top_k_report)
    return Analysis(
        signals=valid,
        anomalies=anomalies,
        membership=membership,
        correlations=correlations,
        best=best,
        ranked=ranked,
        extent=ext,
    )
