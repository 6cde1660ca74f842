from metrics_advisor_spark.operators.validity import (
    series_stats,
    valid_signals,
    range_filter,
)
from metrics_advisor_spark.operators.buckets import (
    attach_extent,
    time_extent,
    time_extent_df,
    with_bucket_id,
    bucket_windows,
)
from metrics_advisor_spark.operators.normalize import (
    get_relative,
    robust_scale,
    winsorize,
)
from metrics_advisor_spark.operators.xcorr import (
    bucket_correlation,
    rank_correlations,
)
from metrics_advisor_spark.operators.detect import (
    smooth_median,
    detect_outliers,
    detect_changepoints,
    detect_anomalies,
)
from metrics_advisor_spark.operators.asof import asof_join
from metrics_advisor_spark.operators.history import (
    latest_by_key,
    merge_upsert,
    scd2_intervals,
)
from metrics_advisor_spark.operators.quality import (
    fk_violations,
    profile_columns,
)
from metrics_advisor_spark.operators.trend import (
    burst_detect,
    changes,
    counter_rate,
    deriv,
    flag_bursts,
    rolling_corr,
    seasonal_strength,
    ewma,
    gap_detect,
    irate,
    mad_outliers,
    predict_linear,
    quantile_over_time,
    resets,
    series_regression,
)
from metrics_advisor_spark.operators.rangejoin import incident_intervals, range_join_count
from metrics_advisor_spark.operators.resample import (
    fill_gaps,
    interpolate_hourly,
    ohlc,
    resample,
    time_weighted_avg,
)
from metrics_advisor_spark.operators.sessions import (
    funnel,
    interval_merge,
    last_touch_attribution,
    pmi_cooccurrence,
    session_stats,
    sessionize,
    sliding_distinct_users,
    transition_counts,
)
from metrics_advisor_spark.operators.xcorr import (
    best_lag,
    ncc_cogrouped,
    positional_correlation,
)

__all__ = [
    "burst_detect",
    "changes",
    "fk_violations",
    "flag_bursts",
    "pmi_cooccurrence",
    "profile_columns",
    "rolling_corr",
    "transition_counts",
    "winsorize",
    "last_touch_attribution",
    "robust_scale",
    "seasonal_strength",
    "sliding_distinct_users",
    "deriv",
    "interpolate_hourly",
    "interval_merge",
    "merge_upsert",
    "ohlc",
    "time_weighted_avg",
    "counter_rate",
    "ewma",
    "funnel",
    "gap_detect",
    "irate",
    "latest_by_key",
    "predict_linear",
    "resets",
    "scd2_intervals",
    "quantile_over_time",
    "mad_outliers",
    "series_regression",
    "incident_intervals",
    "range_join_count",
    "asof_join",
    "best_lag",
    "fill_gaps",
    "ncc_cogrouped",
    "positional_correlation",
    "resample",
    "session_stats",
    "sessionize",
    "series_stats",
    "valid_signals",
    "range_filter",
    "attach_extent",
    "time_extent",
    "time_extent_df",
    "with_bucket_id",
    "bucket_windows",
    "get_relative",
    "bucket_correlation",
    "rank_correlations",
    "smooth_median",
    "detect_outliers",
    "detect_changepoints",
    "detect_anomalies",
]
