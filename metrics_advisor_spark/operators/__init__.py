from metrics_advisor_spark.operators.validity import (
    series_stats,
    valid_signals,
    range_filter,
)
from metrics_advisor_spark.operators.buckets import (
    time_extent,
    with_bucket_id,
    bucket_windows,
)
from metrics_advisor_spark.operators.normalize import get_relative
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

__all__ = [
    "series_stats",
    "valid_signals",
    "range_filter",
    "time_extent",
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
