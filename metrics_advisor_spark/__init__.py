"""metrics_advisor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of freedeaths/metrics-advisor.

The reference (/root/reference/metrics_advisor.py) is an eager,
single-threaded pandas pipeline over reshaped Prometheus metrics.  This
package re-expresses every stage of that pipeline — ingest, validity
filtering, time bucketing, STL-style outlier detection, E-Divisive
change-point detection, lagged normalized cross-correlation, ranking and
reporting — as declarative Spark DataFrame plans, dropping to Arrow-batched
pandas UDFs only for the signal-processing math that Catalyst cannot
express (change-point permutation tests, FFT low-pass).

Canonical data model (SURVEY.md §1.5): one long table

    signals(metric STRING, series STRING, ts TIMESTAMP, value DOUBLE)

partitioned by (metric, series) for detection and by bucket_id for
correlation.  Everything per-series is embarrassingly parallel; the
objective side of the correlation join is tiny and always broadcast.
"""

from metrics_advisor_spark.config import AdvisorConfig
from metrics_advisor_spark.session import get_spark

__all__ = ["AdvisorConfig", "get_spark"]

__version__ = "0.1.0"
