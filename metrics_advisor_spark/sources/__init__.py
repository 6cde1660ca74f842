from metrics_advisor_spark.sources.signals import (
    SIGNALS_SCHEMA,
    signals_from_events,
    read_signals_parquet,
)
from metrics_advisor_spark.sources.csv_tar import (
    ingest_tar,
    read_wide_csv_dir,
)

__all__ = [
    "SIGNALS_SCHEMA",
    "signals_from_events",
    "read_signals_parquet",
    "ingest_tar",
    "read_wide_csv_dir",
]
