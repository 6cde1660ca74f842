from metrics_advisor_spark.sources.signals import (
    SIGNALS_SCHEMA,
    signals_from_events,
    read_signals_parquet,
)
from metrics_advisor_spark.sources.csv_tar import (
    ingest_tar,
    read_wide_csv_dir,
)
from metrics_advisor_spark.sources.prom_json import (
    ingest_prom_tar,
    read_prometheus_json,
)
from metrics_advisor_spark.sources.warehouse import (
    read_signals_partitioned,
    save_bucketed,
    save_signals_partitioned,
)

__all__ = [
    "SIGNALS_SCHEMA",
    "signals_from_events",
    "read_signals_parquet",
    "ingest_tar",
    "ingest_prom_tar",
    "read_prometheus_json",
    "read_wide_csv_dir",
    "read_signals_partitioned",
    "save_bucketed",
    "save_signals_partitioned",
]
