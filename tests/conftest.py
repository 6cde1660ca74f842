from __future__ import annotations

import os
import sys
from datetime import datetime, timezone

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metrics_advisor_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("metrics_advisor_spark_tests", shuffle_partitions=8)
    yield s


def epoch_dt(t: int) -> datetime:
    return datetime.fromtimestamp(int(t), tz=timezone.utc).replace(tzinfo=None)


def make_signals_df(spark, series: dict[tuple[str, str], np.ndarray],
                    t0: int = 1640588307, step: int = 15):
    """Build a signals DataFrame from {(metric, series): values}."""
    rows = []
    for (m, s), v in series.items():
        for i, val in enumerate(np.asarray(v, dtype=float)):
            rows.append((m, s, epoch_dt(t0 + step * i),
                         None if np.isnan(val) else float(val)))
    return spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
