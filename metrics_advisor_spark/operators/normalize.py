"""Max-abs normalization (SURVEY.md §2.6 P9).

Reference ``get_relative(xs) = x / (abs(max(xs)) + 1e-10)``
(/root/reference/metrics_advisor.py:78-80).  NOTE the reference quirk
(SURVEY Q4): it divides by abs(MAX), not max(ABS) — a negative-dominated
series flips sign.  ``parity=True`` reproduces that; the default fixes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_relative(signals: DataFrame, value_col: str = "value",
                 out_col: str = "rel_value", parity: bool = False) -> DataFrame:
    w = Window.partitionBy("metric", "series")
    if parity:
        denom = F.abs(F.max(value_col).over(w)) + F.lit(1e-10)
    else:
        denom = F.max(F.abs(F.col(value_col))).over(w) + F.lit(1e-10)
    return signals.withColumn(out_col, F.col(value_col) / denom)
