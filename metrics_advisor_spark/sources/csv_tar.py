"""Tar/CSV ingest (SURVEY.md §2.1 S1–S5).

The reference opens a tar(.gz), extracts the ``*.csv`` members and parses
each wide CSV (``timestamp,<series1>,<series2>,…``) with pandas
(/root/reference/metrics_advisor.py:114-120,38-48).  Here ingestion is one
distributed scan: ``binaryFile`` source + ``mapInPandas`` that parses and
melts each file into the canonical long signals schema.  One task per
file, no driver loop, no per-file plan explosion — the file count equals
the metric count, while scale grows in series × time, so this stays a
single balanced stage at any data size.

Dialect hazards handled (SURVEY.md §2.9 Q8): header names are opaque
strings (``agg_val``, ``<file>.json``, ``device:instance:port``); sidecar
``meta.yaml``/JSON files are excluded by the ``*.csv`` glob; ``reshape/``
vs ``reshaped/`` directory naming is irrelevant because we glob
recursively.
"""

from __future__ import annotations

import os
import tarfile
import tempfile
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from metrics_advisor_spark.sources.signals import SIGNALS_SCHEMA

# Hadoop Path rejects ':' in file names (URISyntaxException: Relative
# path in absolute URI), and reference metric files are named like
# `node_disk_read_bw:by_instance:by_device.csv`.  Escape on extraction,
# unescape when deriving the metric name.
_COLON_ESCAPE = "%3A"


def _melt_csv_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (path, content) rows → long signal rows."""
    import io

    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            metric = unquote(os.path.basename(path))
            if metric.endswith(".csv"):
                metric = metric[: -len(".csv")]
            wide = pd.read_csv(io.BytesIO(bytes(content)))
            if "timestamp" not in wide.columns:
                continue
            value_cols = [c for c in wide.columns if c != "timestamp"]
            if not value_cols:
                continue
            long = wide.melt(
                id_vars=["timestamp"],
                value_vars=value_cols,
                var_name="series",
                value_name="value",
            )
            out = pd.DataFrame(
                {
                    "metric": metric,
                    "series": long["series"].astype(str),
                    "ts": pd.to_datetime(
                        pd.to_numeric(long["timestamp"], errors="coerce"),
                        unit="s",
                        utc=True,
                    ).dt.tz_localize(None),
                    "value": pd.to_numeric(long["value"], errors="coerce"),
                }
            )
            yield out


def read_wide_csv_dir(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of wide metric CSVs into signals(metric, series, ts, value).

    Reference parity: get_valid_signals minus the >20-row validity gate,
    which is a separate operator (operators.validity.valid_signals).
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.csv")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_melt_csv_files, schema=SIGNALS_SCHEMA)


def extract_tar(input_tar: str, dest: str | None = None) -> str:
    """S1: extract ``*.csv`` members of a tar(.gz) to a scratch directory.

    Reference: metrics_advisor.py:114-118 (member suffix filter, then
    extractall).  Returns the directory to scan.  The tar container is a
    driver-side convenience — at scale the engine reads a CSV/parquet
    directory directly.
    """
    dest = dest or tempfile.mkdtemp(prefix="ma_spark_ingest_")
    with tarfile.open(input_tar) as tf:
        for m in tf.getmembers():
            if not (m.isfile() and m.name.endswith(".csv")):
                continue
            base = os.path.basename(m.name).replace(":", _COLON_ESCAPE)
            src = tf.extractfile(m)
            if src is None:
                continue
            with open(os.path.join(dest, base), "wb") as out:
                out.write(src.read())
    return dest


def ingest_tar(spark: SparkSession, input_tar: str) -> DataFrame:
    """S1+S2+S4+S5 composed: tar → scratch dir → one distributed melt scan."""
    return read_wide_csv_dir(spark, extract_tar(input_tar))
