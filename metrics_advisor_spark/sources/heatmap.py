"""TiKV heatmap sidecar source (the bundles' ``heatmap/*.json``).

Each reference bundle ships PD key-range heatmaps alongside the metrics
(`/root/reference/metrics/*/heatmap/`): one JSON per measure
(read_bytes, read_keys, written_bytes, written_keys) with

    {"data": {<measure>: matrix[time][key_range]},
     "timeAxis": [t0 … tN]      # N+1 boundaries for N rows
     "keyAxis":  [{key, labels}…]  # K+1 boundaries for K columns

The reference ignores these (CSV-only glob, metrics_advisor.py:115).
Here the heatmap becomes just another signal family — long rows
``(metric, series, ts, value)`` with series = the key-range's label path
— so the whole detection/correlation pipeline applies to per-key-range
hotspots unchanged.

One ``binaryFile`` scan + ``mapInPandas`` melt, same distribution story
as the CSV source: a task per file, scale lives in rows.
"""

from __future__ import annotations

import json
import os
import tarfile
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from metrics_advisor_spark.sources.signals import SIGNALS_SCHEMA


def _melt_heatmap_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            try:
                doc = json.loads(bytes(content))
            except ValueError:
                continue
            data = doc.get("data") or {}
            time_axis = doc.get("timeAxis") or []
            key_axis = doc.get("keyAxis") or []
            for measure, matrix in data.items():
                if not matrix or len(time_axis) < len(matrix):
                    continue
                series_names = []
                for k in range(len(matrix[0])):
                    if k < len(key_axis):
                        labels = key_axis[k].get("labels") or []
                        name = "/".join(str(x) for x in labels) or (
                            key_axis[k].get("key") or f"range_{k}"
                        )
                    else:
                        name = f"range_{k}"
                    series_names.append(f"{name}#{k}")  # ranges can share labels
                rows = {
                    "metric": [],
                    "series": [],
                    "ts": [],
                    "value": [],
                }
                for t, row in enumerate(matrix):
                    ts = pd.Timestamp(int(time_axis[t]), unit="s")
                    for k, v in enumerate(row):
                        rows["metric"].append(f"heatmap_{measure}")
                        rows["series"].append(series_names[k])
                        rows["ts"].append(ts)
                        rows["value"].append(float(v))
                yield pd.DataFrame(rows)


def read_heatmap_dir(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of heatmap JSONs into canonical signals."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_melt_heatmap_files, schema=SIGNALS_SCHEMA)


def ingest_heatmap_tar(spark: SparkSession, input_tar: str) -> DataFrame:
    """Extract a bundle's ``heatmap/*.json`` members and melt them."""
    dest = tempfile.mkdtemp(prefix="ma_heatmap_ingest_")
    with tarfile.open(input_tar) as tf:
        for m in tf.getmembers():
            base = os.path.basename(m.name)
            if not (
                m.isfile()
                and base.endswith(".json")
                and not base.startswith("._")
                and os.path.basename(os.path.dirname(m.name)) == "heatmap"
            ):
                continue
            src = tf.extractfile(m)
            if src is None:
                continue
            with open(os.path.join(dest, base), "wb") as out:
                out.write(src.read())
    return read_heatmap_dir(spark, dest)
