"""Ingest edge cases + MLlib distance-based outlier detector."""

from __future__ import annotations

import os
import tarfile

import numpy as np
import pytest

from metrics_advisor_spark.sources import ingest_tar
from metrics_advisor_spark.sources.csv_tar import read_wide_csv_dir

from conftest import make_signals_df


def _make_tar(path, files: dict[str, str]):
    import io

    with tarfile.open(path, "w:gz") as tf:
        for name, content in files.items():
            data = content.encode()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))


def test_empty_tar_yields_empty_signals(spark, tmp_path):
    tar = str(tmp_path / "empty.tar.gz")
    _make_tar(tar, {"readme.txt": "no csvs here"})
    sig = ingest_tar(spark, tar)
    assert sig.count() == 0
    assert sig.columns == ["metric", "series", "ts", "value"]


def test_csv_without_timestamp_column_skipped(spark, tmp_path):
    tar = str(tmp_path / "mixed.tar.gz")
    _make_tar(
        tar,
        {
            "good.csv": "timestamp,a\n100,1.0\n115,2.0\n",
            "bad.csv": "x,y\n1,2\n3,4\n",
        },
    )
    sig = ingest_tar(spark, tar)
    assert {r["metric"] for r in sig.select("metric").distinct().collect()} \
        == {"good"}


def test_non_numeric_values_become_null(spark, tmp_path):
    d = tmp_path / "csvs"
    d.mkdir()
    (d / "m.csv").write_text("timestamp,a\n100,1.5\n115,oops\n130,3.0\n")
    sig = read_wide_csv_dir(spark, str(d)).collect()
    vals = {int(r["ts"].timestamp()): r["value"] for r in sig}
    assert vals[100] == 1.5
    assert vals[115] is None
    assert vals[130] == 3.0


def test_meta_yaml_ignored(spark, tmp_path):
    tar = str(tmp_path / "meta.tar.gz")
    _make_tar(
        tar,
        {
            "reshape/m.csv": "timestamp,a\n100,1.0\n115,2.0\n",
            "reshape/meta.yaml": "tikv_instance_cnt: 3\n",
        },
    )
    sig = ingest_tar(spark, tar)
    assert sig.count() == 2


def test_kmeans_outlier_detector_flags_jump(spark):
    from metrics_advisor_spark.operators.mllib_detect import (
        detect_outliers_kmeans,
    )

    rng = np.random.default_rng(23)
    vals = rng.normal(10, 0.2, 200)
    vals[120] = 25.0  # single extreme jump
    df = make_signals_df(spark, {("m", "s"): vals})
    flagged = detect_outliers_kmeans(df, n_clusters=4, sigma_level=3.0).collect()
    idx = {int((r["ts"].timestamp() - 1640588307) / 15) for r in flagged}
    assert 120 in idx
    # the spike (plus its delta neighbors and at most a few distance-tail
    # points) — not a mass flagging
    assert len(idx) <= 6


def test_round3_ops_on_degenerate_inputs(spark):
    """New round-3 operators must survive empty / single-row / constant
    inputs (the shapes a driver edge-case or an empty partition feeds)."""
    from metrics_advisor_spark.functions.curation import (
        source_stats,
        weighted_sample,
    )
    from metrics_advisor_spark.functions.dedup import dup_cluster_sizes
    from metrics_advisor_spark.functions.text import (
        heavy_hitters,
        normalize_text,
        zipf_slope,
    )
    from pyspark.sql import functions as F

    from metrics_advisor_spark.operators.trend import (
        gap_detect,
        irate,
        quantile_over_time,
    )

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert heavy_hitters(empty_docs).count() == 0
    assert normalize_text(empty_docs).count() == 0
    assert source_stats(empty_docs).count() == 0
    assert weighted_sample(empty_docs).count() == 0
    # zipf on an empty corpus: single row of NULL slope, zero terms
    z = zipf_slope(empty_docs).collect()[0]
    assert z["n_terms"] == 0 and z["zipf_slope"] is None

    # punctuation-only doc tokenizes to nothing
    punct = spark.createDataFrame(
        [(0, "!!! ???", "en", "w", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert heavy_hitters(punct).count() == 0
    assert normalize_text(punct).collect()[0]["n_chars_clean"] == 0

    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dup_cluster_sizes(empty_pairs).count() == 0

    # single-sample series: no gaps, no rates, one quantile row
    one = spark.createDataFrame(
        [("m", "s", 100, 1.0)],
        "metric string, series string, epoch long, value double",
    ).withColumn("ts", F.col("epoch").cast("timestamp")).drop("epoch")
    assert gap_detect(one).count() == 0
    assert irate(one).count() == 0
    q = quantile_over_time(one).collect()
    assert len(q) == 1 and q[0]["p50"] == 1.0
