"""SQL surface (SURVEY.md §2.8).

The reference has no SQL; this engine exposes one because Spark gives it
nearly for free:

- ``register_signals`` publishes the canonical long table as a temp view
  so every relational operator (joins, grouping sets, percentiles,
  windows) is available via ``spark.sql``.
- The signal-processing operators that Catalyst can't express are
  registered as **partition-aware Python UDTFs** (Spark ≥3.5 table
  arguments): ``ma_detect_changepoints`` / ``ma_detect_outliers`` run
  per (metric, series) partition directly from SQL::

      SELECT * FROM ma_detect_changepoints(
          TABLE(SELECT * FROM signals)
          PARTITION BY (metric, series) ORDER BY ts)

  The UDTF buffers one partition (one series) — the same unit of work,
  memory bound and parallelism as the applyInPandas path; Catalyst
  inserts the shuffle for PARTITION BY exactly as groupBy would.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


def _changepoint_udtf():
    from pyspark.sql import Row

    @udtf(returnType="metric string, series string, idx int, ts timestamp, "
                     "value double")
    class DetectChangepoints:
        """E-Divisive change points per (metric, series) partition."""

        def __init__(self) -> None:
            self._rows: list[Row] = []

        def eval(self, row: Row) -> None:
            self._rows.append(row)

        def terminate(self):
            import numpy as np

            from metrics_advisor_spark.operators.detect import (
                _series_seed,
                e_divisive_np,
                moving_median_np,
            )

            if not self._rows:
                return
            rows = sorted(self._rows, key=lambda r: r["ts"])
            x = np.array([r["value"] for r in rows], dtype=np.float64)
            med = moving_median_np(x, 5)
            seed = _series_seed(rows[0]["metric"], rows[0]["series"])
            for i in e_divisive_np(med, pvalue=0.05, permutations=100,
                                   seed=seed):
                r = rows[i]
                yield (r["metric"], r["series"], int(i), r["ts"], r["value"])

    return DetectChangepoints


def _outlier_udtf():
    from pyspark.sql import Row

    @udtf(returnType="metric string, series string, idx int, ts timestamp, "
                     "value double")
    class DetectOutliers:
        """STL-style 3σ outliers per (metric, series) partition."""

        def __init__(self) -> None:
            self._rows: list[Row] = []

        def eval(self, row: Row) -> None:
            self._rows.append(row)

        def terminate(self):
            import numpy as np

            from metrics_advisor_spark.operators.detect import stl_outliers_np

            if not self._rows:
                return
            rows = sorted(self._rows, key=lambda r: r["ts"])
            x = np.array([r["value"] for r in rows], dtype=np.float64)
            for i in stl_outliers_np(x):
                r = rows[int(i)]
                yield (r["metric"], r["series"], int(i), r["ts"], r["value"])

    return DetectOutliers


def register_udtfs(spark: SparkSession) -> None:
    """Register the signal-processing UDTFs for SQL use."""
    spark.udtf.register("ma_detect_changepoints", _changepoint_udtf())
    spark.udtf.register("ma_detect_outliers", _outlier_udtf())


def register_signals(spark: SparkSession, signals, name: str = "signals") -> None:
    """Publish a signals DataFrame as a temp view for spark.sql use."""
    signals.createOrReplaceTempView(name)


def register_all(spark: SparkSession, signals=None) -> None:
    register_udtfs(spark)
    if signals is not None:
        register_signals(spark, signals)


def register_analytics_views(
    spark: SparkSession,
    signals=None,
    events=None,
    gap_seconds: int = 1800,
) -> None:
    """Publish the round-4 analytics building blocks as temp views so
    the whole journey/time-series surface is reachable from plain
    ``spark.sql``:

    - ``signals``      — canonical long table (when given)
    - ``hourly``       — (metric, slot_epoch, value) hourly means
    - ``sessions``     — per-session aggregates (gap-based)
    - ``user_daily``   — (user_id, day, n_events, total_value)

    Views are lazy — registering costs nothing until queried, and every
    SQL query against them plans through the same Catalyst pipeline as
    the DataFrame API (shared shuffles, AQE, pushdown).
    """
    from pyspark.sql import functions as F

    from metrics_advisor_spark.operators.sessions import session_stats

    if signals is not None:
        register_signals(spark, signals)
        hourly = (
            signals.groupBy(
                "metric",
                (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
                .cast("long")
                .alias("slot_epoch"),
            )
            .agg(F.avg("value").alias("value"))
        )
        hourly.createOrReplaceTempView("hourly")
        session_stats(signals, gap_seconds).createOrReplaceTempView(
            "sessions"
        )
    if events is not None:
        events.createOrReplaceTempView("events")
        (
            events.select(
                "user_id",
                F.floor(F.unix_timestamp("ts") / 86400)
                .cast("long")
                .alias("day"),
                "value",
            )
            .groupBy("user_id", "day")
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .createOrReplaceTempView("user_daily")
        )


def register_corpus_views(
    spark: SparkSession,
    documents,
    target=None,
) -> None:
    """Publish the LLM-corpus operator surface as temp views so the
    curation loop is reachable from plain ``spark.sql``:

    - ``documents``      — the corpus itself
    - ``doc_quality``    — per-doc text-quality features (text_stats)
    - ``doc_dsir``       — DSIR importance weights (when ``target`` is
                           given, e.g. ``F.col('source') == 'wiki'``)
    - ``doc_intradoc_rep`` — within-doc repeated-passage report
    - ``dup_clusters``   — exact-dup clusters with source purity
    - ``doc_perplexity`` — CCNet-style char-LM quality scores (r14)
    - ``dup_span_stats`` — corpus duplication accounting over the
                           winnowed span family (r14)

    Views are lazy — registering costs nothing until queried; a SQL
    user can then e.g.::

        SELECT d.doc_id FROM documents d
        JOIN doc_dsir w USING (doc_id)
        LEFT ANTI JOIN doc_intradoc_rep r ON d.doc_id = r.doc_id
        WHERE w.log_weight >= -60

    (admit target-like docs without internal boilerplate repeats).
    """
    from metrics_advisor_spark.functions.dedup import (
        dup_cluster_purity,
        intradoc_repetition,
    )
    from metrics_advisor_spark.functions.selection import dsir_weights
    from metrics_advisor_spark.functions.text import text_stats

    documents.createOrReplaceTempView("documents")
    text_stats(documents).createOrReplaceTempView("doc_quality")
    if target is not None:
        dsir_weights(documents, target).createOrReplaceTempView(
            "doc_dsir"
        )
    intradoc_repetition(documents).createOrReplaceTempView(
        "doc_intradoc_rep"
    )
    if "source" in documents.columns:
        dup_cluster_purity(documents).createOrReplaceTempView(
            "dup_clusters"
        )
    from metrics_advisor_spark.functions.dedup import (
        duplicate_span_stats,
    )
    from metrics_advisor_spark.functions.text import char_lm_perplexity

    char_lm_perplexity(documents).createOrReplaceTempView(
        "doc_perplexity"
    )
    duplicate_span_stats(
        documents,
        group_col="source" if "source" in documents.columns else None,
    ).createOrReplaceTempView("dup_span_stats")
