"""Data-quality audits: referential integrity and column profiling.

The checks a warehouse runs before trusting a fresh load.  Everything
is a left-anti join or a single-pass aggregate — no sampling, exact
answers, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    check_name: str,
) -> DataFrame:
    """One referential-integrity check: child rows whose FK is null or
    matches no parent PK.  Returns a single (check, n_orphans, n_null)
    row — composable with unionByName into an audit report.

    Scale: a left-anti join keyed on the FK (null keys counted
    separately in the same pass via a 1-row aggregate).  The parent
    side projects to its key column only, so even a wide dimension
    broadcasts.
    """
    nulls = child.where(F.col(fk_col).isNull())
    orphans = child.where(F.col(fk_col).isNotNull()).join(
        parent.select(F.col(pk_col).alias(fk_col)).distinct(),
        fk_col,
        "left_anti",
    )
    return (
        orphans.agg(F.count("*").alias("n_orphans"))
        .crossJoin(nulls.agg(F.count("*").alias("n_null")))
        .select(
            F.lit(check_name).alias("check"), "n_orphans", "n_null"
        )
    )


def profile_columns(
    df: DataFrame, numeric_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Single-pass column profile: per column, null count and distinct
    count; numeric columns additionally min/max (6dp-rounded).

    All statistics for all columns compute in ONE aggregate over one
    scan (count_distinct per column folds into the same hash aggregate)
    and are unpivoted driver-side from a 1-row result — no per-column
    scan, no shuffle besides the aggregate's own.
    """
    aggs = []
    for c in df.columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if c in numeric_cols:
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 6).alias(
                    f"{c}__min"
                )
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 6).alias(
                    f"{c}__max"
                )
            )
    wide = df.agg(*aggs)
    parts = []
    for c in df.columns:
        min_e = f"`{c}__min`" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        max_e = f"`{c}__max`" if c in numeric_cols else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"('{c}', `{c}__nulls`, `{c}__distinct`, {min_e}, {max_e})"
        )
    stack = ", ".join(
        f"{p[1:-1]}" for p in parts
    )
    n = len(df.columns)
    return wide.select(
        F.expr(
            f"stack({n}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def psi_drift(
    signals: DataFrame, n_bins: int = 10, eps: float = 1e-6
) -> DataFrame:
    """Population Stability Index per metric between the first and
    second half of each metric's own time range — the standard ML-ops
    drift gate (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    Bin edges are the REFERENCE half's deciles (6dp-rounded so the edge
    set is engine-neutral); both halves are histogrammed against those
    edges and PSI = Σ (p_cur − p_ref)·ln((p_cur+ε)/(p_ref+ε)) with a
    symmetric ε guard for empty bins.

    Plan: three narrow passes over the signal table — per-metric extent
    aggregate, per-metric exact-decile aggregate on the reference half,
    then one binning aggregate with the (tiny) edge table broadcast on
    the metric key.  No windows, no self-joins; scales with rows, and
    the per-metric edge list is O(metrics · n_bins).
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    sig = signals.select(
        "metric", F.unix_timestamp("ts").alias("epoch"), "value"
    )
    extent = sig.groupBy("metric").agg(
        ((F.min("epoch") + F.max("epoch")) / 2.0).alias("mid")
    )
    sides = sig.join(F.broadcast(extent), "metric").select(
        "metric", "value", (F.col("epoch") <= F.col("mid")).alias("is_ref")
    )
    cuts = (
        sides.where("is_ref")
        .groupBy("metric")
        .agg(
            F.transform(
                F.percentile("value", F.array(*[F.lit(q) for q in qs])),
                lambda c: F.round(c, 6),
            ).alias("cuts")
        )
    )
    binned = sides.join(F.broadcast(cuts), "metric").select(
        "metric",
        "is_ref",
        F.size(
            F.filter(F.col("cuts"), lambda c: F.col("value") > c)
        ).alias("bin"),
    )
    cells = binned.groupBy("metric", "bin").agg(
        F.sum(F.col("is_ref").cast("long")).alias("nr"),
        F.sum((~F.col("is_ref")).cast("long")).alias("nc"),
    )
    tot = cells.groupBy("metric").agg(
        F.sum("nr").alias("tr"), F.sum("nc").alias("tc")
    )
    p_ref = F.col("nr") / F.col("tr")
    p_cur = F.col("nc") / F.col("tc")
    term = (p_cur - p_ref) * F.log((p_cur + eps) / (p_ref + eps))
    return (
        cells.join(tot, "metric")
        .groupBy("metric")
        .agg(
            F.max("tr").cast("long").alias("n_ref"),
            F.max("tc").cast("long").alias("n_cur"),
            F.round(F.sum(term), 6).alias("psi"),
        )
    )


def key_skew_audit(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew profile: the distribution of per-key row counts for
    a prospective join/groupBy key — the number every shuffle-sizing
    decision at 100 TB starts from (hot-key share decides whether a join
    needs salting or AQE skew handling).

    One aggregate to key frequencies, one tiny aggregate to the profile
    row: distinct keys, max frequency, top-1 share, p50/p99 frequency
    and their ratio.  Composable with unionByName across keys into one
    audit table.
    """
    freq = df.groupBy(key_col).agg(F.count("*").alias("n"))
    return freq.agg(
        F.lit(key_col).alias("key"),
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_freq"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top1_share"),
        F.round(F.percentile("n", F.lit(0.5)), 6).alias("p50_freq"),
        F.round(F.percentile("n", F.lit(0.99)), 6).alias("p99_freq"),
        F.round(
            F.percentile("n", F.lit(0.99))
            / F.percentile("n", F.lit(0.5)),
            6,
        ).alias("skew_ratio"),
    )


def benford_audit(signals: DataFrame) -> DataFrame:
    """Benford's-law first-significant-digit audit per metric: observed
    digit shares next to the log10(1 + 1/d) expectation — the classic
    fabricated-/truncated-data smell test for positive, scale-spanning
    measurements.

    The digit is the first [1-9] of the value's string form — sign,
    leading zeros and scientific notation all skip naturally, and the
    leading significant digit is representation-independent, so the
    extraction is engine-neutral (float log10 + floor near powers of
    ten is NOT: log10(1000) rounds below 3).  Zero values have no
    significant digit and drop out.  One projection + one bounded
    (metric × 9) aggregate; the share window runs over that tiny frame.
    """
    from pyspark.sql import Window

    digit = F.regexp_extract(
        F.col("value").cast("string"), "[1-9]", 0
    )
    cells = (
        signals.select("metric", digit.alias("d"))
        .where(F.col("d") != "")
        .select("metric", F.col("d").cast("int").alias("digit"))
        .groupBy("metric", "digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("metric"))
    return cells.select(
        "metric",
        "digit",
        "n",
        F.round(F.col("n") / tot, 6).alias("share"),
        F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("expected"),
    )


def ks_drift(signals: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per metric between the
    first and second half of each metric's time range: D = max over the
    merged sample of |F_ref(x) − F_cur(x)| — the distribution-free
    companion to `psi_drift` (no binning to hide a shift in).

    The running CDFs ride ONE window partitioned by metric over the
    per-(metric, value) grouped frame (so ties advance both CDFs
    atomically — the right-continuous convention); each metric's value
    axis sorts independently, nothing global.
    """
    from pyspark.sql import Window

    sig = signals.select(
        "metric", F.unix_timestamp("ts").alias("epoch"), "value"
    )
    extent = sig.groupBy("metric").agg(
        ((F.min("epoch") + F.max("epoch")) / 2.0).alias("mid")
    )
    sides = sig.join(F.broadcast(extent), "metric").select(
        "metric", "value", (F.col("epoch") <= F.col("mid")).alias("is_ref")
    )
    per_val = sides.groupBy("metric", "value").agg(
        F.sum(F.col("is_ref").cast("long")).alias("cr"),
        F.sum((~F.col("is_ref")).cast("long")).alias("cc"),
    )
    w = (
        Window.partitionBy("metric")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = Window.partitionBy("metric")
    stepped = per_val.select(
        "metric",
        F.sum("cr").over(w).alias("sr"),
        F.sum("cc").over(w).alias("sc"),
        F.sum("cr").over(t).alias("tr"),
        F.sum("cc").over(t).alias("tc"),
    )
    return stepped.groupBy("metric").agg(
        F.max("tr").cast("long").alias("n_ref"),
        F.max("tc").cast("long").alias("n_cur"),
        F.round(
            F.max(
                F.abs(
                    F.col("sr") / F.col("tr") - F.col("sc") / F.col("tc")
                )
            ),
            6,
        ).alias("ks"),
    )


def freshness_audit(events: DataFrame) -> DataFrame:
    """Data-freshness profile per metric: staleness of each metric's
    latest sample vs the table's global high-water mark — the first
    number every ingestion-SLA dashboard shows (a silently-stalled
    source is exactly a metric whose staleness grows while the
    high-water mark advances).

    One per-metric aggregate + one 1-row global max broadcast.
    """
    s = events.select(
        F.col("event_type").alias("metric"),
        F.unix_timestamp("ts").alias("epoch"),
    )
    per = s.groupBy("metric").agg(
        F.max("epoch").alias("last_epoch"),
        F.count("*").cast("long").alias("n_events"),
    )
    hwm = s.agg(F.max("epoch").alias("hwm"))
    return per.crossJoin(F.broadcast(hwm)).select(
        "metric",
        "n_events",
        (F.col("hwm") - F.col("last_epoch")).cast("long").alias("staleness_s"),
    )


def dist_overlap(signals: DataFrame, n_bins: int = 10) -> DataFrame:
    """Histogram-intersection overlap between every metric pair:
    Σ_bins min(p_a, p_b) over a SHARED decile grid of the combined
    values — 1 for identical distributions, →0 for disjoint; the
    pairwise companion to the drift gates (psi_drift / ks_drift).

    Global decile cuts (6dp-rounded, broadcast), per-(metric, bin)
    shares, then the bin-keyed pair join — quadratic only in metrics,
    shuffle keyed by bin.
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = signals.agg(
        F.transform(
            F.percentile("value", F.array(*[F.lit(q) for q in qs])),
            lambda c: F.round(c, 6),
        ).alias("cuts")
    )
    binned = (
        signals.crossJoin(F.broadcast(cuts))
        .select(
            "metric",
            F.size(
                F.filter(F.col("cuts"), lambda c: F.col("value") > c)
            ).alias("bin"),
        )
        .groupBy("metric", "bin")
        .agg(F.count("*").alias("n"))
    )
    tot = binned.groupBy("metric").agg(F.sum("n").alias("t"))
    shares = binned.join(tot, "metric").select(
        "metric", "bin", (F.col("n") / F.col("t")).alias("p")
    )
    a = shares.select(
        F.col("metric").alias("metric_a"), "bin", F.col("p").alias("pa")
    )
    b = shares.select(
        F.col("metric").alias("metric_b"), "bin", F.col("p").alias("pb")
    )
    return (
        a.join(b, "bin")
        .where(F.col("metric_a") < F.col("metric_b"))
        .groupBy("metric_a", "metric_b")
        .agg(
            F.round(F.sum(F.least("pa", "pb")), 6).alias("overlap")
        )
    )
