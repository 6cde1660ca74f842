"""Lagged normalized cross-correlation (SURVEY.md §2 J1, P8, A4, K1–K3).

Reference semantics (/root/reference/metrics_advisor.py:183-196): for each
10-minute bucket, pair every objective signal with every candidate signal,
compute normalized cross-correlation at lags −lag_max…+lag_max over the
bucket's 40-sample windows, keep the (lag, corr) with max |corr|, and rank
candidates per (bucket, objective) by |corr| descending.

Spark-first plan (no UDF anywhere):

1. Candidate rows are replicated across the lag dimension by a single
   ``explode(sequence(-k, k))`` projection, shifting the JOIN timestamp by
   ``lag × step`` — correlating obj(t) with cand(t + lag·step).  This is a
   narrow transformation: no window function, no per-lag plan, no extra
   shuffle.
2. The objective side (≤ a handful of metrics, F4) is broadcast, so the
   pairing join never shuffles the big candidate side by anything other
   than its natural (ts) key — and with the broadcast hint, not at all.
3. ``corr()`` (Pearson) per (bucket, obj, cand, lag) — a hash aggregate
   with map-side partials.  Pearson of the two windows IS zero-normalized
   cross-correlation at that lag, matching mathbox ``ncc``.
4. Best lag via one row_number window over the tiny aggregate output
   (ties broken toward the smallest lag, matching Python ``max()`` which
   keeps the first of equals in ascending lag order).

Deviation from reference (documented, SURVEY Q3): windows align on
timestamps, not sample positions, so series with missing samples stay
aligned; at bucket edges a lagged candidate sample may come from the
neighboring bucket (full-overlap correlation) instead of truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lag_explode(
    candidates: DataFrame,
    lag_max: int,
    step_seconds: int,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Replicate candidate rows for each lag, shifting the join timestamp.

    Row (series, ts, value) → (series, lag, join_ts = ts − lag·step, value)
    for lag ∈ [−lag_max, lag_max]: candidate value at time t is paired with
    objective time t − lag·step, i.e. positive lag means the candidate
    LAGS the objective (reference ncc(a, b, lag) convention).
    ``passthrough`` columns are carried along unchanged.
    """
    return candidates.select(
        F.col("metric").alias("cand_metric"),
        F.col("series").alias("cand_series"),
        F.explode(F.sequence(F.lit(-lag_max), F.lit(lag_max))).alias("lag"),
        F.col("ts"),
        F.col("value").alias("cand_value"),
        *[F.col(c) for c in passthrough],
    ).withColumn(
        "join_ts",
        F.timestamp_add("SECOND", (-F.col("lag") * step_seconds).cast("int"), F.col("ts")),
    )


def bucket_correlation(
    objectives: DataFrame,
    candidates: DataFrame,
    *,
    tmin: int | DataFrame,
    bucket_seconds: int = 600,
    lag_max: int = 3,
    step_seconds: int = 15,
    min_pairs: int = 2,
    same_bucket: bool = True,
) -> DataFrame:
    """P8+J1: per-(bucket, obj, cand, lag) Pearson correlation.

    ``objectives``/``candidates`` are signals-shaped DataFrames.  Returns
    (bucket_id, obj_metric, obj_series, cand_metric, cand_series, lag,
    corr, n_pairs).

    ``same_bucket=True`` additionally requires the candidate SAMPLE to lie
    in the same bucket as the objective sample, reproducing the
    reference's truncated-overlap windows (a lag-k correlation uses
    40−|k| pairs, metrics_advisor.py:186-187); False allows full overlap
    across bucket edges.

    ``tmin`` may be a driver int OR a lazy 1-row ``(tmin, ...)`` aggregate
    DataFrame (``buckets.time_extent_df``): the latter is broadcast onto
    both sides, keeping the whole pipeline collect-free.
    """
    if isinstance(tmin, DataFrame):
        ext = tmin.select("tmin")
        objectives = objectives.crossJoin(F.broadcast(ext))
        candidates = candidates.crossJoin(F.broadcast(ext))
        tmin_obj = F.col("tmin")
    else:
        tmin_obj = F.lit(tmin)
    obj = objectives.select(
        F.col("metric").alias("obj_metric"),
        F.col("series").alias("obj_series"),
        F.col("ts").alias("obj_ts"),
        F.col("value").alias("obj_value"),
        F.floor(
            (F.unix_timestamp("ts") - tmin_obj) / F.lit(bucket_seconds)
        ).alias("bucket_id"),
    )
    cand_in = candidates.select(
        "metric", "series", "ts", "value",
        F.floor(
            (F.unix_timestamp("ts") - tmin_obj) / F.lit(bucket_seconds)
        ).alias("cand_bucket_id"),
    )
    cand = lag_explode(
        cand_in, lag_max, step_seconds, passthrough=("cand_bucket_id",)
    )
    cond = cand["join_ts"] == obj["obj_ts"]
    if same_bucket:
        cond = cond & (cand["cand_bucket_id"] == obj["bucket_id"])
    joined = cand.join(F.broadcast(obj), cond, "inner")
    return (
        joined.groupBy(
            "bucket_id", "obj_metric", "obj_series",
            "cand_metric", "cand_series", "lag",
        )
        .agg(
            # Pearson spelled explicitly: under ANSI mode corr() raises
            # DIVIDE_BY_ZERO on zero-variance windows (constant series in a
            # bucket); try_divide yields NULL there, which we filter — the
            # same contract DuckDB's corr() has.
            F.try_divide(
                F.covar_samp("obj_value", "cand_value"),
                F.stddev_samp("obj_value") * F.stddev_samp("cand_value"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
        .filter(F.col("corr").isNotNull())
    )


def best_lag(correlations: DataFrame) -> DataFrame:
    """A4: per pair, keep the (lag, corr) maximizing |corr|.

    Tie-break: smallest lag first — Python ``max()`` keeps the first
    maximal element scanning lags in ascending order
    (metrics_advisor.py:193).
    """
    w = Window.partitionBy(
        "bucket_id", "obj_metric", "obj_series", "cand_metric", "cand_series"
    ).orderBy(F.abs(F.col("corr")).desc(), F.col("lag").asc())
    return (
        correlations.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def positional_correlation(
    objectives: DataFrame,
    candidates: DataFrame,
    *,
    count_bucket: int = 40,
    lag_max: int = 3,
    min_pairs: int = 2,
) -> DataFrame:
    """P8 in the reference's POSITIONAL mode (parity flag Q3).

    The reference slices windows by sample position, not timestamp
    (``data[40i:40i+40]``, metrics_advisor.py:186-187), so series with
    missing rows drift out of time alignment — reproduced here exactly:
    each series gets a 0-based row_number in ts order, bucket = pos //
    count_bucket, and a lag-k pair joins obj position p with candidate
    position p + k inside the same positional bucket.

    Same output schema as ``bucket_correlation``.  One row_number window
    per side (shuffle on (metric, series)) + the same broadcast join —
    the positional index replaces the timestamp as the join key.
    """
    w = Window.partitionBy("metric", "series").orderBy("ts")
    pos = (F.row_number().over(w) - 1).alias("pos")
    obj = objectives.select(
        F.col("metric").alias("obj_metric"),
        F.col("series").alias("obj_series"),
        F.col("value").alias("obj_value"),
        pos,
    ).withColumn("bucket_id", F.floor(F.col("pos") / count_bucket))
    cand = (
        candidates.select(
            F.col("metric").alias("cand_metric"),
            F.col("series").alias("cand_series"),
            F.col("value").alias("cand_value"),
            pos,
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(-lag_max), F.lit(lag_max))).alias("lag"),
        )
        .withColumn("join_pos", F.col("pos") - F.col("lag"))
        .withColumn("cand_bucket_id", F.floor(F.col("pos") / count_bucket))
    )
    joined = cand.join(
        F.broadcast(obj),
        (cand["join_pos"] == obj["pos"])
        & (cand["cand_bucket_id"] == obj["bucket_id"]),
        "inner",
    )
    return (
        joined.groupBy(
            "bucket_id", "obj_metric", "obj_series",
            "cand_metric", "cand_series", "lag",
        )
        .agg(
            F.try_divide(
                F.covar_samp("obj_value", "cand_value"),
                F.stddev_samp("obj_value") * F.stddev_samp("cand_value"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
        .filter(F.col("corr").isNotNull())
    )


def corr_matrix(signals: DataFrame, min_pairs: int = 2) -> DataFrame:
    """Pairwise Pearson correlation between ALL metric series on their
    aligned timestamps (the exploratory "what moves together" matrix).

    Self-join on ts with metric_a < metric_b (upper triangle), then one
    corr aggregate per pair — the join key is time, so co-located reads
    follow from time-partitioned storage.  Output: (metric_a, metric_b,
    corr, n_pairs).  At k metrics the result is k(k−1)/2 rows — the
    OUTPUT is quadratic in metrics, not the shuffle: rows join only
    within equal timestamps.
    """
    a = signals.select(
        F.col("metric").alias("metric_a"),
        F.col("ts"),
        F.col("value").alias("va"),
    )
    b = signals.select(
        F.col("metric").alias("metric_b"),
        F.col("ts"),
        F.col("value").alias("vb"),
    )
    return (
        a.join(b, "ts")
        .filter(F.col("metric_a") < F.col("metric_b"))
        .groupBy("metric_a", "metric_b")
        .agg(
            F.try_divide(
                F.covar_samp("va", "vb"),
                F.stddev_samp("va") * F.stddev_samp("vb"),
            ).alias("corr"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
        .filter(F.col("corr").isNotNull())
    )


def corr_matrix_blocked(
    signals: DataFrame,
    *,
    min_pairs: int = 2,
    num_blocks: int = 64,
    topk_per_metric: int | None = None,
    ts_chunk: int = 65536,
) -> DataFrame:
    """Scale path for ``corr_matrix``: identical output, bounded shuffles.

    ``corr_matrix``'s ts-keyed self-join materializes k² rows per
    timestamp — fine at hundreds of metrics, a scale-killer at 100×.
    This variant never materializes per-timestamp pairs.  Pearson over
    the join's pair-rows decomposes into sufficient statistics that are
    OUTER PRODUCTS of per-(ts, metric) aggregates:

        per ts:  c = row count, s = Σv, s2 = Σv²   (one pre-agg shuffle)
        N  = CᵀC    pair row count      S = SᵀS   Σ va·vb
        A  = SᵀC    Σ va over pairs     Q = S2ᵀC  Σ va² over pairs

    so each hash(ts)-block computes four k×k BLAS matmuls over its dense
    (T_block × k_block) slice and emits SPARSE upper-triangle partials
    (only co-occurring pairs).  A final groupBy(metric_a, metric_b) sum
    — with map-side combine, ≤ one row per co-occurring pair per block —
    reassembles exact global statistics.  Shuffled volume is
    O(distinct(ts, metric)) + O(blocks × co-occurring pairs), never
    O(rows × k).

    ``topk_per_metric`` optionally bounds the OUTPUT too (the strongest
    |corr| partners per metric), mirroring hamming_pairs vs
    hamming_pairs_blocked.  Per-block memory is T_chunk × k dense +
    4·k² partials; beyond k ≈ 5000 metrics, shard the metric vocabulary
    into pair-blocks on top of this (documented limit).

    Exactness: same pairs and n_pairs as ``corr_matrix``; corr agrees to
    FP-reassociation error (≈1e-12) — asserted in tests/test_xcorr.py.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    per_ts = (
        signals.groupBy("ts", "metric")
        .agg(
            F.count(F.lit(1)).cast("double").alias("c"),
            F.sum("value").alias("s"),
            F.sum(F.col("value") * F.col("value")).alias("s2"),
        )
        .withColumn("blk", F.pmod(F.xxhash64("ts"), F.lit(num_blocks)))
    )

    partial_schema = T.StructType(
        [
            T.StructField("metric_a", T.StringType()),
            T.StructField("metric_b", T.StringType()),
            T.StructField("n", T.DoubleType()),
            T.StructField("sxy", T.DoubleType()),
            T.StructField("sx", T.DoubleType()),
            T.StructField("sy", T.DoubleType()),
            T.StructField("sxx", T.DoubleType()),
            T.StructField("syy", T.DoubleType()),
        ]
    )

    def emit_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        metrics = np.sort(pdf["metric"].unique())
        k = metrics.size
        if k < 2:
            return pd.DataFrame(columns=[f.name for f in partial_schema.fields])
        code = {m: i for i, m in enumerate(metrics)}
        mi = pdf["metric"].map(code).to_numpy()
        ts_codes, _ = pd.factorize(pdf["ts"])
        N = np.zeros((k, k))
        S = np.zeros((k, k))
        A = np.zeros((k, k))
        Q = np.zeros((k, k))
        n_ts = int(ts_codes.max()) + 1
        for lo in range(0, n_ts, ts_chunk):
            hi = min(lo + ts_chunk, n_ts)
            sel = (ts_codes >= lo) & (ts_codes < hi)
            rows = ts_codes[sel] - lo
            cols = mi[sel]
            C = np.zeros((hi - lo, k))
            Sv = np.zeros((hi - lo, k))
            S2 = np.zeros((hi - lo, k))
            C[rows, cols] = pdf["c"].to_numpy()[sel]
            Sv[rows, cols] = pdf["s"].to_numpy()[sel]
            S2[rows, cols] = pdf["s2"].to_numpy()[sel]
            N += C.T @ C
            S += Sv.T @ Sv
            A += Sv.T @ C
            Q += S2.T @ C
        ia, ib = np.triu_indices(k, 1)
        keep = N[ia, ib] > 0
        ia, ib = ia[keep], ib[keep]
        return pd.DataFrame(
            {
                "metric_a": metrics[ia],
                "metric_b": metrics[ib],
                "n": N[ia, ib],
                "sxy": S[ia, ib],
                "sx": A[ia, ib],
                "sy": A[ib, ia],
                "sxx": Q[ia, ib],
                "syy": Q[ib, ia],
            }
        )

    partials = per_ts.groupBy("blk").applyInPandas(emit_partials, partial_schema)

    n = F.col("n")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    var_a = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    var_b = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    out = (
        partials.groupBy("metric_a", "metric_b")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sxy").alias("sxy"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
            F.sum("sxx").alias("sxx"),
            F.sum("syy").alias("syy"),
        )
        .filter(n >= min_pairs)
        .withColumn(
            "corr", F.try_divide(cov, F.sqrt(var_a) * F.sqrt(var_b))
        )
        .filter(F.col("corr").isNotNull())
        .select(
            "metric_a",
            "metric_b",
            "corr",
            n.cast("long").alias("n_pairs"),
        )
    )
    if topk_per_metric is not None:
        sym = out.unionByName(
            out.select(
                F.col("metric_b").alias("metric_a"),
                F.col("metric_a").alias("metric_b"),
                "corr",
                "n_pairs",
            )
        )
        w = Window.partitionBy("metric_a").orderBy(
            F.abs(F.col("corr")).desc(), F.col("metric_b")
        )
        out = (
            sym.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= topk_per_metric)
            .drop("rk")
            .select(
                F.least("metric_a", "metric_b").alias("metric_a"),
                F.greatest("metric_a", "metric_b").alias("metric_b"),
                "corr",
                "n_pairs",
            )
            .distinct()
        )
    return out


def ncc_cogrouped(
    objectives: DataFrame,
    candidates: DataFrame,
    *,
    tmin: int,
    bucket_seconds: int = 600,
    lag_max: int = 3,
    min_pairs: int = 2,
) -> DataFrame:
    """P8 option (b): mathbox-style ncc via cogrouped ``applyInPandas``.

    Parity fallback to the SQL plan (SURVEY §2.6 P8): obj and candidate
    samples are cogrouped per bucket; inside the pandas function each
    (obj, cand) pair is aligned POSITIONALLY within the bucket window
    (the reference's array semantics, metrics_advisor.py:186-192) and all
    lags are computed vectorized in numpy.  Same output schema as
    ``bucket_correlation``.

    Scale: one shuffle on bucket_id; a bucket's groups must fit one task
    (40 samples × member series — small by construction, because only
    anomalous series enter buckets).
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("bucket_id", T.LongType()),
            T.StructField("obj_metric", T.StringType()),
            T.StructField("obj_series", T.StringType()),
            T.StructField("cand_metric", T.StringType()),
            T.StructField("cand_series", T.StringType()),
            T.StructField("lag", T.IntegerType()),
            T.StructField("corr", T.DoubleType()),
            T.StructField("n_pairs", T.LongType()),
        ]
    )

    def with_bucket(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket_id",
            F.floor(
                (F.unix_timestamp("ts") - F.lit(tmin)) / F.lit(bucket_seconds)
            ),
        )

    def fn(key: tuple, obj_pdf: pd.DataFrame, cand_pdf: pd.DataFrame):
        bucket_id = int(key[0])
        out = []
        for (om, os_), og in obj_pdf.groupby(["metric", "series"], sort=True):
            a = og.sort_values("ts")["value"].to_numpy(dtype=np.float64)
            for (cm, cs), cg in cand_pdf.groupby(["metric", "series"],
                                                 sort=True):
                b = cg.sort_values("ts")["value"].to_numpy(dtype=np.float64)
                for lag in range(-lag_max, lag_max + 1):
                    # pair a[i] with b[i + lag], truncated to the overlap
                    if lag >= 0:
                        aa, bb = a[: b.size - lag], b[lag:]
                    else:
                        aa, bb = a[-lag:], b[: a.size + lag]
                    m = min(aa.size, bb.size)
                    aa, bb = aa[:m], bb[:m]
                    if m < min_pairs:
                        continue
                    sa, sb = aa.std(ddof=1), bb.std(ddof=1)
                    if sa == 0.0 or sb == 0.0 or np.isnan(sa) or np.isnan(sb):
                        continue
                    c = float(np.corrcoef(aa, bb)[0, 1])
                    out.append(
                        (bucket_id, om, os_, cm, cs, lag, c, m)
                    )
        return pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return (
        with_bucket(objectives)
        .groupBy("bucket_id")
        .cogroup(with_bucket(candidates).groupBy("bucket_id"))
        .applyInPandas(fn, schema)
    )


def rank_correlations(best: DataFrame, top_k: int | None = None) -> DataFrame:
    """K1–K3: rank candidates per (bucket, objective) by |corr| desc.

    Deterministic tie-break on candidate identity so top-k is stable.
    """
    w = Window.partitionBy("bucket_id", "obj_metric", "obj_series").orderBy(
        F.abs(F.col("corr")).desc(),
        F.col("cand_metric").asc(),
        F.col("cand_series").asc(),
    )
    ranked = best.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        ranked = ranked.filter(F.col("rank") <= top_k)
    return ranked
