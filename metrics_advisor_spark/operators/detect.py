"""Detection operators (SURVEY.md §2.6 P1–P7).

Reference pipeline per signal (/root/reference/metrics_advisor.py:144-158):

    range gate → moving_median(5) → e_divisive(p=.05, perm=100)   # change points
                                 └→ get_noise(...)  → 3σ outliers  # P1–P5 fused

The math that Catalyst cannot express (E-Divisive permutation testing,
FFT low-pass) runs inside ONE Arrow-batched ``applyInPandas`` per series —
the whole P1→P7 pipeline fused in a single pass over each group, exactly
the hand-fusion the reference does eagerly (metrics_advisor.py:51-62).
Per-series groups are independent, so a 1000-executor cluster parallelizes
across (metric, series) with one shuffle and zero driver involvement.

The SQL-expressible pieces (rolling median, k-sigma) also exist as pure
DataFrame variants (smooth_median / ksigma_outliers) so they are
oracle-checkable and usable from SQL.

E-Divisive follows Matteson & James 2014 ("A Nonparametric Approach for
Multiple Change Point Analysis") as popularized by MongoDB's
signal-processing-algorithms 2.0.0 (the reference's dependency,
requirements.txt:25): energy-statistic qhat over every split point,
iterative binary segmentation, permutation significance testing.  The
permutation RNG is seeded from (metric, series) so results are
deterministic regardless of cluster placement.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# numpy kernels (run inside executors via applyInPandas)
# ---------------------------------------------------------------------------


def moving_median_np(x: np.ndarray, window: int = 5) -> np.ndarray:
    """P1: centered rolling median, edge-shrunk (min_periods=1).

    Reconstruction of mathbox.moving_median (call sites
    metrics_advisor.py:52,147,203); edge behavior pinned by our unit
    goldens, not the unavailable package.
    """
    return (
        pd.Series(x).rolling(window, center=True, min_periods=1).median().to_numpy()
    )


def lowpass_fft_np(x: np.ndarray, step_seconds: float, f_min: float) -> np.ndarray:
    """P3: low-pass — keep frequency components below f_min Hz.

    mathbox.f_lowpass_filter wraps a Butterworth-style filter
    [public-knowledge]; scipy is unavailable here so we use an FFT
    brick-wall low-pass, which extracts the same "seasonality" component
    for the 3σ residual test that follows.
    """
    n = x.size
    if n == 0:
        return x
    filled = np.nan_to_num(x, nan=float(np.nanmean(x)) if np.isnan(x).any() else 0.0)
    spec = np.fft.rfft(filled)
    freqs = np.fft.rfftfreq(n, d=step_seconds)
    spec[freqs > f_min] = 0.0
    return np.fft.irfft(spec, n=n)


def butter_lowpass_np(order: int, wn: float) -> tuple[np.ndarray, np.ndarray]:
    """Digital Butterworth low-pass (b, a) from first principles — the
    classical analog-prototype → frequency-warp → bilinear-transform
    derivation, matching the scipy.signal.butter(order, wn) convention
    (wn normalized to Nyquist = 1.0).  Pure numpy: this environment has
    no scipy, and the reference's P3 stage
    (/root/reference/metrics_advisor.py:21,56 via mathbox's
    f_lowpass_filter) is a Butterworth-family filter, so implementing
    the textbook pipeline closes the documented FFT-substitute
    deviation.  Validated in tests against published order-3
    coefficient values."""
    n = int(order)
    # analog prototype poles on the unit Butterworth circle
    m = np.arange(-n + 1, n, 2)
    p = -np.exp(1j * np.pi * m / (2 * n))
    k = 1.0
    # pre-warp the cutoff (fs = 2 by the bilinear convention)
    fs = 2.0
    warped = 2.0 * fs * np.tan(np.pi * wn / fs)
    p = p * warped
    k = warped**n
    # bilinear transform: s → 2·fs·(z−1)/(z+1)
    fs2 = 2.0 * fs
    pz = (fs2 + p) / (fs2 - p)
    kz = k * np.real(1.0 / np.prod(fs2 - p))
    b = kz * np.real(np.poly(-np.ones(n)))
    a = np.real(np.poly(pz))
    return b, a


def _lfilter_np(
    b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """IIR direct-form-II-transposed recursion (lfilter semantics).
    Sequential by nature — runs inside the per-series Arrow batch, and
    only in the opt-in Butterworth parity mode."""
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = len(a)
    z = np.zeros(n - 1) if zi is None else np.asarray(zi, float).copy()
    y = np.empty(x.size)
    for i in range(x.size):
        xi = x[i]
        yi = b[0] * xi + z[0]
        for j in range(n - 2):
            z[j] = b[j + 1] * xi + z[j + 1] - a[j + 1] * yi
        z[n - 2] = b[n - 1] * xi - a[n - 1] * yi
        y[i] = yi
    return y, z


def _lfilter_zi_np(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial filter delay values (lfilter_zi semantics):
    solve (I − Aᵀ)·zi = B with A the companion matrix of a."""
    b = np.asarray(b, dtype=np.float64) / a[0]
    a = np.asarray(a, dtype=np.float64) / a[0]
    n = max(len(a), len(b))
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:n]
    if n > 2:
        comp[1:, :-1] = np.eye(n - 2)
    B = b[1:n] - a[1:n] * b[0]
    return np.linalg.solve(np.eye(n - 1) - comp.T, B)


def filtfilt_np(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering (filtfilt semantics):
    odd-extend by 3·max(len(a), len(b)) samples, run the recursion
    forward then backward with matched steady-state initial conditions,
    strip the padding."""
    ntaps = max(len(a), len(b))
    edge = 3 * ntaps
    if x.size <= 1:
        return x.astype(np.float64, copy=True)
    edge = min(edge, x.size - 1)
    left = 2.0 * x[0] - x[edge:0:-1]
    right = 2.0 * x[-1] - x[-2 : -edge - 2 : -1]
    ext = np.concatenate((left, x, right))
    zi = _lfilter_zi_np(b, a)
    y, _ = _lfilter_np(b, a, ext, zi * ext[0])
    y = y[::-1]
    y, _ = _lfilter_np(b, a, y, zi * y[0])
    y = y[::-1]
    return y[edge : y.size - edge]


def lowpass_butterworth_np(
    x: np.ndarray, step_seconds: float, f_min: float, order: int = 3
) -> np.ndarray:
    """P3 in the reference's own filter family: order-``order``
    Butterworth low-pass at cutoff ``f_min`` Hz (sample period
    ``step_seconds``), applied zero-phase.  The cutoff is normalized to
    the Nyquist frequency 1/(2·step_seconds), i.e.
    wn = 2·step_seconds·f_min — with the reference defaults
    (T=15, f_min=0.01/15) that is wn = 0.02."""
    n = x.size
    if n == 0:
        return x
    wn = 2.0 * step_seconds * f_min
    wn = min(max(wn, 1e-8), 1.0 - 1e-8)
    filled = np.nan_to_num(
        x, nan=float(np.nanmean(x)) if np.isnan(x).any() else 0.0
    )
    b, a = butter_lowpass_np(order, wn)
    return filtfilt_np(b, a, filled)


def ksigma_outliers_np(noise: np.ndarray, level: float = 3.0) -> np.ndarray:
    """P5: indices where |x − μ| > level·σ (σ = population std, ddof=0)."""
    mu = float(np.nanmean(noise))
    sd = float(np.nanstd(noise))
    if sd == 0.0 or np.isnan(sd):
        return np.empty(0, dtype=np.int64)
    return np.flatnonzero(np.abs(noise - mu) > level * sd)


def stl_outliers_np(
    x: np.ndarray,
    *,
    window: int = 5,
    step_seconds: float = 15.0,
    f_min: float = 0.01 / 15,
    level: float = 3.0,
    lowpass_mode: str = "fft",
    lowpass_order: int = 3,
) -> np.ndarray:
    """P6 = P1→P2→P3→P4→P5 fused (reference get_noise, metrics_advisor.py:51-62).

    ``lowpass_mode='butterworth'`` runs P3 in the reference's own
    filter family (order-``lowpass_order`` zero-phase Butterworth,
    pure numpy — see `butter_lowpass_np`); the default 'fft'
    brick-wall extracts the same seasonality component ~50× faster
    (vectorized FFT vs sequential IIR recursion) and is the bench
    path."""
    trend = moving_median_np(x, window)
    detrended = x - trend
    if lowpass_mode == "butterworth":
        seasonality = lowpass_butterworth_np(
            detrended, step_seconds, f_min, order=lowpass_order
        )
    else:
        seasonality = lowpass_fft_np(detrended, step_seconds, f_min)
    noise = detrended - seasonality
    return ksigma_outliers_np(noise, level)


def _qhat_stats(x: np.ndarray) -> np.ndarray:
    """Energy-statistic qhat for every split point t ∈ [1, n).

    Vectorized over the pairwise |xi − xj| distance matrix with a 2-D
    cumulative sum: O(n²) time/space — trivial at the reference's n≈480;
    longer series are chunked by the caller (detect_changepoints'
    max_points) so memory stays bounded at scale.
    """
    n = x.size
    q = np.full(n, -np.inf)
    if n < 4:
        return q
    d = np.abs(x[:, None] - x[None, :])
    # One in-place row-wise prefix sum yields everything the 2-D cumsum
    # did (row sums, below-diagonal prefix sums) at ~half the n² memory
    # traffic — this kernel runs O(permutations) times per window, so the
    # constant factor is the whole cost of detect_anomalies.
    np.cumsum(d, axis=1, out=d)
    r = d[:, -1]                     # full row sums
    row_c = np.cumsum(r)             # row_c[k] = Σ_{i<=k} r_i
    idx = np.arange(1, n)
    pre = np.empty(n)
    pre[0] = 0.0
    pre[1:] = d[idx, idx - 1]        # pre[k] = Σ_{j<k} |x_k − x_j|
    a_c = 2.0 * np.cumsum(pre)       # a_c[k] = Σ_{i<=k, j<=k} |x_i − x_j|
    total = row_c[-1]
    t = np.arange(2, n - 1)  # need ≥2 points on each side for the terms
    a = a_c[t - 1]                   # sum over i<t, j<t
    row = row_c[t - 1]               # sum over i<t, all j
    cross = row - a                  # sum over i<t, j>=t
    b = total - 2 * cross - a        # sum over i>=t, j>=t
    m = t.astype(np.float64)
    nn = (n - t).astype(np.float64)
    term1 = cross / (m * nn)
    term2 = a / (m * (m - 1.0))
    term3 = b / (nn * (nn - 1.0))
    q[t] = (m * nn / (m + nn)) * (2.0 * term1 - term2 - term3)
    return q


def e_divisive_np(
    x: np.ndarray,
    *,
    pvalue: float = 0.05,
    permutations: int = 100,
    seed: int = 0,
) -> list[int]:
    """P7: multiple change-point estimation (Matteson & James 2014).

    Iterative binary segmentation: find the argmax-qhat candidate across
    all current windows, accept it iff a within-window permutation test
    deems it significant, repeat.  Matches the semantics of the
    reference's e_divisive call (metrics_advisor.py:148) with a seeded,
    placement-independent RNG.
    """
    x = np.asarray(x, dtype=np.float64)
    x = np.nan_to_num(x, nan=float(np.nanmean(x)) if np.isnan(x).any() else 0.0)
    n = x.size
    if n < 5:
        return []
    rng = np.random.default_rng(seed)
    change_points: list[int] = []
    # Observed qhat is deterministic per window; accepting a change point
    # splits exactly one window, so cache (best q, argmax) per (lo, hi)
    # and recompute only the two new sub-windows each iteration.
    win_cache: dict[tuple[int, int], tuple[float, int]] = {}
    while True:
        bounds = sorted([0, *change_points, n])
        windows = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        best_q, best_idx = -np.inf, -1
        for lo, hi in windows:
            if (lo, hi) not in win_cache:
                q = _qhat_stats(x[lo:hi])
                i = int(np.argmax(q))
                win_cache[(lo, hi)] = (float(q[i]), i)
            qv, i = win_cache[(lo, hi)]
            if qv > best_q:
                best_q, best_idx = qv, lo + i
        if best_idx < 0 or not np.isfinite(best_q):
            return sorted(change_points)
        # permutation test: permute within each window, compare max qhat.
        # Early exits are EXACT and RNG-stream-preserving: the verdict is
        # reject iff exceed >= reject_at, accept otherwise.
        #   - reject locks in the moment exceed hits reject_at → return
        #     immediately (old behavior; the RNG dies with the return).
        #   - accept locks in once exceed can no longer reach reject_at
        #     (exceed + remaining < reject_at).  We must NOT return early
        #     here — the next significance test continues from this RNG
        #     stream — so we keep drawing rng.permutation (cheap, O(n))
        #     but skip the O(n²) energy statistic, which is the cost.
        #   - within one permutation, a single window exceeding best_q
        #     decides that draw → skip the remaining windows' statistics
        #     (their permutations are still drawn to keep the stream).
        #
        # NOTE a batched variant (stack B permutations, one O(B·n²)
        # _qhat_stats pass) was measured SLOWER at every window size
        # (0.1–0.95× vs this loop, n∈[40,480]): the per-permutation n²
        # matrix is cache-resident while the batched tensor spills to
        # DRAM.  Keep the scalar loop.
        reject_at = int(pvalue * (permutations + 1))  # smallest failing count
        if reject_at == 0:
            # pvalue < 1/(permutations+1): no outcome can be significant
            # (ROUND_NOTES: permutations must be ≥ ceil(1/p) − 1).
            return sorted(change_points)
        exceed = 0
        accepted = False
        for k in range(permutations):
            if not accepted and exceed + (permutations - k) < reject_at:
                accepted = True  # verdict locked: remaining draws are moot
            hit = False
            for lo, hi in windows:
                xp = rng.permutation(x[lo:hi])  # always draw: stream-exact
                if accepted or hit:
                    continue
                if float(np.max(_qhat_stats(xp))) >= best_q:
                    hit = True
            if accepted:
                continue
            if hit:
                exceed += 1
                if exceed >= reject_at:
                    return sorted(change_points)
        if not accepted and (exceed + 1) / (permutations + 1) > pvalue:
            return sorted(change_points)
        change_points.append(best_idx)


def _series_seed(metric: str, series: str) -> int:
    """Deterministic per-series RNG seed — stable across partitioning."""
    return zlib.crc32(f"{metric}\x00{series}".encode()) & 0x7FFFFFFF


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType()),
        T.StructField("series", T.StringType()),
        T.StructField("kind", T.StringType()),  # 'changepoint' | 'outlier'
        T.StructField("idx", T.IntegerType()),  # position in ts-ordered series
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def detect_anomalies(
    signals: DataFrame,
    *,
    median_window: int = 5,
    step_seconds: float = 15.0,
    f_min: float = 0.01 / 15,
    sigma_level: float = 3.0,
    cp_pvalue: float = 0.05,
    cp_permutations: int = 100,
    max_points: int = 4096,
    lowpass_mode: str = "fft",
    lowpass_order: int = 3,
) -> DataFrame:
    """P1–P7 fused: per-series change points + STL-style 3σ outliers.

    One applyInPandas over groupBy(metric, series); emits one row per
    detected anomaly.  Series longer than ``max_points`` are chunked so
    the O(n²) energy statistic stays bounded — the 100 TB design is
    "detect per chunk, stitch": change points are local features, and
    chunk boundaries are also bucket boundaries downstream.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        metric, series = pdf["metric"].iat[0], pdf["series"].iat[0]
        x = pdf["value"].to_numpy(dtype=np.float64)
        med = moving_median_np(x, median_window)
        seed = _series_seed(metric, series)
        cps: list[int] = []
        for lo in range(0, x.size, max_points):
            hi = min(lo + max_points, x.size)
            cps.extend(
                lo + c
                for c in e_divisive_np(
                    med[lo:hi],
                    pvalue=cp_pvalue,
                    permutations=cp_permutations,
                    seed=seed + lo,
                )
            )
        outliers = stl_outliers_np(
            x,
            window=median_window,
            step_seconds=step_seconds,
            f_min=f_min,
            level=sigma_level,
            lowpass_mode=lowpass_mode,
            lowpass_order=lowpass_order,
        )
        rows = [("changepoint", i) for i in cps] + [
            ("outlier", int(i)) for i in outliers
        ]
        if not rows:
            return pd.DataFrame(columns=[f.name for f in ANOMALY_SCHEMA.fields])
        kinds, idxs = zip(*rows)
        return pd.DataFrame(
            {
                "metric": metric,
                "series": series,
                "kind": list(kinds),
                "idx": np.asarray(idxs, dtype=np.int32),
                "ts": pdf["ts"].iloc[list(idxs)].to_numpy(),
                "value": x[list(idxs)],
            }
        )

    # explicit fanout: the permutation tests are per-row COMPUTE, so the
    # byte-based AQE coalesce (which collapses this small shuffle to one
    # partition and serializes every group onto one task) must not size
    # this exchange — measured 3.7 s -> 1.7 s at sf0.1 (OPTIMIZATION_r15)
    from metrics_advisor_spark.partitioning import udf_fanout

    return (
        udf_fanout(signals, "metric", "series")
        .groupBy("metric", "series")
        .applyInPandas(fn, ANOMALY_SCHEMA)
    )


def detect_changepoints(signals: DataFrame, **kw) -> DataFrame:
    """P7 alone (reference e_divisive on the median-filtered series)."""
    return detect_anomalies(signals, **kw).filter(F.col("kind") == "changepoint")


def detect_outliers(signals: DataFrame, **kw) -> DataFrame:
    """P6 alone (reference get_noise → 3σ)."""
    return detect_anomalies(signals, **kw).filter(F.col("kind") == "outlier")


# --- pure-SQL variants (oracle-checkable, usable from spark.sql) -----------


def smooth_median(signals: DataFrame, window: int = 5,
                  out_col: str = "smoothed") -> DataFrame:
    """P1 as a pure DataFrame op: centered rolling median over a row frame.

    Matches moving_median_np for interior points; edges shrink the frame
    (same min_periods=1 semantics).
    """
    half = window // 2
    w = (
        Window.partitionBy("metric", "series")
        .orderBy("ts")
        .rowsBetween(-half, half)
    )
    # exact percentile(0.5) == median; Spark 4 rejects median() with a frame
    return signals.withColumn(out_col, F.percentile("value", F.lit(0.5)).over(w))


def ksigma_outliers(signals: DataFrame, level: float = 3.0) -> DataFrame:
    """P5/A5 as pure DataFrame ops: per-series |x−μ| > level·σ_pop rows."""
    w = Window.partitionBy("metric", "series")
    return (
        signals.withColumn("_mu", F.avg("value").over(w))
        .withColumn("_sd", F.stddev_pop("value").over(w))
        .filter(
            (F.col("_sd") > 0)
            & (F.abs(F.col("value") - F.col("_mu")) > level * F.col("_sd"))
        )
        .drop("_mu", "_sd")
    )
