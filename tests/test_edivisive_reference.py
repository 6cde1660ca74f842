"""Independent-implementation attestation for E-Divisive (VERDICT r14
item 6): `detect_anomalies` has been rows-only since r05 because DuckDB
cannot express permutation testing — so, like `streaming_span_gate`'s
reference-model test, the capability is attested by a SECOND ENGINE: a
naive, paper-direct replay (double-sum energy statistics, full
permutation draws, no caching / early exits / cumsum kernels) with the
same seed discipline, compared on fixed fixtures.

The naive model deliberately shares NO code with
`operators/detect.py`: qhat is the literal Matteson & James 2014
double sum, the median filter is statistics.median over explicit
slices, and the permutation loop always draws and always evaluates.
Equivalence of the optimized early-exit verdicts is therefore checked,
not assumed.
"""

import statistics
import zlib

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# the naive second engine
# ---------------------------------------------------------------------------

def naive_qhat(x):
    """Literal Matteson & James qhat at every split t: full double sums
    over |xi - xj| (both orders, zero diagonal), no prefix-sum trick."""
    n = len(x)
    q = [float("-inf")] * n
    for t in range(2, n - 1):
        X, Y = x[:t], x[t:]
        m, nn = float(t), float(n - t)
        a = sum(abs(xi - xj) for xi in X for xj in X)
        b = sum(abs(yi - yj) for yi in Y for yj in Y)
        cross = sum(abs(xi - yj) for xi in X for yj in Y)
        q[t] = (m * nn / (m + nn)) * (
            2.0 * cross / (m * nn)
            - a / (m * (m - 1.0))
            - b / (nn * (nn - 1.0))
        )
    return q


def naive_e_divisive(x, *, pvalue=0.05, permutations=100, seed=0):
    """Iterative binary segmentation with a full (no-early-exit)
    within-window permutation test, drawing from the same seeded
    np.random.default_rng stream in the same (permutation, window)
    order as the production kernel."""
    x = [float(v) for v in x]
    if any(v != v for v in x):  # NaN -> column mean, as production does
        finite = [v for v in x if v == v]
        fill = sum(finite) / len(finite) if finite else 0.0
        x = [fill if v != v else v for v in x]
    n = len(x)
    if n < 5:
        return []
    rng = np.random.default_rng(seed)
    cps = []
    while True:
        bounds = sorted([0, *cps, n])
        windows = [
            (bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]
        best_q, best_idx = float("-inf"), -1
        for lo, hi in windows:
            q = naive_qhat(x[lo:hi])
            for i, qv in enumerate(q):
                if qv > best_q:
                    best_q, best_idx = qv, lo + i
        if best_idx < 0 or best_q in (float("inf"), float("-inf")):
            return sorted(cps)
        exceed = 0
        for _k in range(permutations):
            hit = False
            for lo, hi in windows:
                xp = list(rng.permutation(np.asarray(x[lo:hi])))
                if max(naive_qhat(xp), default=float("-inf")) >= best_q:
                    hit = True
            if hit:
                exceed += 1
        if (exceed + 1) / (permutations + 1) > pvalue:
            return sorted(cps)
        cps.append(best_idx)


def naive_moving_median(x, window=5):
    """Centered edge-shrunk rolling median via explicit slices."""
    n = len(x)
    half = window // 2
    return [
        statistics.median(x[max(0, i - half): min(n, i + half + 1)])
        for i in range(n)
    ]


def _mk_series(rng, n, shifts):
    """Noise around 0 with mean shifts planted at the given cut
    positions (fractions of n)."""
    x = rng.normal(0.0, 1.0, n)
    level = 0.0
    prev = 0
    for frac, jump in shifts:
        cut = int(n * frac)
        x[prev:cut] += level
        level += jump
        prev = cut
    x[prev:] += level
    return x


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

def test_qhat_matches_naive_double_sum():
    from metrics_advisor_spark.operators.detect import _qhat_stats

    rng = np.random.default_rng(42)
    for n in (4, 5, 8, 20, 60):
        x = rng.normal(0, 1, n)
        fast = _qhat_stats(x)
        slow = naive_qhat(list(x))
        for t in range(n):
            if slow[t] == float("-inf"):
                assert not np.isfinite(fast[t])
            else:
                assert fast[t] == pytest.approx(slow[t], rel=1e-9)


def test_e_divisive_matches_naive_reference():
    # 20 seeded series across the interesting regimes: clean shifts,
    # no shift (pure noise), shift near an edge, multiple shifts —
    # change-point OUTPUT must match the naive engine exactly
    from metrics_advisor_spark.operators.detect import e_divisive_np

    rng = np.random.default_rng(7)
    cases = []
    for i in range(8):
        cases.append(_mk_series(rng, 80, [(0.5, 4.0)]))
    for i in range(4):
        cases.append(_mk_series(rng, 80, []))
    for i in range(4):
        cases.append(_mk_series(rng, 90, [(0.3, 3.0), (0.7, -3.0)]))
    for i in range(4):
        cases.append(_mk_series(rng, 60, [(0.1, 5.0)]))
    n_detected = 0
    for i, x in enumerate(cases):
        fast = e_divisive_np(x, pvalue=0.05, permutations=40, seed=i)
        slow = naive_e_divisive(
            list(x), pvalue=0.05, permutations=40, seed=i
        )
        assert fast == slow, f"case {i}: {fast} != {slow}"
        n_detected += len(fast)
    # the fixture must exercise BOTH verdicts or the test proves little
    assert n_detected >= 8


def test_detect_anomalies_changepoints_vs_reference_model(spark):
    # end-to-end second-engine replay of the rows-only contract query
    # path: per-series seed discipline (crc32), the centered median
    # prefilter AND the max_points chunk-stitch rule — everything the
    # DuckDB oracle cannot express, attested here instead
    from metrics_advisor_spark.operators.detect import detect_anomalies

    rng = np.random.default_rng(99)
    rows = []
    series_data = {}
    for s in range(3):
        name = f"s{s}"
        x = _mk_series(rng, 150, [(0.4, 5.0), (0.8, -4.0)])
        series_data[name] = x
        for i, v in enumerate(x):
            rows.append(
                ("m", name, np.datetime64(1_700_000_000 + 15 * i, "s")
                 .astype("datetime64[us]").item(), float(v))
            )
    df = spark.createDataFrame(
        rows, "metric string, series string, ts timestamp, value double"
    )
    got = (
        detect_anomalies(
            df, cp_permutations=40, max_points=64
        )
        .filter("kind = 'changepoint'")
        .select("series", "idx")
        .collect()
    )
    got_cps = {}
    for r in got:
        got_cps.setdefault(r["series"], []).append(r["idx"])
    want_cps = {}
    for name, x in series_data.items():
        med = naive_moving_median(list(x), 5)
        seed = zlib.crc32(f"m\x00{name}".encode()) & 0x7FFFFFFF
        cps = []
        for lo in range(0, len(x), 64):  # the chunk-stitch rule
            cps.extend(
                lo + c
                for c in naive_e_divisive(
                    med[lo: lo + 64],
                    pvalue=0.05,
                    permutations=40,
                    seed=seed + lo,
                )
            )
        if cps:
            want_cps[name] = sorted(cps)
    assert {k: sorted(v) for k, v in got_cps.items()} == want_cps
    assert sum(len(v) for v in want_cps.values()) >= 3
