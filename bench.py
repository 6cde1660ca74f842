#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect), after one warm-up of the session on a trivial action.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from metrics_advisor_spark import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# Committed idle-host canary time (sec): the MEDIAN of 3 runs of
# `spark.range(4e9).sum()` on local[32].  When a measured canary
# deviates >1.5x from this, the whole bench run is flagged
# host_contended=true in the output JSON, so a loaded driver host can
# no longer masquerade as an across-the-board code regression (VERDICT
# r08 "what's wrong" #1: r08's 397.5 s vs the committed 283.8 s basis
# was pure host load — every suspect recovered to r07 levels on an
# idle re-measure).  Sizing note: 2e8 rows finishes in ~0.3 s and
# scheduling noise swamps the signal (measured medians 0.24-0.87 s);
# 4e9 rows is ~0.7 s of pure whole-stage-codegen CPU and repeats
# within +/-15% (measured medians 0.70/0.70/0.80).  Re-stamp this
# constant if the bench host hardware ever changes (no Python workers,
# no shuffle, no disk — only CPU contention moves it).
CANARY_COMMITTED_SEC = float(
    os.environ.get("SPARK_GRAFT_CANARY_COMMITTED", "0.75")
)


def _canary(spark, runs: int = 3) -> float:
    """Fixed-cost JVM job whose wall time tracks host CPU contention.

    runs=3 → median (one GC pause cannot fake a contended host);
    runs=2 → min (GC pauses only bias UP, so the min is the honest
    cheap estimate for the interleaved mid-run samples)."""
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(4_000_000_000).selectExpr("sum(id)").collect()
        vals.append(time.perf_counter() - t0)
    vals.sort()
    return round(vals[(len(vals) - 1) // 2], 3)


# Committed idle-host IO canary basis (sec): median of 3 idle runs of
# _io_canary below.  VERDICT r10 item 2: the CPU canary is correct and
# STILL missed 3-4x inflation on IO-bound queries in the driver's r10
# run (streaming_sliding_counts 15.6 s vs 2.05 idle,
# hamming_group_pairs 17.1 vs 4.1 — all 12 CPU samples idle,
# suspect_queries empty).  The signature was page-cache/writeback
# pressure after the 30-min test suite: disk-touching work (streaming
# checkpoint dirs, shuffle spill, parquet scans) inflates while pure
# whole-stage-codegen CPU stays flat — a blind spot a compute-only
# probe can never see.  This second arm writes a fixed ~20 MB
# incompressible parquet to local disk and reads it back, so it rides
# the same page cache + writeback path the inflated queries do.
IO_CANARY_COMMITTED_SEC = float(
    os.environ.get("SPARK_GRAFT_IO_CANARY_COMMITTED", "0.80")
)
# IO is inherently noisier than codegen CPU (writeback timing, dirty
# page thresholds), so the hot threshold is 2x committed rather than
# the CPU arm's 1.5x — calibrated so idle jitter (measured +/-25%)
# cannot flag, while the r10 episode (3-4x) lands well above.
IO_CANARY_HOT_FACTOR = float(
    os.environ.get("SPARK_GRAFT_IO_CANARY_HOT_FACTOR", "2.0")
)


def _io_canary(spark, runs: int = 3) -> float:
    """Fixed-cost disk round-trip whose wall time tracks host IO
    pressure (page-cache eviction, dirty-writeback stalls, device
    contention) that the pure-CPU canary is blind to.

    Writes 2.5M rows of xxhash64 output (incompressible → the parquet
    bytes actually hit the block layer, ~20 MB) to a fresh temp dir,
    evicts the written pages (posix_fadvise DONTNEED), reads them back
    COLD through an aggregate, and removes the dir so repeated samples
    never accumulate disk usage.  The eviction is the point (r11
    lesson): without it the read-back hits pages the write just
    populated, so the arm measured only write/writeback pressure and
    was blind to slow COLD reads — the failure mode that actually
    inflates parquet-scan-heavy queries when the source tables fall
    out of page cache (measured: hamming_group_pairs 4.1 → 14 s with
    BOTH original canary arms reading idle).  runs=3 → median,
    runs=2 → MAX — opposite of the CPU canary's min, deliberately:
    this arm exists to DETECT stalls, and the measured A/B (2x12 GB
    background buffered writes) showed moderate pressure producing
    alternating samples where a min-of-2 reads under the hot threshold
    and a max-of-2 flags."""
    import glob
    import shutil
    import tempfile

    vals = []
    for _ in range(runs):
        d = tempfile.mkdtemp(prefix="ma_io_canary_")
        path = os.path.join(d, "p")
        try:
            t0 = time.perf_counter()
            (
                spark.range(2_500_000)
                .selectExpr("id", "xxhash64(id) AS h")
                .repartition(8)
                .write.mode("overwrite")
                .parquet(path)
            )
            for f in glob.glob(os.path.join(path, "*.parquet")):
                fd = os.open(f, os.O_RDONLY)
                try:
                    os.fsync(fd)  # flush dirty pages so DONTNEED works
                    os.posix_fadvise(
                        fd, 0, 0, os.POSIX_FADV_DONTNEED
                    )
                finally:
                    os.close(fd)
            # bit_xor, not sum: xxhash64 output spans the full int64
            # range and a 2.5M-row sum overflows under ANSI mode
            spark.read.parquet(path).selectExpr("bit_xor(h)").collect()
            vals.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    if runs == 2:
        return round(max(vals), 3)
    vals.sort()
    return round(vals[(len(vals) - 1) // 2], 3)


# Scheduler-stall arm (VERDICT r11 item 3): the r11 episode showed a
# third contention mode BOTH arms are blind to — queries inflating
# 3-10x run-to-run while /proc/stat reads ~74% idle (cores parked, not
# stolen, not in iowait) and both canaries sample idle.  /proc/stat
# deltas are now recorded per canary segment (the artifact the judge
# asked for) and per query sample.  Calibration on an idle host
# (ROUND_NOTES r12) killed the naive "idle high + query long" flag:
# healthy slow queries run 55-95% idle here (pagerank 70% — barrier
# rounds; knn_graph 94% — sampled single-partition by design), so
# idle%% alone cannot discriminate.  What DOES discriminate is the
# episode's oscillation: the same query swinging >=2x across
# same-session samples, or >=2.5x above its committed BENCH_FULL
# basis, WHILE the slow sample's /proc/stat delta shows parked cores
# (idle high, steal ~0, iowait ~0 — a loaded or IO-bound host shows
# the opposite).  Those two gates, idle-corroborated, define
# `sched_suspect_queries`; either firing sets `sched_anomalous`.
SCHED_IDLE_MIN = float(os.environ.get("SPARK_GRAFT_SCHED_IDLE_MIN", "0.55"))
SCHED_DISPERSION = float(os.environ.get("SPARK_GRAFT_SCHED_DISPERSION", "2.0"))
SCHED_VS_PRIOR = float(os.environ.get("SPARK_GRAFT_SCHED_VS_PRIOR", "2.5"))
SCHED_FLOOR_SEC = float(os.environ.get("SPARK_GRAFT_SCHED_FLOOR", "3.0"))


def _cpu_stat() -> dict | None:
    """One /proc/stat aggregate-CPU snapshot (jiffy counters)."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        keys = (
            "user", "nice", "system", "idle",
            "iowait", "irq", "softirq", "steal",
        )
        return dict(zip(keys, map(int, parts[1:9])))
    except (OSError, ValueError):
        return None


def _cpu_delta(a: dict | None, b: dict | None) -> dict | None:
    """Percent breakdown of the jiffies elapsed between two snapshots."""
    if not a or not b:
        return None
    d = {k: b[k] - a[k] for k in a}
    tot = sum(d.values())
    if tot <= 0:
        return None
    return {
        "user_pct": round((d["user"] + d["nice"]) / tot, 3),
        "system_pct": round(
            (d["system"] + d["irq"] + d["softirq"]) / tot, 3
        ),
        "idle_pct": round(d["idle"] / tot, 3),
        "iowait_pct": round(d["iowait"] / tot, 3),
        "steal_pct": round(d["steal"] / tot, 3),
        "jiffies": tot,
    }


def _parked_cores(cpu: dict | None) -> bool:
    """The r11 stall signature: cores idle yet NOT stolen and NOT in
    iowait — a loaded host shows low idle, an IO-bound one high iowait,
    a noisy-neighbor microVM high steal; only a scheduling stall parks
    them with all three low."""
    return bool(
        cpu
        and cpu["idle_pct"] >= SCHED_IDLE_MIN
        and cpu["steal_pct"] < 0.05
        and cpu["iowait_pct"] < 0.10
    )


# Interleaved-canary cadence (VERDICT r09 item 3): endpoint-only
# sampling missed episodic mid-run contention TWO rounds straight
# (r08/r09 both shipped `host_contended: false` around 8-39x inflated
# segments; the judge measured the same canary at 3.7-3.9 s — 5x the
# committed 0.75 s — for a sustained mid-session window).  A min-of-2
# canary every CANARY_EVERY queries costs ~1.5 s x ~11 samples over
# the ~270-query suite (~4% of an idle run) and bounds how much of the
# suite a contention episode can pollute undetected.
CANARY_EVERY = int(os.environ.get("SPARK_GRAFT_CANARY_EVERY", "25"))


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("metrics_advisor_bench")
    # Warm-up phase (excluded from timings): JVM/codegen spin-up, parquet
    # footer + page cache for every table, and one micro KMeans fit to
    # class-load MLlib/BLAS.  Without this, whichever queries happen to
    # run first eat multi-second one-time costs and the per-query numbers
    # become an artifact of dict order (measured: ivf_topk 13.4 s cold at
    # position ~40 vs 2.8 s steady-state).
    spark.range(1).count()
    for t in (
        "events", "documents", "embeddings", "orders", "customer",
        "nation", "region", "supplier", "part", "lineitem",
    ):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:
            pass
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector
        from pyspark.sql import functions as F

        tiny = spark.range(64).select(
            array_to_vector(F.array(F.rand(1), F.rand(2))).alias("_feat")
        )
        KMeans(k=2, seed=1, featuresCol="_feat").fit(tiny)
    except Exception:
        pass
    # spawn the Arrow Python workers once (first pandas-UDF query
    # otherwise pays ~2 s of worker startup)
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # warm the parquet WRITE path once and discard: the first parquet
    # write in a session pays committer/codec class-loading that would
    # otherwise inflate the opening IO-canary sample (measured: first
    # median-of-3 reads ~1.5 s vs the ~0.8 s steady state)
    _io_canary(spark, runs=1)

    # Warm-number discipline without tripling the suite (tiered —
    # r07 verdict item 3 asked for median-of-3 so host variance stops
    # producing ±50% flappers that eat a verdict cycle per round):
    #   * first run ≤ 0.7 s  → keep it (a warm cheap run is already the
    #     right number; ~180 of ~260 queries land here);
    #   * first run > 0.7 s  → one more run, report the MIN (cold-
    #     position noise: the rotating dict order otherwise makes
    #     numbers an artifact of position — r03: pii_scrub 0.55→2.43 s
    #     with zero code changes);
    #   * first run > 1.8 s  → two more runs, report the MEDIAN of 3
    #     (every historical flapper — detect_anomalies, kmeans_outliers,
    #     streaming_session_stats — lives above this line; the median
    #     absorbs a single GC/compaction outlier in either direction
    #     where min-of-2 still flaps when BOTH runs land high).
    # An unconditional 3× over ~260 queries would blow the driver's
    # bench budget; the tiers spend re-runs only where variance bites.
    # SPARK_GRAFT_BENCH_RUNS=N forces unconditional N runs (median).
    runs_env = os.environ.get("SPARK_GRAFT_BENCH_RUNS")
    rerun_above = float(
        os.environ.get("SPARK_GRAFT_BENCH_RERUN_THRESHOLD", "0.7")
    )
    median3_above = float(
        os.environ.get("SPARK_GRAFT_BENCH_MEDIAN3_THRESHOLD", "1.8")
    )
    load_start = _loadavg()
    # Interleaved canary (VERDICT r09 item 3): endpoint-only sampling
    # shipped host_contended=false around mid-run 8-39x contention
    # spikes two rounds straight.  A sample lands before the suite,
    # after every CANARY_EVERY queries, and after the suite; each
    # query belongs to the segment between its two bounding samples,
    # and a segment is contended when EITHER bound exceeds 1.5x the
    # committed idle basis — so an inflated streaming_ksigma
    # self-identifies via `suspect_queries` instead of polluting a
    # "clean" run.
    canary_samples: list[dict] = [
        {
            "after_n": 0,
            "sec": _canary(spark, runs=3),
            "io_sec": _io_canary(spark, runs=3),
        }
    ]
    # Per-query committed basis for the scheduler-stall arm: the repo's
    # own BENCH_FULL.json (the builder's last clean-run numbers).  Only
    # trusted when that run itself was clean (no suspects) — a polluted
    # basis would mass-flag a healthy run.
    prior_timings: dict[str, float] = {}
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_FULL.json",
            )
        ) as fh:
            _prior = json.load(fh)
        if not _prior.get("host", {}).get("suspect_queries"):
            prior_timings = _prior.get("queries", {})
    except (OSError, ValueError):
        pass
    timings: dict[str, float] = {}
    seg_of: dict[str, int] = {}
    query_cpu: dict[str, dict] = {}
    sched_suspects: list[str] = []
    total = 0.0
    bench_fns = dict(entry_mod.queries())
    # flagship end-to-end pipeline (detection UDFs + correlation + rank)
    bench_fns["flagship_analyze"] = entry_mod.flagship
    # SPARK_GRAFT_BENCH_ONLY=q1,q2 — subset filter for local iteration
    # (the driver never sets it; a full run is unaffected)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        unknown = keep - set(bench_fns)
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names unknown queries: "
                f"{sorted(unknown)}"
            )
        bench_fns = {k: v for k, v in bench_fns.items() if k in keep}
    n_done = 0
    seg_stat = _cpu_stat()  # /proc/stat at the current segment's start
    for name, fn in bench_fns.items():
        a = _cpu_stat()
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        pairs = [(time.perf_counter() - t0, _cpu_delta(a, _cpu_stat()))]
        if runs_env:
            extra = max(1, int(runs_env)) - 1
        elif pairs[0][0] > median3_above:
            extra = 2
        elif pairs[0][0] > rerun_above:
            extra = 1
        else:
            extra = 0
        for _ in range(extra):
            a = _cpu_stat()
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            pairs.append(
                (time.perf_counter() - t0, _cpu_delta(a, _cpu_stat()))
            )
        pairs.sort(key=lambda p: p[0])
        samples = [p[0] for p in pairs]
        # lower median: N=3 → the true median, N=2 → the min
        # (cold-position runs only bias UP, so low is the honest pick),
        # N=1 → the single warm run
        val = samples[(len(samples) - 1) // 2]
        timings[name] = round(val, 3)
        seg_of[name] = len(canary_samples) - 1
        total += val
        # Scheduler-stall detection (see SCHED_* block above): the slow
        # sample must show parked cores AND the wall must oscillate —
        # either within this run's own samples or vs the committed
        # per-query basis.  Healthy high-idle slow queries (pagerank,
        # knn_graph) pass both walls steady, so neither gate fires.
        worst_wall, worst_cpu = pairs[-1]
        if worst_wall >= SCHED_FLOOR_SEC and _parked_cores(worst_cpu):
            dispersed = (
                len(samples) >= 2
                and worst_wall >= SCHED_DISPERSION * samples[0]
            )
            prior = prior_timings.get(name)
            inflated = bool(prior) and val >= max(
                SCHED_FLOOR_SEC, SCHED_VS_PRIOR * prior
            )
            if dispersed or inflated:
                sched_suspects.append(name)
        if worst_wall >= 2.0:
            query_cpu[name] = {"wall": round(worst_wall, 3), **worst_cpu} \
                if worst_cpu else {"wall": round(worst_wall, 3)}
        # Queries that persist intermediates (kl_divergence, pagerank,
        # triangle_count, dedup pipelines) must not leak cached blocks
        # into later queries' memory budget — each timing measures the
        # query's own plan, nothing inherited.
        spark.catalog.clearCache()
        n_done += 1
        if n_done % CANARY_EVERY == 0:
            # mid-run 2-sample estimates: CPU reports the MIN (GC
            # pauses only bias up — noise), IO reports the MAX (stalls
            # are the signal; see _io_canary docstring).  A full
            # median-of-3 on both arms every segment would add
            # ~4s x 11 segments.  seg_cpu is the /proc/stat delta over
            # the QUERIES of the segment ending here (canary work
            # excluded — the snapshot is taken before the sample runs).
            seg_end = _cpu_stat()
            canary_samples.append(
                {
                    "after_n": n_done,
                    "sec": _canary(spark, runs=2),
                    "io_sec": _io_canary(spark, runs=2),
                    "seg_cpu": _cpu_delta(seg_stat, seg_end),
                }
            )
            seg_stat = _cpu_stat()
    if canary_samples[-1]["after_n"] != n_done:
        seg_end = _cpu_stat()
        canary_samples.append(
            {
                "after_n": n_done,
                "sec": _canary(spark, runs=3),
                "io_sec": _io_canary(spark, runs=3),
                "seg_cpu": _cpu_delta(seg_stat, seg_end),
            }
        )
    load_end = _loadavg()
    cpu_hot = [
        s["sec"] > 1.5 * CANARY_COMMITTED_SEC for s in canary_samples
    ]
    io_hot = [
        s["io_sec"] > IO_CANARY_HOT_FACTOR * IO_CANARY_COMMITTED_SEC
        for s in canary_samples
    ]
    hot = [c or i for c, i in zip(cpu_hot, io_hot)]
    # segment i spans queries between samples i and i+1; contended if
    # either bound is hot (contention seen entering OR leaving it)
    seg_contended = [
        hot[i] or hot[min(i + 1, len(hot) - 1)]
        for i in range(max(1, len(hot) - 1))
    ]
    suspect = sorted(
        n for n, seg in seg_of.items() if seg_contended[seg]
    )
    host = {
        "canary_committed_sec": CANARY_COMMITTED_SEC,
        "io_canary_committed_sec": IO_CANARY_COMMITTED_SEC,
        "io_canary_hot_factor": IO_CANARY_HOT_FACTOR,
        "canary_samples": canary_samples,
        "canary_start_sec": canary_samples[0]["sec"],
        "canary_end_sec": canary_samples[-1]["sec"],
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "host_contended": any(hot),
        "cpu_contended": any(cpu_hot),
        "io_contended": any(io_hot),
        "suspect_queries": suspect,
        "sched_anomalous": bool(sched_suspects),
        "sched_suspect_queries": sorted(sched_suspects),
        "sched_thresholds": {
            "idle_min": SCHED_IDLE_MIN,
            "dispersion": SCHED_DISPERSION,
            "vs_prior": SCHED_VS_PRIOR,
            "floor_sec": SCHED_FLOOR_SEC,
        },
    }
    # Full per-query line first (for logs/humans), then a compact summary
    # line LAST: the driver retains only an output tail, and with ~100
    # queries the full line exceeds it — the compact line always fits and
    # stays parseable (VERDICT r02 item 2: BENCH_r02 parsed=null).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "host": host,
            }
        )
    )
    # VERDICT r04 item 7: the driver keeps only a truncated output tail,
    # so persist the FULL per-query map to a sibling file committed to
    # the repo — cross-round per-query diffs need all ~230 entries, not
    # the ~27 that fit in the tail.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    try:
        if only:
            full_path = os.devnull  # subset run: keep the full map
        with open(full_path, "w") as fh:
            json.dump(
                {
                    "metric": "headline_queries_total_wall",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    "host": host,
                    # worst-sample /proc/stat delta for every query that
                    # crossed 2 s — the per-query corroboration behind
                    # sched_suspect_queries (full file only: too big for
                    # the driver's stdout tail)
                    "query_cpu": query_cpu,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
    except OSError:
        pass  # read-only checkout: stdout line above still has the map
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    # VERDICT r12 residual nit: BENCH_r12 had parsed=null because this
    # final line embedded the FULL host canary object (per-segment
    # /proc/stat deltas, several KB) and the driver's tail cap cut it
    # mid-line.  The final line must stay BOUNDED: verdicts only here;
    # the segment-level evidence lives in the first (full) line and in
    # BENCH_FULL.json.
    host_verdict = {
        k: host[k]
        for k in (
            "host_contended", "cpu_contended", "io_contended",
            "sched_anomalous",
        )
    }
    host_verdict["suspect_queries"] = host["suspect_queries"][:10]
    host_verdict["sched_suspect_queries"] = (
        host["sched_suspect_queries"][:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "slowest15": slowest,
                "host": host_verdict,
            }
        )
    )


if __name__ == "__main__":
    main()
