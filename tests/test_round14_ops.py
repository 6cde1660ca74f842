"""Round-14 unit tests: the composed crawl loop e2e (VERDICT r13
item 4), the WET/CDX column surfaces and the perplexity curation
stage."""

from __future__ import annotations

import importlib.util
import os

import pyspark.sql.functions as F
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_example(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, "examples", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_crawl_pipeline_example_e2e(spark):
    # the whole loop at sf0.001 in ONE test (VERDICT r13 item 4):
    # fetch -> parse -> admit -> schedule -> next wave, plus the
    # WET/CDX sidecars at the tail
    counts = _load_example("crawl_pipeline").main(
        "/root/testdata/sf0.001"
    )
    n = counts["docs"]
    assert n > 0
    # r15: the loop's entry point — the sitemap URL itself is
    # DISCOVERED from robots.txt, and the frontier hangs off it
    assert counts["sitemaps_discovered"] == 1
    # WARC round-trip: one response per doc; 404 arm drops ids%10==0
    assert counts["responses"] == n
    assert counts["status_200"] == n - (n + 9) // 10
    # robots: /doc/1* disallowed — survivors are status-200 docs whose
    # id does not start with '1'
    assert 0 < counts["robots_allowed"] < counts["status_200"]
    assert counts["url_dedup"] == counts["robots_allowed"]
    # each fetched page plants one self-link (anti-joined away) and
    # one genuinely new link -> next frontier == fetched pages
    assert counts["links_extracted"] == 2 * counts["url_dedup"]
    assert counts["next_frontier"] == counts["url_dedup"]
    # the politeness plan schedules EVERY admitted URL, single host,
    # FIFO waves at the robots' Crawl-delay of 1.5 s
    assert counts["next_scheduled"] == counts["next_frontier"]
    assert counts["last_fetch_offset_sec"] == pytest.approx(
        (counts["next_frontier"] - 1) * 1.5
    )
    # WET sidecar reads back exactly the emitted slice; CDX indexes
    # warcinfo + one conversion member per doc
    assert counts["wet_docs"] == 40
    assert counts["cdx_members"] == 41


def test_wet_column_roundtrip(spark):
    from metrics_advisor_spark.sources.warc import (
        attach_wet_payload,
        warc_records_df,
    )

    rows = [(1, "plain text one"), (2, "ζωή & 🌍 two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    recs = warc_records_df(attach_wet_payload(df), archive_col="wet")
    conv = {
        int(r["archive"]): r["body"].decode("utf-8")
        for r in recs.filter(F.col("warc_type") == "conversion")
        .collect()
    }
    assert conv == dict(rows)
    # warcinfo rides along per payload
    assert (
        recs.filter(F.col("warc_type") == "warcinfo").count() == 2
    )


def test_warc_cdx_records_tiling(spark):
    from metrics_advisor_spark.sources.warc import (
        attach_warc_payload,
        warc_cdx_records,
    )

    df = spark.createDataFrame(
        [(1, "odd doc gzip arm"), (2, "even doc plain arm")],
        "doc_id long, text string",
    )
    rows = warc_cdx_records(attach_warc_payload(df)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["offset"])
        assert [r["warc_type"] for r in rs] == [
            "warcinfo", "request", "response",
        ]
        # offsets tile the archive byte-exactly
        pos = 0
        for r in rs:
            assert r["offset"] == pos
            pos += r["length"]
        assert pos == rs[0]["archive_bytes"]


def test_perplexity_gate_stage(spark):
    from metrics_advisor_spark.functions.corpus_api import Corpus
    from metrics_advisor_spark.functions.text import char_lm_perplexity

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and then "
             "walks home through the quiet town in the evening"),
         (2, "zxq vjw qqq kkk zzz xxx jjj qq zx vj wk zq xj kv jw "
             "qz xk vz jq wx kj zv qx"),
         (3, "no")],  # too short to score -> dropped
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["nll_per_tri"]
        for r in char_lm_perplexity(df).collect()
    }
    assert scores[1] < scores[2]  # fluent < gibberish
    assert scores[3] is None
    mid = (scores[1] + scores[2]) / 2
    kept = Corpus(df).perplexity_gate(max_nll_per_tri=mid).df
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # schema-preserving: all original columns survive
    assert kept.columns == df.columns


def test_scrub_keep_first(spark):
    # keep_first: the FIRST (doc_id, offset) occurrence of each
    # duplicated window is canonical and survives; every other copy
    # is scrubbed — dedup, not destruction
    import random
    import string

    from metrics_advisor_spark.functions.dedup import (
        duplicate_spans,
        scrub_duplicate_spans,
    )

    rng = random.Random(17)

    def rand(n):
        return "".join(
            rng.choice(string.ascii_lowercase) for _ in range(n)
        )

    shared = rand(120)
    rows = [
        (1, rand(50) + shared + rand(50)),   # first occurrence wins
        (2, rand(33) + shared + rand(70)),   # scrubbed
        (3, shared + rand(40)),              # scrubbed
        (4, rand(150)),                      # unique, untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, min_len=64, stride=16, keep_first=True)
    assert {r["doc_id"] for r in spans.collect()} == {2, 3}
    got = {
        r["doc_id"]: r["text"]
        for r in scrub_duplicate_spans(
            df, min_len=64, stride=16, keep_first=True
        ).collect()
    }
    core = shared[16:-16]
    assert got[1] == rows[0][1]       # canonical copy intact
    assert core not in got[2]
    assert core not in got[3]
    assert got[4] == rows[3][1]
    # exactly one copy of the duplicated material survives corpus-wide
    assert sum(core in t for t in got.values()) == 1
    # within-doc repeat: the earlier offset is canonical
    df2 = spark.createDataFrame(
        [(9, rand(20) + shared + rand(30) + shared + rand(20))],
        "doc_id long, text string",
    )
    got2 = scrub_duplicate_spans(
        df2, min_len=64, stride=16, keep_first=True
    ).collect()[0]["text"]
    assert got2.count(core) == 1


def test_streaming_span_gate(spark, tmp_path):
    # 23rd surface staged for r15: cross-batch substring scrub —
    # material batch 1 carried is scrubbed from batch 2 arrivals;
    # batch 1's own copy survives intact (keep-first in arrival
    # order); within-batch dups keep the (doc_id, offset)-first copy
    import random
    import string

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_span_gate,
    )

    rng = random.Random(23)

    def rand(n):
        return "".join(
            rng.choice(string.ascii_lowercase) for _ in range(n)
        )

    shared = rand(120)
    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    b1 = [(1, rand(40) + shared + rand(40)), (2, rand(150))]
    # batch 2: doc 3 re-carries the batch-1 run (scrubbed), docs 4+5
    # share a NEW run (4 keeps it, 5 scrubbed), doc 6 unique
    shared2 = rand(100)
    b2 = [
        (3, rand(25) + shared + rand(60)),
        (4, rand(10) + shared2 + rand(70)),
        (5, rand(55) + shared2 + rand(30)),
        (6, rand(140)),
    ]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    streaming_span_gate(
        stream,
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
    )
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    orig = dict(b1 + b2)
    core, core2 = shared[16:-16], shared2[16:-16]
    assert got[1] == orig[1]          # first arrival intact
    assert got[2] == orig[2]
    assert core not in got[3]         # cross-batch scrub
    assert got[4] == orig[4]          # within-batch canonical intact
    assert core2 not in got[5]        # within-batch dup scrubbed
    assert got[6] == orig[6]
    # exactly one copy of each run survives stream-wide
    assert sum(core in t for t in got.values()) == 1
    assert sum(core2 in t for t in got.values()) == 1


def _pcm16_wav(samples):
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def test_audio_fingerprint(spark):
    # gain-invariant audio dedup sketch: identical audio -> identical
    # fp56; constant-gain copy -> identical fp56; different audio ->
    # different codes.  Codes mode agrees with a per-window integer
    # replay.
    import random

    import numpy as np

    from metrics_advisor_spark.functions.multimodal import (
        audio_fingerprint,
    )

    rng = random.Random(31)
    base = [rng.randrange(-8000, 8000) for _ in range(2048)]
    other = [rng.randrange(-8000, 8000) for _ in range(2048)]
    rows = [
        (1, _pcm16_wav(base)),
        (2, _pcm16_wav(base)),                      # exact dup
        (3, _pcm16_wav([2 * s for s in base])),     # gain x2
        (4, _pcm16_wav(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, wav binary")
    fp = {r["doc_id"]: r["fp56"] for r in audio_fingerprint(df).collect()}
    assert fp[1] == fp[2] == fp[3]
    assert fp[1] != fp[4]
    # codes mode: integer replay of window 1's code for doc 1
    got = {
        (r["doc_id"], r["win_id"]): r["code"]
        for r in audio_fingerprint(df, codes=True).collect()
    }
    s = np.asarray(base, dtype=np.int64)
    e = (s[:2048] ** 2).reshape(8, 16, 16).sum(axis=2)
    code1 = int(
        sum(
            (1 << (15 - b)) * (e[1, b] > e[0, b])
            for b in range(16)
        )
    )
    assert got[(1, 1)] == code1
    assert got[(3, 1)] == code1          # gain invariance per window
    # short payloads (< 2 windows) emit no codes, fp = 0
    short = spark.createDataFrame(
        [(9, _pcm16_wav([5] * 100))], "doc_id long, wav binary"
    )
    r = audio_fingerprint(short).collect()[0]
    assert r["n_codes"] == 0 and r["fp56"] == 0


def test_duplicate_span_sources(spark):
    import random
    import string

    from metrics_advisor_spark.functions.dedup import (
        duplicate_span_sources,
    )

    rng = random.Random(41)

    def rand(n):
        return "".join(
            rng.choice(string.ascii_lowercase) for _ in range(n)
        )

    shared = rand(100)
    df = spark.createDataFrame(
        [(5, rand(30) + shared + rand(20)),
         (2, rand(45) + shared + rand(40)),
         (7, rand(200))],
        "doc_id long, text string",
    )
    rows = duplicate_span_sources(df).collect()
    assert rows, "planted run must surface at least one dup key"
    for r in rows:
        assert r["n_occurrences"] >= 2
        assert r["n_docs"] == 2
        assert r["min_doc"] == 2  # canonical pointer = lowest doc


def test_streaming_span_gate_vs_reference_model(spark, tmp_path):
    # randomized 3-batch corpus (cross-batch re-carries, within-batch
    # dups, multi-run docs, multibyte chars) validated against an
    # INDEPENDENT Python reference of the gate's arrival-order
    # semantics: seen-key store + keep-first-in-batch + island splice
    import random
    import string
    import time

    from _span_gate_model import reference_gate as reference

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_span_gate,
    )

    rng = random.Random(77)
    alpha = string.ascii_lowercase + " "

    def rand(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    runs = [rand(90), rand(130), "梅雨前線が停滞し続けた七月の" + rand(70)]
    doc_id = 0
    batches = []
    for _ in range(3):
        batch = []
        for _ in range(6):
            doc_id += 1
            t = rand(rng.randrange(0, 60))
            for r in rng.sample(runs, rng.randrange(0, 3)):
                t += r + rand(rng.randrange(10, 50))
            batch.append((doc_id, t))
        batches.append(batch)

    src = tmp_path / "rdocs"
    src.mkdir()
    schema = "doc_id long, text string"
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
        time.sleep(1.1)  # distinct mtimes pin file-stream batch order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src) + "/*")
    )
    streaming_span_gate(
        stream,
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
    )
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = reference(batches)
    assert got == want
    # sanity: the corpus really exercised the gate (some doc scrubbed)
    orig = {d: t for b in batches for d, t in b}
    assert any(got[d] != orig[d] for d in got)


def test_frontier_schedule_hostless_guard(spark):
    # malformed/relative URLs must get NULL wave/offset and must NOT
    # enter the per-host window (at crawl scale a NULL-host partition
    # is a straggler); hosted rows schedule exactly as before
    from metrics_advisor_spark.functions.url import frontier_schedule

    df = spark.createDataFrame(
        [(1, "https://h0.example.org/a"),
         (2, "https://h0.example.org/b"),
         (3, "not a url"),
         (4, "/relative/path"),
         (5, "mailto:x@example.org")],
        "doc_id long, canonical string",
    )
    got = {r["doc_id"]: r for r in frontier_schedule(df).collect()}
    assert got[1]["wave"] == 0 and got[2]["wave"] == 1
    assert got[1]["fetch_offset_sec"] == 0.0
    assert got[2]["fetch_offset_sec"] == 1.0
    for d in (3, 4, 5):
        assert got[d]["wave"] is None
        assert got[d]["fetch_offset_sec"] is None
    # the compiled plan's window must not receive the hostless branch
    plan = frontier_schedule(df)._jdf.queryExecution().toString()
    assert "row_number" in plan
