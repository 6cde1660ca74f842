"""Round-15 additions: replay-safety for the streaming span gate
(r14 ADVICE medium), the 16-bit PCM guard (r14 ADVICE low), the
single-pass frontier plan (r14 ADVICE low), and the keep_first
overlap-caveat boundary pin (VERDICT r14 item 2)."""

import random
import string

import pytest


def _rand(rng, n):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def test_streaming_span_gate_replay_idempotent(spark, tmp_path):
    # r14 ADVICE (medium): foreachBatch is at-least-once — a batch
    # that appended its store leaf but lost the checkpoint commit is
    # REPLAYED under the same batch_id.  Simulate exactly that: drain
    # once (store leaf written), then DELETE the checkpoint (the lost
    # commit) and drain again with the SAME checkpoint path.  The
    # replay must (a) not read its own failed-attempt keys as 'seen'
    # (which would scrub the canonical first copy too — zero copies
    # of the batch's material surviving), and (b) overwrite the same
    # run=/batch= leaf instead of leaving the stale attempt's docs
    # behind under a second run dir.
    import shutil

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_span_gate,
    )

    rng = random.Random(151)
    shared = _rand(rng, 120)
    b1 = [
        (1, _rand(rng, 40) + shared + _rand(rng, 40)),
        (2, _rand(rng, 30) + shared + _rand(rng, 55)),
        (3, _rand(rng, 150)),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        streaming_span_gate(
            stream,
            store_dir=str(tmp_path / "store"),
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )

    drain()
    first = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # sanity: keep-first within the batch — doc 1 keeps the run, doc 2
    # scrubbed, doc 3 untouched
    assert shared in first[1]
    assert shared not in first[2]
    assert first[3] == b1[2][1]

    # lose the commit, replay batch 0 under the same checkpoint path
    shutil.rmtree(tmp_path / "ck")
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))
    replay = {r["doc_id"]: r["text"] for r in out.collect()}
    assert replay == first, (
        "replayed batch diverged from the original drain — the store "
        "read leaked the failed attempt's own keys"
    )
    # exactly one run leaf: run_id derives from the checkpoint, so the
    # replay overwrote rather than forking a second run dir
    runs = {r["run"] for r in out.select("run").distinct().collect()}
    assert len(runs) == 1, f"replay forked a second run dir: {runs}"
    # and each doc appears exactly once corpus-wide
    assert out.count() == 3


def test_audio_fingerprint_rejects_non_16bit(spark):
    # r14 ADVICE (low): the '<i2' frombuffer assumes 16-bit PCM; an
    # 8-bit canonical-header WAV must raise, not fingerprint garbage
    import struct

    from metrics_advisor_spark.functions.multimodal import (
        audio_fingerprint,
        audio_windows,
    )

    def wav(bits, n_samples=1024):
        data_len = n_samples * bits // 8
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 8000, 8000 * bits // 8,
                          bits // 8, bits)
            + b"data" + struct.pack("<I", data_len)
        )
        return hdr + bytes(data_len)

    df8 = spark.createDataFrame(
        [(1, bytearray(wav(8)))], "doc_id long, wav binary"
    )
    with pytest.raises(Exception, match="8-bit PCM unsupported"):
        audio_fingerprint(df8).collect()
    with pytest.raises(Exception, match="8-bit PCM unsupported"):
        audio_windows(df8).collect()
    # 16-bit still fingerprints
    df16 = spark.createDataFrame(
        [(1, bytearray(wav(16)))], "doc_id long, wav binary"
    )
    assert audio_fingerprint(df16).count() == 1


def test_frontier_schedule_single_scan(spark):
    # r14 ADVICE (low): the filter-split form scanned the input twice
    # (a nondeterministic upstream could emit a row into both branches
    # or neither); the salted-pseudo-host form is ONE plan — assert
    # exactly one scan of the source relation survives in the
    # physical plan, and the observable output is unchanged
    # (hosted rows get per-host FIFO waves, hostless rows NULL).
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.url import frontier_schedule

    rows = [
        ("https://a.example.org/1",),
        ("https://a.example.org/2",),
        ("https://b.example.org/x",),
        ("not a url",),
        ("also-not-a-url",),
    ]
    df = spark.createDataFrame(rows, "canonical string")
    out = frontier_schedule(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("LocalTableScan") + plan.count("Scan ")
    assert n_scans == 1, f"expected single source scan, plan:\n{plan}"
    got = {r["canonical"]: r["wave"] for r in out.collect()}
    assert got["https://a.example.org/1"] == 0
    assert got["https://a.example.org/2"] == 1
    assert got["https://b.example.org/x"] == 0
    assert got["not a url"] is None
    assert got["also-not-a-url"] is None


def test_frontier_schedule_hostless_spread(spark):
    # the straggler guard survives the single-pass rewrite: hostless
    # rows hash across 1024 salted pseudo-host keys, never one
    # NULL-host window partition
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.url import frontier_schedule

    df = spark.range(500).select(
        F.concat(F.lit("junk-"), F.col("id").cast("string"))
        .alias("canonical")
    )
    out = frontier_schedule(df)
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["wave"] is None for r in rows)
    assert all(r["fetch_offset_sec"] is None for r in rows)


def test_keep_first_overlap_caveat_boundary(spark):
    # VERDICT r14 item 2: pin the DOCUMENTED boundary of the
    # keep_first guarantee, not just the happy path.  Construct a doc
    # whose canonical copy of run X is overlapped by a duplicated run
    # Y from a DIFFERENT window key: the island merge cuts into the
    # canonical copy, so "exactly one copy survives" fails exactly as
    # the docstring warns — while the non-interleaved control doc
    # keeps its canonical copy intact.
    import random

    from metrics_advisor_spark.functions.dedup import (
        scrub_duplicate_spans,
    )

    rng = random.Random(77)
    x_part = _rand(rng, 100)
    shared = _rand(rng, 100)
    y_part = _rand(rng, 100)
    x = x_part + shared  # run X: canonical copy lives in doc 2
    y = shared + y_part  # run Y: canonical copy lives in doc 1
    # doc 1: canonical Y — every duplicated window in doc 1 is
    # first-in-(doc_id, off) order, so doc 1 must pass untouched
    d1 = _rand(rng, 20) + y + _rand(rng, 20)
    # doc 2: X and Y OVERLAP (they share `shared`) — X's canonical
    # copy is cut into by hits from doc 2's NON-canonical Y windows
    d2 = _rand(rng, 25) + x_part + shared + y_part + _rand(rng, 25)
    # doc 3: the duplicating copy of X (non-canonical → scrubbed)
    d3 = _rand(rng, 30) + x + _rand(rng, 30)
    # docs 4/5: control — run Z's canonical copy is NOT overlapped by
    # other duplicated material, so exactly one copy survives
    z = _rand(rng, 100)
    d4 = _rand(rng, 20) + z + _rand(rng, 20)
    d5 = _rand(rng, 30) + z + _rand(rng, 30)
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3), (4, d4), (5, d5)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in scrub_duplicate_spans(df, keep_first=True).collect()
    }
    # happy paths: canonical copies survive where runs don't overlap
    assert got[1] == d1  # canonical Y doc untouched
    assert z in got[4]
    assert z not in got[5]
    # THE BOUNDARY: doc 2 is the canonical holder of X, but doc 2's Y
    # occurrence is non-canonical (doc 1 came first) and its hits
    # cover the shared tail of X — the island splice cuts into the
    # canonical copy, so NO intact copy of X survives corpus-wide.
    # This is exactly the documented caveat; if these assertions ever
    # flip, the docstring must be updated to claim the stronger
    # guarantee.
    assert x not in got[2]
    assert x not in got[3]


def _pcm16_wav(samples):
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def test_audio_dup_components_gain_invariant(spark):
    # VERDICT r14 item 5: the corpus-level audio-dedup chain —
    # fingerprint -> blocked Hamming -> components.  The same clip at
    # two gains must land in ONE component (delta-sign codes are
    # gain-invariant, so Hamming distance 0); a distinct clip stays
    # its own component; a sub-window stub is excluded (no signal).
    import numpy as np

    from metrics_advisor_spark.functions.multimodal import (
        audio_dup_components,
        audio_fingerprint,
    )

    rng = np.random.default_rng(15)
    clip_a = rng.integers(-1000, 1000, 2048)
    clip_b = rng.integers(-1000, 1000, 2048)
    rows = [
        (1, bytearray(_pcm16_wav(clip_a))),
        (2, bytearray(_pcm16_wav(clip_a * 4))),  # +12 dB re-level
        (3, bytearray(_pcm16_wav(clip_b))),
        (4, bytearray(_pcm16_wav(rng.integers(-1000, 1000, 300)))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, wav binary")
    # precondition worth pinning: the re-levelled copy fingerprints
    # IDENTICALLY, and the distinct clip is far in Hamming space
    fp = {
        r["doc_id"]: (r["n_codes"], r["fp56"])
        for r in audio_fingerprint(media).collect()
    }
    assert fp[1] == fp[2]
    assert bin(fp[1][1] ^ fp[3][1]).count("1") > 4
    assert fp[4][0] == 0  # stub: no full window pair -> no codes
    comp = {
        r["doc_id"]: r["component"]
        for r in audio_dup_components(media).collect()
    }
    assert comp[1] == comp[2] == 1
    assert comp[3] == 3
    assert 4 not in comp  # stubs excluded, not clustered


def test_corpus_dedup_audio_stage(spark):
    # the fluent pipeline form: full corpus rows (text + wav) survive
    # for cluster representatives; too-short clips pass through
    import numpy as np

    from metrics_advisor_spark.functions.corpus_api import Corpus

    rng = np.random.default_rng(16)
    clip_a = rng.integers(-800, 800, 2048)
    clip_b = rng.integers(-800, 800, 2048)
    rows = [
        (1, "keep me", bytearray(_pcm16_wav(clip_a))),
        (2, "dropped dup", bytearray(_pcm16_wav(clip_a * 2))),
        (3, "distinct", bytearray(_pcm16_wav(clip_b))),
        (4, "short stub", bytearray(_pcm16_wav(rng.integers(-800, 800, 100)))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, wav binary"
    )
    out = Corpus(df).dedup_audio().df
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1, 3, 4}
    assert got[1] == "keep me"


def test_robots_sitemap_urls(spark):
    # the discovery hook: Sitemap: lines live outside UA groups and
    # apply file-wide; files advertising none emit one NULL row
    # (coverage stays observable); relative junk is passed through
    # verbatim (the caller's canonicalizer decides)
    from metrics_advisor_spark.functions.robots import (
        robots_sitemap_urls,
    )

    rows = [
        ("a", "User-agent: *\nDisallow: /x\n"
              "Sitemap: https://a.example.org/s1.xml\n"
              "User-agent: bot\nAllow: /\n"
              "Sitemap: https://a.example.org/s2.xml\n"),
        ("b", "User-agent: *\nDisallow: /\n"),
        ("c", "sitemap: https://c.example.org/map.xml\n"),  # case-insensitive
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {}
    for r in robots_sitemap_urls(df).collect():
        got.setdefault(r["host"], []).append(r["sitemap_url"])
    assert sorted(got["a"]) == [
        "https://a.example.org/s1.xml",
        "https://a.example.org/s2.xml",
    ]
    assert got["b"] == [None]
    assert got["c"] == ["https://c.example.org/map.xml"]
    assert got["d"] == [None]


def test_attach_wav_variants_rule_and_dedup(spark):
    # the r15 contract fixture (q_audio_dup_components): hash-derived
    # variant payloads.  Pin the waveform RULE itself (md5 of
    # "src:block" -> 8 samples x 4 hex chars, biased, then >> shift)
    # against an independent recomputation, and the end-to-end merge
    # semantics: exact re-encode (shift 0) AND half-gain re-level
    # (shift 1) rejoin their source; a distinct source stays apart;
    # a sub-window stub (src%10 < 2 -> n_samples < 512) is excluded.
    import hashlib

    from metrics_advisor_spark.functions.multimodal import (
        attach_wav_variants,
        audio_dup_components,
        audio_meta,
    )

    # src 5: ns = 400 + 5*80 = 800 (3 full windows); src 7: 960;
    # src 10: ns = 400 -> stub (< 2 windows)
    variants = [
        (5, 5, 0), (1000005, 5, 0), (2000005, 5, 1),
        (7, 7, 0),
        (10, 10, 0), (1000010, 10, 0),
    ]
    df = spark.createDataFrame(
        variants, "doc_id long, src_id long, shift int"
    )
    media = attach_wav_variants(df)

    # the payloads are REAL canonical WAVs (the meta parser accepts
    # them) with the documented n_samples law
    meta = {
        r["doc_id"]: r["n_samples"] for r in audio_meta(media).collect()
    }
    assert meta[5] == 800 and meta[7] == 960 and meta[10] == 400

    # rule pin: first 8 samples of src 5 shift 0 equal the md5 hex
    # recomputation; the shift-1 payload is the arithmetic half
    raw = {r["doc_id"]: bytes(r["wav"]) for r in media.collect()}
    import struct

    def samples(payload, k):
        return struct.unpack("<%dh" % k, payload[44:44 + 2 * k])

    hx = hashlib.md5(b"5:0").hexdigest()
    want = tuple(int(hx[4 * k:4 * k + 4], 16) - 32768 for k in range(8))
    assert samples(raw[5], 8) == want
    assert samples(raw[1000005], 8) == want  # exact re-encode
    assert samples(raw[2000005], 8) == tuple(v >> 1 for v in want)

    comp = {
        r["doc_id"]: r["component"]
        for r in audio_dup_components(media).collect()
    }
    assert comp[5] == comp[1000005] == comp[2000005] == 5
    assert comp[7] == 7  # distinct source: own singleton
    assert 10 not in comp and 1000010 not in comp  # stubs excluded


def test_streaming_neardup_gate_replay_idempotent(spark, tmp_path):
    # r15: the span gate's r14-ADVICE replay discipline applied to the
    # OTHER store-carrying gate.  Lost-commit restart (drain -> rm
    # checkpoint -> drain, same paths): without guard (b) the replay
    # reads its own failed attempt's bands as "already admitted" and
    # suppresses every doc the batch introduced; without (a) it forks
    # a second run dir and partition discovery doubles the output.
    import shutil

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_neardup_gate,
    )

    rng = random.Random(152)
    t1 = _rand(rng, 80)
    b1 = [
        (1, t1),
        (2, t1),  # exact dup: shares every band -> in-batch suppressed
        (3, _rand(rng, 80)),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src) + "/*"
        )
        streaming_neardup_gate(
            stream,
            store_dir=str(tmp_path / "store"),
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )

    drain()
    first = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert first == [1, 3]  # min-id winner + the distinct doc

    shutil.rmtree(tmp_path / "ck")
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3], (
        "replay diverged — the store read leaked the failed "
        "attempt's own bands (every doc would be suppressed)"
    )
    runs = {r["run"] for r in out.select("run").distinct().collect()}
    assert len(runs) == 1, f"replay forked a second run dir: {runs}"


def test_streaming_stateless_gate_replay_no_duplicates(spark, tmp_path):
    # r15: the checkpoint-derived run_id applied family-wide.  The
    # stateless gates keep no store, but a lost-commit restart under a
    # fresh uuid run would leave the failed attempt's out leaf behind
    # and double every admitted row.  Representative: the perplexity
    # gate.
    import shutil

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_perplexity_gate,
    )

    b1 = [
        (1, "the quick brown fox jumps over the lazy dog again and "
            "again the quick brown fox"),
        (2, "zq zq zq xv xv xv qq qq"),  # junk trigrams: high nll
    ]
    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src) + "/*"
        )
        streaming_perplexity_gate(
            stream,
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )

    drain()
    first = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    shutil.rmtree(tmp_path / "ck")
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out.collect()) == first, (
        "replay duplicated rows — run_id must derive from the "
        "checkpoint path so the replay overwrites its own leaf"
    )
    runs = {r["run"] for r in out.select("run").distinct().collect()}
    assert len(runs) == 1


def _variant_wav(src, shift=0):
    from metrics_advisor_spark.functions.multimodal import (
        _wav_variant_bytes,
    )

    return bytearray(_wav_variant_bytes(src, shift))


def test_streaming_audio_gate_cross_batch(spark, tmp_path):
    # 24th surface (staged r15): clips the stream already admitted
    # suppress later re-encodes AND re-levels; stubs pass through
    # untouched and are never stored; within a batch the min-id
    # representative of a Hamming cluster wins.
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_audio_gate,
    )

    schema = "doc_id long, wav binary"
    src_dir = tmp_path / "media"
    src_dir.mkdir()
    # batch 1: clip 5 (fingerprintable), stub 10 (ns=400 < 2 windows)
    b1 = [(5, _variant_wav(5)), (10, _variant_wav(10))]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src_dir / "f1")
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src_dir) + "/*"
        )
        streaming_audio_gate(
            stream,
            store_dir=str(tmp_path / "store"),
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )

    drain()
    got1 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got1 == [5, 10]  # clip admitted; stub passes through

    # batch 2: half-gain re-level of 5 (suppressed cross-batch),
    # exact re-encode of 5 (suppressed), distinct clip 7 + its
    # re-encode 107 (in-batch cluster -> min id 7 wins), and a
    # re-encode of the STUB (stubs are never stored, so it passes)
    b2 = [
        (205, _variant_wav(5, shift=1)),
        (105, _variant_wav(5)),
        (7, _variant_wav(7)),
        (107, _variant_wav(7)),
        (110, _variant_wav(10)),
    ]
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src_dir / "f2")
    )
    drain()
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [5, 7, 10, 110], got


def test_streaming_audio_gate_single_drain_equals_dedup_audio(
    spark, tmp_path
):
    # the batch-twin discipline: ONE availableNow drain over an empty
    # store = Corpus.dedup_audio on the same static frame (stubs pass,
    # min-id representative per cluster) — the r16 oracle's shape.
    from metrics_advisor_spark.functions.corpus_api import Corpus
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_audio_gate,
    )

    rows = [
        (3, _variant_wav(3)),
        (103, _variant_wav(3)),          # exact re-encode of 3
        (203, _variant_wav(3, shift=1)),  # half-gain re-level of 3
        (8, _variant_wav(8)),
        (11, _variant_wav(11)),           # ns=480: stub
    ]
    schema = "doc_id long, wav binary"
    df = spark.createDataFrame(rows, schema)
    want = sorted(
        r["doc_id"] for r in Corpus(df).dedup_audio().df.collect()
    )

    src_dir = tmp_path / "media"
    src_dir.mkdir()
    df.coalesce(1).write.parquet(str(src_dir / "f1"))
    stream = spark.readStream.schema(schema).parquet(
        str(src_dir) + "/*"
    )
    streaming_audio_gate(
        stream,
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
    )
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == want == [3, 8, 11]


def test_streaming_audio_gate_replay_idempotent(spark, tmp_path):
    # replay-safe from day one: lost-commit restart (drain -> rm
    # checkpoint -> drain) must neither suppress the replayed batch's
    # own clips (guard b) nor fork a second run dir (guard a).
    import shutil

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_audio_gate,
    )

    schema = "doc_id long, wav binary"
    src_dir = tmp_path / "media"
    src_dir.mkdir()
    rows = [(5, _variant_wav(5)), (105, _variant_wav(5))]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src_dir / "f1")
    )

    def drain():
        stream = spark.readStream.schema(schema).parquet(
            str(src_dir) + "/*"
        )
        streaming_audio_gate(
            stream,
            store_dir=str(tmp_path / "store"),
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )

    drain()
    first = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert first == [5]
    shutil.rmtree(tmp_path / "ck")
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in out.collect()) == [5], (
        "replay diverged — the store read leaked the failed "
        "attempt's own sketches"
    )
    runs = {r["run"] for r in out.select("run").distinct().collect()}
    assert len(runs) == 1, f"replay forked a second run dir: {runs}"


def test_attach_bmp_variants_and_dedup_images(spark):
    # the image arm of the variant-fixture family: hash-derived
    # pixels (the smooth gradient rule is perceptually degenerate —
    # ids 0 and 1 are dHash-IDENTICAL, measured, so a fixture on it
    # attests nothing).  Pin: byte-identical re-use at noise 0, the
    # measured near-dup distance at src 5 / noise 1152, cross-src
    # separation, and the Corpus.dedup_images min-id rule.
    from metrics_advisor_spark.functions.corpus_api import Corpus
    from metrics_advisor_spark.functions.multimodal import (
        _bmp_variant_bytes,
        attach_bmp_variants,
        image_dhash,
    )

    # builder-verified: src 5's noise-1152 variant sits at dHash
    # distance 4 from clean — inside max_distance=4
    assert _bmp_variant_bytes(5, 0) != _bmp_variant_bytes(5, 1152)

    variants = [
        (5, 5, 0), (1000005, 5, 0), (2000005, 5, 1152),
        (7, 7, 0),
    ]
    df = spark.createDataFrame(
        variants, "doc_id long, src_id long, noise int"
    )
    media = attach_bmp_variants(df)
    raw = {r["doc_id"]: bytes(r["img"]) for r in media.collect()}
    assert raw[5] == raw[1000005]  # exact byte re-use
    assert raw[5] != raw[2000005]

    hs = {
        r["doc_id"]: r["dhash"] for r in image_dhash(media).collect()
    }
    assert hs[5] == hs[1000005]
    d_noise = bin(hs[5] ^ hs[2000005]).count("1")
    assert 1 <= d_noise <= 4, d_noise
    assert bin(hs[5] ^ hs[7]).count("1") > 4  # cross-src separation

    rows = [(d, raw[d]) for d in sorted(raw)]
    corpus = spark.createDataFrame(rows, "doc_id long, img binary")
    kept = sorted(
        r["doc_id"] for r in Corpus(corpus).dedup_images().df.collect()
    )
    assert kept == [5, 7]  # exact AND near copy fold into min-id 5


def test_multimodal_dedup_example_e2e(spark):
    # the whole multimodal story at sf0.001 in ONE test: 40 originals
    # + 8 image-reuse/audio-re-encode rows + 6 audio re-levels;
    # image dedup folds the 8, audio dedup folds the 4 fingerprintable
    # re-levels (srcs 0 and 21 are sub-window stubs -> pass), and the
    # streaming gate admits wave 1 in full plus wave 2's 6 stub rows.
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "multimodal_dedup_pipeline",
        os.path.join(repo, "examples", "multimodal_dedup_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    counts = mod.main("/root/testdata/sf0.001")
    assert counts["media"] == 54
    assert counts["image_dedup"] == 46
    assert counts["audio_dedup"] == 42
    assert counts["stream_admitted"] == 46
    assert counts["stream_admitted_wave2"] == 6


def test_streaming_audio_gate_matches_staged_r16_oracle(
    spark, tmp_path
):
    # the staged r16 contract pairing, validated builder-side (the
    # 4ef3476 discipline): ONE availableNow drain of the audio
    # variant fixture over an empty store must equal the DuckDB
    # analytic oracle = audio_dup_components replay restricted to
    # min-id representatives, UNION the sub-window stubs.  Validated
    # EXACT at sf0.01 (565 = 565) at stage time; this test pins the
    # same equality at sf0.001 permanently.
    import duckdb

    import __spark_entry__ as em
    from metrics_advisor_spark.functions.multimodal import (
        attach_wav_variants,
    )
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_audio_gate,
    )

    sf = "/root/testdata/sf0.001"
    media = attach_wav_variants(em._audio_variants(spark, sf))
    src = str(tmp_path / "media")
    media.coalesce(2).write.parquet(src)
    streaming_audio_gate(
        spark.readStream.schema("doc_id long, wav binary").parquet(
            src
        ),
        store_dir=str(tmp_path / "store"),
        out_dir=str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ck"),
    )
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("doc_id")
        .collect()
    )

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    audio_cte = em.oracle_sql()["audio_dup_components"]
    want = [
        r[0]
        for r in con.execute(
            f"""
            WITH comp_out AS ({audio_cte}),
            stubs AS (
              SELECT doc_id FROM (
                SELECT doc_id, 400 + (src % 10) * 80 AS ns FROM (
                  SELECT doc_id, doc_id AS src FROM documents
                  UNION ALL
                  SELECT doc_id + 1000000, doc_id FROM documents
                  WHERE doc_id % 5 = 0
                  UNION ALL
                  SELECT doc_id + 2000000, doc_id FROM documents
                  WHERE doc_id % 7 = 0
                )
              ) WHERE ns // 256 < 2
            )
            SELECT doc_id FROM comp_out WHERE doc_id = component
            UNION ALL
            SELECT doc_id FROM stubs
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want
    assert len(got) > 0


_URL_DUP_ORACLE = """
    WITH u AS (
      SELECT doc_id,
             'https://example.org/p' || doc_id AS canonical
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             'https://example.org/p' || doc_id
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 2000000,
             'https://example.org/p' || doc_id
      FROM documents WHERE doc_id % 4 = 0
    )
    SELECT canonical, count(*) AS n_docs, min(doc_id) AS min_doc_id
    FROM u GROUP BY canonical HAVING count(*) > 1
    ORDER BY canonical
"""


def test_url_dup_groups_matches_staged_r16_oracle(spark):
    # staged r16 pairing (the 4ef3476 discipline): q_url_dup_groups
    # vs the analytic oracle — every fixture branch canonicalizes to
    # 'https://example.org/p{doc}', so the dup groups are one GROUP
    # BY over the modular rules.  Validated exact builder-side at
    # sf0.01; pinned here at sf0.001 permanently.  Register both at
    # r16 open.
    import duckdb

    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["canonical"], r["n_docs"], r["min_doc_id"])
        for r in em.q_url_dup_groups(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        (c, n, m)
        for c, n, m in con.execute(_URL_DUP_ORACLE).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_kmeans_outliers_second_engine_flag_agreement(spark):
    # VERDICT r14 item 6's discipline extended to the LAST
    # un-attested rows-only query: `kmeans_outliers` cannot be
    # DuckDB-oracled (MLlib's fit is not SQL), so attest the
    # CAPABILITY with a second engine — an independent pure-numpy
    # pipeline (same (value, d1, d2) features, same per-metric
    # standardization, its OWN Lloyd k-means from a different init,
    # same mu+3*sigma / tiny-cluster flag rules).  Centroids differ
    # between engines; on well-separated data the FLAG SET must not.
    import numpy as np

    from pyspark.sql import functions as F

    from metrics_advisor_spark.operators.mllib_detect import (
        detect_outliers_kmeans,
    )

    rng = np.random.default_rng(42)
    rows = []
    planted = set()
    for metric in ("m0", "m1"):
        base = 100.0 if metric == "m0" else 5.0
        vals = base + np.cumsum(rng.normal(0, 0.05, 240))
        jumps = {60, 150} if metric == "m0" else {200}
        for i in range(240):
            v = float(vals[i]) + (80.0 * base if i in jumps else 0.0)
            rows.append((metric, "s", i * 60, v))
            if i in jumps:
                planted.add((metric, i * 60))
    df = spark.createDataFrame(
        rows, "metric string, series string, epoch long, value double"
    ).select(
        "metric", "series",
        F.timestamp_seconds("epoch").alias("ts"), "value",
    )

    got = {
        (r["metric"], int(r["ts"].timestamp()))
        for r in detect_outliers_kmeans(df, n_clusters=6).collect()
    }

    # ---- independent engine: numpy features + own Lloyd ----
    feats, keys = [], []
    for metric in ("m0", "m1"):
        sub = sorted(
            (e, v) for m, s, e, v in rows if m == metric
        )
        v = np.array([x[1] for x in sub])
        d1 = np.diff(v, prepend=v[0])  # first diff = 0
        d2 = np.diff(d1, prepend=d1[0])
        d2[0] = 0.0
        f = np.stack([v, d1, d2], axis=1)
        mu, sd = f.mean(axis=0), f.std(axis=0) + 1e-12
        feats.append((f - mu) / sd)
        keys.extend((metric, e) for e, _ in sub)
    X = np.concatenate(feats)
    # Lloyd from a deterministic spread init (different from MLlib's)
    centers = X[np.linspace(0, len(X) - 1, 6).astype(int)].copy()
    for _ in range(50):
        dist = ((X[:, None, :] - centers[None]) ** 2).sum(axis=2)
        cell = dist.argmin(axis=1)
        for c in range(6):
            if (cell == c).any():
                centers[c] = X[cell == c].mean(axis=0)
    dist = np.sqrt(
        ((X - centers[cell]) ** 2).sum(axis=1)
    )
    mu_d, sd_d = dist.mean(), dist.std()
    sizes = np.bincount(cell, minlength=6)
    flagged = (dist > mu_d + 3.0 * sd_d) | (
        sizes[cell] < 0.01 * len(X)
    )
    want = {keys[i] for i in np.where(flagged)[0]}

    assert got == want, (
        f"engines disagree: only-mllib={sorted(got - want)[:5]} "
        f"only-numpy={sorted(want - got)[:5]}"
    )
    # and both found exactly the planted jump discontinuities (each
    # jump perturbs value at i and the deltas at i/i+1 — the flagged
    # set must cover every planted instant)
    assert planted <= got
