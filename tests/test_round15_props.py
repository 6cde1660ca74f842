"""Round-15 deep-fuzz (VERDICT r14 item 7): streaming_span_gate batch
boundaries and frontier_schedule's try_parse_url arm.

- Gate batch-boundary fuzz: randomized corpora drained under
  RANDOMIZED batch splits (1–3 batches, runs crossing batch
  boundaries, periodic all-same-char runs where ONE window key
  recurs at many offsets in one doc — the seen-key store's stress
  case) compared exactly against the shared independent Python
  reference model (tests/_span_gate_model.py).
- Adversarial URL corpus: the single-pass frontier plan over every
  malformed-URL shape that used to kill (Spark-4 ANSI parse_url
  throw) or skew (NULL-host straggler) the plan — exactly-once row
  membership, dense per-host waves, NULL for the junk.
"""

from __future__ import annotations

import random
import string
import time

import pytest

from _span_gate_model import reference_gate


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_span_gate_randomized_batch_boundaries(spark, tmp_path, seed):
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_span_gate,
    )

    rng = random.Random(seed)
    alpha = string.ascii_lowercase + " "

    def rand(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    # shared runs incl. a PERIODIC one: every 64-char window of an
    # all-'z' run is the same text, so a single store key recurs at
    # dozens of offsets within one doc — keep-first must keep exactly
    # the (doc, off)-first window and islands must merge the rest
    runs = [rand(90), rand(130), "z" * (80 + rng.randrange(60))]
    docs = []
    for doc_id in range(1, 13):
        t = rand(rng.randrange(0, 60))
        for r in rng.sample(runs, rng.randrange(0, 3)):
            t += r + rand(rng.randrange(10, 50))
        docs.append((doc_id, t))
    # randomized batch split: 1..3 batches, contiguous doc ranges (so
    # runs planted across the cut points genuinely cross batches)
    n_batches = rng.randrange(1, 4)
    cuts = sorted(rng.sample(range(1, len(docs)), n_batches - 1))
    batches = [
        docs[a:b]
        for a, b in zip([0, *cuts], [*cuts, len(docs)])
        if docs[a:b]
    ]

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
        if len(batches) > 1:
            time.sleep(1.1)  # distinct mtimes pin batch order
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
    assert got == reference_gate(batches), (
        f"seed={seed} batching={[len(b) for b in batches]}"
    )
    # the fixture must have real cross-batch or within-batch work
    assert any(got[d] != t for d, t in docs)


_ADVERSARIAL_URLS = [
    "",                                   # empty
    " ",                                  # whitespace only
    "http://",                            # scheme, no host
    "https://:8080/path",                 # port, no host
    "not a url at all",
    "::::",
    "http://exa mple.org/x",              # space inside authority
    "https://h0.example.org/ok1",
    "https://h0.example.org/ok2",
    "HTTPS://H0.EXAMPLE.ORG/UPPER",       # case-folds to same host
    "https://user:pw@h1.example.org/a",   # userinfo
    "https://h1.example.org:8443/b",      # explicit port
    "http://[2001:db8::1]/v6",            # IPv6 literal
    "ftp://h2.example.org/f",             # non-http scheme, real host
    "javascript:alert(1)",
    "mailto:a@example.org",
    "/relative/path/only",
    "https://h0.example.org/%zz",         # bad percent-escape
    "http://h3.example.org/\ttab",        # control char in path
    "https://ünïcode.example.org/x",      # non-ASCII host
    "x" * 4000,                           # absurdly long junk
    "https://h0.example.org/" + "y" * 2000,  # long but valid
]


def test_frontier_schedule_adversarial_corpus(spark):
    # one junk row used to kill the whole plan (Spark 4 ANSI
    # parse_url THROW); a million of them used to pile into one
    # NULL-host window partition; the split used to double-scan.
    # Assert: no crash, every input row exactly once, dense per-host
    # FIFO waves for the parseable rows, NULL wave for the rest.
    from collections import Counter

    from metrics_advisor_spark.functions.url import frontier_schedule

    df = spark.createDataFrame(
        [(u,) for u in _ADVERSARIAL_URLS], "canonical string"
    )
    rows = frontier_schedule(df).collect()
    # exactly-once membership (the r14 double-scan hazard)
    assert Counter(r["canonical"] for r in rows) == Counter(
        _ADVERSARIAL_URLS
    )
    by_host: dict = {}
    for r in rows:
        if r["wave"] is not None:
            assert r["host"], f"wave without host: {r}"
            by_host.setdefault(r["host"], []).append(r)
        else:
            assert r["fetch_offset_sec"] is None
    # every hosted group is a dense FIFO 0..n-1 in canonical order
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["canonical"])
        assert [r["wave"] for r in rs] == list(range(len(rs))), host
    # the shapes that must be fetchable did land in a host group
    hosts = set(by_host)
    assert "h0.example.org" in hosts
    assert "h1.example.org" in hosts or any(
        "h1.example.org" in h for h in hosts
    )
    # and the junk really was junk (some NULL-wave rows exist)
    assert sum(1 for r in rows if r["wave"] is None) >= 5


def test_wav_variant_rule_property():
    # the r15 audio-dedup fixture's waveform rule, attested by an
    # INDEPENDENT implementation path: `_wav_variant_bytes` builds
    # samples via a big-endian uint16 view of the md5 digest (the
    # vectorized form); the reference here parses the HEXDIGEST
    # string 4 chars at a time — the rule as the oracle SQL states
    # it.  25 random (src, shift) pairs, every sample compared, plus
    # header sanity (canonical 44-byte RIFF, n_samples law).
    import hashlib
    import random
    import struct

    from metrics_advisor_spark.functions.multimodal import (
        _wav_variant_bytes,
    )

    rng = random.Random(1555)
    for _ in range(25):
        src = rng.randrange(0, 10_000_000)
        shift = rng.choice([0, 0, 1, 2, 3])
        payload = _wav_variant_bytes(src, shift)
        n = 400 + (src % 10) * 80
        assert payload[:4] == b"RIFF" and payload[36:40] == b"data"
        (dlen,) = struct.unpack("<I", payload[40:44])
        assert dlen == 2 * n
        got = struct.unpack("<%dh" % n, payload[44:44 + 2 * n])
        for i in range(n):
            hx = hashlib.md5(f"{src}:{i // 8}".encode()).hexdigest()
            k = (i % 8) * 4
            want = (int(hx[k:k + 4], 16) - 32768) >> shift
            assert got[i] == want, (src, shift, i)


def _audio_ref_model(batches, max_distance=4):
    """Independent arrival-order replay of streaming_audio_gate's
    semantics: per batch, drop clips within Hamming<=d of any stored
    admitted sketch, then union-find the remainder on <=d and admit
    each component's min id (+ stubs, never stored)."""
    import hashlib

    import numpy as np

    def fp56(src, shift):
        n = 400 + (src % 10) * 80
        buf = b"".join(
            hashlib.md5(f"{src}:{b}".encode()).digest()
            for b in range((n + 7) // 8)
        )
        s = (
            np.frombuffer(buf[: 2 * n], dtype=">u2").astype(np.int64)
            - 32768
        ) >> shift
        nw = s.size // 256
        if nw < 2:
            return None
        e = (s[: nw * 256] ** 2).reshape(nw, 16, 16).sum(axis=2)
        bits = e[1:] > e[:-1]
        w = 1 << np.arange(15, -1, -1, dtype=np.int64)
        votes = np.zeros(56, dtype=np.int64)
        for c in (bits * w).sum(axis=1):
            h = int(
                hashlib.md5(str(int(c)).encode()).hexdigest()[:14], 16
            )
            for b in range(56):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(56) if votes[b] > 0)

    store = []
    admitted = []
    for batch in batches:
        sk = {}
        for doc, src, shift in batch:
            f = fp56(src, shift)
            if f is None:
                admitted.append(doc)  # stub: pass, never stored
            else:
                sk[doc] = f
        fresh = {
            d: f
            for d, f in sk.items()
            if not any(
                bin(f ^ s).count("1") <= max_distance for s in store
            )
        }
        ids = sorted(fresh)
        parent = {d: d for d in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                da, db = find(a), find(b)
                if da != db and bin(
                    fresh[a] ^ fresh[b]
                ).count("1") <= max_distance:
                    parent[max(da, db)] = min(da, db)
        reps = [d for d in ids if find(d) == d]
        admitted.extend(reps)
        store.extend(fresh[d] for d in reps)
    return sorted(admitted)


@pytest.mark.parametrize("seed", [404, 505])
def test_audio_gate_randomized_batch_boundaries(spark, tmp_path, seed):
    # the span-gate fuzz discipline on the audio gate: a randomized
    # variant population (re-encodes, re-levels at several shifts,
    # stubs) split across random batch boundaries must equal the
    # independent Python replay of the arrival-order semantics.
    from metrics_advisor_spark.functions.multimodal import (
        _wav_variant_bytes,
    )
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_audio_gate,
    )

    rng = random.Random(seed)
    rows = []
    doc = 0
    for src in rng.sample(range(1000), 12):
        rows.append((doc, src, 0))
        doc += 1
        for _ in range(rng.randrange(0, 3)):
            rows.append((doc, src, rng.choice([0, 1, 2])))
            doc += 1
    rng.shuffle(rows)
    cut1 = rng.randrange(1, len(rows) - 1)
    cut2 = rng.randrange(cut1 + 1, len(rows))
    batches = [rows[:cut1], rows[cut1:cut2], rows[cut2:]]
    batches = [b for b in batches if b]
    want = _audio_ref_model(batches)

    src_dir = tmp_path / "media"
    src_dir.mkdir()
    schema = "doc_id long, wav binary"
    for i, b in enumerate(batches):
        pay = [
            (d, bytearray(_wav_variant_bytes(s, sh)))
            for d, s, sh in b
        ]
        spark.createDataFrame(pay, schema).coalesce(1).write.parquet(
            str(src_dir / f"f{i}")
        )
        streaming_audio_gate(
            spark.readStream.schema(schema).parquet(
                str(src_dir) + "/*"
            ),
            store_dir=str(tmp_path / "store"),
            out_dir=str(tmp_path / "out"),
            checkpoint=str(tmp_path / "ck"),
        )
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == want
