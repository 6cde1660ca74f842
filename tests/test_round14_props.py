"""Round-14 property tests: the winnowed duplicate-span family and
the frontier scheduler.

Pure-Python hypothesis properties (no Spark — real example counts):

- winnowing COVERAGE: every full window of `stride` consecutive hash
  positions contains at least one selected position (the density half
  of the detection guarantee).
- winnowing ALIGNMENT INVARIANCE (the ADVICE r13 contract): a random
  non-periodic run of length >= min_len + stride - 1 planted behind
  two DIFFERENT random paddings (arbitrary residues mod stride)
  selects at least one common in-run relative offset in both docs —
  i.e. the duplicated run always shares a window key, any alignment.

Spark-based composition checks (seeded, single cases — the Spark
session is too slow for hypothesis loops):

- scrub idempotence (VERDICT r13 item 5): scrubbing twice == once on
  a corpus with planted duplicated runs carrying MULTI-BYTE chars
  (CJK, emoji, combining marks) at different residues mod stride.
- stage composition: scrub_exact_substrings -> pii_scrub leaves
  unique text intact, removes duplicated material and scrubs PII
  embedded in the surviving text without char corruption (offsets
  are codepoint-based on both the numpy and splice sides).
- frontier_schedule: per-host waves are exactly 0..n_h-1 in canonical
  order and offsets are wave x delay with the default fallback.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

PROP = settings(max_examples=25, deadline=None)


def _offsets(text: str, min_len: int = 64, stride: int = 16):
    from metrics_advisor_spark.functions.dedup import (
        _SPAN_ANCHOR_CHARS,
        _SPAN_HASH_BASE,
        _SPAN_HASH_MOD,
        _winnow_offsets,
    )

    a = min(_SPAN_ANCHOR_CHARS, min_len)
    pows = [
        pow(_SPAN_HASH_BASE, a - 1 - j, _SPAN_HASH_MOD)
        for j in range(a)
    ]
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    return _winnow_offsets(cp, min_len, stride, pows)


_TXT = st.text(
    alphabet=string.ascii_lowercase + " 0123456789",
    min_size=64, max_size=400,
)


@PROP
@given(_TXT)
def test_winnow_coverage_prop(text):
    # at least one selection in EVERY full window of `stride`
    # consecutive hash positions — the density half of the guarantee
    min_len, stride = 64, 16
    sel = set(int(x) for x in _offsets(text, min_len, stride))
    m = len(text) - min_len + 1
    assert sel, "non-empty selection for len >= min_len"
    if m <= stride:
        assert len(sel) >= 1
        return
    for j in range(0, m - stride + 1):
        assert any(j <= i <= j + stride - 1 for i in sel), (j, sel)


@PROP
@given(
    st.integers(0, 2 ** 31 - 1),
    st.integers(0, 97),
    st.integers(0, 97),
    st.integers(79, 200),
)
def test_winnow_alignment_invariance_prop(seed, pad_a, pad_b, run_len):
    # the ADVICE r13 repro, generalized: a shared non-periodic run at
    # ARBITRARY offsets (any residues mod stride) must select at
    # least one common relative offset whose full min_len window lies
    # inside the run — that shared window key IS the detection
    min_len, stride = 64, 16
    rng = random.Random(seed)
    alpha = string.ascii_lowercase + "0123456789"
    run = "".join(rng.choice(alpha) for _ in range(run_len))
    ctx_a = "".join(rng.choice(alpha) for _ in range(pad_a))
    ctx_b = "".join(rng.choice(alpha) for _ in range(pad_b))
    tail_a = "".join(rng.choice(alpha) for _ in range(50))
    tail_b = "".join(rng.choice(alpha) for _ in range(50))
    doc_a = ctx_a + run + tail_a
    doc_b = ctx_b + run + tail_b
    sel_a = {int(i) - pad_a for i in _offsets(doc_a, min_len, stride)}
    sel_b = {int(i) - pad_b for i in _offsets(doc_b, min_len, stride)}
    in_run = {
        r for r in (sel_a & sel_b) if 0 <= r <= run_len - min_len
    }
    assert in_run, (pad_a % stride, pad_b % stride, sel_a, sel_b)
    # and the shared window keys are literally equal text
    r = min(in_run)
    assert (doc_a[pad_a + r:pad_a + r + min_len]
            == doc_b[pad_b + r:pad_b + r + min_len])


def _mb_corpus(spark):
    # duplicated runs carrying CJK + emoji + combining marks, planted
    # at different residues mod stride; unique docs around them
    rng = random.Random(99)
    alpha = string.ascii_lowercase + " "

    def rand(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    shared = (
        "数据管理系统在大规模分布式环境中的一致性保证机制研究 "
        "étoile🌍 " + rand(48)
    )
    assert len(shared) >= 64 + 16 - 1
    rows = [
        (1, rand(103) + shared + rand(60)),
        (2, rand(37) + shared + rand(90)),
        (3, rand(200)),
        (4, rand(81) + shared + rand(20) + "PII x@example.org end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_scrub_idempotent_multibyte(spark):
    from metrics_advisor_spark.functions.dedup import (
        scrub_duplicate_spans,
    )

    df, rows = _mb_corpus(spark)
    once = scrub_duplicate_spans(df, min_len=64, stride=16)
    got1 = {r["doc_id"]: r["text"] for r in once.collect()}
    twice = scrub_duplicate_spans(
        spark.createDataFrame(
            [(k, v) for k, v in got1.items()],
            "doc_id long, text string",
        ),
        min_len=64, stride=16,
    )
    got2 = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert got1 == got2
    # the multi-byte interior is gone from every planted doc, the
    # unique doc is untouched
    core = "一致性保证机制"
    for k in (1, 2, 4):
        assert core not in got1[k]
    assert got1[3] == rows[2][1]


def test_scrub_composes_with_pii_scrub(spark):
    from metrics_advisor_spark.functions.corpus_api import Corpus
    from metrics_advisor_spark.functions.curation import pii_scrub

    df, rows = _mb_corpus(spark)
    out = pii_scrub(
        Corpus(df).scrub_exact_substrings(min_len=64, stride=16).df
    )
    got = {r["doc_id"]: r["redacted_text"] for r in out.collect()}
    assert "x@example.org" not in got[4]  # PII scrubbed post-splice
    assert "一致性保证" not in got[4]      # dup span scrubbed
    assert got[3] == rows[2][1]           # unique doc byte-identical
    # no char corruption anywhere: every output decodes/encodes cleanly
    for t in got.values():
        assert t == t.encode("utf-8").decode("utf-8")


def test_frontier_schedule_waves(spark):
    import pyspark.sql.functions as F

    from metrics_advisor_spark.functions.url import frontier_schedule

    rows = [
        (i, f"https://h{i % 3}.example.org/p/{i:03d}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, canonical string")
    delays = spark.createDataFrame(
        [("h1.example.org", 2.5)], "host string, delay_sec double"
    )
    got = frontier_schedule(df, delays=delays).collect()
    by_host: dict[str, list] = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["canonical"])
        assert [r["wave"] for r in rs] == list(range(len(rs)))
        delay = 2.5 if host == "h1.example.org" else 1.0
        for r in rs:
            assert r["fetch_offset_sec"] == r["wave"] * delay


@PROP
@given(
    st.integers(0, 2 ** 31 - 1),
    st.integers(1, 7),
    st.integers(2, 9),
)
def test_audio_fingerprint_gain_invariance_prop(seed, gain, nwin):
    # pure-python replay of the per-window code under arbitrary
    # positive gain: delta-sign bits over integer block energies are
    # gain-invariant as long as no sample clips
    import numpy as np

    rng = random.Random(seed)
    window, n_bands = 64, 8
    n = window * nwin
    base = np.array(
        [rng.randrange(-4000, 4000) for _ in range(n)], dtype=np.int64
    )
    scaled = base * gain  # |scaled| <= 28000 < 32768: no clipping

    def codes(s):
        nw = s.size // window
        e = (s[: nw * window] ** 2).reshape(
            nw, n_bands, window // n_bands
        ).sum(axis=2)
        bits = e[1:] > e[:-1]
        w = 1 << np.arange(n_bands - 1, -1, -1, dtype=np.int64)
        return [int(c) for c in (bits * w).sum(axis=1)]

    assert codes(base) == codes(scaled)
