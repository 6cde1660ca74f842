"""Property-based tests for the round-12 crawl/codec additions.  All
pure python/numpy — no Spark session — so hypothesis can afford real
example counts.

- GIF LZW: random index streams at every minimum code size round-trip
  bit-exactly through encode→decode, including streams long enough to
  saturate the 4096-entry table (mid-stream CLEAR + reset).
- GIF container: random rasters, palettes, interlace flags and frame
  splits round-trip through `encode_gif` → `gif_frames`.
- exp-Golomb: every (ue, se) sequence round-trips; the encoder is
  prefix-free (decoding consumes exactly what was written).
- SPS: random even dims round-trip through encode_sps → parse_sps
  (cropping arithmetic exact in both directions).
- WARC: random record payloads (including CRLF-rich bodies and binary
  bytes) round-trip through the record walk, plain and gzip'd.
- URL canonicalization is IDEMPOTENT: canonical(canonical(u)) ==
  canonical(u) over generated messy URLs.
- MP3: every (kbps, rate, frame-count) grid point round-trips and the
  analytic length law holds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

PROP = settings(max_examples=30, deadline=None)


@PROP
@given(
    st.integers(2, 8),
    st.integers(1, 6000),
    st.randoms(use_true_random=False),
)
def test_lzw_roundtrip_prop(mcs, n, rnd):
    from metrics_advisor_spark.functions.gif import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(rnd.randrange(2**32))
    # mix uniform noise with repeated runs (dictionary stress)
    base = rng.integers(0, 1 << mcs, n).astype(np.uint8)
    if n > 10:
        base[n // 4: n // 2] = base[0]
    out = _lzw_decode(_lzw_encode(base, mcs), mcs, n)
    assert (out == base).all()


@PROP
@given(
    st.integers(1, 24), st.integers(1, 24),
    st.integers(1, 3), st.booleans(),
    st.randoms(use_true_random=False),
)
def test_gif_container_roundtrip_prop(w, h, nf, interlace, rnd):
    from metrics_advisor_spark.functions.gif import (
        encode_gif,
        gif_frames,
        gif_meta,
    )

    rng = np.random.default_rng(rnd.randrange(2**32))
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    frames = [
        (30, rng.integers(0, 16, (h, w)).astype(np.uint8))
        for _ in range(nf)
    ]
    payload = encode_gif(frames, pal, interlace=interlace)
    assert gif_meta(payload) == (w, h, nf, nf * 30)
    got = gif_frames(payload)
    assert len(got) == nf
    # disposal=1 (leave): frame k composites over frame k-1, but each
    # frame covers the full screen, so every composited frame equals
    # its own source
    for (_, arr), (_, idx) in zip(got, frames):
        assert (arr == pal[idx]).all()


@PROP
@given(st.lists(st.integers(0, 100_000), min_size=1, max_size=40),
       st.lists(st.integers(-50_000, 50_000), min_size=1, max_size=40))
def test_exp_golomb_roundtrip_prop(ues, ses):
    from metrics_advisor_spark.functions.h264 import (
        _BitReader,
        _BitWriter,
    )

    w = _BitWriter()
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    marker = 0b101101  # written after the payload; must survive
    w.u(marker, 6)
    r = _BitReader(w.rbsp())
    assert [r.ue() for _ in ues] == ues
    assert [r.se() for _ in ses] == ses
    assert r.u(6) == marker  # prefix-freeness: nothing over/under-read


@PROP
@given(st.integers(1, 250), st.integers(1, 135))
def test_sps_dims_roundtrip_prop(w2, h2):
    from metrics_advisor_spark.functions.h264 import (
        encode_sps,
        parse_sps,
    )

    w, h = w2 * 2, h2 * 2  # 4:2:0 cropping moves in 2-px units
    out = parse_sps(encode_sps(w, h))
    assert (out["width"], out["height"]) == (w, h)


@PROP
@given(
    st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=8
    ),
    st.booleans(),
)
def test_warc_record_walk_prop(payloads, gz):
    import gzip as _gzip

    from metrics_advisor_spark.sources.warc import (
        _warc_record,
        iter_warc_records,
    )

    recs = [
        _warc_record("metadata", f"urn:p{i}", "2026-01-01T00:00:00Z",
                     f"<urn:uuid:{i}>", p)
        for i, p in enumerate(payloads)
    ]
    stream = b"".join(recs)
    if gz:
        stream = b"".join(
            _gzip.compress(r, compresslevel=1, mtime=0) for r in recs
        )
    got = list(iter_warc_records(stream))
    assert [p for _, p in got] == payloads
    assert [h["warc-target-uri"] for h, _ in got] == [
        f"urn:p{i}" for i in range(len(payloads))
    ]


_URL_SEG = st.text(
    alphabet="abcXYZ019-._~%25", min_size=0, max_size=6
)


@PROP
@given(
    st.sampled_from(["http", "HTTPS", "FTP"]),
    st.sampled_from(["E.org", "ex.AMPLE.com", "host"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(_URL_SEG, min_size=0, max_size=4),
    st.lists(st.tuples(_URL_SEG, _URL_SEG), min_size=0, max_size=3),
    st.booleans(),
)
def test_url_canonical_idempotent_prop(scheme, host, port, segs, qs,
                                       strip):
    from metrics_advisor_spark.functions.url import canonicalize_url

    url = f"{scheme}://{host}{port}/" + "/".join(segs)
    if qs:
        url += "?" + "&".join(f"{k}={v}" for k, v in qs)
    url += "#frag"
    c1 = canonicalize_url(url, strip_tracking=strip)
    assert canonicalize_url(c1, strip_tracking=strip) == c1


@PROP
@given(st.sampled_from([32, 64, 128, 192, 256, 320]),
       st.sampled_from([44100, 48000, 32000]),
       st.integers(1, 20))
def test_mp3_roundtrip_prop(kbps, sr, nf):
    from metrics_advisor_spark.functions.mp3 import encode_mp3, mp3_meta

    p = encode_mp3(nf, kbps=kbps, sample_rate=sr)
    got_sr, got_kbps, got_nf, dur, _ = mp3_meta(p)
    assert (got_sr, got_kbps, got_nf) == (sr, kbps, nf)
    assert len(p) == nf * (144000 * kbps // sr)
    assert dur == nf * 1152 * 1000 // sr
