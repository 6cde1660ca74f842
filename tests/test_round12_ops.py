"""Round-12 additions: ISO-BMFF (MP4) container metadata (VERDICT r11
item 5) — parse round-trip, dispatch, and the rejection matrix — plus
the positional_xcorr contract query's operator-level invariants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from metrics_advisor_spark.functions.multimodal import (
    _mp4_bytes,
    _mp4_dims,
    _mp4_n_frames,
    _mp4_sample_size,
    _parse_mp4_meta,
)


def test_mp4_roundtrip_analytic():
    for did in range(0, 40):
        p = _mp4_bytes(did)
        w, h, nf, dur, codec = _parse_mp4_meta(did, p)
        ew, eh = _mp4_dims(did)
        enf = _mp4_n_frames(did)
        assert (w, h, nf, dur, codec) == (ew, eh, enf, enf * 40, "avc1")
        # the oracle's analytic byte size: 614 + nf·(sample_size + 4)
        assert len(p) == 614 + enf * (_mp4_sample_size(did) + 4)


def test_mp4_moov_after_mdat_is_default_layout():
    """The fixture writes moov LAST (progressive-upload layout); the
    parser must scan top-level boxes, not assume moov-first."""
    p = _mp4_bytes(7)
    assert p[4:8] == b"ftyp"
    mdat_at = p.find(b"mdat")
    moov_at = p.find(b"moov")
    assert 0 < mdat_at < moov_at


def test_mp4_moov_first_also_parses():
    """Reordering the top-level boxes (fast-start layout) must parse
    identically — stco offsets are not validated against mdat, only
    the metadata tree is walked."""
    p = _mp4_bytes(11)
    (ftyp_sz,) = struct.unpack(">I", p[0:4])
    ftyp, rest = p[:ftyp_sz], p[ftyp_sz:]
    (mdat_sz,) = struct.unpack(">I", rest[0:4])
    mdat, moov = rest[:mdat_sz], rest[mdat_sz:]
    assert _parse_mp4_meta(11, ftyp + moov + mdat) == _parse_mp4_meta(11, p)


def test_mp4_rejection_matrix():
    p = _mp4_bytes(5)
    # (1) not ISO-BMFF at all
    with pytest.raises(ValueError, match="no leading ftyp"):
        _parse_mp4_meta(5, b"\x00" * 32)
    # (2) ftyp-only stream (metadata-stripped)
    (ftyp_sz,) = struct.unpack(">I", p[0:4])
    with pytest.raises(ValueError, match="no moov"):
        _parse_mp4_meta(5, p[:ftyp_sz])
    # (3) truncated mid-box: the final moov loses its tail
    with pytest.raises(ValueError, match="escaping its enclosing"):
        _parse_mp4_meta(5, p[:-20])
    # (4) a box whose declared size escapes its parent
    bad = bytearray(p)
    moov_at = p.find(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(p) + 64)
    with pytest.raises(ValueError, match="escaping its enclosing"):
        _parse_mp4_meta(5, bytes(bad))
    # (5) no video track: flip the hdlr handler to 'soun'
    bad = bytearray(p)
    h_at = p.find(b"hdlr")
    assert p[h_at + 12 : h_at + 16] == b"vide"
    bad[h_at + 12 : h_at + 16] = b"soun"
    with pytest.raises(ValueError, match="no video"):
        _parse_mp4_meta(5, bytes(bad))
    # (6) zero mvhd timescale
    bad = bytearray(p)
    m_at = p.find(b"mvhd")
    struct.pack_into(">I", bad, m_at + 16, 0)  # body+12 (v0 timescale)
    with pytest.raises(ValueError, match="timescale"):
        _parse_mp4_meta(5, bytes(bad))


def test_mp4_dispatch_and_frame_decode_rejection(spark):
    """extract_media_meta types MP4 payloads off the ftyp magic;
    frame EXTRACTION on a compressed container stays a loud error
    (the documented deployment codec swap)."""
    from metrics_advisor_spark.functions.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    p = _mp4_bytes(9)
    media = spark.createDataFrame(
        [(9, "video", bytearray(p))],
        "doc_id long, media_type string, payload binary",
    )
    row = extract_media_meta(media).collect()[0]
    assert row["media_type"] == "video/mp4"
    w, h = _mp4_dims(9)
    assert (row["width"], row["height"]) == (w, h)
    assert row["n_frames"] == _mp4_n_frames(9)
    assert row["duration_ms"] == _mp4_n_frames(9) * 40
    assert row["n_bytes"] == len(p)

    with pytest.raises(Exception, match="RIFF/AVI"):
        sample_frames(media, every_ms=100).collect()


def test_positional_xcorr_bucket_arithmetic(spark):
    """The positional bucket rule (pos // 40, reference
    metrics_advisor.py:186-187 parity): a candidate aligned at lag 0
    correlates 1.0 within every full bucket, and a pair straddling a
    bucket boundary never joins across it."""
    from metrics_advisor_spark.operators.xcorr import (
        positional_correlation,
    )

    n = 100
    rows = [(float(i), "m", "all", float(i % 7)) for i in range(n)]
    obj = spark.createDataFrame(
        rows, "ts double, metric string, series string, value double"
    )
    cand = spark.createDataFrame(
        [(float(i), "c", "all", 2.0 * (i % 7) + 1) for i in range(n)],
        "ts double, metric string, series string, value double",
    )
    out = positional_correlation(
        obj, cand, count_bucket=40, lag_max=0, min_pairs=2
    ).collect()
    got = {r["bucket_id"]: (r["corr"], r["n_pairs"]) for r in out}
    assert set(got) == {0, 1, 2}
    assert got[0][1] == 40 and got[1][1] == 40 and got[2][1] == 20
    for corr, _ in got.values():
        assert corr == pytest.approx(1.0)
