"""MP3 triage (`functions/mp3.py`): frame-walk roundtrips across the
bitrate/samplerate grid, ID3v2 tag arithmetic, and the rejection
matrix (bad sync, reserved indices, truncation, mid-stream header
changes, MPEG-2)."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.mp3 import (
    _id3v2_size,
    encode_mp3,
    mp3_meta,
)


@pytest.mark.parametrize("kbps", [32, 128, 192, 320])
@pytest.mark.parametrize("sr", [44100, 48000, 32000])
def test_roundtrip_grid(kbps, sr):
    nf = 7
    p = encode_mp3(nf, kbps=kbps, sample_rate=sr)
    got_sr, got_kbps, got_nf, dur, has_id3 = mp3_meta(p)
    assert (got_sr, got_kbps, got_nf) == (sr, kbps, nf)
    assert dur == nf * 1152 * 1000 // sr
    assert not has_id3
    # analytic size: nf frames of floor(144000·kbps/sr) bytes
    assert len(p) == nf * (144000 * kbps // sr)


def test_id3v2_tag():
    body = b"TIT2\x00\x00\x00\x05\x00\x00\x00Hello"
    p = encode_mp3(3, id3_body=body)
    assert _id3v2_size(p) == 10 + len(body)
    sr, kbps, nf, dur, has_id3 = mp3_meta(p)
    assert (nf, has_id3) == (3, True)
    # syncsafe size: a body over 127 bytes exercises the 7-bit limbs
    big = bytes(200)
    p2 = encode_mp3(2, id3_body=big)
    assert _id3v2_size(p2) == 210
    assert mp3_meta(p2)[2] == 2


def _id3v24_tag(body: bytes, flags: int) -> bytes:
    size = len(body)
    tag = b"ID3" + bytes([4, 0, flags]) + bytes([
        (size >> 21) & 0x7F, (size >> 14) & 0x7F,
        (size >> 7) & 0x7F, size & 0x7F,
    ]) + body
    if flags & 0x10:
        tag += b"3DI" + tag[3:10]  # footer mirrors the header
    return tag


def test_id3v24_footer_flag():
    # ADVICE r12: the ID3v2.4 footer flag (0x10) adds 10 bytes AFTER
    # the size-counted body; ignoring it lands the frame walk on the
    # '3DI' footer and kills a valid file
    body = bytes(40)
    frames = encode_mp3(3)
    p = _id3v24_tag(body, 0x10) + frames
    assert _id3v2_size(p) == 10 + 40 + 10
    sr, kbps, nf, dur, has_id3 = mp3_meta(p)
    assert (nf, has_id3) == (3, True)
    # without the footer flag the same body is 10 bytes shorter
    p2 = _id3v24_tag(body, 0x00) + frames
    assert _id3v2_size(p2) == 10 + 40
    assert mp3_meta(p2)[2] == 3


def test_id3v2_undefined_flag_bits_rejected():
    p = _id3v24_tag(bytes(8), 0x04) + encode_mp3(1)
    with pytest.raises(ValueError, match="undefined ID3v2 flag"):
        mp3_meta(p)


def test_classic_header_bytes():
    # 128 kbps / 44.1 kHz MPEG-1 Layer III no-CRC is the canonical
    # 0xFF 0xFB 0x90 stream; frame length 417
    p = encode_mp3(1, kbps=128, sample_rate=44100)
    assert p[:3] == b"\xff\xfb\x90"
    assert len(p) == 417


def test_rejections():
    good = encode_mp3(4)
    with pytest.raises(ValueError, match="lost frame sync"):
        mp3_meta(b"\x00\x01" + good)
    with pytest.raises(ValueError, match="final frame truncated"):
        mp3_meta(good[:-10])
    with pytest.raises(ValueError, match="truncated frame header"):
        mp3_meta(good + b"\xff\xfb")
    # MPEG-2 version bits (10)
    bad = bytearray(good)
    bad[1] = 0xF3
    with pytest.raises(ValueError, match="only MPEG-1"):
        mp3_meta(bytes(bad))
    # Layer I bits (11)
    bad = bytearray(good)
    bad[1] = 0xFF
    with pytest.raises(ValueError, match="only Layer III"):
        mp3_meta(bytes(bad))
    # forbidden bitrate index 15
    bad = bytearray(good)
    bad[2] = 0xF0
    with pytest.raises(ValueError, match="forbidden"):
        mp3_meta(bytes(bad))
    # free-format bitrate index 0
    bad = bytearray(good)
    bad[2] = 0x00
    with pytest.raises(ValueError, match="free-format"):
        mp3_meta(bytes(bad))
    # reserved sample-rate index 3
    bad = bytearray(good)
    bad[2] = 0x9C
    with pytest.raises(ValueError, match="reserved sample-rate"):
        mp3_meta(bytes(bad))
    # mid-stream bitrate change (VBR) — splice two CBR streams
    a = encode_mp3(2, kbps=128)
    b = encode_mp3(2, kbps=192)
    with pytest.raises(ValueError, match="changes mid-stream"):
        mp3_meta(a + b)
    # ID3 tag escaping the payload
    with pytest.raises(ValueError, match="escapes the payload"):
        mp3_meta(b"ID3" + bytes([3, 0, 0, 0, 0, 0x7F, 0x7F]))
    # non-syncsafe size byte
    with pytest.raises(ValueError, match="not syncsafe"):
        mp3_meta(b"ID3" + bytes([3, 0, 0, 0x80, 0, 0, 0]))
    # tag with nothing after it
    t = encode_mp3(1, id3_body=b"x" * 5)
    tag_only = t[: 10 + 5]
    with pytest.raises(ValueError, match="no audio frames"):
        mp3_meta(tag_only)


def test_engine_dispatch(spark):
    from metrics_advisor_spark.functions.multimodal import (
        _mp3_bytes,
        _mp3_params,
        attach_mp3_payload,
        extract_media_meta,
        mp3_media_meta,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id long"
    )
    media = attach_mp3_payload(docs)
    rows = {r["doc_id"]: r for r in mp3_media_meta(media).collect()}
    for i in range(10):
        kbps, sr, nf, tag_len = _mp3_params(i)
        r = rows[i]
        assert (r["sample_rate"], r["bitrate_kbps"], r["n_frames"]) \
            == (sr, kbps, nf)
        assert r["duration_ms"] == nf * 1152 * 1000 // sr
        assert r["has_id3"] == (i % 2 == 1)
        assert r["n_bytes"] == \
            (10 + tag_len if tag_len else 0) + nf * (144000 * kbps // sr)
        assert r["n_bytes"] == len(_mp3_bytes(i))

    # universal magic dispatch: both the ID3-tagged and the bare-sync
    # layouts resolve to audio/mpeg
    uni = extract_media_meta(
        media.withColumnRenamed("audio", "payload")
    ).collect()
    assert all(r["media_type"] == "audio/mpeg" for r in uni)
    assert all(r["width"] is None for r in uni)
