"""GIF decoder (`functions/gif.py`) — validated two-sided against an
INDEPENDENT codec, like the PNG suite: (a) files written by the JVM's
ImageIO GIF writer decode bit-exact here (GIF is lossless once the
image is palette-indexed), and (b) files written by our encoder decode
bit-exact in ImageIO.  Animation disposal, transparency, interlace and
the LZW table-saturation path are pinned by analytic fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from metrics_advisor_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames,
    gif_meta,
)


def _palette16():
    c = np.arange(16, dtype=np.int64)
    return np.stack(
        [(c * 37 + 11) % 256, (c * 73 + 5) % 256, (c * 29 + 101) % 256],
        axis=1,
    ).astype(np.uint8)


def _indices(h, w, seed=0):
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return ((seed + y * 5 + x * 3) % 16).astype(np.uint8)


# ---------------------------------------------------------------------------
# LZW core
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mcs,n", [(2, 17), (4, 1000), (8, 5000)])
def test_lzw_roundtrip(mcs, n):
    rng = np.random.default_rng(mcs * 1000 + n)
    # low-entropy stretches force long dictionary chains; the 5000-px
    # case saturates the 4096-entry table → encoder emits mid-stream
    # CLEAR, decoder resets
    base = rng.integers(0, 1 << mcs, n).astype(np.uint8)
    base[n // 3: 2 * n // 3] = base[0]
    out = _lzw_decode(_lzw_encode(base, mcs), mcs, n)
    assert (out == base).all()


def test_lzw_kwkwk():
    # 'ababab…' is the canonical KwKwK (code == next_code) stream
    seq = np.tile(np.array([0, 1], dtype=np.uint8), 40)
    out = _lzw_decode(_lzw_encode(seq, 2), 2, len(seq))
    assert (out == seq).all()


def test_lzw_truncated_raises():
    seq = np.arange(64, dtype=np.uint8) % 4
    data = _lzw_encode(seq, 2)
    with pytest.raises(ValueError, match="truncated|ended early"):
        _lzw_decode(data[: len(data) // 2], 2, 64)


def test_lzw_code_beyond_table_raises():
    # a 6-bit-wide stream whose second code jumps past next_code
    with pytest.raises(ValueError, match="beyond table|not a root"):
        _lzw_decode(bytes([0xFF, 0xFF, 0x3F]), 2, 4)


# ---------------------------------------------------------------------------
# container roundtrip
# ---------------------------------------------------------------------------


def test_still_roundtrip():
    pal, idx = _palette16(), _indices(9, 13, seed=3)
    payload = encode_gif(idx, pal)
    assert payload[:6] == b"GIF89a"
    assert gif_meta(payload) == (13, 9, 1, None)
    assert (decode_gif(payload) == pal[idx]).all()


def test_interlaced_roundtrip():
    pal, idx = _palette16(), _indices(11, 7, seed=5)
    plain = encode_gif(idx, pal)
    inter = encode_gif(idx, pal, interlace=True)
    assert inter != plain
    assert (decode_gif(inter) == decode_gif(plain)).all()


def test_animated_meta_and_frames():
    pal = _palette16()
    frames = [(80, _indices(6, 8, seed=k)) for k in range(3)]
    payload = encode_gif(frames, pal)
    assert gif_meta(payload) == (8, 6, 3, 240)
    out = gif_frames(payload)
    assert [d for d, _ in out] == [80, 80, 80]
    for (_, got), (_, idx) in zip(out, frames):
        assert (got == pal[idx]).all()


def test_disposal_restore_background_and_previous():
    # 4x4 screen; frame 1 full, frame 2 a 2x2 patch with disposal 2
    # (restore bg), frame 3 a 1x1 patch with disposal 3 (restore
    # previous).  Composition rules per GIF89a §23.
    pal = _palette16()
    base = np.full((4, 4), 2, dtype=np.uint8)
    patch = np.full((2, 2), 7, dtype=np.uint8)
    dot = np.full((1, 1), 9, dtype=np.uint8)

    import struct

    from metrics_advisor_spark.functions.gif import _lzw_encode as enc

    def img_block(left, top, arr):
        h, w = arr.shape
        s = enc(arr.ravel(), 4)
        blocks = b"".join(
            bytes([len(s[i:i + 255])]) + s[i:i + 255]
            for i in range(0, len(s), 255)
        )
        return (struct.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
                + bytes([4]) + blocks + b"\x00")

    def gce(disposal, delay_cs=5):
        return (b"\x21\xf9\x04"
                + struct.pack("<BHB", (disposal & 7) << 2, delay_cs, 0)
                + b"\x00")

    pal64 = np.zeros((16, 3), dtype=np.uint8)
    pal64[: len(pal)] = pal
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 3, 0, 0)
        + pal64.tobytes()
        + gce(1) + img_block(0, 0, base)        # leave
        + gce(2) + img_block(1, 1, patch)       # restore bg after
        + gce(3) + img_block(0, 0, dot)         # restore prev after
        + gce(1) + img_block(3, 3, dot)
        + b"\x3b"
    )
    out = gif_frames(payload)
    assert len(out) == 4
    f1, f2, f3, f4 = (f for _, f in out)
    assert (f1 == pal[2]).all()
    assert (f2[1:3, 1:3] == pal[7]).all() and (f2[0, 0] == pal[2]).all()
    # frame 2's rect was restored to BACKGROUND (palette entry 0)
    assert (f3[1:3, 1:3] == pal[0]).all()
    assert (f3[0, 0] == pal[9]).all()
    # frame 3 was disposal=3 → its dot vanishes; bg restore persists
    assert (f4[0, 0] == pal[2]).all()
    assert (f4[3, 3] == pal[9]).all()
    assert (f4[1:3, 1:3] == pal[0]).all()


def test_transparency_skips_pixels():
    pal = _palette16()
    idx = _indices(5, 5, seed=1)
    idx[2, 2] = 15  # will be declared transparent
    payload = encode_gif([(50, idx)], pal, transparent_index=15)
    got = decode_gif(payload)
    # transparent pixel shows the background (bg_index 0)
    assert (got[2, 2] == pal[0]).all()
    mask = idx != 15
    assert (got[mask] == pal[idx][mask]).all()


# ---------------------------------------------------------------------------
# cross-validation vs the JVM's ImageIO (independent codec)
# ---------------------------------------------------------------------------


def _imageio_write_gif(spark, idx, pal):
    jvm = spark.sparkContext._jvm
    h, w = idx.shape
    k = len(pal)
    icm = jvm.java.awt.image.IndexColorModel(
        8, k,
        bytes(int(v) for v in pal[:, 0]),
        bytes(int(v) for v in pal[:, 1]),
        bytes(int(v) for v in pal[:, 2]),
    )
    t = jvm.java.awt.image.BufferedImage
    bi = t(w, h, t.TYPE_BYTE_INDEXED, icm)
    ras = bi.getRaster()
    for y in range(h):
        for x in range(w):
            ras.setSample(x, y, 0, int(idx[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    return bytes(baos.toByteArray())


def _imageio_read_rgb(spark, payload):
    jvm = spark.sparkContext._jvm
    bi = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload)
    )
    h, w = bi.getHeight(), bi.getWidth()
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            v = bi.getRGB(x, y) & 0xFFFFFF
            out[y, x] = (v >> 16, (v >> 8) & 0xFF, v & 0xFF)
    return out


def test_decode_imageio_written_gif(spark):
    pal, idx = _palette16(), _indices(14, 23, seed=9)
    payload = _imageio_write_gif(spark, idx, pal)
    assert payload[:4] == b"GIF8"
    got = decode_gif(payload)
    assert (got == pal[idx]).all()
    # and ImageIO's own read agrees — closes the triangle
    assert (got == _imageio_read_rgb(spark, payload)).all()


def test_imageio_decodes_our_gif(spark):
    pal, idx = _palette16(), _indices(10, 17, seed=4)
    for interlace in (False, True):
        payload = encode_gif(idx, pal, interlace=interlace)
        assert (_imageio_read_rgb(spark, payload) == pal[idx]).all()


# ---------------------------------------------------------------------------
# rejection matrix — malformed payloads raise, never guessed around
# ---------------------------------------------------------------------------


def test_rejections():
    pal, idx = _palette16(), _indices(6, 6)
    good = encode_gif(idx, pal)

    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"NOTG" + good[4:])
    with pytest.raises(ValueError, match="missing trailer"):
        gif_meta(good[:-1])
    with pytest.raises(ValueError, match="truncated sub-block"):
        # chop inside the LZW sub-block chain (header 13 + GCT 48 +
        # image descriptor 10 + mcs 1 = 72; 80 is mid-chain)
        decode_gif(good[:80])
    with pytest.raises(ValueError, match="unknown block introducer"):
        # decode_gif returns at the first frame (a browser's
        # progressive contract), so the full walk is what sees the
        # junk introducer
        gif_meta(good[:-1] + b"\x7f" + b"\x3b")
    # shrink the DECLARED global color table: the palette bytes that
    # follow get re-parsed as blocks / indices escape the table —
    # either way the payload must raise, never decode
    hdr_packed = good[10]
    corrupt = (good[:10]
               + bytes([(hdr_packed & 0xF8) | 0x00])  # GCT size → 2
               + good[11:])
    with pytest.raises(ValueError):
        decode_gif(corrupt)


def test_frame_rect_escape_raises():
    import struct

    pal = _palette16()
    idx = _indices(4, 4)
    payload = bytearray(encode_gif(idx, pal))
    # image descriptor starts right after header+GCT: find 0x2C
    pos = payload.index(0x2C, 13)
    # move the frame to left=3 so 3+4 > screen width 4
    struct.pack_into("<H", payload, pos + 1, 3)
    with pytest.raises(ValueError, match="escapes logical screen"):
        decode_gif(bytes(payload))


# ---------------------------------------------------------------------------
# engine dispatch (Spark side)
# ---------------------------------------------------------------------------


def test_engine_dispatch(spark):
    from metrics_advisor_spark.functions.multimodal import (
        _gif_bytes,
        _gif_dims,
        _gif_palette,
        attach_gif_payload,
        decode_image,
        extract_media_meta,
        gif_media_meta,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    media = attach_gif_payload(docs)

    # triage meta matches the synthesis rule
    meta = {
        r["doc_id"]: r
        for r in gif_media_meta(media).collect()
    }
    for i in range(12):
        w, h, nf = _gif_dims(i)
        r = meta[i]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["duration_ms"] == (None if nf == 1 else nf * 80)

    # universal magic dispatch agrees
    uni = extract_media_meta(
        media.withColumnRenamed("img", "payload")
    ).collect()
    assert all(r["media_type"] == "image/gif" for r in uni)

    # pixel decode: frame 0 composited == palette[index rule]
    pal = _gif_palette()
    px = decode_image(media.filter("doc_id = 7")).collect()
    w, h, _ = _gif_dims(7)
    assert len(px) == w * h
    for r in px:
        idx = (7 + r["y"] * 5 + r["x"] * 3) % 16
        assert (r["r"], r["g"], r["b"]) == tuple(
            int(v) for v in pal[idx]
        )

    # byte-level sanity: animated payloads carry GCE blocks, stills
    # don't
    rows = media.collect()
    for r in rows:
        p = bytes(r["img"])
        assert p == _gif_bytes(r["doc_id"])
        has_gce = b"\x21\xf9" in p
        assert has_gce == (r["doc_id"] % 3 != 0)


def test_truncated_extension_raises_valueerror():
    # review finding r12: a stream ending right after the 0x21
    # extension introducer must raise the documented ValueError, not
    # IndexError
    pal, idx = _palette16(), _indices(4, 4)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="truncated extension"):
        gif_meta(good[:-1] + b"\x21")


def test_large_image_cross_validation(spark):
    # scale up the two-sided ImageIO check: 120x96 dense-noise
    # indexed image, both directions (review follow-up: the small
    # fixtures leave LZW width-growth beyond 9 bits untested —
    # 11520 px over 16 symbols grows the table through 10/11/12-bit
    # codes and forces a mid-stream CLEAR)
    rng = np.random.default_rng(77)
    pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (96, 120)).astype(np.uint8)
    ours = encode_gif(idx, pal)
    assert (decode_gif(ours) == pal[idx]).all()
    assert (_imageio_read_rgb(spark, ours) == pal[idx]).all()
    theirs = _imageio_write_gif(spark, idx, pal)
    assert (decode_gif(theirs) == pal[idx]).all()
