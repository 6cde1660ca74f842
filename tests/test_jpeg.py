"""Baseline-JPEG decoder (r09 verdict item 8) — verified against an
INDEPENDENT codec: the JVM's built-in ImageIO JPEG implementation
encodes every fixture; the pure-numpy decoder must reproduce ImageIO's
own decode within JPEG-compliance-style tolerance (T.81 does not pin
bit-exact decoder output; IDCT and chroma-upsampling filters are
implementation choices — the luma path agrees to ±1, color to a few
codes where the upsampling filters differ)."""

from __future__ import annotations

import numpy as np
import pytest


def _jvm(spark):
    return spark.sparkContext._jvm


def _encode_gray_jvm(spark, arr):
    """Gray fixture via raster setSample — setRGB/getRGB on a
    TYPE_BYTE_GRAY image passes through JDK color management (linear
    gray <-> sRGB gamma) and would distort the comparison."""
    jvm = _jvm(spark)
    h, w = arr.shape
    t = jvm.java.awt.image.BufferedImage
    bi = t(w, h, t.TYPE_BYTE_GRAY)
    ras = bi.getRaster()
    for y in range(h):
        for x in range(w):
            ras.setSample(x, y, 0, int(arr[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def _decode_gray_jvm(spark, payload):
    jvm = _jvm(spark)
    bi = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload)
    )
    ras = bi.getRaster()
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            out[y, x] = ras.getSample(x, y, 0)
    return out


def _encode_rgb_jvm(spark, arr):
    jvm = _jvm(spark)
    h, w = arr.shape[:2]
    t = jvm.java.awt.image.BufferedImage
    bi = t(w, h, t.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in arr[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def _decode_rgb_jvm(spark, payload):
    jvm = _jvm(spark)
    bi = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload)
    )
    h, w = bi.getHeight(), bi.getWidth()
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            rgb = bi.getRGB(x, y)
            out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
    return out


def _gray_fixture():
    g = (np.linspace(0, 255, 24)[:, None] + np.zeros((1, 40))).astype(
        np.uint8
    )
    g[8:16, 10:20] = 230  # sharp edge: exercises full AC spectrum
    return g


def test_jpeg_gray_matches_independent_codec(spark):
    from metrics_advisor_spark.functions.jpeg import (
        decode_baseline_jpeg,
        jpeg_meta,
    )

    gy = _gray_fixture()
    payload = _encode_gray_jvm(spark, gy)
    assert payload[:2] == b"\xff\xd8"
    assert jpeg_meta(payload) == (40, 24, 1)
    mine = decode_baseline_jpeg(payload)
    assert mine.shape == (24, 40, 3)
    assert (mine[:, :, 0] == mine[:, :, 1]).all()
    ref = _decode_gray_jvm(spark, payload)
    d = np.abs(mine[:, :, 0].astype(np.int64) - ref)
    # luma path (Huffman + dequant + IDCT) must agree to +/-1 — the
    # only remaining freedom is IDCT rounding
    assert d.max() <= 1
    # and the decode is a faithful decode of the source image
    assert np.abs(mine[:, :, 0].astype(np.int64) - gy).max() <= 16


def test_jpeg_color_matches_independent_codec(spark):
    from metrics_advisor_spark.functions.jpeg import (
        decode_baseline_jpeg,
        jpeg_meta,
    )

    col = np.zeros((24, 40, 3), dtype=np.uint8)
    col[..., 0] = np.linspace(10, 240, 40)[None, :]
    col[..., 1] = np.linspace(240, 10, 24)[:, None]
    col[..., 2] = 128
    payload = _encode_rgb_jvm(spark, col)
    assert jpeg_meta(payload) == (40, 24, 3)
    mine = decode_baseline_jpeg(payload).astype(np.int64)
    ref = _decode_rgb_jvm(spark, payload)
    d = np.abs(mine - ref)
    # chroma is 4:2:0-subsampled by the JDK writer and the two
    # decoders upsample with different filters (replication vs
    # smoothing) — a few codes of drift on a smooth field is the
    # compliance-style bound
    assert d.max() <= 8
    assert d.mean() <= 4.0
    assert np.abs(mine - col.astype(np.int64)).max() <= 16


def _encode_progressive_jvm(spark, bi_setter, w, h, img_type):
    """Progressive (SOF2) fixture via the JDK writer's
    ImageWriteParam.MODE_DEFAULT scan script — an independent encoder
    for the Annex G decode path."""
    jvm = _jvm(spark)
    t = jvm.java.awt.image.BufferedImage
    bi = t(w, h, img_type)
    bi_setter(bi)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpg"
    ).next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(1)  # ImageWriteParam.MODE_DEFAULT
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(
        None, jvm.javax.imageio.IIOImage(bi, None, None), param
    )
    ios.close()
    writer.dispose()
    return bytes(baos.toByteArray())


def test_jpeg_progressive_gray_matches_independent_codec(spark):
    """r11 (VERDICT r10 item 7): progressive Huffman decode for real —
    the fixture must actually BE progressive (SOF2 + multiple scans),
    and the Annex G coefficient accumulation must agree with ImageIO's
    own decode to the same ±1 luma bound as baseline (the decoded
    coefficients are identical; only IDCT rounding differs)."""
    from metrics_advisor_spark.functions.jpeg import (
        decode_jpeg,
        jpeg_meta,
    )

    gy = _gray_fixture()
    h, w = gy.shape

    def setter(bi):
        ras = bi.getRaster()
        for y in range(h):
            for x in range(w):
                ras.setSample(x, y, 0, int(gy[y, x]))

    payload = _encode_progressive_jvm(spark, setter, w, h, 10)
    # TYPE_BYTE_GRAY = 10
    assert b"\xff\xc2" in payload, "fixture is not SOF2"
    assert payload.count(b"\xff\xda") > 1, "fixture is not multi-scan"
    assert jpeg_meta(payload) == (40, 24, 1)
    mine = decode_jpeg(payload)
    ref = _decode_gray_jvm(spark, payload)
    d = np.abs(mine[:, :, 0].astype(np.int64) - ref)
    assert d.max() <= 1
    assert np.abs(mine[:, :, 0].astype(np.int64) - gy).max() <= 16


def test_jpeg_progressive_color_matches_independent_codec(spark):
    from metrics_advisor_spark.functions.jpeg import (
        decode_jpeg,
        jpeg_meta,
    )

    col = np.zeros((24, 40, 3), dtype=np.uint8)
    col[..., 0] = np.linspace(10, 240, 40)[None, :]
    col[..., 1] = np.linspace(240, 10, 24)[:, None]
    col[..., 2] = 128

    def setter(bi):
        for y in range(24):
            for x in range(40):
                r, g, b = (int(v) for v in col[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)

    payload = _encode_progressive_jvm(spark, setter, 40, 24, 1)
    # TYPE_INT_RGB = 1
    assert b"\xff\xc2" in payload
    assert payload.count(b"\xff\xda") > 1
    assert jpeg_meta(payload) == (40, 24, 3)
    mine = decode_jpeg(payload).astype(np.int64)
    ref = _decode_rgb_jvm(spark, payload)
    d = np.abs(mine - ref)
    assert d.max() <= 8
    assert d.mean() <= 4.0
    assert np.abs(mine - col.astype(np.int64)).max() <= 16


def test_jpeg_missing_eoi_still_decodes(spark):
    """A payload truncated right before the 2-byte EOI marker — common
    in crawl downloads — carries complete entropy data and must decode
    identically to the intact stream (code-review finding r11: the
    multi-scan refactor briefly made this raise)."""
    from metrics_advisor_spark.functions.jpeg import decode_jpeg

    payload = _encode_gray_jvm(spark, _gray_fixture())
    assert payload[-2:] == b"\xff\xd9"
    full = decode_jpeg(payload)
    clipped = decode_jpeg(payload[:-2])
    assert (full == clipped).all()


def test_jpeg_premature_eoi_raises(spark):
    """ADVICE r10: a corrupt stream whose entropy data hits a real
    marker (e.g. premature EOI) must surface as ValueError, not leak
    the internal _Marker exception."""
    from metrics_advisor_spark.functions.jpeg import decode_jpeg

    payload = bytearray(_encode_gray_jvm(spark, _gray_fixture()))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    inject = sos + 20
    payload[inject : inject + 2] = b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_jpeg_arithmetic_raises(spark):
    from metrics_advisor_spark.functions.jpeg import decode_jpeg

    payload = bytearray(_encode_gray_jvm(spark, _gray_fixture()))
    # patch the SOF0 marker to SOF9 (arithmetic sequential): parser
    # must refuse loudly, not guess
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(bytes(payload))


def test_jpeg_truncated_raises(spark):
    from metrics_advisor_spark.functions.jpeg import decode_baseline_jpeg

    payload = _encode_gray_jvm(spark, _gray_fixture())
    with pytest.raises(ValueError):
        decode_baseline_jpeg(payload[: len(payload) // 2])


def test_jpeg_flows_through_engine_dispatch(spark):
    """The Spark surfaces dispatch JPEG payloads next to BMP ones:
    extract_media_meta types them, image_meta reads the frame header,
    decode_image emits the same (doc_id, y, x, b, g, r) raster rows as
    the standalone decoder."""
    from metrics_advisor_spark.functions.jpeg import decode_baseline_jpeg
    from metrics_advisor_spark.functions.multimodal import (
        _encode_bmp,
        decode_image,
        extract_media_meta,
        image_meta,
    )

    gy = _gray_fixture()
    jpg = _encode_gray_jvm(spark, gy)
    bmp = _encode_bmp(np.stack([gy, gy, gy], axis=-1))
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpg)), (2, "image", bytearray(bmp))],
        "doc_id long, media_type string, payload binary",
    )
    meta = {
        r["doc_id"]: r
        for r in extract_media_meta(media).collect()
    }
    assert meta[1]["media_type"] == "image/jpeg"
    assert (meta[1]["width"], meta[1]["height"]) == (40, 24)
    assert meta[2]["media_type"] == "image/bmp"
    assert (meta[2]["width"], meta[2]["height"]) == (40, 24)

    imgs = media.selectExpr("doc_id", "payload as img")
    im = {r["doc_id"]: r for r in image_meta(imgs).collect()}
    assert (im[1]["width"], im[1]["height"], im[1]["bpp"]) == (40, 24, 24)
    assert im[1]["row_stride"] is None
    assert im[2]["row_stride"] is not None

    decoded = (
        decode_image(imgs.where("doc_id = 1"))
        .orderBy("y", "x")
        .collect()
    )
    expect = decode_baseline_jpeg(jpg)
    assert len(decoded) == 24 * 40
    got = np.array([[r["r"], r["g"], r["b"]] for r in decoded]).reshape(
        24, 40, 3
    )
    assert (got == expect.astype(np.int64)).all()
