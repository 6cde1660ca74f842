"""Full PNG decoder (`functions/png.py`) — verified BIT-EXACT against
an independent codec (the JVM's ImageIO PNG writer): PNG is lossless,
so unlike the JPEG comparison there is no tolerance."""

from __future__ import annotations

import numpy as np
import pytest


def _jvm(spark):
    return spark.sparkContext._jvm


def _encode_png_jvm(spark, arr, mode="rgb"):
    jvm = _jvm(spark)
    t = jvm.java.awt.image.BufferedImage
    if mode == "gray":
        h, w = arr.shape
        bi = t(w, h, t.TYPE_BYTE_GRAY)
        ras = bi.getRaster()
        for y in range(h):
            for x in range(w):
                ras.setSample(x, y, 0, int(arr[y, x]))
    else:
        h, w = arr.shape[:2]
        typ = t.TYPE_INT_ARGB if mode == "rgba" else t.TYPE_INT_RGB
        bi = t(w, h, typ)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in arr[y, x, :3])
                a = int(arr[y, x, 3]) if mode == "rgba" else 255
                argb = (a << 24) | (r << 16) | (g << 8) | b
                if argb >= 1 << 31:  # Java int is signed 32-bit
                    argb -= 1 << 32
                bi.setRGB(x, y, argb)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    return bytes(baos.toByteArray())


def _fixture_rgb():
    rng = np.random.default_rng(11)
    col = rng.integers(0, 256, (24, 37, 3), dtype=np.int64).astype(
        np.uint8
    )
    # mix structure + noise so the encoder exercises several scanline
    # filters, not just one
    col[:12, :, 0] = np.linspace(0, 255, 37)[None, :]
    col[6:18, 5:30, 2] = 7
    return col


def test_png_rgb_bit_exact_vs_independent_codec(spark):
    from metrics_advisor_spark.functions.png import decode_png, png_meta

    col = _fixture_rgb()
    payload = _encode_png_jvm(spark, col)
    assert png_meta(payload) == (37, 24, 3)
    assert (decode_png(payload) == col).all()


def test_png_gray_and_rgba_bit_exact(spark):
    from metrics_advisor_spark.functions.png import decode_png, png_meta

    gy = (np.linspace(0, 255, 24)[:, None] + np.zeros((1, 37))).astype(
        np.uint8
    )
    p_gray = _encode_png_jvm(spark, gy, mode="gray")
    assert png_meta(p_gray)[2] == 1
    got = decode_png(p_gray)
    assert (got[:, :, 0] == gy).all() and (got[:, :, 2] == gy).all()

    rng = np.random.default_rng(5)
    rgba = rng.integers(0, 256, (16, 21, 4), dtype=np.int64).astype(
        np.uint8
    )
    p_rgba = _encode_png_jvm(spark, rgba, mode="rgba")
    assert png_meta(p_rgba)[2] == 4
    assert (decode_png(p_rgba) == rgba[:, :, :3]).all()


def test_png_all_filter_types_decode(spark):
    """Hand-build one PNG per scanline filter type (the independent
    encoder picks filters adaptively, so force each explicitly) and
    check the unfilter math against the plain pixels."""
    import struct
    import zlib

    from metrics_advisor_spark.functions.png import decode_png

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (6, 9, 3), dtype=np.int64).astype(np.uint8)

    def build(filter_id):
        h, w, ch = px.shape
        lines = []
        prev = np.zeros(w * ch, dtype=np.int64)
        for y in range(h):
            cur = px[y].reshape(-1).astype(np.int64)
            if filter_id == 0:
                enc = cur
            elif filter_id == 1:
                left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
                enc = (cur - left) & 0xFF
            elif filter_id == 2:
                enc = (cur - prev) & 0xFF
            elif filter_id == 3:
                left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
                enc = (cur - (left + prev) // 2) & 0xFF
            else:  # Paeth
                left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
                ul = np.concatenate([np.zeros(ch, np.int64), prev[:-ch]])
                p = left + prev - ul
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev, ul),
                )
                enc = (cur - pred) & 0xFF
            lines.append(bytes([filter_id]) + bytes(enc.astype(np.uint8)))
            prev = cur

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b"")
        )

    for f in range(5):
        assert (decode_png(build(f)) == px).all(), f"filter {f}"


def test_png_palette_bit_exact(spark):
    """r11: palette (color type 3) decodes through the PLTE lookup —
    a TYPE_BYTE_INDEXED BufferedImage makes ImageIO emit a genuine
    palette PNG, and ImageIO's own decode is the expansion oracle."""
    jvm = _jvm(spark)
    t = jvm.java.awt.image.BufferedImage
    rng = np.random.default_rng(17)
    idx = rng.integers(0, 256, (19, 23), dtype=np.int64)
    bi = t(23, 19, t.TYPE_BYTE_INDEXED)
    for y in range(19):
        for x in range(23):
            # indexed model: setRGB quantizes to the default 256-color
            # palette; whatever it picks, both decoders must agree
            v = int(idx[y, x])
            bi.setRGB(x, y, (v << 16) | ((255 - v) << 8) | v)
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    payload = bytes(baos.toByteArray())

    from metrics_advisor_spark.functions.png import decode_png, png_meta

    assert b"PLTE" in payload, "fixture is not a palette PNG"
    assert png_meta(payload) == (23, 19, 1)
    mine = decode_png(payload)
    ref = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(payload)
    )
    for y in range(19):
        for x in range(23):
            rgb = ref.getRGB(x, y)
            assert (
                mine[y, x, 0] == (rgb >> 16) & 255
                and mine[y, x, 1] == (rgb >> 8) & 255
                and mine[y, x, 2] == rgb & 255
            ), (y, x)


def test_png_16bit_gray_high_byte(spark):
    """r11: 16-bit samples decode via the byte-pair unfilter and keep
    the high byte (the defined 16->8 reduction)."""
    jvm = _jvm(spark)
    t = jvm.java.awt.image.BufferedImage
    rng = np.random.default_rng(23)
    gy16 = rng.integers(0, 65536, (14, 17), dtype=np.int64)
    bi = t(17, 14, t.TYPE_USHORT_GRAY)
    ras = bi.getRaster()
    for y in range(14):
        for x in range(17):
            ras.setSample(x, y, 0, int(gy16[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    jvm.javax.imageio.ImageIO.write(bi, "png", baos)
    payload = bytes(baos.toByteArray())

    from metrics_advisor_spark.functions.png import decode_png

    assert payload[24] == 16, "fixture is not 16-bit"
    mine = decode_png(payload)
    assert (mine[:, :, 0] == (gy16 >> 8)).all()


def test_png_interlaced_bit_exact(spark):
    """r11: Adam7 interlace — the JDK PNG writer's progressive mode
    emits interlace method 1; the seven-pass de-interlace must
    reproduce the plain pixels bit-exactly."""
    jvm = _jvm(spark)
    t = jvm.java.awt.image.BufferedImage
    col = _fixture_rgb()
    h, w = col.shape[:2]
    bi = t(w, h, t.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in col[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "png"
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
    payload = bytes(baos.toByteArray())

    from metrics_advisor_spark.functions.png import decode_png

    assert payload[28] == 1, "fixture is not interlaced"
    assert (decode_png(payload) == col).all()


def test_png_subbyte_gray_depths():
    """Hand-built depth-1/2/4 grayscale fixtures (no independent
    encoder emits these on demand): MSB-first bit unpacking + the
    RFC 2083 full-range rescale."""
    import struct
    import zlib

    from metrics_advisor_spark.functions.png import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(29)
    for depth in (1, 2, 4):
        w, h = 11, 5  # width chosen to leave padding bits per row
        maxv = (1 << depth) - 1
        vals = rng.integers(0, maxv + 1, (h, w), dtype=np.int64)
        lines = []
        for y in range(h):
            bits = np.zeros(((w * depth + 7) // 8) * 8, dtype=np.uint8)
            for x in range(w):
                for k in range(depth):
                    bits[x * depth + k] = (vals[y, x] >> (depth - 1 - k)) & 1
            lines.append(b"\x00" + bytes(np.packbits(bits)))
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b"")
        )
        got = decode_png(payload)
        want = vals * 255 // maxv
        assert (got[:, :, 0] == want).all(), f"depth {depth}"


def test_png_unsupported_layouts_raise(spark):
    import struct
    import zlib

    from metrics_advisor_spark.functions.png import decode_png

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # unknown color type
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 5, 0, 0, 0)
    with pytest.raises(ValueError, match="color type"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr))
    # depth invalid for the color type (16-bit palette)
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="invalid for color type"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16))
    # palette image without PLTE
    ihdrp = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdrp)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + chunk(b"IEND", b"")
        )
    # truncated
    good = _encode_png_jvm(spark, _fixture_rgb())
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])


def test_png_flows_through_engine_dispatch(spark):
    from metrics_advisor_spark.functions.multimodal import (
        decode_image,
        extract_media_meta,
        image_meta,
    )
    from metrics_advisor_spark.functions.png import decode_png

    col = _fixture_rgb()
    png = _encode_png_jvm(spark, col)
    media = spark.createDataFrame(
        [(9, "image", bytearray(png))],
        "doc_id long, media_type string, payload binary",
    )
    meta = extract_media_meta(media).collect()[0]
    assert meta["media_type"] == "image/png"
    assert (meta["width"], meta["height"]) == (37, 24)
    imgs = media.selectExpr("doc_id", "payload as img")
    im = image_meta(imgs).collect()[0]
    assert (im["width"], im["height"], im["bpp"]) == (37, 24, 24)
    decoded = decode_image(imgs).orderBy("y", "x").collect()
    got = np.array(
        [[r["r"], r["g"], r["b"]] for r in decoded]
    ).reshape(24, 37, 3)
    assert (got == decode_png(png).astype(np.int64)).all()
    assert (got == col.astype(np.int64)).all()
