"""Multimodal binary-column plumbing — REAL codecs (BMP/WAV/AVI) since
round 8; the former sha-stub surfaces are gone."""

import pytest

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.multimodal import (
    _avi_n_frames,
    _bmp_dims,
    _wav_bytes,
    attach_avi_payload,
    attach_bmp_payload,
    attach_wav_payload,
    decode_image,
    extract_media_meta,
    sample_frames,
)

DOC_IDS = list(range(9))  # 3 of each modality under doc_id % 3


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i,) for i in DOC_IDS], "doc_id long"
    )
    img = attach_bmp_payload(docs.filter(F.col("doc_id") % 3 == 0)).select(
        "doc_id", F.col("img").alias("payload")
    )
    wav = attach_wav_payload(docs.filter(F.col("doc_id") % 3 == 1)).select(
        "doc_id", F.col("wav").alias("payload")
    )
    avi = attach_avi_payload(docs.filter(F.col("doc_id") % 3 == 2)).select(
        "doc_id", F.col("video").alias("payload")
    )
    return img.unionByName(wav).unionByName(avi).cache()


def test_payload_schema(media):
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint", "binary",
    ]


def test_extract_meta_dispatches_on_magic(media):
    meta = {r["doc_id"]: r for r in extract_media_meta(media).collect()}
    assert set(meta) == set(DOC_IDS)
    for doc_id, r in meta.items():
        w, h = _bmp_dims(doc_id)
        stride = (w * 3 + 3) // 4 * 4
        if doc_id % 3 == 0:
            assert r["media_type"] == "image/bmp"
            assert (r["width"], r["height"]) == (w, h)
            assert r["n_bytes"] == 54 + stride * h
            assert r["n_frames"] is None and r["duration_ms"] is None
        elif doc_id % 3 == 1:
            ns = 400 + (doc_id % 10) * 80
            assert r["media_type"] == "audio/wav"
            assert r["n_bytes"] == 44 + 2 * ns
            assert r["duration_ms"] == ns * 1000 // 8000
            assert r["width"] is None and r["n_frames"] is None
        else:
            nf = _avi_n_frames(doc_id)
            assert r["media_type"] == "video/avi"
            assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
            assert r["n_bytes"] == 224 + nf * (8 + stride * h)
            assert r["duration_ms"] == nf * 100


def test_extract_meta_rejects_unknown_magic(spark):
    # (the old junk fixture said "GIF89a not supported" — since r12
    # GIF IS dispatched, so that payload now correctly raises a GIF
    # parse error instead; both rejections are asserted)
    junk = spark.createDataFrame(
        [(0, bytearray(b"TIFF nope, not dispatched"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="unrecognized payload magic"):
        extract_media_meta(junk).collect()
    bad_gif = spark.createDataFrame(
        [(0, bytearray(b"GIF89a truncated screen"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="GIF"):
        extract_media_meta(bad_gif).collect()


def test_meta_deterministic(media):
    a = sorted(map(tuple, extract_media_meta(media).collect()))
    b = sorted(map(tuple, extract_media_meta(media).collect()))
    assert a == b


def test_decode_image_rejects_non_bmp(spark):
    # a WAV payload fed to the image decoder must raise, not be
    # guessed around
    wav = spark.createDataFrame(
        [(0, bytearray(_wav_bytes(0)))], "doc_id long, img binary"
    )
    with pytest.raises(Exception, match="not a BMP payload"):
        decode_image(wav).collect()


def test_bmp_roundtrip_exact(spark):
    # synth → real bytes → header parse + pixel decode must reproduce
    # the generation rule exactly (stride crop and bottom-up flip are
    # where a wrong parser silently corrupts)
    from metrics_advisor_spark.functions.multimodal import (
        _bmp_dims,
        attach_bmp_payload,
        image_meta,
        image_tile_stats,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    )
    media = attach_bmp_payload(docs).cache()
    meta = {r["doc_id"]: r for r in image_meta(media).collect()}
    for i in range(20):
        w, h = _bmp_dims(i)
        assert (meta[i]["width"], meta[i]["height"]) == (w, h)
        assert meta[i]["bpp"] == 24
        assert meta[i]["row_stride"] % 4 == 0
        assert meta[i]["n_bytes"] == 54 + meta[i]["row_stride"] * h
    px = decode_image(media).collect()
    for r in px[:500]:
        for ch, col in enumerate(("b", "g", "r")):
            assert r[col] == (
                r["doc_id"] * 31 + r["y"] * 17 + r["x"] * 7 + ch * 13
            ) % 256
    # tile sums == pixel sums regrouped
    tiles = {
        (r["doc_id"], r["ty"], r["tx"]): r
        for r in image_tile_stats(media, tile=4).collect()
    }
    agg = {}
    for r in px:
        key = (r["doc_id"], r["y"] // 4, r["x"] // 4)
        n, b, g, rr = agg.get(key, (0, 0, 0, 0))
        agg[key] = (n + 1, b + r["b"], g + r["g"], rr + r["r"])
    assert set(agg) == set(tiles)
    for key, (n, b, g, rr) in agg.items():
        t = tiles[key]
        assert (t["n_px"], t["sum_b"], t["sum_g"], t["sum_r"]) == (
            n, b, g, rr,
        )
    media.unpersist()


def test_resize_bmp_roundtrip_and_passthrough(spark):
    from metrics_advisor_spark.functions.multimodal import (
        attach_bmp_payload,
        image_meta,
        resize_bmp,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(15)], "doc_id long"
    )
    media = attach_bmp_payload(docs)
    orig = {
        r["doc_id"]: (r["width"], r["height"])
        for r in image_meta(media).collect()
    }
    small = resize_bmp(media, max_side=8).cache()
    dims = {
        r["doc_id"]: (r["width"], r["height"]) for r in small.collect()
    }
    # the resized payload is a REAL BMP: header-parse dims must agree
    reparsed = {
        r["doc_id"]: (r["width"], r["height"])
        for r in image_meta(small.select("doc_id", "img")).collect()
    }
    assert reparsed == dims
    for i, (w, h) in orig.items():
        nw, nh = dims[i]
        if max(w, h) <= 8:
            assert (nw, nh) == (w, h)  # pass-through re-encode
        else:
            assert max(nw, nh) <= 8
            assert (nw, nh) == (
                max(1, w * 8 // max(w, h)), max(1, h * 8 // max(w, h)),
            )
    small.unpersist()


def test_wav_meta_rejects_noncanonical_chunks(spark):
    # r06 ADVICE: an 18-byte fmt chunk (or a wrong tag) must raise,
    # not silently misparse fixed offsets
    import struct

    from metrics_advisor_spark.functions.multimodal import (
        _wav_bytes,
        audio_meta,
    )

    good = _wav_bytes(3)
    fmt18 = (
        good[:16]
        + struct.pack("<I", 18)
        + good[20:36]
        + b"\x00\x00"
        + good[36:]
    )
    bad_tag = good[:12] + b"LIST" + good[16:]

    def run(payload):
        df = spark.createDataFrame(
            [(0, bytearray(payload))], "doc_id long, wav binary"
        )
        audio_meta(df).collect()

    run(good)  # canonical layout parses
    with pytest.raises(Exception, match="non-canonical fmt"):
        run(fmt18)
    with pytest.raises(Exception, match="expected 'fmt '"):
        run(bad_tag)

    # r07 ADVICE: audio_windows shares the SAME validated parse — the
    # payloads that raise in audio_meta must raise there too, not
    # silently frame garbage PCM from a blind fixed-44 slice
    from metrics_advisor_spark.functions.multimodal import audio_windows

    def run_windows(payload):
        df = spark.createDataFrame(
            [(0, bytearray(payload))], "doc_id long, wav binary"
        )
        audio_windows(df).collect()

    run_windows(good)
    with pytest.raises(Exception, match="non-canonical fmt"):
        run_windows(fmt18)
    with pytest.raises(Exception, match="expected 'fmt '"):
        run_windows(bad_tag)


def test_sample_frames_real_bmp_frames(spark):
    # every sampled frame is a REAL parseable BMP matching the video
    # synthesis rule at the tick's frame index (r08: sha-digest stub
    # replaced by the AVI path)
    from metrics_advisor_spark.functions.multimodal import (
        _bmp_bytes,
        _parse_bmp_header,
    )

    docs = spark.createDataFrame([(1,), (2,), (7,)], "doc_id long")
    media = attach_avi_payload(docs).select(
        "doc_id", F.col("video").alias("payload")
    )
    frames = sample_frames(media, every_ms=100).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        # 100 ms cadence at 10 fps → exactly one tick per frame
        assert len(rows) == _avi_n_frames(doc_id)
        rows = sorted(rows, key=lambda r: r["frame_ts_ms"])
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        w, h = _bmp_dims(doc_id)
        for r in rows:
            fb = bytes(r["frame"])
            pw, ph, bpp, _, _ = _parse_bmp_header(doc_id, fb)
            assert (pw, ph, bpp) == (w, h, 24)
        # tick 0 samples frame 0 == the doc's BMP raster, bit-exact
        assert bytes(rows[0]["frame"]) == _bmp_bytes(doc_id)
    again = sample_frames(media, every_ms=100).collect()
    assert sorted(map(repr, frames)) == sorted(map(repr, again))


def test_resize_media_real_roundtrip(spark):
    # resize_media is the real BMP resize since r08: output payloads
    # re-parse, dims follow the integer aspect-preserving rule
    from metrics_advisor_spark.functions.multimodal import (
        _parse_bmp_header,
        resize_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = attach_bmp_payload(docs).select(
        "doc_id", F.col("img").alias("payload")
    )
    for r in resize_media(media, max_side=4).collect():
        w0, h0 = _bmp_dims(r["doc_id"])
        mx = max(w0, h0)
        assert (r["width"], r["height"]) == (
            max(1, w0 * 4 // mx), max(1, h0 * 4 // mx),
        )
        pw, ph, _, _, _ = _parse_bmp_header(
            r["doc_id"], bytes(r["payload"])
        )
        assert (pw, ph) == (r["width"], r["height"])
        assert r["media_type"] == "image/bmp"


def test_avi_parser_rejects_malformed(spark):
    # header-vs-spec checks: every structural claim is validated, so a
    # corrupted container raises instead of silently misparsing
    import struct

    from metrics_advisor_spark.functions.multimodal import (
        _avi_bytes,
        _parse_avi_header,
        video_meta,
    )

    good = _avi_bytes(5)
    _parse_avi_header(5, good)  # canonical layout parses

    def corrupt(at, new):
        return good[:at] + new + good[at + len(new):]

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        _parse_avi_header(5, corrupt(8, b"WAVE"))
    with pytest.raises(ValueError, match="expected LIST/hdrl"):
        _parse_avi_header(5, corrupt(20, b"JUNK"))
    with pytest.raises(ValueError, match="non-canonical avih"):
        _parse_avi_header(5, corrupt(28, struct.pack("<I", 64)))
    with pytest.raises(ValueError, match="streams"):
        _parse_avi_header(5, corrupt(56, struct.pack("<I", 2)))
    with pytest.raises(ValueError, match="unsupported stream"):
        _parse_avi_header(5, corrupt(112, b"XVID"))
    with pytest.raises(ValueError, match="disagrees"):
        _parse_avi_header(5, corrupt(132, struct.pack("<I", 25)))
    with pytest.raises(ValueError, match="24-bit BI_RGB"):
        _parse_avi_header(5, corrupt(186, struct.pack("<H", 8)))
    with pytest.raises(ValueError, match="unexpected movi chunk"):
        _parse_avi_header(5, corrupt(224, b"01wb"))
    # truncation / size-lie bounds (ADVICE r08): every malformed input
    # raises the per-doc ValueError diagnostic, never struct.error or a
    # silent empty-slice scan
    with pytest.raises(ValueError, match="truncated AVI payload"):
        _parse_avi_header(5, good[:100])
    with pytest.raises(ValueError, match="points past end"):
        # hdrl size pointing beyond the real payload
        _parse_avi_header(
            5, corrupt(16, struct.pack("<I", len(good) + 1000))
        )
    with pytest.raises(ValueError, match="points past end"):
        # movi LIST size lying about available bytes
        _parse_avi_header(5, good[: len(good) - 40])
    # movi chunk declaring more bytes than remain: shrink the declared
    # movi size so the last frame chunk overruns it
    movi_at = 20 + struct.unpack("<I", good[16:20])[0]
    movi_sz = struct.unpack("<I", good[movi_at + 4:movi_at + 8])[0]
    with pytest.raises(ValueError, match="declares|truncated movi"):
        _parse_avi_header(
            5, corrupt(movi_at + 4, struct.pack("<I", movi_sz - 4))
        )
    # and through the Spark surface too
    bad = spark.createDataFrame(
        [(5, bytearray(corrupt(8, b"WAVE")))],
        "doc_id long, video binary",
    )
    with pytest.raises(Exception, match="not a RIFF/AVI"):
        video_meta(bad).collect()


def test_video_frames_partition_invariant(spark):
    from metrics_advisor_spark.functions.multimodal import video_frames

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    media = attach_avi_payload(docs)

    def run(df):
        return sorted(
            (r["doc_id"], r["frame_id"], r["ts_ms"], bytes(r["img"]))
            for r in video_frames(df).collect()
        )

    base = run(media)
    assert len(base) == sum(_avi_n_frames(i) for i in range(20))
    for parts in (1, 7, 32):
        assert run(media.repartition(parts)) == base
