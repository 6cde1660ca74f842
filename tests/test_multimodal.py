"""Multimodal binary-column plumbing (stubbed codec, real Spark contract)."""

import hashlib

import pytest

from metrics_advisor_spark.functions.multimodal import (
    attach_fake_payload,
    decode_image,
    extract_media_meta,
    sample_frames,
)

DOCS = [(0, "hello world"), (1, "multimodal payload test"), (2, "x" * 5000)]


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return attach_fake_payload(docs).cache()


def test_payload_schema(media):
    assert [f.dataType.simpleString() for f in media.schema.fields] == [
        "bigint", "string", "binary",
    ]


def test_extract_meta_matches_payload(media):
    meta = {r["doc_id"]: r for r in extract_media_meta(media).collect()}
    for doc_id, text in DOCS:
        raw = text.encode()
        r = meta[doc_id]
        assert r["n_bytes"] == len(raw)
        assert r["sha256_prefix"] == hashlib.sha256(raw).hexdigest()[:16]
        assert 16 <= r["width"] < 256 and 16 <= r["height"] < 256
        assert r["media_type"] == "image/png"


def test_meta_deterministic(media):
    a = sorted(map(tuple, extract_media_meta(media).collect()))
    b = sorted(map(tuple, extract_media_meta(media).collect()))
    assert a == b


def test_decode_image_rejects_non_bmp(spark, media):
    # decode_image is REAL since round 7 (numpy BMP codec) — a payload
    # that is not a BMP must raise, not be guessed around; the `media`
    # fixture's payloads are raw utf-8 text
    with pytest.raises(Exception, match="not a BMP payload"):
        decode_image(
            media.select("doc_id", media["payload"].alias("img"))
        ).collect()


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


def test_sample_frames_fanout_and_determinism(spark):
    from metrics_advisor_spark.functions.multimodal import (
        _fake_decode_dims,
        attach_fake_payload,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "video one content"), (2, "a different video payload")],
        "doc_id long, text string",
    )
    media = attach_fake_payload(docs, media_type="video/mp4")
    frames = sample_frames(media, every_ms=5000).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        payload = [r for r in media.collect() if r["doc_id"] == doc_id][0]["payload"]
        _, _, dur = _fake_decode_dims(bytes(payload))
        assert len(rows) == dur // 5000 + 1  # one frame per 5 s tick
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_ts_ms"])] \
            == list(range(len(rows)))
        assert all(len(bytes(r["frame"])) == 32 for r in rows)
    again = sample_frames(media, every_ms=5000).collect()
    assert sorted(map(repr, frames)) == sorted(map(repr, again))


def test_resize_media_aspect_ratio(spark):
    from metrics_advisor_spark.functions.multimodal import (
        _fake_decode_dims,
        attach_fake_payload,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(i, f"image number {i} bytes") for i in range(6)],
        "doc_id long, text string",
    )
    media = attach_fake_payload(docs)
    orig = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in resize_media(media, max_side=32).collect():
        w0, h0, _ = _fake_decode_dims(orig[r["doc_id"]])
        assert max(r["width"], r["height"]) <= 32
        # aspect ratio preserved within integer rounding
        assert abs(r["width"] / r["height"] - w0 / h0) < 0.2
