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


def test_codec_stubs_raise(media):
    # full image decode stays a clearly-marked stub (no PIL/opencv here);
    # frame sampling and resize have real plumbing with fake codecs
    with pytest.raises(NotImplementedError):
        decode_image(media)


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
