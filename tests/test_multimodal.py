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
    with pytest.raises(NotImplementedError):
        decode_image(media)
    with pytest.raises(NotImplementedError):
        sample_frames(media)
