"""WARC source (`sources/warc.py`): record-walk roundtrips (plain and
per-record-gzip archives parse identically), the file-level
binaryFile→mapInPandas scan, HTTP response extraction, and the
rejection matrix."""

from __future__ import annotations

import gzip

import pytest

from metrics_advisor_spark.sources.warc import (
    _warc_record,
    attach_warc_payload,
    iter_warc_records,
    make_warc,
    parse_warc_bytes,
    read_warc,
    warc_records_df,
)

_DOCS = [(0, "alpha beta"), (1, "gamma"), (10, "delta epsilon zeta")]


def test_record_walk_plain_vs_gzip():
    plain = make_warc(_DOCS)
    gz = make_warc(_DOCS, gzipped=True)
    assert gz[:2] == b"\x1f\x8b" and plain[:2] != b"\x1f\x8b"
    a = [(h, p) for h, p in iter_warc_records(plain)]
    b = [(h, p) for h, p in iter_warc_records(gz)]
    assert a == b
    # warcinfo + (request, response) per doc
    assert len(a) == 1 + 2 * len(_DOCS)
    assert a[0][0]["warc-type"] == "warcinfo"
    assert a[1][0]["warc-type"] == "request"
    assert a[2][0]["warc-type"] == "response"


def test_http_extraction():
    rows = list(parse_warc_bytes("t", make_warc(_DOCS)))
    resp = [r for r in rows if r[2] == "response"]
    assert len(resp) == 3
    by_uri = {r[3]: r for r in resp}
    r0 = by_uri["https://example.org/doc/0"]
    assert r0[6] == 404 and r0[7] == "text/html; charset=utf-8"
    assert r0[8] == b"<html><body>alpha beta</body></html>"
    r1 = by_uri["https://example.org/doc/1"]
    assert r1[6] == 200
    assert r1[4] == "2026-01-02T01:00:00Z"
    # non-response records keep NULL status and the raw payload
    info = rows[0]
    assert info[6] is None and info[8].startswith(b"software:")


def test_header_continuation_lines():
    rec = _warc_record(
        "metadata", "urn:x", "2026-01-01T00:00:00Z", "<urn:uuid:m>",
        b"k",
        extra=(("WARC-Long", "part one"),),
    )
    # splice a continuation line after WARC-Long
    rec = rec.replace(
        b"WARC-Long: part one\r\n",
        b"WARC-Long: part one\r\n\t and two\r\n",
    )
    (hdr, payload), = iter_warc_records(rec)
    assert hdr["warc-long"] == "part one and two"
    assert payload == b"k"


def test_read_warc_file_scan(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "a.warc").write_bytes(make_warc(_DOCS[:2]))
    (d / "b.warc.gz").write_bytes(make_warc(_DOCS[2:], gzipped=True))
    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == (1 + 2 * 2) + (1 + 2 * 1)
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert {r["target_uri"] for r in resp} == {
        f"https://example.org/doc/{i}" for i, _ in _DOCS
    }
    archives = {r["archive"] for r in rows}
    assert len(archives) == 2  # one per file


def test_per_doc_archives(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    recs = warc_records_df(attach_warc_payload(docs))
    resp = recs.filter("warc_type = 'response'").collect()
    assert len(resp) == 8
    for r in resp:
        did = int(r["archive"])
        assert r["target_uri"] == f"https://example.org/doc/{did}"
        assert r["http_status"] == (404 if did % 10 == 0 else 200)
        assert bytes(r["body"]) == (
            f"<html><body>text {did}</body></html>".encode()
        )


def test_rejections():
    good = make_warc(_DOCS[:1])
    with pytest.raises(ValueError, match="bad version line"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="payload truncated"):
        list(iter_warc_records(good[:-30]))
    with pytest.raises(ValueError, match="not terminated"):
        # overwrite a terminator CRLF CRLF with junk
        bad = good.replace(b"\r\n\r\nWARC/1.0", b"\r\nxxWARC/1.0", 1)
        list(iter_warc_records(bad))
    with pytest.raises(ValueError, match="missing Content-Length"):
        rec = _warc_record("metadata", "u", "d", "i", b"x")
        bad = rec.replace(b"Content-Length: 1", b"Content-Foo: 1")
        list(iter_warc_records(bad))
    with pytest.raises(ValueError, match="corrupt gzip"):
        list(iter_warc_records(b"\x1f\x8b" + b"\x00" * 20))
    # a response record whose payload is not an HTTP message
    rec = _warc_record(
        "response", "u", "d", "i", b"not http at all",
    )
    with pytest.raises(ValueError, match="not HTTP"):
        list(parse_warc_bytes("t", rec))
    # gzip'd junk that inflates fine but isn't WARC
    with pytest.raises(ValueError, match="bad version line"):
        list(iter_warc_records(gzip.compress(b"hello world\r\n")))


def test_chunked_transfer_encoding():
    from metrics_advisor_spark.sources.warc import _dechunk

    # fixture docs ≡2 mod 5 are stored chunked; the parsed body must
    # equal the unchunked form byte-for-byte
    rows = list(parse_warc_bytes("t", make_warc([(2, "chunky text")])))
    resp = [r for r in rows if r[2] == "response"][0]
    assert resp[8] == b"<html><body>chunky text</body></html>"
    # direct dechunk: extensions ignored, trailers dropped
    assert _dechunk(b"3;ext=1\r\nabc\r\n2\r\nde\r\n0\r\nX-T: v\r\n\r\n") \
        == b"abcde"
    with pytest.raises(ValueError, match="chunked body truncated"):
        _dechunk(b"ff\r\nshort\r\n")
    with pytest.raises(ValueError, match="bad chunk size"):
        _dechunk(b"zz\r\nabc\r\n")
    with pytest.raises(ValueError, match="not CRLF-terminated"):
        _dechunk(b"3\r\nabcXX0\r\n\r\n")


def test_wet_roundtrip(spark, tmp_path):
    # WET = WARC of conversion records; read_wet returns the text
    # table directly (no HTML parse), both plain and per-record gzip
    from metrics_advisor_spark.sources.warc import make_wet, read_wet

    rows = [(i, f"extracted text for doc {i} — unicode ünïcode")
            for i in range(6)]
    (tmp_path / "a.warc").write_bytes(make_wet(rows[:3]))
    (tmp_path / "b.warc.gz").write_bytes(
        make_wet(rows[3:], gzipped=True)
    )
    got = {r["target_uri"]: r["text"]
           for r in read_wet(spark, str(tmp_path)).collect()}
    assert got == {
        f"https://example.org/doc/{i}": t for i, t in rows
    }


def test_warc_cdx_random_access(spark, tmp_path):
    # the property a CDX exists for: a ranged read of
    # [offset, offset+length) + one-member gunzip yields EXACTLY the
    # indexed record, without touching the rest of the archive
    import gzip as _gzip

    from metrics_advisor_spark.sources.warc import (
        iter_warc_records,
        make_warc,
        warc_cdx,
    )

    rows = [(i, f"text for doc {i}") for i in range(5)]
    gz = make_warc(rows, gzipped=True)
    plain = make_warc(rows)
    (tmp_path / "a.warc.gz").write_bytes(gz)
    (tmp_path / "b.warc").write_bytes(plain)
    cdx = warc_cdx(spark, str(tmp_path)).collect()
    # warcinfo + request + response per doc, both archives
    assert len(cdx) == 2 * (1 + 2 * len(rows))
    raw = {str(tmp_path / "a.warc.gz"): gz,
           str(tmp_path / "b.warc"): plain}
    n_ranged = 0
    for r in cdx:
        data = [v for k, v in raw.items() if r["archive"].endswith(
            k.rsplit("/", 1)[-1])][0]
        span = data[r["offset"]:r["offset"] + r["length"]]
        if span[:2] == b"\x1f\x8b":
            span = _gzip.decompress(span)
        (hdr, payload), = list(iter_warc_records(span))
        assert hdr.get("warc-target-uri") == r["target_uri"]
        assert hdr.get("warc-type") == r["warc_type"]
        if r["warc_type"] == "response":
            assert r["http_status"] == (
                404 if int(r["target_uri"].rsplit("/", 1)[-1]) % 10 == 0
                else 200
            )
        n_ranged += 1
    assert n_ranged == len(cdx)
    # offsets strictly increase and tile each archive exactly
    for name, data in raw.items():
        spans = sorted(
            (r["offset"], r["length"]) for r in cdx
            if r["archive"].endswith(name.rsplit("/", 1)[-1])
        )
        pos = 0
        for off, ln in spans:
            assert off == pos
            pos += ln
        assert pos == len(data)
