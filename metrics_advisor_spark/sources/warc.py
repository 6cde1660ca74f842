"""WARC (Web ARChive, ISO 28500) source — the format 100 TB crawl
corpora actually arrive in (Common Crawl publishes ~90k WARC files per
monthly snapshot).  A training-data pipeline's first stage is exactly
this: split each archive into records, keep the 'response' records,
parse the embedded HTTP response, and emit (uri, date, status,
content-type, body) rows for the text pipeline downstream.

Layout parsed (WARC/1.0 and 1.1):
  - record = version line + named headers (CRLF-terminated, ending at
    a blank line) + Content-Length payload bytes + CRLF CRLF
  - response records carry an HTTP/1.x message as payload: status
    line + headers + blank line + body
  - real Common Crawl archives are PER-RECORD gzip members
    concatenated into one .warc.gz — stdlib zlib handles member
    concatenation, so both plain and gzip archives read identically

Scale: `read_warc` uses the `binaryFile` source + `mapInPandas` —
parallelism is per-archive, the standard Spark approach (one WARC is
~1 GiB by convention and a snapshot has tens of thousands, so the
file grain IS the right partition grain; splitting inside one gzip
stream would need a custom Hadoop input format for marginal gain).
Records stream through one pass per archive — no whole-archive
re-scans, no driver-side reads.

Malformed archives raise (bad version line, missing Content-Length,
truncated payload, missing record terminator) — consistent with the
codec family: parse per spec, never guess around.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"

RECORD_SCHEMA = T.StructType([
    T.StructField("archive", T.StringType()),
    T.StructField("record_idx", T.IntegerType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparently inflate .warc.gz archives: per-record gzip
    members are concatenated, which stdlib gzip handles in one call
    (it loops over members)."""
    if data[:2] != b"\x1f\x8b":
        return data
    try:
        return gzip.decompress(data)
    except (OSError, EOFError, zlib.error) as e:
        raise ValueError(f"WARC: corrupt gzip stream ({e})") from None


def _parse_headers(data: bytes, pos: int) -> tuple[dict, int]:
    """Parse CRLF-terminated `Name: value` lines up to the blank
    line; returns ({lower-name: value}, position after blank line).
    Handles RFC-style continuation lines (leading whitespace)."""
    headers: dict[str, str] = {}
    last = None
    while True:
        end = data.find(_CRLF, pos)
        if end < 0:
            raise ValueError("WARC: headers not CRLF-terminated")
        line = data[pos:end]
        pos = end + 2
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        sep = line.find(b":")
        if sep < 0:
            raise ValueError(
                f"WARC: malformed header line {line[:40]!r}"
            )
        name = line[:sep].strip().decode("latin-1").lower()
        headers[name] = line[sep + 1:].strip().decode("latin-1")
        last = name
    # unreachable


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, payload_bytes) per record from a plain or
    gzip'd WARC byte stream, walking Content-Length boundaries."""
    data = _maybe_gunzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        end = data.find(_CRLF, pos)
        if end < 0:
            raise ValueError("WARC: missing version line terminator")
        version = data[pos:end]
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"WARC: bad version line {version[:20]!r} at "
                f"offset {pos}"
            )
        headers, body_at = _parse_headers(data, end + 2)
        if "content-length" not in headers:
            raise ValueError("WARC: record missing Content-Length")
        length = int(headers["content-length"])
        body_end = body_at + length
        if body_end + 4 > n:
            raise ValueError(
                f"WARC: record payload truncated at offset {body_at}"
            )
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError(
                "WARC: record not terminated by CRLF CRLF"
            )
        yield headers, data[body_at:body_end]
        pos = body_end + 4


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoding body (RFC 9112
    §7.1): hex size line (chunk extensions after ';' ignored) + data
    + CRLF, terminated by a zero-size chunk; trailer headers after
    the last chunk are dropped.  Crawl archives store the payload as
    captured off the wire, so chunked bodies are common in real WARC
    data."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        end = body.find(_CRLF, pos)
        if end < 0:
            raise ValueError("WARC: chunked body missing size line")
        size_tok = body[pos:end].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"WARC: bad chunk size {size_tok[:16]!r}"
            ) from None
        pos = end + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are dropped
        if pos + size + 2 > n:
            raise ValueError("WARC: chunked body truncated")
        out += body[pos:pos + size]
        if body[pos + size:pos + size + 2] != _CRLF:
            raise ValueError("WARC: chunk data not CRLF-terminated")
        pos += size + 2


def _parse_http_response(payload: bytes) -> tuple[int, str, bytes]:
    """(status, content-type, body) from an HTTP/1.x response
    message; chunked transfer-encoding is decoded (archives store
    the wire format)."""
    end = payload.find(_CRLF)
    if end < 0 or not payload.startswith(b"HTTP/"):
        raise ValueError(
            f"WARC: response payload is not HTTP ({payload[:20]!r})"
        )
    parts = payload[:end].split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(
            f"WARC: malformed HTTP status line {payload[:40]!r}"
        )
    status = int(parts[1])
    headers, body_at = _parse_headers(payload, end + 2)
    body = payload[body_at:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return status, headers.get("content-type", ""), body


def parse_warc_bytes(
    archive: str, data: bytes
) -> Iterator[tuple]:
    """Row-tuples (RECORD_SCHEMA order) for every record in one
    archive; response records get their HTTP message parsed, other
    record types carry NULL status/content-type and the raw
    payload."""
    for i, (hdr, payload) in enumerate(iter_warc_records(data)):
        wtype = hdr.get("warc-type", "")
        status = ctype = None
        body = payload
        if wtype == "response":
            status, ctype, body = _parse_http_response(payload)
        yield (
            archive, i, wtype,
            hdr.get("warc-target-uri"),
            hdr.get("warc-date"),
            hdr.get("warc-record-id"),
            status, ctype, body,
        )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` over ``path`` (glob ok;
    .warc and .warc.gz mix freely) → one mapInPandas parse per
    archive.  Column pruning upstream of heavy bodies is the
    caller's job (select away `body` before wide shuffles)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(fpath, bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(fn, RECORD_SCHEMA)
    )


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def _warc_record(
    wtype: str, uri: str, date: str, rec_id: str, payload: bytes,
    extra: tuple[tuple[str, str], ...] = (),
) -> bytes:
    head = [b"WARC/1.0"]
    head.append(f"WARC-Type: {wtype}".encode())
    head.append(f"WARC-Target-URI: {uri}".encode())
    head.append(f"WARC-Date: {date}".encode())
    head.append(f"WARC-Record-ID: {rec_id}".encode())
    for k, v in extra:
        head.append(f"{k}: {v}".encode())
    head.append(f"Content-Length: {len(payload)}".encode())
    return (
        _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    )


def make_warc(
    doc_rows: list[tuple[int, str]], *, gzipped: bool = False
) -> bytes:
    """A genuine multi-record WARC byte stream from (doc_id, text)
    rows: one warcinfo record, then a request+response pair per doc
    (the real crawl layout).  Deterministic URIs/dates/ids from
    doc_id; ``gzipped`` emits per-record gzip members (the Common
    Crawl convention)."""
    recs = [_warc_record(
        "warcinfo", "urn:warcinfo", "2026-01-01T00:00:00Z",
        "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        b"software: metrics-advisor-spark-fixture\r\n",
    )]
    for doc_id, text in doc_rows:
        uri = f"https://example.org/doc/{doc_id}"
        date = (
            f"2026-01-{1 + doc_id % 28:02d}"
            f"T{doc_id % 24:02d}:00:00Z"
        )
        req = (
            f"GET /doc/{doc_id} HTTP/1.1\r\n"
            f"Host: example.org\r\n\r\n"
        ).encode()
        recs.append(_warc_record(
            "request", uri, date,
            f"<urn:uuid:req-{doc_id}>", req,
        ))
        body = f"<html><body>{text}</body></html>".encode()
        status = 200 if doc_id % 10 else 404
        if doc_id % 5 == 2:
            # chunked wire format (docs ≡2 mod 5): two chunks +
            # terminator — archives store responses as captured, so
            # the reader must dechunk
            k = len(body) // 2
            wire = (
                f"{k:x}".encode() + _CRLF + body[:k] + _CRLF
                + f"{len(body) - k:x}".encode() + _CRLF
                + body[k:] + _CRLF + b"0" + _CRLF + _CRLF
            )
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"Transfer-Encoding: chunked\r\n\r\n"
            ).encode() + wire
        else:
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        recs.append(_warc_record(
            "response", uri, date,
            f"<urn:uuid:resp-{doc_id}>", http,
        ))
    if gzipped:
        return b"".join(
            gzip.compress(r, compresslevel=1, mtime=0) for r in recs
        )
    return b"".join(recs)


# ---------------------------------------------------------------------------
# per-doc archive shape (contract-query surface): the same parser
# core over a binary column — one small WARC per doc — so the hash
# gate pins record splitting, header parsing, the gzip arm (odd
# doc_ids are per-record gzip members) and HTTP response extraction
# without needing a filesystem fixture.
# ---------------------------------------------------------------------------


def attach_warc_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, warc binary): a genuine 3-record WARC (warcinfo +
    request + response wrapping the doc text as HTML) per doc;
    odd doc_ids are gzip'd per-record (the Common Crawl layout)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "warc": [
                    make_warc([(int(d), str(t))], gzipped=int(d) % 2 == 1)
                    for d, t in zip(pdf[id_col], pdf[text_col])
                ],
            })

    return df.select(id_col, text_col).mapInPandas(
        fn, "doc_id long, warc binary"
    )


def warc_records_df(
    media: DataFrame, archive_col: str = "warc",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse a binary WARC column into RECORD_SCHEMA rows (the
    `archive` field carries the stringified doc id)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[archive_col]):
                rows.extend(
                    parse_warc_bytes(str(int(doc_id)), bytes(data))
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(fn, RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WET — Common Crawl's extracted-text sidecar format.  A WET file IS a
# WARC file whose content records are `WARC-Type: conversion` with a
# text/plain payload (the crawl's own HTML→text pass) plus a leading
# warcinfo; for text-only pipelines, reading WET skips the HTML parse
# entirely.  Same record walk, same per-record-gzip convention.
# ---------------------------------------------------------------------------


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET scan → (archive, target_uri, warc_date, text):
    the conversion records only, payloads decoded as UTF-8 (the WET
    convention; undecodable bytes are replaced, never fatal — WET text
    is already a lossy extraction)."""
    recs = read_warc(spark, path)
    from pyspark.sql import functions as F

    conv = recs.filter(F.col("warc_type") == "conversion")
    return conv.select(
        "archive", "target_uri", "warc_date",
        F.decode(F.col("body"), "UTF-8").alias("text"),
    )


def make_wet(
    doc_rows: list[tuple[int, str]], *, gzipped: bool = False
) -> bytes:
    """A genuine WET byte stream from (doc_id, text) rows: warcinfo +
    one conversion record per doc (deterministic URIs/dates from
    doc_id), per-record gzip members when ``gzipped``."""
    recs = [_warc_record(
        "warcinfo", "urn:warcinfo", "2026-01-01T00:00:00Z",
        "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        b"software: metrics-advisor-spark-fixture\r\n"
        b"format: WARC File Format 1.0\r\n",
    )]
    for doc_id, text in doc_rows:
        recs.append(_warc_record(
            "conversion",
            f"https://example.org/doc/{doc_id}",
            f"2026-01-01T00:00:{doc_id % 60:02d}Z",
            f"<urn:uuid:{doc_id:032x}>",
            text.encode("utf-8"),
            extra=(("Content-Type", "text/plain"),),
        ))
    if not gzipped:
        return b"".join(recs)
    return b"".join(gzip.compress(r) for r in recs)


def attach_wet_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, wet binary): a genuine single-doc WET stream
    (warcinfo + one conversion record) per doc; odd doc_ids gzip'd
    per-record — the same arm split as `attach_warc_payload`."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "wet": [
                    make_wet([(int(d), str(t))], gzipped=int(d) % 2 == 1)
                    for d, t in zip(pdf[id_col], pdf[text_col])
                ],
            })

    return df.select(id_col, text_col).mapInPandas(
        fn, "doc_id long, wet binary"
    )


# ---------------------------------------------------------------------------
# CDX-style archive index — the random-access companion every big
# archive collection ships (Common Crawl publishes a CDX per snapshot):
# (archive, offset, length) of each on-disk unit lets a consumer fetch
# ONE record with a ranged read + one-member gunzip instead of scanning
# the archive.  For .warc.gz the unit is the gzip MEMBER (the
# per-record-gzip convention exists precisely for this); for plain
# .warc it is the record span itself.
# ---------------------------------------------------------------------------


def iter_warc_members(
    data: bytes,
) -> Iterator[tuple[int, int, bytes]]:
    """Yield ``(offset, stored_length, record_bytes)`` per on-disk
    unit: gzip members for compressed archives (tracked via
    ``zlib.decompressobj(31)`` unused_data), CRLF-delimited record
    spans for plain ones."""
    n = len(data)
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < n:
            d = zlib.decompressobj(31)
            try:
                chunk = d.decompress(data[pos:])
            except zlib.error as e:
                raise ValueError(
                    f"WARC: corrupt gzip member at offset {pos} ({e})"
                ) from None
            if not d.eof:
                raise ValueError(
                    f"WARC: truncated gzip member at offset {pos}"
                )
            consumed = n - pos - len(d.unused_data)
            yield pos, consumed, chunk
            pos += consumed
        return
    pos = 0
    while pos < n:
        end = data.find(_CRLF, pos)
        if end < 0 or not data[pos:end].startswith(b"WARC/"):
            raise ValueError(
                f"WARC: bad version line at offset {pos}"
            )
        headers, body_at = _parse_headers(data, end + 2)
        if "content-length" not in headers:
            raise ValueError("WARC: record missing Content-Length")
        body_end = body_at + int(headers["content-length"])
        if data[body_end:body_end + 4] != _CRLF + _CRLF:
            raise ValueError("WARC: record not terminated by CRLF CRLF")
        yield pos, body_end + 4 - pos, data[pos:body_end + 4]
        pos = body_end + 4


def warc_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Distributed CDX build: one row per record — (archive, offset,
    length, warc_type, target_uri, warc_date, http_status).  offset/
    length address the ON-DISK unit (gzip member or plain span), so
    ``gunzip(archive[offset:offset+length])`` is exactly that record:
    the contract the random-access test pins.  One streaming pass per
    archive, per-archive parallelism (the read_warc grain)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for off, ln, chunk in iter_warc_members(bytes(content)):
                    for hdr, payload in iter_warc_records(chunk):
                        status = None
                        if hdr.get("warc-type") == "response":
                            status = _parse_http_response(payload)[0]
                        rows.append((
                            fpath, off, ln,
                            hdr.get("warc-type"),
                            hdr.get("warc-target-uri"),
                            hdr.get("warc-date"),
                            status,
                        ))
            yield pd.DataFrame(rows, columns=[
                "archive", "offset", "length", "warc_type",
                "target_uri", "warc_date", "http_status",
            ])

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(
            fn,
            "archive string, offset long, length long, "
            "warc_type string, target_uri string, warc_date string, "
            "http_status int",
        )
    )


def warc_cdx_records(
    media: DataFrame, archive_col: str = "warc",
    id_col: str = "doc_id",
) -> DataFrame:
    """CDX build over a binary ARCHIVE COLUMN (the testable twin of
    the path-level `warc_cdx` — same `iter_warc_members` walk):
    one row per record with the on-disk unit addressing plus
    ``archive_bytes`` (total payload size) so tiling invariants
    (offset continuity, full coverage) are checkable downstream.

    offset/length are zlib-OUTPUT-dependent for gzip members (the
    exact compressed byte spans), so cross-engine oracles should gate
    the content-derived columns + the tiling booleans, not the raw
    offsets — those are pinned by the byte-exact random-access unit
    test instead."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            id_col, "offset", "length", "archive_bytes", "warc_type",
            "target_uri", "warc_date", "http_status",
        ]
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[archive_col]):
                data = bytes(content)
                for off, ln, chunk in iter_warc_members(data):
                    for hdr, payload in iter_warc_records(chunk):
                        status = None
                        if hdr.get("warc-type") == "response":
                            status = _parse_http_response(payload)[0]
                        rows.append((
                            int(did), off, ln, len(data),
                            hdr.get("warc-type"),
                            hdr.get("warc-target-uri"),
                            hdr.get("warc-date"),
                            status,
                        ))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        fn,
        f"{id_col} long, offset long, length long, archive_bytes long, "
        "warc_type string, target_uri string, warc_date string, "
        "http_status int",
    )
