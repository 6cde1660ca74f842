"""ZIP archive source — the other container crawl and data drops
arrive in (alongside tar, `sources/csv_tar.py`, and WARC,
`sources/warc.py`): document dumps, dataset releases and scraped
bundles ship as .zip far more often than as bare files.

Layout parsed (PKWARE APPNOTE.TXT, the public ZIP specification):

  - End of Central Directory record (EOCD, ``PK\\x05\\x06``) found by
    a bounded backward scan (the trailing comment can push it up to
    65535 bytes from the end); the stored comment length must account
    for every remaining byte — trailing garbage is rejected, not
    skipped.
  - Central directory entries (``PK\\x01\\x02``) are AUTHORITATIVE for
    sizes/CRC (streamed archives with the bit-3 data descriptor leave
    the local copies zero); the walk must consume exactly the EOCD's
    ``cd_size`` bytes.
  - Local file headers (``PK\\x03\\x04``) locate the payload; the
    local file name must agree with the central one.
  - Compression: stored (0) and deflate (8, raw — stdlib
    ``zlib.decompressobj(-15)``); every entry's CRC-32 and
    uncompressed size are verified.
  - File names decode as UTF-8 when general-purpose flag bit 11 is
    set, else cp437 (the APPNOTE default).

Rejected cleanly (parse per spec, never guess): multi-disk/spanned
archives, encrypted entries (flag bit 0), compression methods other
than stored/deflate, ZIP64 (0xFFFF/0xFFFFFFFF sentinel fields or a
``PK\\x06\\x07`` locator), truncated payloads, CRC/size mismatches,
central/local name disagreement.

Scale: `read_zip` uses the ``binaryFile`` source + ``mapInPandas`` —
parallelism is per-archive (the same grain as `read_warc`: archives
are many and self-contained; splitting inside one deflate stream
buys nothing without a custom input format).  Entries stream out in
central-directory order, one pass per archive.

The encoder side (`make_zip`) emits genuine archives — real local
headers, central directory and EOCD, real raw-deflate members — and
the tests cross-validate BOTH directions against an independent
codec (stdlib ``zipfile``): it reads ours, we read its.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_EOCD_SIG = b"PK\x05\x06"
_CEN_SIG = b"PK\x01\x02"
_LOC_SIG = b"PK\x03\x04"
_ZIP64_LOC_SIG = b"PK\x06\x07"
_METHODS = {0: "stored", 8: "deflate"}
# fixed DOS timestamp (1980-01-01 00:00) keeps fixtures byte-stable
_DOS_DATE = 0x0021
_DOS_TIME = 0


def _find_eocd(data: bytes) -> tuple[int, int, int, int]:
    """Locate the EOCD record; returns (n_entries, cd_size, cd_off,
    eocd_off) after validating the single-disk and exact-comment
    invariants."""
    if len(data) < 22:
        raise ValueError("ZIP: shorter than an EOCD record")
    start = max(0, len(data) - 22 - 65535)
    idx = data.rfind(_EOCD_SIG, start)
    if idx < 0:
        raise ValueError("ZIP: end-of-central-directory not found")
    if idx + 22 > len(data):
        raise ValueError("ZIP: truncated EOCD record")
    (disk_num, cd_disk, n_disk, n_total, cd_size, cd_off,
     comment_len) = struct.unpack("<HHHHIIH", data[idx + 4:idx + 22])
    if idx + 22 + comment_len != len(data):
        raise ValueError("ZIP: EOCD comment length mismatch")
    if disk_num != 0 or cd_disk != 0 or n_disk != n_total:
        raise ValueError("ZIP: spanned/multi-disk archives unsupported")
    # the ZIP64 EOCD locator sits IMMEDIATELY before the EOCD record
    # (APPNOTE 4.3.15) — checking only that fixed slot avoids false
    # positives on signature bytes inside stored payloads
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF \
            or data[idx - 20:idx - 16] == _ZIP64_LOC_SIG:
        raise ValueError("ZIP: ZIP64 unsupported")
    return n_total, cd_size, cd_off, idx


def iter_zip_entries(
    data: bytes,
) -> Iterator[tuple[str, str, int, bytes]]:
    """Yield ``(name, method, n_bytes, payload)`` per entry in
    central-directory order, with CRC-32 and size verification.
    Raises ValueError on anything outside the documented scope."""
    n_total, cd_size, cd_off, eocd_off = _find_eocd(data)
    pos = cd_off
    end = cd_off + cd_size
    if end > eocd_off:
        raise ValueError("ZIP: central directory overlaps the EOCD")
    for _ in range(n_total):
        if data[pos:pos + 4] != _CEN_SIG:
            raise ValueError(
                f"ZIP: bad central-directory signature at byte {pos}"
            )
        if pos + 46 > len(data):
            raise ValueError("ZIP: truncated central-directory entry")
        (_ver_made, _ver_need, flags, method, _t, _d, crc, csize,
         usize, nlen, elen, clen, disk, _iattr, _eattr,
         lho) = struct.unpack("<HHHHHHIIIHHHHHII", data[pos + 4:pos + 46])
        if flags & 0x1:
            raise ValueError("ZIP: encrypted entries unsupported")
        if method not in _METHODS:
            raise ValueError(f"ZIP: compression method {method} unsupported")
        if disk != 0:
            raise ValueError("ZIP: spanned/multi-disk archives unsupported")
        if 0xFFFFFFFF in (csize, usize, lho):
            raise ValueError("ZIP: ZIP64 unsupported")
        raw_name = data[pos + 46:pos + 46 + nlen]
        if len(raw_name) != nlen:
            raise ValueError("ZIP: truncated central-directory entry")
        try:
            name = raw_name.decode("utf-8" if flags & 0x800 else "cp437")
        except UnicodeDecodeError:
            raise ValueError("ZIP: undecodable entry name") from None
        pos += 46 + nlen + elen + clen
        if pos > end:
            raise ValueError("ZIP: central directory overruns cd_size")

        # ---- local header → payload (central sizes authoritative)
        if data[lho:lho + 4] != _LOC_SIG:
            raise ValueError(
                f"ZIP: bad local-header signature at byte {lho}"
            )
        if lho + 30 > len(data):
            raise ValueError("ZIP: truncated local header")
        nlen2, elen2 = struct.unpack("<HH", data[lho + 26:lho + 30])
        if data[lho + 30:lho + 30 + nlen2] != raw_name:
            raise ValueError(
                "ZIP: local file name disagrees with the central one"
            )
        dstart = lho + 30 + nlen2 + elen2
        comp = data[dstart:dstart + csize]
        if len(comp) != csize:
            raise ValueError("ZIP: truncated entry payload")
        if method == 0:
            if csize != usize:
                raise ValueError(
                    "ZIP: stored entry with csize != usize"
                )
            payload = comp
        else:
            dec = zlib.decompressobj(-15)
            try:
                payload = dec.decompress(comp) + dec.flush()
            except zlib.error as e:
                raise ValueError(f"ZIP: bad deflate stream ({e})") from None
        if len(payload) != usize:
            raise ValueError(
                f"ZIP: entry {name!r} inflates to {len(payload)} "
                f"bytes, central directory says {usize}"
            )
        if zlib.crc32(payload) != crc:
            raise ValueError(f"ZIP: CRC mismatch on entry {name!r}")
        yield name, _METHODS[method], usize, payload
    if pos != end:
        raise ValueError("ZIP: central directory shorter than cd_size")


def parse_zip_bytes(data: bytes) -> list[dict]:
    """All entries as dict rows (name, method, n_bytes, payload)."""
    return [
        {"name": n, "method": m, "n_bytes": s, "payload": p}
        for n, m, s, p in iter_zip_entries(data)
    ]


# -------------------------------------------------------------- encoder


def make_zip(
    entries: list[tuple[str, bytes]], *,
    methods: list[str] | None = None, utf8_names: bool = False,
    comment: bytes = b"",
) -> bytes:
    """A genuine ZIP archive: real local headers, raw-deflate members,
    central directory and EOCD.  ``methods`` per entry ('stored' /
    'deflate', default all deflate); stdlib ``zipfile`` reads the
    output (cross-validated in tests)."""
    methods = methods or ["deflate"] * len(entries)
    if len(methods) != len(entries):
        raise ValueError("methods/entries length mismatch")
    flags = 0x800 if utf8_names else 0
    body = bytearray()
    central = bytearray()
    for (name, payload), meth in zip(entries, methods):
        raw_name = name.encode("utf-8" if utf8_names else "cp437")
        crc = zlib.crc32(payload)
        if meth == "stored":
            method, comp = 0, payload
        elif meth == "deflate":
            cobj = zlib.compressobj(6, zlib.DEFLATED, -15)
            method, comp = 8, cobj.compress(payload) + cobj.flush()
        else:
            raise ValueError(f"unknown method {meth!r}")
        lho = len(body)
        body += _LOC_SIG + struct.pack(
            "<HHHHHIIIHH", 20, flags, method, _DOS_TIME, _DOS_DATE,
            crc, len(comp), len(payload), len(raw_name), 0,
        ) + raw_name + comp
        central += _CEN_SIG + struct.pack(
            "<HHHHHHIIIHHHHHII", 20, 20, flags, method, _DOS_TIME,
            _DOS_DATE, crc, len(comp), len(payload), len(raw_name),
            0, 0, 0, 0, 0, lho,
        ) + raw_name
    cd_off = len(body)
    out = bytes(body) + bytes(central) + _EOCD_SIG + struct.pack(
        "<HHHHIIH", 0, 0, len(entries), len(entries), len(central),
        cd_off, len(comment),
    ) + comment
    return out


# -------------------------------------------------------- Spark surface


def read_zip(spark: SparkSession, path: str) -> DataFrame:
    """Scan a directory of .zip archives → one row per entry:
    (archive, entry, method, n_bytes, body).  binaryFile source —
    per-archive parallelism, one streaming pass per archive."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path)
        .select("path", "content")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"archive": [], "entry": [], "method": [],
                    "n_bytes": [], "body": []}
            for path_, content in zip(b["path"], b["content"]):
                for name, meth, size, payload in iter_zip_entries(
                        bytes(content)):
                    rows["archive"].append(path_)
                    rows["entry"].append(name)
                    rows["method"].append(meth)
                    rows["n_bytes"].append(size)
                    rows["body"].append(payload)
            yield pd.DataFrame(rows)

    return files.mapInPandas(
        fn,
        "archive string, entry string, method string, n_bytes long, "
        "body binary",
    )


def attach_zip_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, zip binary): every doc's text wrapped into a genuine
    two-entry archive — ``doc_<id>.txt`` carries the text (deflate on
    odd ids, stored on even) and ``meta/info-<id>.txt`` carries an
    analytic marker (deflate on id%3==0) — the same joint-pin fixture
    pattern as `attach_pdf_payload`."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = [
                make_zip(
                    [
                        (f"doc_{int(d)}.txt", t.encode("utf-8")),
                        (f"meta/info-{int(d)}.txt",
                         f"id={int(d)}".encode("ascii")),
                    ],
                    methods=[
                        "deflate" if int(d) % 2 == 1 else "stored",
                        "deflate" if int(d) % 3 == 0 else "stored",
                    ],
                )
                for d, t in zip(b[id_col], b[text_col])
            ]
            yield pd.DataFrame({"doc_id": b[id_col], "zip": payloads})

    return df.select(id_col, text_col).mapInPandas(
        fn, "doc_id long, zip binary"
    )


def extract_zip_entries(
    media: DataFrame, zip_col: str = "zip", *, strict: bool = True,
) -> DataFrame:
    """(doc_id, entry_name, method, n_bytes, text) per archive entry.
    Per-payload bounded-state parse inside one Arrow batch — payloads
    never cross a shuffle (the `extract_pdf_text` shape).

    ``strict=False`` is the quarantine mode: malformed archives come
    back as one row with null fields and the ValueError text in an
    ``error`` column instead of killing the task."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {
                "doc_id": [], "entry_name": [], "method": [],
                "n_bytes": [], "text": [],
            }
            if not strict:
                rows["error"] = []
            for d, payload in zip(b["doc_id"], b[zip_col]):
                try:
                    for name, meth, size, data in iter_zip_entries(
                            bytes(payload)):
                        rows["doc_id"].append(d)
                        rows["entry_name"].append(name)
                        rows["method"].append(meth)
                        rows["n_bytes"].append(size)
                        rows["text"].append(data.decode("utf-8"))
                        if not strict:
                            rows["error"].append(None)
                except (ValueError, UnicodeDecodeError) as e:
                    if strict:
                        raise
                    rows["doc_id"].append(d)
                    for k in ("entry_name", "method", "n_bytes",
                              "text"):
                        rows[k].append(None)
                    rows["error"].append(str(e))
            yield pd.DataFrame(rows)

    schema = ("doc_id long, entry_name string, method string, "
              "n_bytes long, text string")
    if not strict:
        schema += ", error string"
    return media.mapInPandas(fn, schema)
