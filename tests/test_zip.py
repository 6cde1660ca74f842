"""ZIP source (`sources/zip_archive.py`): encode→parse roundtrips,
TWO-SIDED cross-validation against an independent codec (stdlib
zipfile reads our archives, we read its), the rejection matrix via
byte patches at spec offsets, and the Spark surfaces."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from metrics_advisor_spark.sources.zip_archive import (
    attach_zip_payload,
    extract_zip_entries,
    iter_zip_entries,
    make_zip,
    parse_zip_bytes,
    read_zip,
)

_ENTRIES = [
    ("a.txt", b"hello world " * 40),
    ("dir/b.bin", bytes(range(256)) * 10),
    ("empty.txt", b""),
]


def test_roundtrip_grid():
    for methods in (["deflate"] * 3, ["stored"] * 3,
                    ["deflate", "stored", "deflate"]):
        z = make_zip(_ENTRIES, methods=methods)
        got = [(n, m, s, p) for n, m, s, p in iter_zip_entries(z)]
        assert [(n, p) for n, m, s, p in got] == _ENTRIES
        assert [m for n, m, s, p in got] == methods
        assert [s for n, m, s, p in got] == [
            len(p) for _, p in _ENTRIES
        ]


def test_two_sided_stdlib_cross_validation():
    # stdlib reads OURS
    z = make_zip(_ENTRIES, methods=["deflate", "stored", "deflate"])
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert [(i.filename, zf.read(i)) for i in zf.infolist()] == _ENTRIES
    assert zf.testzip() is None  # stdlib's own CRC pass
    # we read STDLIB's (deflate, stored, comment, nesting)
    for comp in (zipfile.ZIP_DEFLATED, zipfile.ZIP_STORED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", comp) as out:
            out.comment = b"trailing comment bytes"
            for n, p in _ENTRIES:
                out.writestr(n, p)
        got = [(r["name"], r["payload"])
               for r in parse_zip_bytes(buf.getvalue())]
        assert got == _ENTRIES
    # utf-8 flagged names, both directions
    z8 = make_zip([("héllo.txt", b"x")], utf8_names=True)
    assert zipfile.ZipFile(io.BytesIO(z8)).namelist() == ["héllo.txt"]
    assert next(iter_zip_entries(z8))[0] == "héllo.txt"


def _patch(z: bytes, off: int, data: bytes) -> bytes:
    return z[:off] + data + z[off + len(data):]


def _expect(z: bytes, msg: str) -> None:
    with pytest.raises(ValueError, match=msg):
        list(iter_zip_entries(z))


def test_rejections():
    z = make_zip(_ENTRIES, methods=["stored", "stored", "stored"])
    cen = z.index(b"PK\x01\x02")
    eocd = z.rindex(b"PK\x05\x06")
    _expect(b"notazip", "shorter than an EOCD record")
    _expect(b"x" * 64, "end-of-central-directory not found")
    _expect(z + b"garbage", "EOCD comment length mismatch")
    # spanned: EOCD disk number
    _expect(_patch(z, eocd + 4, struct.pack("<H", 1)),
            "spanned/multi-disk")
    # spanned: central-directory entry disk-start
    _expect(_patch(z, cen + 34, struct.pack("<H", 2)),
            "spanned/multi-disk")
    # ZIP64 sentinels
    _expect(
        _patch(z, eocd + 8, struct.pack("<HH", 0xFFFF, 0xFFFF)),
        "ZIP64 unsupported",
    )
    # encrypted entry (flag bit 0)
    _expect(_patch(z, cen + 8, struct.pack("<H", 0x1)),
            "encrypted entries unsupported")
    # unsupported method (bzip2 = 12)
    _expect(_patch(z, cen + 10, struct.pack("<H", 12)),
            "compression method 12 unsupported")
    # stored entry with usize != csize
    first_usize = struct.unpack("<I", z[cen + 24:cen + 28])[0]
    _expect(
        _patch(z, cen + 24, struct.pack("<I", first_usize + 1)),
        "csize != usize",
    )
    # CRC mismatch: flip one payload byte of the first stored entry
    body = z.index(b"hello world")
    _expect(_patch(z, body, b"jello"), "CRC mismatch")
    # local/central name disagreement
    loc_name = z.index(b"a.txt")
    _expect(_patch(z, loc_name, b"x.txt"),
            "local file name disagrees")
    # central directory shorter than cd_size
    cd_size = struct.unpack("<I", z[eocd + 12:eocd + 16])[0]
    _expect(
        _patch(z, eocd + 12, struct.pack("<I", cd_size + 46)),
        "overlaps the EOCD|overruns cd_size",
    )
    # deflate stream corruption
    zd = make_zip([("d.txt", b"compressible " * 50)],
                  methods=["deflate"])
    dstart = zd.index(b"d.txt") + 5
    _expect(_patch(zd, dstart + 4, b"\xff\xff\xff\xff"),
            "bad deflate stream|CRC mismatch|inflates to")


def test_spark_read_zip(spark, tmp_path):
    (tmp_path / "one.zip").write_bytes(
        make_zip([("x.txt", b"xx"), ("y.txt", b"yyy")],
                 methods=["stored", "deflate"])
    )
    (tmp_path / "two.zip").write_bytes(make_zip([("z.txt", b"z")]))
    (tmp_path / "ignored.bin").write_bytes(b"not a zip")
    rows = read_zip(spark, str(tmp_path)).collect()
    got = sorted((r["entry"], r["method"], r["n_bytes"],
                  bytes(r["body"])) for r in rows)
    assert got == [
        ("x.txt", "stored", 2, b"xx"),
        ("y.txt", "deflate", 3, b"yyy"),
        ("z.txt", "deflate", 1, b"z"),
    ]
    assert all(r["archive"].endswith(".zip") for r in rows)


def test_spark_wrappers_and_quarantine(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(6)],
        "doc_id long, text string",
    )
    out = extract_zip_entries(attach_zip_payload(df)).collect()
    assert len(out) == 12
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(6):
        doc, meta = sorted(by_doc[i], key=lambda r: r["entry_name"])
        assert doc["entry_name"] == f"doc_{i}.txt"
        assert doc["text"] == f"doc {i} body text"
        assert doc["method"] == ("deflate" if i % 2 else "stored")
        assert meta["entry_name"] == f"meta/info-{i}.txt"
        assert meta["text"] == f"id={i}"
        assert meta["method"] == ("deflate" if i % 3 == 0 else "stored")

    bad = spark.createDataFrame(
        [(1, bytearray(make_zip([("ok.txt", b"fine")]))),
         (2, bytearray(b"PK\x03\x04 but no directory"))],
        "doc_id long, zip binary",
    )
    rows = {r["doc_id"]: r
            for r in extract_zip_entries(bad, strict=False).collect()}
    assert rows[1]["text"] == "fine" and rows[1]["error"] is None
    assert rows[2]["text"] is None
    assert "EOCD" in rows[2]["error"]
    with pytest.raises(Exception):
        extract_zip_entries(bad).collect()


def test_truncation_raises_valueerror_not_struct_error():
    # review finding r13: truncated directory slices hit struct.error,
    # which escapes the quarantine handler and kills the task
    z = make_zip(_ENTRIES, methods=["stored"] * 3)
    cen = z.index(b"PK\x01\x02")
    eocd = z.rindex(b"PK\x05\x06")
    # EOCD signature present but record cut short
    _expect(z[:eocd + 10], "end-of-central-directory not found|"
            "truncated EOCD|EOCD comment length mismatch")
    # central-directory entry cut mid-struct: move the EOCD's cd_off
    # to point just before the real directory END so the sig check
    # passes but the 46-byte header cannot
    short = z[:cen + 20] + z[eocd:]
    short = _patch(short, short.rindex(b"PK\x05\x06") + 16,
                   struct.pack("<I", cen))
    with pytest.raises(ValueError):
        list(iter_zip_entries(short))
    # quarantine mode survives arbitrary truncations end-to-end
    from metrics_advisor_spark.sources.zip_archive import (
        iter_zip_entries as it,
    )
    for cut in (len(z) - 1, eocd + 5, cen + 30, 30, 3):
        with pytest.raises(ValueError):
            list(it(z[:cut]))


def test_zip64_locator_sig_in_payload_not_false_positive():
    # review finding r13: the locator check must probe only the fixed
    # slot before the EOCD (APPNOTE 4.3.15) — signature bytes inside a
    # STORED payload near the end of the archive are data, not ZIP64
    z = make_zip([("tail.bin", b"x" * 8 + b"PK\x06\x07" + b"y" * 4)],
                 methods=["stored"])
    (name, meth, size, payload), = list(iter_zip_entries(z))
    assert b"PK\x06\x07" in payload and name == "tail.bin"
    # a real locator in the fixed slot still rejects
    eocd = z.rindex(b"PK\x05\x06")
    fake = z[:eocd] + b"PK\x06\x07" + b"\x00" * 16 + z[eocd:]
    # splice breaks the comment-length invariant too, so accept either
    with pytest.raises(ValueError,
                       match="ZIP64 unsupported|comment length"):
        list(iter_zip_entries(fake))
