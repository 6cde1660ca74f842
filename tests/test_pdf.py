"""PDF text extraction (`functions/pdf.py`): encode→parse roundtrips
across the feature grid (Flate, multi-page, TJ kerning, hex strings,
octal escapes, WinAnsi high bytes), the rejection matrix, incremental
updates, and the Spark wrappers.  Mutation tests use SAME-LENGTH byte
substitutions so the xref offsets stay honest."""

from __future__ import annotations

import re
import zlib

import pytest

from metrics_advisor_spark.functions.pdf import (
    _a85_decode,
    _ahx_decode,
    _lzw_decode,
    _lzw_encode,
    _parse_tounicode,
    attach_pdf_payload,
    encode_pdf,
    extract_pdf_text,
    pdf_text,
)

_TEXT = (
    "key agg row scan slow fast table value part hash value table "
    "part a row fast merge batch part value"
)


@pytest.mark.parametrize("kw", [
    {},
    {"compress": True},
    {"n_pages": 2},
    {"n_pages": 3, "compress": True},
    {"use_tj": True},
    {"hex_strings": True},
    {"octal_first": True},
    {"n_pages": 2, "compress": True, "use_tj": True,
     "hex_strings": True, "octal_first": True},
])
def test_roundtrip_grid(kw):
    p = encode_pdf(_TEXT, **kw)
    n_pages, tx = pdf_text(p)
    assert n_pages == kw.get("n_pages", 1)
    assert tx.replace("\n", " ") == _TEXT


def test_arms_actually_fire():
    long = " ".join(f"w{i}" for i in range(40))
    hexed = encode_pdf(long, hex_strings=True)
    assert re.search(rb"<[0-9a-f]+> Tj", hexed), "hex arm inert"
    assert pdf_text(hexed)[1].replace("\n", " ") == long
    tj = encode_pdf(long, use_tj=True)
    assert b"] TJ" in tj, "TJ arm inert"
    assert pdf_text(tj)[1].replace("\n", " ") == long
    octal = encode_pdf(long, octal_first=True)
    assert re.search(rb"\(\\[0-7]{3}", octal), "octal arm inert"
    assert pdf_text(octal)[1].replace("\n", " ") == long
    assert b"/FlateDecode" in encode_pdf(long, compress=True)


def test_string_escapes_and_winansi():
    tricky = r"parens (x) and \back\ and )( mix"
    assert pdf_text(encode_pdf(tricky))[1].replace("\n", " ") == tricky
    hi = "café naïve —dash’s €uro"
    assert pdf_text(encode_pdf(hi))[1].replace("\n", " ") == hi
    assert pdf_text(encode_pdf("single"))[1] == "single"


def test_multipage_line_structure():
    # 20 words, 3 pages → ceil split 7/7/6; 8 words per line
    words = [f"w{i}" for i in range(20)]
    n_pages, tx = pdf_text(encode_pdf(" ".join(words), n_pages=3))
    assert n_pages == 3
    lines = tx.split("\n")
    assert [len(ln.split(" ")) for ln in lines] == [7, 7, 6]
    assert " ".join(lines) == " ".join(words)


def test_incremental_update_prev_chain():
    # append an update section that re-points the catalog at a NEW
    # pages tree carrying different text; /Prev must chain back for
    # the untouched objects, and later sections must win
    base = encode_pdf("old words here")
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", base):
        pass
    old_xref = int(m.group(1))
    upd = bytearray(base)

    def add_obj(num: int, body: bytes) -> int:
        off = len(upd)
        upd.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")
        return off

    content = b"BT /F1 12 Tf 72 720 Td (new words) Tj ET"
    offs = {
        20: add_obj(20, b"<< /Length %d >>\nstream\n" % len(content)
                    + content + b"\nendstream"),
        21: add_obj(
            21,
            b"<< /Type /Page /Parent 22 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> "
            b"/Contents 20 0 R >>",
        ),
        22: add_obj(
            22, b"<< /Type /Pages /Kids [21 0 R] /Count 1 >>"
        ),
        1: add_obj(1, b"<< /Type /Catalog /Pages 22 0 R >>"),
    }
    xref_off = len(upd)
    upd.extend(b"xref\n")
    for num in sorted(offs):
        upd.extend(b"%d 1\n%010d 00000 n \n" % (num, offs[num]))
    upd.extend(
        b"trailer\n<< /Size 23 /Root 1 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (old_xref, xref_off)
    )
    n_pages, tx = pdf_text(bytes(upd))
    assert (n_pages, tx) == (1, "new words")
    # the base document still parses on its own
    assert pdf_text(base)[1].replace("\n", " ") == "old words here"


def _expect(payload: bytes, msg: str) -> None:
    with pytest.raises(ValueError, match=re.escape(msg)):
        pdf_text(payload)


def test_rejections():
    good = encode_pdf("hello world", compress=True)
    _expect(b"GIF89a" + good[6:], "missing %PDF- header")
    # same-length substitutions keep every xref offset honest
    _expect(good.replace(b"/Root 1 0 R", b"/Rook 1 0 R"), "/Root")
    _expect(
        good.replace(b"/FlateDecode", b"/XlateDecode"),
        "filter /XlateDecode unsupported",
    )
    # Type0 with a simple-font /Encoding: not Identity-H -> reject
    _expect(
        good.replace(b"/Subtype /Type1", b"/Subtype /Type0"),
        "CID",
    )
    _expect(good.replace(b"/Count 1", b"/Count 7"),
            "/Count 7 != 1 leaf pages")
    _expect(good[: good.rindex(b"startxref")], "no startxref")
    # same-digit /Length bump: stream no longer ends at endstream
    m = re.search(rb"/Length (\d+)", good)
    ln = int(m.group(1))
    bump = good.replace(
        b"/Length %d" % ln, b"/Length %d" % (ln + 9), 1
    )
    _expect(bump, "missing endstream")


def test_encrypt_rejected():
    # /Size N -> /Encrypt is longer; rebuild via incremental trailer
    good = encode_pdf("hello")
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", good):
        pass
    xref_off = int(m.group(1))
    upd = bytearray(good)
    new_xref = len(upd)
    upd.extend(
        b"xref\n0 1\n0000000000 65535 f \ntrailer\n"
        b"<< /Size 9 /Root 1 0 R /Encrypt 8 0 R /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (xref_off, new_xref)
    )
    _expect(bytes(upd), "encrypted")


def test_startxref_at_non_xref_object_rejected():
    # startxref pointing at a plain object (not /Type /XRef) must fail
    # loudly, not be misread as a cross-reference stream
    good = encode_pdf("hello")
    m = re.search(rb"startxref\n(\d+)", good)
    first_obj = good.index(b"1 0 obj")
    patched = good.replace(
        m.group(0), b"startxref\n%d" % first_obj
    )
    _expect(patched, "not /Type /XRef")


@pytest.mark.parametrize("kw", [
    {"xref_stream": True},
    {"xref_stream": True, "compress": True, "n_pages": 3},
    {"xref_stream": True, "use_tj": True, "hex_strings": True,
     "octal_first": True, "n_pages": 2},
])
def test_xref_stream_roundtrip(kw):
    # the PDF 1.5 layout: dictionaries in an object stream, xref as a
    # Flate stream under the PNG Up predictor
    long = " ".join(f"w{i}" for i in range(30))
    p = encode_pdf(long, **kw)
    assert p.startswith(b"%PDF-1.5")
    assert b"/Type /ObjStm" in p and b"/Type /XRef" in p
    assert b"trailer" not in p  # no classic table at all
    n_pages, tx = pdf_text(p)
    assert n_pages == kw.get("n_pages", 1)
    assert tx.replace("\n", " ") == long


def test_xref_stream_rejections():
    good = encode_pdf("hello world", xref_stream=True)
    _expect(good.replace(b"/W [1 4 2]", b"/W [1 4 9]"), "bad xref stream /W")
    _expect(good.replace(b"/Type /XRef", b"/Type /XRfe"), "not /Type /XRef")
    _expect(
        good.replace(b"/Predictor 12", b"/Predictor 02"),
        "TIFF predictor 2 unsupported",
    )
    _expect(
        good.replace(b"/Type /ObjStm", b"/Type /ObjStx"),
        "not /Type /ObjStm",
    )
    # /Index claiming more rows than the stream carries
    m = re.search(rb"/Index \[0 (\d+)\]", good)
    n = int(m.group(1))
    _expect(
        good.replace(m.group(0), b"/Index [0 %d]" % (n + 9)),
        "shorter than /Index",
    )


def test_standard_encoding_ascii_only():
    # strip the /Encoding entry (same-length pad) → StandardEncoding;
    # high bytes must then be rejected, ASCII still decodes
    p = encode_pdf("plain ascii words only here")
    pad = b"/Encoding /WinAnsiEncoding"
    p2 = p.replace(pad, b" " * len(pad))
    assert pdf_text(p2)[1].replace("\n", " ") == \
        "plain ascii words only here"
    hi = encode_pdf("café")
    hi2 = hi.replace(pad, b" " * len(pad))
    _expect(hi2, "outside the ASCII subset")


def test_unbalanced_string_rejected():
    p = encode_pdf("abc def")
    # kill the closing paren of the only Tj string (same length)
    patched = p.replace(b"(abc def) Tj", b"(abc def  Tj")
    _expect(patched, "unterminated literal string")


@pytest.mark.parametrize("kw", [
    {"cid": True},
    {"cid": True, "compress": True, "n_pages": 2},
    {"cid": True, "use_tj": True},
    {"cid": True, "xref_stream": True},
    {"differences": True},
    {"differences": True, "use_tj": True, "hex_strings": True,
     "octal_first": True, "n_pages": 2},
    {"alt_filter": "lzw"},
    {"alt_filter": "ahx"},
    {"alt_filter": "a85"},
    {"alt_filter": "a85flate"},
    {"cid": True, "alt_filter": "lzw", "xref_stream": True},
])
def test_r13_roundtrip_grid(kw):
    p = encode_pdf(_TEXT, **kw)
    n_pages, tx = pdf_text(p)
    assert n_pages == kw.get("n_pages", 1)
    assert tx.replace("\n", " ") == _TEXT


def test_r13_arms_actually_fire():
    cid = encode_pdf("fine fish final fit", cid=True)
    assert b"/Identity-H" in cid and b"/ToUnicode" in cid
    assert b"beginbfrange" in cid and b"beginbfchar" in cid
    # the 'fi' ligature CID carries a TWO-code-unit destination
    assert b"<0100> <00660069>" in cid
    assert pdf_text(cid)[1] == "fine fish final fit"

    diff = encode_pdf("not a tent", differences=True)
    assert b"/Differences [129 /e 141 /t 143 /a /o 157 /n]" in diff
    # the remapped cp1252-undefined bytes really appear in the stream
    assert b"\x81" not in diff.split(b"stream")[0]
    assert b"\x8d" in diff and b"\x9d" in diff
    assert pdf_text(diff)[1] == "not a tent"

    for alt, marker in [("lzw", b"/LZWDecode"),
                        ("ahx", b"/ASCIIHexDecode"),
                        ("a85", b"/ASCII85Decode"),
                        ("a85flate",
                         b"/Filter [/ASCII85Decode /FlateDecode]")]:
        p = encode_pdf(_TEXT, alt_filter=alt)
        assert marker in p, alt
        assert pdf_text(p)[1].replace("\n", " ") == _TEXT


def test_cid_unicode_and_hex_show():
    hi = "café naïve —dash’s €uro fit"
    p = encode_pdf(hi, cid=True)
    assert pdf_text(p)[1] == hi
    # show strings are 2-byte-code hex strings, never literals
    body = p.split(b"stream", 1)[1]
    assert re.search(rb"<[0-9a-f]{4,}> Tj", body)


def test_differences_rejections():
    diff = encode_pdf("no tent", differences=True)
    # same-length glyph-name patch: /n -> /nx (not in the AGL table)
    _expect(diff.replace(b" /n]", b"/nx]"),
            "glyph name /nx not in the bounded AGL table")
    # same-length patch: a name before any code
    _expect(diff.replace(b"[129 /e", b"[/q 29 "),
            "name before any code")
    # an EMPTY Differences array is valid and falls back to the base
    good = encode_pdf("hello world", compress=True)
    ok = good.replace(b"/Encoding /WinAnsiEncoding >>",
                      b"/Encoding<</Differences[]>>>>")
    assert pdf_text(ok)[1] == "hello world"


def test_tounicode_rejections():
    cid = encode_pdf("fit for use", cid=True)
    # Type0 whose /ToUnicode key vanished (same-length rename)
    _expect(cid.replace(b"/ToUnicode", b"/ToUnicorn"),
            "without a /ToUnicode CMap")
    # 1-byte codespace (same-length patch)
    _expect(cid.replace(b"<0000> <FFFF>", b"<00> <FFFFFF>"),
            "only 2-byte ToUnicode code spaces")
    # unit-level CMap rejections
    base = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n%s")
    _parse_tounicode(base % b"1 beginbfchar <0041> <0042> endbfchar")
    with pytest.raises(ValueError, match="odd bfchar"):
        _parse_tounicode(base % b"1 beginbfchar <0041> endbfchar")
    with pytest.raises(ValueError, match="not UTF-16BE"):
        _parse_tounicode(
            base % b"1 beginbfchar <0041> <00d800> endbfchar"
        )
    with pytest.raises(ValueError, match="hi < lo"):
        _parse_tounicode(
            base % b"1 beginbfrange <0042> <0041> <0043> endbfrange"
        )
    with pytest.raises(ValueError, match="array mismatch"):
        _parse_tounicode(
            base % b"1 beginbfrange <0041> <0043> [<0044> <0045>] "
            b"endbfrange"
        )
    with pytest.raises(ValueError, match="maps nothing"):
        _parse_tounicode(base % b"")
    # a CID outside the map must fail loudly at show time: bump the
    # first code of the first SHOW string only (the CMap's own hex
    # strings must stay untouched)
    m = re.search(rb"<([0-9a-f]{4,})> Tj", cid)
    missing = cid[:m.start(1)] + b"7" + cid[m.start(1) + 1:]
    with pytest.raises(ValueError, match="no /ToUnicode mapping"):
        pdf_text(missing)


def test_lzw_codec():
    # deterministic vectors + boundary fuzz, decoder is the inverse
    import random
    rng = random.Random(13)
    cases = [b"", b"A", b"AAAAAA", b"TOBEORNOTTOBEORTOBEORNOT",
             bytes(range(256)) * 40]
    for _ in range(25):
        alpha = rng.choice([b"ab", b"abcdefgh", bytes(range(256))])
        cases.append(bytes(rng.choice(alpha)
                           for _ in range(rng.randrange(0, 9000))))
    # force table saturation -> mid-stream clear + width reset
    cases.append(bytes(range(256)) * 600)
    # regression: a stream whose FINAL data code lands exactly on the
    # 511-entry width boundary (the decoder appends an entry for the
    # final code that the encoder never assigns; EOD must be written
    # at the bumped width)
    from metrics_advisor_spark.functions.pdf import _cid_assignment
    cases.append(_cid_assignment("q r s")[2])
    for data in cases:
        assert _lzw_decode(_lzw_encode(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(b"")
    with pytest.raises(ValueError, match="truncated"):
        _lzw_decode(_lzw_encode(b"hello hello hello")[:-2])


def test_ascii_filters_vs_stdlib():
    import base64
    import binascii
    import random
    rng = random.Random(99)
    for _ in range(40):
        data = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 300)))
        assert _a85_decode(base64.a85encode(data) + b"~>") == data
        assert _ahx_decode(binascii.hexlify(data) + b">") == data
    # whitespace tolerated, EOD required, 'z' shorthand honored
    assert _a85_decode(b"z ~>") == b"\x00\x00\x00\x00"
    assert _ahx_decode(b"48 6\n9>") == b"Hi"
    with pytest.raises(ValueError, match="missing '~>'"):
        _a85_decode(b"9jqo")
    with pytest.raises(ValueError, match="missing '>'"):
        _ahx_decode(b"4869")
    with pytest.raises(ValueError, match="1-digit final"):
        _a85_decode(b"9~>")
    with pytest.raises(ValueError, match="bad ASCIIHex digit"):
        _ahx_decode(b"48zz>")
    with pytest.raises(ValueError, match="'z' inside"):
        _a85_decode(b"9jz~>")


def test_spark_wrappers(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} words " * 3 + "tail") for i in range(12)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_pages"], r["text"])
        for r in extract_pdf_text(attach_pdf_payload(df)).collect()
    }
    assert len(got) == 12
    for i in range(12):
        n_pages, tx = got[i]
        assert n_pages == 1 + i % 3
        assert tx.replace("\n", " ") == f"doc {i} words " * 3 + "tail"


def test_quarantine_mode(spark):
    good = encode_pdf("fine words here")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"GIF89a not a pdf"))],
        "doc_id long, pdf binary",
    )
    rows = {r["doc_id"]: r
            for r in extract_pdf_text(df, strict=False).collect()}
    assert rows[1]["text"].replace("\n", " ") == "fine words here"
    assert rows[1]["error"] is None
    assert rows[2]["text"] is None
    assert "missing %PDF- header" in rows[2]["error"]
    with pytest.raises(Exception):
        extract_pdf_text(df).collect()


def test_agl_table_vs_unicodedata():
    # the bounded AGL table cross-checked against an INDEPENDENT
    # source (unicodedata): accented-Latin names follow the
    # letter+accent rule, punctuation/typographic names match their
    # canonical Unicode character names
    import unicodedata

    from metrics_advisor_spark.functions.pdf import _AGL

    accents = {
        "grave": "GRAVE", "acute": "ACUTE",
        "circumflex": "CIRCUMFLEX", "tilde": "TILDE",
        "dieresis": "DIAERESIS", "ring": "RING ABOVE",
        "cedilla": "CEDILLA",
    }
    n_accented = 0
    for name, ch in _AGL.items():
        for suffix, uni in accents.items():
            if (len(name) > 1 and name[0].isalpha()
                    and name[1:] == suffix and len(ch) == 1):
                case = "CAPITAL" if name[0].isupper() else "SMALL"
                assert unicodedata.name(ch) == (
                    f"LATIN {case} LETTER {name[0].upper()} WITH {uni}"
                ), name
                n_accented += 1
    assert n_accented >= 40  # the Latin-1 accent block is present
    spot = {
        "Euro": "EURO SIGN",
        "germandbls": "LATIN SMALL LETTER SHARP S",
        "AE": "LATIN CAPITAL LETTER AE",
        "oe": "LATIN SMALL LIGATURE OE",
        "Oslash": "LATIN CAPITAL LETTER O WITH STROKE",
        "thorn": "LATIN SMALL LETTER THORN",
        "Eth": "LATIN CAPITAL LETTER ETH",
        "endash": "EN DASH", "emdash": "EM DASH",
        "ellipsis": "HORIZONTAL ELLIPSIS",
        "perthousand": "PER MILLE SIGN",
        "florin": "LATIN SMALL LETTER F WITH HOOK",
        "fraction": "FRACTION SLASH", "minus": "MINUS SIGN",
        "quotesinglbase": "SINGLE LOW-9 QUOTATION MARK",
        "guilsinglleft": "SINGLE LEFT-POINTING ANGLE QUOTATION MARK",
        "guillemotleft": "LEFT-POINTING DOUBLE ANGLE QUOTATION MARK",
        "mu": "MICRO SIGN",
        "circumflex": "MODIFIER LETTER CIRCUMFLEX ACCENT",
        "tilde": "SMALL TILDE",
    }
    for name, expect in spot.items():
        assert unicodedata.name(_AGL[name]) == expect, name
    # every single-letter name maps to itself
    for c in "AZaz09":
        pass
    for c in "ABCxyz":
        assert _AGL[c] == c
