"""PDF text extraction — the crawl-ingest stage after HTML
(`functions/html.py`): crawl corpora are PDF-heavy, and a training
pipeline needs the text out of them without shelling out to a native
library.

Scope (bounded, parse-per-spec like the other codecs in this package):

* classic cross-reference TABLES (PDF 32000-1:2008 §7.5.4) with
  incremental-update ``/Prev`` chains, AND PDF 1.5 cross-reference
  STREAMS (§7.5.8: /W field widths, /Index subsections, FlateDecode
  with PNG predictors via the shared `functions/png.py` unfilter) +
  OBJECT STREAMS (§7.5.7) — the layout modern PDFs actually use; the
  hybrid-reference /XRefStm key is deliberately ignored (the classic
  table in a hybrid file is spec-constructed to stand alone),
* ``/FlateDecode`` content streams via stdlib zlib (§7.4.4); any
  other filter (or a predictor ``/DecodeParms``) is rejected,
* the text-showing subset of the content-stream operator set
  (§9.4.3): ``BT/ET``, ``Tf``, ``Td/TD/T*/Tm/TL``, ``Tj``, ``TJ``,
  ``'`` and ``"``; literal strings with the full escape table
  (§7.3.4.2, incl. octal and line continuations) and hex strings,
* simple fonts with ``/WinAnsiEncoding`` (≈ cp1252, Annex D.3) or
  StandardEncoding restricted to ASCII; ``/Type0`` (CID) fonts and
  ``/Differences`` arrays are rejected,
* ``/Encrypt`` documents are rejected (§7.6).

Everything the parser accepts it must extract EXACTLY — the contract
query (`pdf_text_extract`) pins text → encode_pdf → pdf_text as the
identity under the driver's hash gate, the same joint-pin pattern as
`warc_text_extract`.

The encoder side (`encode_pdf`) emits genuine PDFs — real byte-offset
xref tables, real Flate streams — so the parser is exercised against
honest structure, not a hand-shaken fixture.

Reference parity note: the reference engine (a 246-line pandas script,
/root/reference/metrics_advisor.py) has no document-ingest stage at
all; this module is part of the beyond-reference LLM-data-pipeline
surface the brief mandates.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref(NamedTuple):
    num: int
    gen: int


class _Name(str):
    """A PDF name token (distinct from a decoded string)."""


class _Stream(NamedTuple):
    dict: dict
    raw: bytes


def _unpredict(
    data: bytes, predictor: int, columns: int, colors: int,
    bits: int,
) -> bytes:
    """Undo a /DecodeParms predictor (§7.4.4.4): 1 = none; ≥10 = the
    PNG row filters, shared with `functions/png.py`'s unfilter (each
    row is a tag byte + ``columns×bpp`` data bytes).  TIFF predictor 2
    is rejected (never seen in xref streams)."""
    if predictor == 1:
        return data
    if predictor == 2:
        raise ValueError("PDF: TIFF predictor 2 unsupported")
    if predictor < 10 or predictor > 15:
        raise ValueError(f"PDF: unknown predictor {predictor}")
    import numpy as np

    from metrics_advisor_spark.functions.png import _unfilter

    bpp = max(1, colors * bits // 8)
    row = columns * bpp
    if row <= 0 or len(data) % (row + 1):
        raise ValueError(
            f"PDF: predictor data length {len(data)} is not a multiple "
            f"of row size {row + 1}"
        )
    rows = np.frombuffer(data, dtype=np.uint8).reshape(-1, row + 1)
    return _unfilter(rows, bpp).astype(np.uint8).tobytes()


# ---------------------------------------------------------------- lexer


class _Lexer:
    """Tokenizer over the raw byte buffer (PDF 32000-1:2008 §7.2)."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment runs to EOL (§7.2.4)
                while self.pos < n and buf[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def _token_end(self) -> int:
        buf, n = self.buf, len(self.buf)
        p = self.pos
        while p < n and buf[p] not in _WS and buf[p] not in _DELIM:
            p += 1
        return p

    def keyword(self) -> str:
        self._skip_ws()
        end = self._token_end()
        if end == self.pos:
            raise ValueError(
                f"PDF: expected keyword at byte {self.pos}"
            )
        kw = self.buf[self.pos:end].decode("latin-1")
        self.pos = end
        return kw

    def peek_byte(self) -> int:
        self._skip_ws()
        if self.pos >= len(self.buf):
            raise ValueError("PDF: unexpected end of buffer")
        return self.buf[self.pos]

    # -- value parsing ------------------------------------------------

    def value(self):
        c = self.peek_byte()
        buf = self.buf
        if c == 0x2F:  # '/'
            return self._name()
        if c == 0x28:  # '('
            return self._literal_string()
        if c == 0x3C:  # '<'
            if buf[self.pos:self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:  # '['
            return self._array()
        if c in b"+-.0123456789":
            return self._number_or_ref()
        kw = self.keyword()
        if kw == "true":
            return True
        if kw == "false":
            return False
        if kw == "null":
            return None
        raise ValueError(f"PDF: unexpected token {kw!r}")

    def _name(self) -> _Name:
        self.pos += 1  # '/'
        end = self._token_end()
        raw = self.buf[self.pos:end]
        self.pos = end

        def sub(m: re.Match) -> bytes:
            return bytes([int(m.group(1), 16)])

        raw = re.sub(rb"#([0-9a-fA-F]{2})", sub, raw)  # §7.3.5
        return _Name(raw.decode("latin-1"))

    def _literal_string(self) -> bytes:
        buf, n = self.buf, len(self.buf)
        p = self.pos + 1
        out = bytearray()
        depth = 1
        while p < n:
            c = buf[p]
            if c == 0x5C:  # backslash escape (§7.3.4.2)
                p += 1
                if p >= n:
                    break
                e = buf[p]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif e in b"\r\n":  # line continuation
                    p += 1
                    if e == 0x0D and p < n and buf[p] == 0x0A:
                        p += 1
                elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                    oct_ = bytearray([e])
                    p += 1
                    while (len(oct_) < 3 and p < n
                           and 0x30 <= buf[p] <= 0x37):
                        oct_.append(buf[p])
                        p += 1
                    out.append(int(oct_.decode(), 8) & 0xFF)
                else:  # lone backslash: drop it, keep the char
                    out.append(e)
                    p += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
            out.append(c)
            p += 1
        raise ValueError("PDF: unterminated literal string")

    def _hex_string(self) -> bytes:
        end = self.buf.index(b">", self.pos)
        hexs = re.sub(rb"[\x00\t\n\x0c\r ]", b"",
                      self.buf[self.pos + 1:end])
        self.pos = end + 1
        if len(hexs) % 2:  # odd count: final digit padded with 0
            hexs += b"0"
        try:
            return bytes.fromhex(hexs.decode("latin-1"))
        except ValueError:
            raise ValueError("PDF: bad hex string") from None

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            if self.peek_byte() == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.value())

    def _dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.buf[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.value()
            if not isinstance(key, _Name):
                raise ValueError("PDF: dict key is not a name")
            out[str(key)] = self.value()

    def _number_or_ref(self):
        end = self._token_end()
        tok = self.buf[self.pos:end].decode("latin-1")
        self.pos = end
        if "." in tok:
            return float(tok)
        num = int(tok)
        # lookahead for 'gen R' (§7.3.10) — only bare ints qualify
        if num >= 0 and not tok.startswith(("+", "-")):
            save = self.pos
            self._skip_ws()
            m = re.match(rb"(\d+)\s+R(?![A-Za-z0-9])",
                         self.buf[self.pos:self.pos + 32])
            if m:
                self.pos += m.end()
                return _Ref(num, int(m.group(1)))
            self.pos = save
        return num


# ------------------------------------------------------------- document


class _Document:
    """Random-access object store over one PDF buffer: xref-table
    chain → byte offsets → lazily parsed objects."""

    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF-"):
            raise ValueError("PDF: missing %PDF- header")
        self.buf = buf
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        # compressed: obj num -> (object-stream num, index within it)
        self.compressed: dict[int, tuple[int, int]] = {}
        self.offsets, self.trailer = self._load_xref_chain()
        if "Encrypt" in self.trailer:
            raise ValueError("PDF: encrypted documents unsupported")

    # -- xref ----------------------------------------------------------

    def _load_xref_chain(self) -> tuple[dict[int, int], dict]:
        tail = self.buf[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF: no startxref")
        offsets: dict[int, int] = {}
        trailer: dict = {}
        claimed: set[int] = set()  # newest section wins, either kind
        seen: set[int] = set()
        off: int | None = int(m.group(1))
        while off is not None:
            if off in seen:
                raise ValueError("PDF: circular /Prev xref chain")
            seen.add(off)
            sub_off, sub_comp, sub_tr = self._load_xref_section(off)
            for k, v in sub_off.items():
                if k not in claimed:
                    offsets[k] = v
                    claimed.add(k)
            for k, v in sub_comp.items():
                if k not in claimed:
                    self.compressed[k] = v
                    claimed.add(k)
            for k, v in sub_tr.items():
                trailer.setdefault(k, v)
            off = sub_tr.get("Prev")
        return offsets, trailer

    def _load_xref_section(
        self, off: int,
    ) -> tuple[dict[int, int], dict[int, tuple[int, int]], dict]:
        lex = _Lexer(self.buf, off)
        lex._skip_ws()
        if re.match(rb"\d+\s+\d+\s+obj", self.buf[lex.pos:lex.pos + 24]):
            return self._load_xref_stream(lex.pos)
        if lex.keyword() != "xref":
            raise ValueError(f"PDF: expected 'xref' at byte {off}")
        offsets: dict[int, int] = {}
        while True:
            lex._skip_ws()
            if self.buf[lex.pos:lex.pos + 7] == b"trailer":
                lex.pos += 7
                trailer = lex.value()
                if not isinstance(trailer, dict):
                    raise ValueError("PDF: trailer is not a dict")
                # hybrid-reference /XRefStm deliberately ignored: the
                # classic table is spec-built to stand alone (§7.5.8.4)
                return offsets, {}, trailer
            first = lex.value()
            count = lex.value()
            if not isinstance(first, int) or not isinstance(count, int):
                raise ValueError("PDF: malformed xref subsection header")
            for i in range(count):
                lex._skip_ws()
                ent = self.buf[lex.pos:lex.pos + 18]
                em = re.match(rb"(\d{10}) (\d{5}) ([nf])", ent)
                if not em:
                    raise ValueError(
                        f"PDF: malformed xref entry at byte {lex.pos}"
                    )
                if em.group(3) == b"n":
                    offsets.setdefault(first + i, int(em.group(1)))
                lex.pos += 18

    def _load_xref_stream(
        self, off: int,
    ) -> tuple[dict[int, int], dict[int, tuple[int, int]], dict]:
        """PDF 1.5 cross-reference stream (§7.5.8): /W-packed
        big-endian rows over /Index subsections; the stream dict
        doubles as the trailer."""
        val = self._parse_obj_at(off, in_xref_load=True)[1]
        if not isinstance(val, _Stream) or \
                str(val.dict.get("Type")) != "XRef":
            raise ValueError(
                f"PDF: startxref object at byte {off} is not /Type /XRef"
            )
        d = val.dict
        data = self.stream_data(val)
        w = d.get("W")
        if (not isinstance(w, list) or len(w) != 3
                or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)):
            raise ValueError(f"PDF: bad xref stream /W {w!r}")
        size = d.get("Size")
        if not isinstance(size, int):
            raise ValueError("PDF: xref stream missing /Size")
        index = d.get("Index", [0, size])
        if (not isinstance(index, list) or len(index) % 2
                or not all(isinstance(x, int) for x in index)):
            raise ValueError(f"PDF: bad xref stream /Index {index!r}")
        row = sum(w)
        pos = 0
        offsets: dict[int, int] = {}
        compressed: dict[int, tuple[int, int]] = {}

        def field(width: int, default: int) -> int:
            nonlocal pos
            if width == 0:
                return default
            v = int.from_bytes(data[pos:pos + width], "big")
            pos += width
            return v

        for start, count in zip(index[::2], index[1::2]):
            if pos + count * row > len(data):
                raise ValueError("PDF: xref stream data shorter than /Index")
            for i in range(count):
                typ = field(w[0], 1)  # w1=0 → type 1 (§7.5.8.3)
                f2 = field(w[1], 0)
                f3 = field(w[2], 0)
                num = start + i
                if typ == 1:
                    offsets.setdefault(num, f2)
                elif typ == 2:
                    compressed.setdefault(num, (f2, f3))
                elif typ != 0:  # free entries skipped; others reserved
                    raise ValueError(f"PDF: xref entry type {typ} reserved")
        return offsets, compressed, dict(d)

    # -- objects -------------------------------------------------------

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get(v.num)
        return v

    def _parse_obj_at(
        self, off: int, in_xref_load: bool = False,
    ) -> tuple[int, object]:
        lex = _Lexer(self.buf, off)
        got_num = lex.value()
        lex.value()  # generation
        if not isinstance(got_num, int) or lex.keyword() != "obj":
            raise ValueError(f"PDF: no object header at byte {off}")
        val = lex.value()
        lex._skip_ws()
        if self.buf[lex.pos:lex.pos + 6] == b"stream":
            if not isinstance(val, dict):
                raise ValueError("PDF: stream without a dict")
            lex.pos += 6
            if self.buf[lex.pos:lex.pos + 2] == b"\r\n":
                lex.pos += 2
            elif self.buf[lex.pos:lex.pos + 1] == b"\n":
                lex.pos += 1
            length = val.get("Length")
            if isinstance(length, _Ref):
                if in_xref_load:
                    # resolving needs the xref we are currently building
                    raise ValueError(
                        "PDF: xref stream /Length must be direct"
                    )
                length = self.resolve(length)
            if not isinstance(length, int):
                raise ValueError("PDF: stream /Length is not an integer")
            raw = self.buf[lex.pos:lex.pos + length]
            if len(raw) != length:
                raise ValueError("PDF: stream data truncated")
            lex.pos += length
            lex._skip_ws()
            if self.buf[lex.pos:lex.pos + 9] != b"endstream":
                raise ValueError("PDF: missing endstream")
            val = _Stream(val, raw)
        return got_num, val

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        if num in self.compressed:
            val = self._from_objstm(num)
            self._cache[num] = val
            return val
        off = self.offsets.get(num)
        if off is None:
            return None  # a free / absent object resolves to null
        got_num, val = self._parse_obj_at(off)
        if got_num != num:
            raise ValueError(
                f"PDF: xref offset for obj {num} does not point at it"
            )
        self._cache[num] = val
        return val

    def _from_objstm(self, num: int):
        """Member of an object stream (§7.5.7): decode the container
        once, parse the (objnum, offset) header pairs, cache every
        member."""
        stm_num, idx = self.compressed[num]
        members = self._objstm_cache.get(stm_num)
        if members is None:
            stm = self.get(stm_num)
            if not isinstance(stm, _Stream) or \
                    str(stm.dict.get("Type")) != "ObjStm":
                raise ValueError(
                    f"PDF: obj {num} points into obj {stm_num}, which "
                    "is not /Type /ObjStm"
                )
            n = self.resolve(stm.dict.get("N"))
            first = self.resolve(stm.dict.get("First"))
            if not isinstance(n, int) or not isinstance(first, int):
                raise ValueError("PDF: object stream missing /N or /First")
            data = self.stream_data(stm)
            hdr = _Lexer(data[:first])
            pairs = []
            for _ in range(n):
                onum = hdr.value()
                ooff = hdr.value()
                if not isinstance(onum, int) or not isinstance(ooff, int):
                    raise ValueError("PDF: malformed object-stream header")
                pairs.append((onum, ooff))
            members = {
                onum: _Lexer(data, first + ooff).value()
                for onum, ooff in pairs
            }
            self._objstm_cache[stm_num] = members
        if num not in members:
            raise ValueError(
                f"PDF: obj {num} not found in object stream {stm_num}"
            )
        return members[num]

    def stream_data(self, s: _Stream) -> bytes:
        filt = self.resolve(s.dict.get("Filter"))
        if filt is None:
            return s.raw
        filters = filt if isinstance(filt, list) else [filt]
        parms = self.resolve(s.dict.get("DecodeParms"))
        parms_list = parms if isinstance(parms, list) else [parms]
        data = s.raw
        for i, f in enumerate(filters):
            if str(f) != "FlateDecode":
                raise ValueError(f"PDF: filter /{f} unsupported")
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"PDF: bad Flate stream ({e})") from None
            p = self.resolve(
                parms_list[i] if i < len(parms_list) else None
            )
            if p is not None:
                data = _unpredict(
                    data,
                    int(self.resolve(p.get("Predictor", 1))),
                    int(self.resolve(p.get("Columns", 1))),
                    int(self.resolve(p.get("Colors", 1))),
                    int(self.resolve(p.get("BitsPerComponent", 8))),
                )
        return data


# --------------------------------------------------------- text extract


def _font_encodings(doc: _Document, page: dict) -> dict[str, str]:
    """Map font resource name → codec, walking /Resources with page-tree
    inheritance (§7.8.3); rejects CID fonts and /Differences."""
    res = doc.resolve(page.get("Resources")) or {}
    fonts = doc.resolve(res.get("Font")) or {}
    out: dict[str, str] = {}
    for fname, fref in fonts.items():
        fd = doc.resolve(fref)
        if not isinstance(fd, dict):
            continue
        sub = str(doc.resolve(fd.get("Subtype")) or "")
        if sub == "Type0":
            raise ValueError("PDF: /Type0 (CID) fonts unsupported")
        enc = doc.resolve(fd.get("Encoding"))
        if isinstance(enc, dict):
            if "Differences" in enc:
                raise ValueError(
                    "PDF: /Encoding /Differences unsupported"
                )
            enc = doc.resolve(enc.get("BaseEncoding"))
        enc = str(enc) if enc is not None else "StandardEncoding"
        if enc not in ("WinAnsiEncoding", "StandardEncoding",
                       "MacRomanEncoding"):
            raise ValueError(f"PDF: encoding /{enc} unsupported")
        out[str(fname)] = enc
    return out


def _decode_pdf_bytes(raw: bytes, enc: str) -> str:
    if enc == "WinAnsiEncoding":
        # WinAnsiEncoding is cp1252 (Annex D.3); the five undefined
        # code points must not silently pass
        try:
            return raw.decode("cp1252")
        except UnicodeDecodeError as e:
            raise ValueError(
                f"PDF: byte 0x{raw[e.start]:02x} undefined in "
                "WinAnsiEncoding"
            ) from None
    # Standard/MacRoman restricted to ASCII in this bounded scope
    for b in raw:
        if b >= 0x80:
            raise ValueError(
                f"PDF: byte 0x{b:02x} outside the ASCII subset of "
                f"/{enc}"
            )
    return raw.decode("ascii")


def _walk_pages(doc: _Document, node: dict, out: list[dict],
                depth: int = 0) -> None:
    if depth > 64:
        raise ValueError("PDF: page tree too deep (cycle?)")
    typ = str(doc.resolve(node.get("Type")) or "")
    if typ == "Page":
        out.append(node)
        return
    if typ != "Pages":
        raise ValueError(f"PDF: unexpected page-tree node /{typ}")
    kids = doc.resolve(node.get("Kids"))
    if not isinstance(kids, list):
        raise ValueError("PDF: /Pages without /Kids")
    for k in kids:
        kid = doc.resolve(k)
        # inherit /Resources down the tree (§7.7.3.4)
        if isinstance(kid, dict) and "Resources" not in kid \
                and "Resources" in node:
            kid = {**kid, "Resources": node["Resources"]}
        _walk_pages(doc, kid, out, depth + 1)


_SHOW_OPS = {"Tj", "TJ", "'", '"'}
_NEWLINE_OPS = {"Td", "TD", "T*", "Tm", "'", '"'}


def _page_text(doc: _Document, page: dict) -> str:
    encs = _font_encodings(doc, page)
    contents = doc.resolve(page.get("Contents"))
    if contents is None:
        return ""
    parts = contents if isinstance(contents, list) else [contents]
    data = b"\n".join(
        doc.stream_data(doc.resolve(p)) for p in parts
    )
    lex = _Lexer(data)
    stack: list = []
    lines: list[list[str]] = []
    cur: list[str] = []
    font_enc = "StandardEncoding"
    in_text = False

    def flush_line() -> None:
        nonlocal cur
        if cur:
            lines.append(cur)
            cur = []

    def show(raw: bytes) -> None:
        cur.append(_decode_pdf_bytes(raw, font_enc))

    n = len(data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if (c in b"/([<+-.0123456789"
                and data[lex.pos:lex.pos + 2] != b"<<") or c == 0x3C:
            stack.append(lex.value())
            continue
        op = lex.keyword() if c not in b"'\"" else \
            data[lex.pos:lex.pos + 1].decode()
        if c in b"'\"":
            lex.pos += 1
        if op == "BT":
            in_text = True
            flush_line()
        elif op == "ET":
            in_text = False
            flush_line()
        elif op == "Tf" and len(stack) >= 2:
            fname = stack[-2]
            if isinstance(fname, _Name):
                if str(fname) not in encs:
                    raise ValueError(
                        f"PDF: font /{fname} not in /Resources"
                    )
                font_enc = encs[str(fname)]
        elif in_text and op in _NEWLINE_OPS:
            flush_line()
        if in_text and op in _SHOW_OPS:
            arg = stack[-1] if stack else None
            if op == "TJ" and isinstance(arg, list):
                for el in arg:
                    if isinstance(el, bytes):
                        show(el)  # numbers are kerning, not spacing
            elif isinstance(arg, bytes):
                show(arg)
        stack.clear()
    flush_line()
    # shows on one line concatenate DIRECTLY: TJ kerning numbers and
    # consecutive Tj carry no implied spacing (§9.4.3) — any separator
    # the author wanted is inside the string itself
    return "\n".join("".join(ln) for ln in lines if ln)


def pdf_text(payload: bytes) -> tuple[int, str]:
    """Parse ``payload`` and return ``(n_pages, text)`` — lines joined
    with ``\\n`` within a page, pages joined with ``\\n`` too.  Raises
    ValueError on anything outside the documented scope (encrypted,
    xref streams, CID fonts, non-Flate filters, malformed
    structure)."""
    doc = _Document(payload)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise ValueError("PDF: trailer /Root missing")
    tree = doc.resolve(root.get("Pages"))
    if not isinstance(tree, dict):
        raise ValueError("PDF: catalog /Pages missing")
    pages: list[dict] = []
    _walk_pages(doc, tree, pages)
    want = doc.resolve(tree.get("Count"))
    if isinstance(want, int) and want != len(pages):
        raise ValueError(
            f"PDF: /Count {want} != {len(pages)} leaf pages"
        )
    texts = [_page_text(doc, p) for p in pages]
    return len(pages), "\n".join(t for t in texts if t)


# -------------------------------------------------------------- encoder


def _esc_literal(s: str) -> bytes:
    out = s.encode("cp1252")
    return out.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
              .replace(b")", rb"\)")


def encode_pdf(
    text: str, *, n_pages: int = 1, compress: bool = False,
    use_tj: bool = False, hex_strings: bool = False,
    octal_first: bool = False, line_words: int = 8,
    xref_stream: bool = False,
) -> bytes:
    """A genuine PDF carrying ``text``: real byte-offset xref table,
    catalog → /Pages → /Page tree, Helvetica /WinAnsiEncoding font,
    content streams (Flate-compressed when ``compress``).  Words are
    laid out ``line_words`` per line, pages split contiguously; the
    arms exercise TJ kerning arrays (``use_tj`` splits a show string
    mid-word — extraction must concatenate), hex strings and octal
    escapes.  ``pdf_text`` inverts all of it exactly (newlines for
    line/page breaks)."""
    words = text.split(" ") if text else []
    n_pages = max(1, min(n_pages, max(1, len(words))))
    per_page = -(-len(words) // n_pages) if words else 0
    page_words = [
        words[i * per_page:(i + 1) * per_page] for i in range(n_pages)
    ]

    objects: dict[int, bytes] = {}
    font_num = 3 + 2 * n_pages
    page_nums = [3 + 2 * i for i in range(n_pages)]

    def content_for(ws: list[str]) -> bytes:
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        first = True
        for i in range(0, len(ws), line_words):
            line = " ".join(ws[i:i + line_words])
            if not first:
                ops.append(b"0 -14 Td")
            first = False
            if hex_strings and (i // line_words) % 3 == 2:
                ops.append(
                    b"<" + line.encode("cp1252").hex().encode() + b"> Tj"
                )
            elif use_tj and len(line) > 4:
                cut = len(line) // 2
                ops.append(
                    b"[" + b"(" + _esc_literal(line[:cut]) + b") -120 ("
                    + _esc_literal(line[cut:]) + b")] TJ"
                )
            elif octal_first and line:
                ops.append(
                    b"(\\%03o" % ord(line[0])
                    + _esc_literal(line[1:]) + b") Tj"
                )
            else:
                ops.append(b"(" + _esc_literal(line) + b") Tj")
        ops.append(b"ET")
        return b"\n".join(ops)

    for i, ws in enumerate(page_words):
        data = content_for(ws)
        extra = b""
        if compress:
            data = zlib.compress(data, 6)
            extra = b" /Filter /FlateDecode"
        objects[page_nums[i] + 1] = (
            b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
            + data + b"\nendstream"
        )
        objects[page_nums[i]] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_num, page_nums[i] + 1)
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    )
    objects[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )

    if not xref_stream:
        buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(objects):
            offsets[num] = len(buf)
            buf += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
        xref_off = len(buf)
        n_obj = max(objects) + 1
        buf += b"xref\n0 %d\n" % n_obj
        buf += b"0000000000 65535 f \n"
        for num in range(1, n_obj):
            buf += b"%010d 00000 n \n" % offsets[num]
        buf += (
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (n_obj, xref_off)
        )
        return bytes(buf)

    # ---- PDF 1.5 layout: dictionaries live in an OBJECT STREAM, the
    # cross-reference is a Flate stream with the PNG Up predictor —
    # the structure pdf_text's §7.5.7/§7.5.8 paths must invert
    content_nums = {p + 1 for p in page_nums}
    member_nums = sorted(n for n in objects if n not in content_nums)
    body = bytearray()
    offs: list[int] = []
    for n_ in member_nums:
        offs.append(len(body))
        body += objects[n_] + b"\n"
    header = (
        " ".join(f"{n_} {o}" for n_, o in zip(member_nums, offs))
        .encode() + b"\n"
    )
    objstm_num = font_num + 1
    xref_num = font_num + 2
    stm_payload = zlib.compress(bytes(header + body), 6)
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n_ in sorted(content_nums):
        offsets[n_] = len(buf)
        buf += b"%d 0 obj\n" % n_ + objects[n_] + b"\nendobj\n"
    offsets[objstm_num] = len(buf)
    buf += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (objstm_num, len(member_nums), len(header), len(stm_payload))
        + stm_payload + b"\nendstream\nendobj\n"
    )
    xref_off = len(buf)
    size = xref_num + 1
    rows = bytearray()
    for n_ in range(size):
        if n_ == 0:
            typ, f2, f3 = 0, 0, 0xFFFF
        elif n_ in offsets:
            typ, f2, f3 = 1, offsets[n_], 0
        elif n_ == xref_num:
            typ, f2, f3 = 1, xref_off, 0
        else:
            typ, f2, f3 = 2, objstm_num, member_nums.index(n_)
        rows += bytes([typ]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
    # PNG Up predictor (tag 2 per row), Columns 7 == the row width
    filtered = bytearray()
    prev = bytes(7)
    for i in range(0, len(rows), 7):
        cur = rows[i:i + 7]
        filtered += b"\x02" + bytes(
            (cur[j] - prev[j]) & 0xFF for j in range(7)
        )
        prev = cur
    xref_payload = zlib.compress(bytes(filtered), 6)
    buf += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /Root 1 0 R /W [1 4 2] "
        b"/Index [0 %d] /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 7 >> /Length %d >>\n"
        b"stream\n" % (xref_num, size, size, len(xref_payload))
        + xref_payload + b"\nendstream\nendobj\n"
    )
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(buf)


# -------------------------------------------------------- Spark surface


def attach_pdf_payload(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, pdf binary): every doc's text wrapped into a genuine
    PDF via mapInPandas (same Arrow batch shape as the other
    attachers in `functions/multimodal.py`).  Arms by doc_id: Flate
    compression on odd ids, 1–3 pages, TJ kerning arrays / hex
    strings / octal escapes on rotating residues — all of which
    `pdf_text` must invert exactly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            payloads = [
                encode_pdf(
                    t,
                    n_pages=1 + int(d) % 3,
                    compress=int(d) % 2 == 1,
                    use_tj=int(d) % 3 == 0,
                    hex_strings=int(d) % 5 == 0,
                    octal_first=int(d) % 7 == 0,
                    xref_stream=int(d) % 11 == 3,
                )
                for d, t in zip(pdf_batch[id_col], pdf_batch[text_col])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf_batch[id_col], "pdf": payloads}
            )

    return df.select(id_col, text_col).mapInPandas(
        fn, "doc_id long, pdf binary"
    )


def extract_pdf_text(media: DataFrame, pdf_col: str = "pdf",
                     *, strict: bool = True) -> DataFrame:
    """(doc_id, n_pages, text) per payload.  Per-payload bounded-state
    parse inside one Arrow batch — payloads never cross a shuffle, the
    same 100 TB shape as the image/audio codecs (each task parses its
    own split's documents; parallelism = input splits).

    ``strict=False`` is the QUARANTINE mode a 100 TB crawl actually
    runs: a malformed payload must not kill the task (and with it the
    stage and its retries) — instead the row comes back with
    ``n_pages``/``text`` null and the ValueError text in an ``error``
    column, so the pipeline routes rejects to a side table and keeps
    going.  ``strict=True`` (default) keeps the parse-per-spec raise
    for fixtures and tests."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n_pages, texts, errs = [], [], []
            for payload in b[pdf_col]:
                try:
                    np_, tx = pdf_text(bytes(payload))
                    n_pages.append(np_)
                    texts.append(tx)
                    errs.append(None)
                except ValueError as e:
                    if strict:
                        raise
                    n_pages.append(None)
                    texts.append(None)
                    errs.append(str(e))
            out = {"doc_id": b["doc_id"], "n_pages": n_pages,
                   "text": texts}
            if not strict:
                out["error"] = errs
            yield pd.DataFrame(out)

    schema = "doc_id long, n_pages int, text string"
    if not strict:
        schema += ", error string"
    return media.mapInPandas(fn, schema)
