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
* stream filters (§7.4): ``/FlateDecode`` via stdlib zlib,
  ``/LZWDecode`` (§7.4.4.2: MSB-first variable-width TIFF LZW with
  /EarlyChange), ``/ASCIIHexDecode`` and ``/ASCII85Decode``
  (cross-validated against stdlib ``binascii``/``base64``), filter
  CHAINS (``[/ASCII85Decode /FlateDecode]``), and the PNG predictors
  on Flate/LZW; anything else is rejected,
* the text-showing subset of the content-stream operator set
  (§9.4.3): ``BT/ET``, ``Tf``, ``Td/TD/T*/Tm/TL``, ``Tj``, ``TJ``,
  ``'`` and ``"``; literal strings with the full escape table
  (§7.3.4.2, incl. octal and line continuations) and hex strings,
* simple fonts with ``/WinAnsiEncoding`` (≈ cp1252, Annex D.3) or
  StandardEncoding restricted to ASCII, plus ``/Differences``
  arrays resolved through a bounded Adobe-Glyph-List table
  (§9.6.6.3; unknown glyph names rejected),
* ``/Type0`` composite fonts with ``/Identity-H`` encoding and a
  ``/ToUnicode`` CMap (§9.7.6.3/§9.10.3: codespacerange, bfchar,
  bfrange in both increment and array form) — the form modern
  PDF generators actually emit; Identity-V, named CMaps, and Type0
  without ToUnicode are rejected (text would be unextractable),
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

import base64
import binascii
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


def _ahx_decode(data: bytes) -> bytes:
    """/ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, '>'
    EOD required, an odd final digit is padded with 0."""
    m = data.find(b">")
    if m < 0:
        raise ValueError("PDF: ASCIIHex missing '>' EOD")
    hexs = re.sub(rb"[\x00\t\n\x0c\r ]", b"", data[:m])
    if re.search(rb"[^0-9a-fA-F]", hexs):
        raise ValueError("PDF: bad ASCIIHex digit")
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    """/ASCII85Decode (§7.4.3): groups of 5 digits in '!'..'u' encode
    4 bytes base-85 big-endian; 'z' is an all-zero group (illegal
    inside a partial group); a final partial group of n digits yields
    n-1 bytes (padded with 'u'); '~>' EOD required."""
    out = bytearray()
    group: list[int] = []
    i, n = 0, len(data)
    while True:
        if i >= n:
            raise ValueError("PDF: ASCII85 missing '~>' EOD")
        c = data[i]
        if c in _WS:
            i += 1
            continue
        if c == 0x7E:  # '~'
            if data[i:i + 2] != b"~>":
                raise ValueError("PDF: bad ASCII85 EOD")
            break
        if c == 0x7A:  # 'z'
            if group:
                raise ValueError("PDF: 'z' inside an ASCII85 group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError(f"PDF: bad ASCII85 byte 0x{c:02x}")
        group.append(c - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("PDF: ASCII85 group overflow")
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise ValueError("PDF: 1-digit final ASCII85 group")
        k = len(group)
        v = 0
        for g in group + [84] * (5 - k):
            v = v * 85 + g
        if v > 0xFFFFFFFF:
            raise ValueError("PDF: ASCII85 group overflow")
        out += v.to_bytes(4, "big")[:k - 1]
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """/LZWDecode (§7.4.4.2): TIFF-style LZW — 8-bit symbols, codes
    packed MSB-first starting at 9 bits, Clear=256, EOD=257, the code
    width grows at table sizes 511/1023/2047 with /EarlyChange 1 (the
    default) or 512/1024/2048 with 0."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev: bytes | None = None
    acc = nbits = pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("PDF: LZW stream truncated (no EOD)")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # clear table
            table = list(base)
            width = 9
            prev = None
            continue
        if code == 257:  # EOD
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise ValueError(
                    "PDF: LZW code after clear is not a literal"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError(f"PDF: LZW code {code} beyond table")
        out += entry
        if prev is not None:
            if len(table) >= 4096:
                raise ValueError("PDF: LZW table overflow (missing clear)")
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) - (1 if early_change else 0) \
                and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """Greedy /LZWDecode-compatible encoder (EarlyChange=1) for the
    fixture arm: leading clear code, dictionary rebuild at 4095
    entries, MSB-first packing.  `_lzw_decode` inverts it exactly."""
    out = bytearray()
    acc = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)
    w = b""
    for bt in data:
        wc = w + bytes([bt])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        # EarlyChange=1: the decoder reads the NEXT code at width+1
        # once its table holds 2^width - 1 entries, which happens the
        # moment this entry's index reaches 2^width - 1 (the decoder
        # trails the encoder by exactly one entry — same offset as
        # the GIF pair in functions/gif.py, shifted one code early)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        next_code += 1
        if next_code == 4095:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([bt])
    if w:
        emit(table[w])
        # the decoder appends an entry for this FINAL code too (we
        # assign none — there is no next byte); if that append lands
        # exactly on the width boundary the decoder reads EOD one bit
        # wider, so mirror its bump before emitting EOD
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


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
            name = str(f)
            p = self.resolve(
                parms_list[i] if i < len(parms_list) else None
            )
            if name == "FlateDecode":
                try:
                    data = zlib.decompress(data)
                except zlib.error as e:
                    raise ValueError(
                        f"PDF: bad Flate stream ({e})"
                    ) from None
            elif name == "LZWDecode":
                ec = 1
                if p is not None:
                    ec = self.resolve(p.get("EarlyChange", 1))
                    if ec not in (0, 1):
                        raise ValueError(
                            f"PDF: bad /EarlyChange {ec!r}"
                        )
                data = _lzw_decode(data, ec)
            elif name == "ASCIIHexDecode":
                if p is not None:
                    raise ValueError(
                        "PDF: DecodeParms on /ASCIIHexDecode unsupported"
                    )
                data = _ahx_decode(data)
            elif name == "ASCII85Decode":
                if p is not None:
                    raise ValueError(
                        "PDF: DecodeParms on /ASCII85Decode unsupported"
                    )
                data = _a85_decode(data)
            else:
                raise ValueError(f"PDF: filter /{name} unsupported")
            if name in ("FlateDecode", "LZWDecode") and p is not None:
                data = _unpredict(
                    data,
                    int(self.resolve(p.get("Predictor", 1))),
                    int(self.resolve(p.get("Columns", 1))),
                    int(self.resolve(p.get("Colors", 1))),
                    int(self.resolve(p.get("BitsPerComponent", 8))),
                )
        return data


# --------------------------------------------------------- text extract


# Bounded Adobe Glyph List subset (Annex D / the public AGL): ASCII,
# Latin-1 and the cp1252 typographic block.  /Differences names
# outside this table are rejected — parse-per-spec, never guess.
_AGL: dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "colon": ":", "semicolon": ";",
    "less": "<", "equal": "=", "greater": ">", "question": "?",
    "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_",
    "grave": "`", "braceleft": "{", "bar": "|", "braceright": "}",
    "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    # Latin-1 supplement
    "exclamdown": "\xa1", "cent": "\xa2", "sterling": "\xa3",
    "currency": "\xa4", "yen": "\xa5", "brokenbar": "\xa6",
    "section": "\xa7", "dieresis": "\xa8", "copyright": "\xa9",
    "ordfeminine": "\xaa", "guillemotleft": "\xab",
    "logicalnot": "\xac", "registered": "\xae", "macron": "\xaf",
    "degree": "\xb0", "plusminus": "\xb1", "acute": "\xb4",
    "mu": "\xb5", "paragraph": "\xb6", "periodcentered": "\xb7",
    "cedilla": "\xb8", "ordmasculine": "\xba",
    "guillemotright": "\xbb", "onequarter": "\xbc",
    "onehalf": "\xbd", "threequarters": "\xbe",
    "questiondown": "\xbf",
    "Agrave": "\xc0", "Aacute": "\xc1", "Acircumflex": "\xc2",
    "Atilde": "\xc3", "Adieresis": "\xc4", "Aring": "\xc5",
    "AE": "\xc6", "Ccedilla": "\xc7", "Egrave": "\xc8",
    "Eacute": "\xc9", "Ecircumflex": "\xca", "Edieresis": "\xcb",
    "Igrave": "\xcc", "Iacute": "\xcd", "Icircumflex": "\xce",
    "Idieresis": "\xcf", "Eth": "\xd0", "Ntilde": "\xd1",
    "Ograve": "\xd2", "Oacute": "\xd3", "Ocircumflex": "\xd4",
    "Otilde": "\xd5", "Odieresis": "\xd6", "multiply": "\xd7",
    "Oslash": "\xd8", "Ugrave": "\xd9", "Uacute": "\xda",
    "Ucircumflex": "\xdb", "Udieresis": "\xdc", "Yacute": "\xdd",
    "Thorn": "\xde", "germandbls": "\xdf",
    "agrave": "\xe0", "aacute": "\xe1", "acircumflex": "\xe2",
    "atilde": "\xe3", "adieresis": "\xe4", "aring": "\xe5",
    "ae": "\xe6", "ccedilla": "\xe7", "egrave": "\xe8",
    "eacute": "\xe9", "ecircumflex": "\xea", "edieresis": "\xeb",
    "igrave": "\xec", "iacute": "\xed", "icircumflex": "\xee",
    "idieresis": "\xef", "eth": "\xf0", "ntilde": "\xf1",
    "ograve": "\xf2", "oacute": "\xf3", "ocircumflex": "\xf4",
    "otilde": "\xf5", "odieresis": "\xf6", "divide": "\xf7",
    "oslash": "\xf8", "ugrave": "\xf9", "uacute": "\xfa",
    "ucircumflex": "\xfb", "udieresis": "\xfc", "yacute": "\xfd",
    "thorn": "\xfe", "ydieresis": "\xff",
    # cp1252 typographic block
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…",
    "dagger": "†", "daggerdbl": "‡",
    "circumflex": "ˆ", "perthousand": "‰",
    "Scaron": "Š", "guilsinglleft": "‹", "OE": "Œ",
    "Zcaron": "Ž", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "bullet": "•",
    "endash": "–", "emdash": "—", "tilde": "˜",
    "trademark": "™", "scaron": "š",
    "guilsinglright": "›", "oe": "œ", "zcaron": "ž",
    "Ydieresis": "Ÿ", "minus": "−", "fraction": "⁄",
}
# single letters name themselves in the AGL
_AGL.update({c: c for c in
             "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"})


def _parse_differences(doc: _Document, arr: list) -> dict[int, str]:
    """/Encoding /Differences (§9.6.6.3): integers set the next code,
    names consume consecutive codes; names resolve through the
    bounded AGL table."""
    if not isinstance(arr, list):
        raise ValueError("PDF: /Differences is not an array")
    out: dict[int, str] = {}
    code: int | None = None
    for el in arr:
        el = doc.resolve(el)
        if isinstance(el, int):
            if not 0 <= el <= 255:
                raise ValueError(f"PDF: /Differences code {el} out of range")
            code = el
        elif isinstance(el, _Name):
            if code is None:
                raise ValueError("PDF: /Differences name before any code")
            if code > 255:
                raise ValueError("PDF: /Differences run past code 255")
            ch = _AGL.get(str(el))
            if ch is None:
                raise ValueError(
                    f"PDF: glyph name /{el} not in the bounded AGL table"
                )
            out[code] = ch
            code += 1
        else:
            raise ValueError("PDF: /Differences element is not int or name")
    return out


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """/ToUnicode CMap (§9.10.3): walk the PostScript token stream,
    honoring codespacerange (2-byte codes only in this bounded
    scope), bfchar, and bfrange in both the increment and the
    destination-array form; destinations are UTF-16BE."""
    lex = _Lexer(data)
    n = len(data)
    cmap: dict[int, str] = {}

    def utf16(bs: bytes) -> str:
        if not bs:
            raise ValueError("PDF: empty ToUnicode destination")
        try:
            return bs.decode("utf-16-be")
        except UnicodeDecodeError:
            raise ValueError(
                "PDF: ToUnicode destination is not UTF-16BE"
            ) from None

    def read_until(end_kw: str) -> list:
        vals: list = []
        while True:
            lex._skip_ws()
            if lex.pos >= n:
                raise ValueError(f"PDF: ToUnicode missing {end_kw}")
            if data[lex.pos] in b"/([<+-.0123456789":
                vals.append(lex.value())
            else:
                kw = lex.keyword()
                if kw != end_kw:
                    raise ValueError(
                        f"PDF: unexpected {kw!r} inside a ToUnicode "
                        "section"
                    )
                return vals

    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        if data[lex.pos] in b"/([<+-.0123456789":
            lex.value()  # operands outside sections: CMap boilerplate
            continue
        kw = lex.keyword()
        if kw == "begincodespacerange":
            for v in read_until("endcodespacerange"):
                if not isinstance(v, bytes) or len(v) != 2:
                    raise ValueError(
                        "PDF: only 2-byte ToUnicode code spaces supported"
                    )
        elif kw == "beginbfchar":
            vals = read_until("endbfchar")
            if len(vals) % 2:
                raise ValueError("PDF: odd bfchar operand count")
            for src, dst in zip(vals[::2], vals[1::2]):
                if (not isinstance(src, bytes) or len(src) != 2
                        or not isinstance(dst, bytes)):
                    raise ValueError("PDF: malformed bfchar entry")
                cmap[int.from_bytes(src, "big")] = utf16(dst)
        elif kw == "beginbfrange":
            vals = read_until("endbfrange")
            if len(vals) % 3:
                raise ValueError(
                    "PDF: bfrange operand count not a multiple of 3"
                )
            for lo, hi, dst in zip(vals[::3], vals[1::3], vals[2::3]):
                if (not isinstance(lo, bytes) or len(lo) != 2
                        or not isinstance(hi, bytes) or len(hi) != 2):
                    raise ValueError("PDF: malformed bfrange entry")
                lo_i = int.from_bytes(lo, "big")
                hi_i = int.from_bytes(hi, "big")
                if hi_i < lo_i:
                    raise ValueError("PDF: bfrange hi < lo")
                if isinstance(dst, list):
                    if len(dst) != hi_i - lo_i + 1 or not all(
                            isinstance(d, bytes) for d in dst):
                        raise ValueError(
                            "PDF: bfrange destination array mismatch"
                        )
                    for i, d in enumerate(dst):
                        cmap[lo_i + i] = utf16(d)
                elif isinstance(dst, bytes):
                    start = int.from_bytes(dst, "big")
                    for i in range(hi_i - lo_i + 1):
                        try:
                            stepped = (start + i).to_bytes(
                                len(dst), "big"
                            )
                        except OverflowError:
                            raise ValueError(
                                "PDF: bfrange increment overflow"
                            ) from None
                        cmap[lo_i + i] = utf16(stepped)
                else:
                    raise ValueError("PDF: malformed bfrange destination")
    if not cmap:
        raise ValueError("PDF: ToUnicode CMap maps nothing")
    return cmap


def _font_specs(
    doc: _Document, page: dict,
) -> dict[str, tuple[str, object, object]]:
    """Map font resource name → decode spec, walking /Resources with
    page-tree inheritance (§7.8.3).  Specs: ``("simple", codec,
    differences | None)`` for simple fonts, ``("cid", tounicode_map,
    None)`` for /Type0 /Identity-H composite fonts."""
    res = doc.resolve(page.get("Resources")) or {}
    fonts = doc.resolve(res.get("Font")) or {}
    out: dict[str, tuple[str, object, object]] = {}
    for fname, fref in fonts.items():
        fd = doc.resolve(fref)
        if not isinstance(fd, dict):
            continue
        sub = str(doc.resolve(fd.get("Subtype")) or "")
        if sub == "Type0":
            enc = doc.resolve(fd.get("Encoding"))
            if str(enc) != "Identity-H":
                raise ValueError(
                    f"PDF: /Type0 (CID) encoding /{enc} unsupported "
                    "(only Identity-H)"
                )
            tu = doc.resolve(fd.get("ToUnicode"))
            if not isinstance(tu, _Stream):
                raise ValueError(
                    "PDF: /Type0 (CID) font without a /ToUnicode CMap "
                    "is unextractable"
                )
            out[str(fname)] = (
                "cid", _parse_tounicode(doc.stream_data(tu)), None,
            )
            continue
        enc = doc.resolve(fd.get("Encoding"))
        diffs: dict[int, str] | None = None
        if isinstance(enc, dict):
            darr = doc.resolve(enc.get("Differences"))
            if darr is not None:
                diffs = _parse_differences(doc, darr)
            enc = doc.resolve(enc.get("BaseEncoding"))
        enc = str(enc) if enc is not None else "StandardEncoding"
        if enc not in ("WinAnsiEncoding", "StandardEncoding",
                       "MacRomanEncoding"):
            raise ValueError(f"PDF: encoding /{enc} unsupported")
        out[str(fname)] = ("simple", enc, diffs)
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


def _decode_show(raw: bytes, spec: tuple[str, object, object]) -> str:
    """Decode one show-string under the active font spec."""
    kind, arg, diffs = spec
    if kind == "cid":
        if len(raw) % 2:
            raise ValueError("PDF: odd-length Identity-H show string")
        out = []
        for i in range(0, len(raw), 2):
            code = int.from_bytes(raw[i:i + 2], "big")
            ch = arg.get(code)  # type: ignore[union-attr]
            if ch is None:
                raise ValueError(
                    f"PDF: CID {code} has no /ToUnicode mapping"
                )
            out.append(ch)
        return "".join(out)
    if not diffs:
        return _decode_pdf_bytes(raw, arg)  # type: ignore[arg-type]
    return "".join(
        diffs.get(b) or _decode_pdf_bytes(bytes([b]), arg)
        for b in raw
    )


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
    specs = _font_specs(doc, page)
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
    font_spec: tuple[str, object, object] = (
        "simple", "StandardEncoding", None,
    )
    in_text = False

    def flush_line() -> None:
        nonlocal cur
        if cur:
            lines.append(cur)
            cur = []

    def show(raw: bytes) -> None:
        cur.append(_decode_show(raw, font_spec))

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
                if str(fname) not in specs:
                    raise ValueError(
                        f"PDF: font /{fname} not in /Resources"
                    )
                font_spec = specs[str(fname)]
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


def _esc_bytes(out: bytes) -> bytes:
    return out.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
              .replace(b")", rb"\)")


def _esc_literal(s: str) -> bytes:
    return _esc_bytes(s.encode("cp1252"))


# Differences fixture arm: the five cp1252-UNDEFINED bytes remapped to
# common letters (129→e, 141→t, 143→a, 144→o run-form, 157→n), so no
# legitimate cp1252 text can collide with the remapped codes
_DIFF_CODES = {"e": 129, "t": 141, "a": 143, "o": 144, "n": 157}
_DIFF_ARRAY = b"[129 /e 141 /t 143 /a /o 157 /n]"


def _cid_assignment(
    text: str,
) -> tuple[dict[str, int], int | None, bytes]:
    """Deterministic char→CID assignment plus the ToUnicode CMap
    bytes for the fixture encoder: CIDs 0x0101.. in sorted-char
    order; codepoint-consecutive runs ≥3 become increment-form
    bfranges, adjacent leftovers become destination-array bfranges
    (chunks ≤4), singletons become bfchar entries; an 'fi' ligature
    CID 0x0100 (2-char destination) exercises multi-code-unit
    destinations whenever the text contains 'fi'."""
    chars = sorted(set(text)) or [" "]
    cidmap = {c: 0x0101 + i for i, c in enumerate(chars)}
    lig = 0x0100 if "fi" in text else None

    inc_ranges: list[tuple[int, int, str]] = []
    misc_groups: list[list[tuple[int, str]]] = []
    pend: list[tuple[int, str]] = []
    i, n = 0, len(chars)
    while i < n:
        j = i
        while j + 1 < n and ord(chars[j + 1]) == ord(chars[j]) + 1:
            j += 1
        if j - i + 1 >= 3:
            if pend:
                misc_groups.append(pend)
                pend = []
            inc_ranges.append(
                (cidmap[chars[i]], cidmap[chars[j]], chars[i])
            )
        else:
            pend.extend((cidmap[chars[k]], chars[k])
                        for k in range(i, j + 1))
        i = j + 1
    if pend:
        misc_groups.append(pend)
    bfchars: list[tuple[int, str]] = []
    arr_ranges: list[list[tuple[int, str]]] = []
    for grp in misc_groups:
        for k in range(0, len(grp), 4):
            chunk = grp[k:k + 4]
            if len(chunk) == 1:
                bfchars.append(chunk[0])
            else:
                arr_ranges.append(chunk)
    if lig is not None:
        bfchars.append((lig, "fi"))

    def u16(s: str) -> bytes:
        return s.encode("utf-16-be").hex().encode()

    lines = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    if inc_ranges or arr_ranges:
        lines.append(b"%d beginbfrange"
                     % (len(inc_ranges) + len(arr_ranges)))
        for lo, hi, ch in inc_ranges:
            lines.append(b"<%04x> <%04x> <%s>" % (lo, hi, u16(ch)))
        for chunk in arr_ranges:
            dsts = b" ".join(b"<%s>" % u16(c) for _, c in chunk)
            lines.append(b"<%04x> <%04x> [%s]"
                         % (chunk[0][0], chunk[-1][0], dsts))
        lines.append(b"endbfrange")
    if bfchars:
        lines.append(b"%d beginbfchar" % len(bfchars))
        for cid_, c in bfchars:
            lines.append(b"<%04x> <%s>" % (cid_, u16(c)))
        lines.append(b"endbfchar")
    lines += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end", b"end",
    ]
    return cidmap, lig, b"\n".join(lines)


def _encode_stream(
    data: bytes, compress: bool, alt: str | None,
) -> tuple[bytes, bytes]:
    """Encode stream payload for the fixture arms; returns
    ``(payload, filter-clause)``.  ``alt`` overrides ``compress``."""
    if alt == "lzw":
        return _lzw_encode(data), b" /Filter /LZWDecode"
    if alt == "ahx":
        return binascii.hexlify(data) + b">", b" /Filter /ASCIIHexDecode"
    if alt == "a85":
        return base64.a85encode(data) + b"~>", b" /Filter /ASCII85Decode"
    if alt == "a85flate":  # decode order: ASCII85 first, then Flate
        return (
            base64.a85encode(zlib.compress(data, 6)) + b"~>",
            b" /Filter [/ASCII85Decode /FlateDecode]",
        )
    if alt is not None:
        raise ValueError(f"unknown alt_filter {alt!r}")
    if compress:
        return zlib.compress(data, 6), b" /Filter /FlateDecode"
    return data, b""


def encode_pdf(
    text: str, *, n_pages: int = 1, compress: bool = False,
    use_tj: bool = False, hex_strings: bool = False,
    octal_first: bool = False, line_words: int = 8,
    xref_stream: bool = False, cid: bool = False,
    differences: bool = False, alt_filter: str | None = None,
) -> bytes:
    """A genuine PDF carrying ``text``: real byte-offset xref table,
    catalog → /Pages → /Page tree, Helvetica /WinAnsiEncoding font,
    content streams (Flate-compressed when ``compress``).  Words are
    laid out ``line_words`` per line, pages split contiguously; the
    arms exercise TJ kerning arrays (``use_tj`` splits a show string
    mid-word — extraction must concatenate), hex strings and octal
    escapes.  ``cid`` swaps the font for /Type0 /Identity-H with a
    genuine ToUnicode CMap (2-byte-code hex show strings, bfrange +
    bfchar + an 'fi' ligature destination); ``differences`` remaps
    e/t/a/o/n onto the five cp1252-undefined bytes via an /Encoding
    /Differences array; ``alt_filter`` ∈ {lzw, ahx, a85, a85flate}
    swaps the stream filter.  ``pdf_text`` inverts all of it exactly
    (newlines for line/page breaks)."""
    if cid and differences:
        raise ValueError("cid and differences arms are exclusive")
    words = text.split(" ") if text else []
    n_pages = max(1, min(n_pages, max(1, len(words))))
    per_page = -(-len(words) // n_pages) if words else 0
    page_words = [
        words[i * per_page:(i + 1) * per_page] for i in range(n_pages)
    ]

    objects: dict[int, bytes] = {}
    font_num = 3 + 2 * n_pages
    page_nums = [3 + 2 * i for i in range(n_pages)]
    desc_num = font_num + 1  # cid only
    tu_num = font_num + 2    # cid only
    last_num = tu_num if cid else font_num

    cidmap: dict[str, int] = {}
    lig: int | None = None
    cmap_bytes = b""
    if cid:
        cidmap, lig, cmap_bytes = _cid_assignment(text)

    def enc_raw(s: str) -> bytes:
        if differences:
            out = bytearray()
            for ch in s:
                dc = _DIFF_CODES.get(ch)
                if dc is not None:
                    out.append(dc)
                else:
                    out += ch.encode("cp1252")
            return bytes(out)
        return s.encode("cp1252")

    def cid_codes(s: str) -> bytes:
        out = bytearray()
        i = 0
        while i < len(s):
            if lig is not None and s.startswith("fi", i):
                out += lig.to_bytes(2, "big")
                i += 2
            else:
                out += cidmap[s[i]].to_bytes(2, "big")
                i += 1
        return bytes(out)

    def hexstr(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    def mk_show(line: str, block: int) -> bytes:
        if cid:
            codes = cid_codes(line)
            if use_tj and len(codes) >= 8:
                cut = (len(codes) // 4) * 2  # even → code boundary
                return (b"[" + hexstr(codes[:cut]) + b" -120 "
                        + hexstr(codes[cut:]) + b"] TJ")
            return hexstr(codes) + b" Tj"
        if hex_strings and block % 3 == 2:
            return hexstr(enc_raw(line)) + b" Tj"
        if use_tj and len(line) > 4:
            cut = len(line) // 2
            return (b"[" + b"(" + _esc_bytes(enc_raw(line[:cut]))
                    + b") -120 (" + _esc_bytes(enc_raw(line[cut:]))
                    + b")] TJ")
        if octal_first and line:
            return (b"(\\%03o" % enc_raw(line[0])[0]
                    + _esc_bytes(enc_raw(line[1:])) + b") Tj")
        return b"(" + _esc_bytes(enc_raw(line)) + b") Tj"

    def content_for(ws: list[str]) -> bytes:
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        first = True
        for i in range(0, len(ws), line_words):
            line = " ".join(ws[i:i + line_words])
            if not first:
                ops.append(b"0 -14 Td")
            first = False
            ops.append(mk_show(line, i // line_words))
        ops.append(b"ET")
        return b"\n".join(ops)

    def stream_obj(data: bytes) -> bytes:
        payload, extra = _encode_stream(data, compress, alt_filter)
        return (
            b"<< /Length %d%s >>\nstream\n" % (len(payload), extra)
            + payload + b"\nendstream"
        )

    for i, ws in enumerate(page_words):
        objects[page_nums[i] + 1] = stream_obj(content_for(ws))
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
    if cid:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Helvetica "
            b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
            b"/ToUnicode %d 0 R >>" % (desc_num, tu_num)
        )
        objects[desc_num] = (
            b"<< /Type /Font /Subtype /CIDFontType2 "
            b"/BaseFont /Helvetica /CIDSystemInfo << /Registry (Adobe) "
            b"/Ordering (Identity) /Supplement 0 >> >>"
        )
        objects[tu_num] = stream_obj(cmap_bytes)
    elif differences:
        objects[font_num] = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences " + _DIFF_ARRAY + b" >> >>"
        )
    else:
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
    # the structure pdf_text's §7.5.7/§7.5.8 paths must invert.
    # Stream objects (page contents, the ToUnicode CMap) cannot live
    # inside an object stream (§7.5.7) and stay top-level.
    stream_nums = {p + 1 for p in page_nums}
    if cid:
        stream_nums.add(tu_num)
    member_nums = sorted(n for n in objects if n not in stream_nums)
    body = bytearray()
    offs: list[int] = []
    for n_ in member_nums:
        offs.append(len(body))
        body += objects[n_] + b"\n"
    header = (
        " ".join(f"{n_} {o}" for n_, o in zip(member_nums, offs))
        .encode() + b"\n"
    )
    objstm_num = last_num + 1
    xref_num = last_num + 2
    stm_payload = zlib.compress(bytes(header + body), 6)
    buf = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for n_ in sorted(stream_nums):
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
    strings / octal escapes on rotating residues, the PDF 1.5 layout
    on id%11==3, /Type0 /Identity-H + ToUnicode on id%13==1,
    /Differences on id%13==5, and LZW / ASCIIHex / ASCII85 /
    [ASCII85, Flate] stream filters on id%17∈{1,2,3,4} — all of
    which `pdf_text` must invert exactly."""
    _ALT = {1: "lzw", 2: "ahx", 3: "a85", 4: "a85flate"}

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
                    cid=int(d) % 13 == 1,
                    differences=int(d) % 13 == 5,
                    alt_filter=_ALT.get(int(d) % 17),
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
