"""Full PNG (RFC 2083) still-image decoder — stdlib zlib + numpy.

The chart sink already EMITS PNG (`plans/charts_png.py`: signature +
IHDR + one filter-0 IDAT) and its `_parse_png` roundtrips only that
subset.  This module is the general DECODER for the multimodal ingest
path: grayscale (0), RGB (2), palette (3), gray+alpha (4), RGBA (6)
color types at bit depths 1/2/4/8/16 (as RFC 2083 permits per type),
ALL five scanline filters (None/Sub/Up/Average/Paeth), multi-IDAT
streams, and Adam7 interlace (r11; seven independently-filtered
sub-images scattered onto the output grid) — decoded with zlib inflate
+ numpy unfiltering.  Verified bit-exact against an independent codec
(the JVM's ImageIO) — PNG is lossless, so unlike the JPEG tests the
comparison is equality, not tolerance (16-bit compares the high byte,
the defined 16→8 reduction).

Out of scope (raise with a clear message): APNG animation and the
nonzero compression/filter methods no conformant encoder emits.

Scale: inflate + per-scanline unfilter run per payload inside the
existing mapInPandas batches.  Filters Up/None are fully vectorized;
Sub is a per-channel modular prefix-sum; Average/Paeth carry a
left-neighbor dependency and fall back to a per-pixel scanline loop —
the standard serial core every PNG implementation has.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# RFC 2083 §4.1.1: permitted bit depths per color type
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def png_meta(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_channels) from IHDR — cheap, no inflate."""
    w, h, depth, ctype, interlace, _ = _ihdr(payload)
    return w, h, _CHANNELS[ctype]


def _ihdr(payload: bytes):
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    if len(payload) < 33 or payload[12:16] != b"IHDR":
        raise ValueError("PNG: missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", payload[16:29]
    )
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {ctype}")
    if depth not in _DEPTHS[ctype]:
        raise ValueError(
            f"PNG: bit depth {depth} invalid for color type {ctype}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    return w, h, depth, ctype, interlace, comp


def _unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """Undo the five RFC 2083 scanline filters.  ``rows`` is
    (n_scanlines, 1 + row_bytes) raw bytes (filter tag first);
    ``bpp`` is the filter's left-neighbor offset in BYTES
    (ceil(depth/8) x channels).  Returns (n_scanlines, row_bytes)."""
    n, row_bytes = rows.shape[0], rows.shape[1] - 1
    out = np.zeros((n, row_bytes), dtype=np.int64)
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(n):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: modular prefix sum per byte offset
            cur = line.reshape(-1, bpp)
            cur = np.cumsum(cur, axis=0) & 0xFF
            cur = cur.reshape(row_bytes)
        elif f == 3:  # Average
            cur = np.empty(row_bytes, dtype=np.int64)
            for i in range(row_bytes):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(row_bytes, dtype=np.int64)
            for i in range(row_bytes):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown scanline filter {f}")
        out[y] = cur
        prev = cur
    return out


def _samples(unf: np.ndarray, pw: int, depth: int, ch: int) -> np.ndarray:
    """Unfiltered byte rows -> (n, pw*ch) uint8 samples.  16-bit takes
    the high byte (the defined 16->8 reduction); sub-byte depths unpack
    MSB-first and are NOT rescaled here (gray rescale / palette lookup
    is the caller's job)."""
    n = unf.shape[0]
    u8 = (unf & 0xFF).astype(np.uint8)
    if depth == 8:
        return u8[:, : pw * ch]
    if depth == 16:
        return u8.reshape(n, -1, 2)[:, : pw * ch, 0]
    bits = np.unpackbits(u8, axis=1)
    vals = bits.reshape(n, -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (vals * weights).sum(axis=2)[:, : pw * ch].astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 RGB array — gray replicates,
    palette indices map through PLTE, alpha is dropped, 16-bit keeps
    the high byte (the raster contract the BMP/JPEG paths use)."""
    w, h, depth, ctype, interlace, _ = _ihdr(payload)
    ch = _CHANNELS[ctype]
    pos = 8
    idat = bytearray()
    plte: np.ndarray | None = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("PNG: truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + ln : pos + 12 + ln]
        )
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"PNG: CRC mismatch in {tag!r} chunk")
        if tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            if ln % 3 or ln == 0:
                raise ValueError(
                    "PNG: PLTE length must be a positive multiple of 3"
                )
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        raise ValueError("PNG: no IDAT data")
    if ctype == 3 and plte is None:
        raise ValueError("PNG: palette image without PLTE chunk")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    bpp = max(1, depth // 8) * ch

    def row_bytes(pw: int) -> int:
        return (pw * ch * depth + 7) // 8

    if interlace == 0:
        stride = 1 + row_bytes(w)
        if raw.size != h * stride:
            raise ValueError(
                f"PNG: inflated size {raw.size} != expected {h * stride}"
            )
        sam = _samples(_unfilter(raw.reshape(h, stride), bpp), w, depth, ch)
        px = sam.reshape(h, w, ch)
    else:  # Adam7: seven independently-filtered sub-images
        px = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = 1 + row_bytes(pw)
            part = raw[off : off + ph * stride]
            if part.size != ph * stride:
                raise ValueError("PNG: truncated interlace pass")
            off += ph * stride
            sam = _samples(
                _unfilter(part.reshape(ph, stride), bpp), pw, depth, ch
            )
            px[y0::dy, x0::dx, :] = sam.reshape(ph, pw, ch)
        if off != raw.size:
            raise ValueError(
                f"PNG: {raw.size - off} trailing bytes after interlace "
                "passes"
            )
    if ctype == 3:
        if int(px.max(initial=0)) >= len(plte):
            raise ValueError(
                f"PNG: palette index {int(px.max())} out of range for "
                f"{len(plte)}-entry PLTE"
            )
        return plte[px[:, :, 0]]
    if ctype == 0 and depth < 8:
        # rescale sub-byte gray to full range (RFC 2083 sample depth)
        px = (px.astype(np.int64) * 255 // ((1 << depth) - 1)).astype(
            np.uint8
        )
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)
