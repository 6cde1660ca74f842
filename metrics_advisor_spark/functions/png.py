"""Full PNG (RFC 2083) still-image decoder — stdlib zlib + numpy.

The chart sink already EMITS PNG (`plans/charts_png.py`: signature +
IHDR + one filter-0 IDAT) and its `_parse_png` roundtrips only that
subset.  This module is the general DECODER for the multimodal ingest
path: any 8-bit-depth, non-interlaced PNG — grayscale (0), RGB (2),
gray+alpha (4), RGBA (6) color types, ALL five scanline filters
(None/Sub/Up/Average/Paeth), multi-IDAT streams — decoded with zlib
inflate + numpy unfiltering.  Verified bit-exact against an
independent codec (the JVM's ImageIO) — PNG is lossless, so unlike the
JPEG tests the comparison is equality, not tolerance.

Out of scope (raise with a clear message): 16-bit depth, palette
(color type 3), Adam7 interlace — rare in crawl data and a documented
deployment swap, the same boundary the other codecs draw.

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

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


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
    if depth != 8:
        raise ValueError(
            f"PNG: only 8-bit depth supported, got {depth}"
        )
    if ctype not in _CHANNELS:
        raise ValueError(
            f"PNG: unsupported color type {ctype} (palette PNGs are a "
            "deployment codec swap)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlace not supported")
    return w, h, depth, ctype, interlace, comp


def decode_png(payload: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 RGB array — gray replicates,
    alpha is dropped (the raster contract the BMP/JPEG paths use)."""
    w, h, _, ctype, _, _ = _ihdr(payload)
    ch = _CHANNELS[ctype]
    pos = 8
    idat = bytearray()
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
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if not idat:
        raise ValueError("PNG: no IDAT data")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if raw.size != h * stride:
        raise ValueError(
            f"PNG: inflated size {raw.size} != expected {h * stride}"
        )
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.int64)
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        f = rows[y, 0]
        line = rows[y, 1:].astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: modular prefix sum per channel offset
            cur = line.reshape(w, ch)
            cur = np.cumsum(cur, axis=0) & 0xFF
            cur = cur.reshape(w * ch)
        elif f == 3:  # Average
            cur = np.empty(w * ch, dtype=np.int64)
            for i in range(w * ch):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = np.empty(w * ch, dtype=np.int64)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
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
    px = out.reshape(h, w, ch).astype(np.uint8)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGB / RGBA (alpha dropped)
