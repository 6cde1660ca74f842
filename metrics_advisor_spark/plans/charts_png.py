"""Dependency-free PNG chart sink (reference S6 parity — the reference
emits one matplotlib PNG per (bucket, objective), metrics_advisor.py:
221-223).  matplotlib/PIL are absent in this container, but PNG itself
is stdlib territory: the file is a signature + IHDR + zlib-compressed
scanlines (IDAT) + IEND with CRC32s — all writable with ``zlib`` +
``struct`` alone, exactly like the repo's BMP/WAV/AVI codecs.  So
instead of gating PNG behind an import-try for a library that may
never appear, this module renders the chart for REAL:

* `_encode_png`: a genuine RGB8 truecolor PNG encoder (filter 0
  scanlines, one IDAT, CRC-checked) — parseable by any PNG reader;
* a numpy rasterizer drawing the SAME content as the SVG sink
  (`plans/report._svg_chart`): white canvas, recessive horizontal
  grid + y-tick labels, dashed change-point vlines, one polyline per
  series in the shared fixed-order palette, and a swatch+text legend;
* text via a compact 5×7 bitmap font (charset: alnum + the handful of
  punctuation chart labels use; anything else renders as a hollow box
  rather than crashing the sink).

SVG stays the default sink (resolution-independent, diffable);
``save_charts(..., fmt="png")`` opts into this raster path.  Charts are
a driver-side render of an already-tiny ranked result (SURVEY §2.7 K5
note) — nothing here touches the distributed plan.
"""

from __future__ import annotations

import struct
import zlib

# --- 5×7 bitmap font --------------------------------------------------------
# Each glyph: 7 rows top→bottom, one 5-bit int per row (MSB = leftmost
# column).  Covers the characters chart titles/legends/ticks emit.

_FONT: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "a": (0x00, 0x00, 0x0E, 0x01, 0x0F, 0x11, 0x0F),
    "b": (0x10, 0x10, 0x1E, 0x11, 0x11, 0x11, 0x1E),
    "c": (0x00, 0x00, 0x0E, 0x10, 0x10, 0x11, 0x0E),
    "d": (0x01, 0x01, 0x0F, 0x11, 0x11, 0x11, 0x0F),
    "e": (0x00, 0x00, 0x0E, 0x11, 0x1F, 0x10, 0x0E),
    "f": (0x06, 0x08, 0x1C, 0x08, 0x08, 0x08, 0x08),
    "g": (0x00, 0x0F, 0x11, 0x11, 0x0F, 0x01, 0x0E),
    "h": (0x10, 0x10, 0x1E, 0x11, 0x11, 0x11, 0x11),
    "i": (0x04, 0x00, 0x0C, 0x04, 0x04, 0x04, 0x0E),
    "j": (0x02, 0x00, 0x06, 0x02, 0x02, 0x12, 0x0C),
    "k": (0x10, 0x10, 0x12, 0x14, 0x18, 0x14, 0x12),
    "l": (0x0C, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "m": (0x00, 0x00, 0x1A, 0x15, 0x15, 0x15, 0x15),
    "n": (0x00, 0x00, 0x1E, 0x11, 0x11, 0x11, 0x11),
    "o": (0x00, 0x00, 0x0E, 0x11, 0x11, 0x11, 0x0E),
    "p": (0x00, 0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10),
    "q": (0x00, 0x0F, 0x11, 0x11, 0x0F, 0x01, 0x01),
    "r": (0x00, 0x00, 0x16, 0x19, 0x10, 0x10, 0x10),
    "s": (0x00, 0x00, 0x0F, 0x10, 0x0E, 0x01, 0x1E),
    "t": (0x08, 0x08, 0x1C, 0x08, 0x08, 0x09, 0x06),
    "u": (0x00, 0x00, 0x11, 0x11, 0x11, 0x13, 0x0D),
    "v": (0x00, 0x00, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "w": (0x00, 0x00, 0x11, 0x11, 0x15, 0x15, 0x0A),
    "x": (0x00, 0x00, 0x11, 0x0A, 0x04, 0x0A, 0x11),
    "y": (0x00, 0x11, 0x11, 0x11, 0x0F, 0x01, 0x0E),
    "z": (0x00, 0x00, 0x1F, 0x02, 0x04, 0x08, 0x1F),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ",": (0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    ";": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x04, 0x08),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "=": (0x00, 0x00, 0x1F, 0x00, 0x1F, 0x00, 0x00),
    "%": (0x18, 0x19, 0x02, 0x04, 0x08, 0x13, 0x03),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    "|": (0x04, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "'": (0x04, 0x04, 0x08, 0x00, 0x00, 0x00, 0x00),
}
# unknown characters render as a hollow box (never crash the sink)
_BOX = (0x1F, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1F)


def _encode_png(rgb) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a genuine truecolor PNG:
    signature, IHDR (8-bit, color type 2), one zlib IDAT of
    filter-0-prefixed scanlines, IEND — CRC32 on every chunk."""
    import numpy as np

    h, w = rgb.shape[0], rgb.shape[1]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = rgb.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes):
    """Decode a PNG produced by `_encode_png` back to an (h, w, 3)
    array — the roundtrip half the tests and the report pipeline's
    self-check use.  Only the subset this encoder emits (8-bit RGB,
    filter 0) is supported; anything else raises."""
    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + ln:pos + 12 + ln]
        )
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, _ = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2:
                raise ValueError(
                    f"unsupported PNG layout (depth={depth}, "
                    f"color_type={ctype}); 8-bit RGB only"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, 1 + w * 3)
    if (rows[:, 0] != 0).any():
        raise ValueError("unsupported scanline filter (0 only)")
    return rows[:, 1:].reshape(h, w, 3).copy()


def _hex_rgb(color: str):
    return tuple(int(color[i:i + 2], 16) for i in (1, 3, 5))


def _draw_hline(img, y: int, x0: int, x1: int, color, dash=0) -> None:
    h, w = img.shape[:2]
    if not 0 <= y < h:
        return
    for x in range(max(0, x0), min(w, x1 + 1)):
        if dash and (x // dash) % 2:
            continue
        img[y, x] = color


def _draw_vline(img, x: int, y0: int, y1: int, color, dash=0) -> None:
    h, w = img.shape[:2]
    if not 0 <= x < w:
        return
    for y in range(max(0, y0), min(h, y1 + 1)):
        if dash and (y // dash) % 2:
            continue
        img[y, x] = color


def _draw_line(img, x0: float, y0: float, x1: float, y1: float,
               color, width: int = 2) -> None:
    """Bresenham polyline segment with a square brush of ``width``."""
    h, w = img.shape[:2]
    x0, y0, x1, y1 = int(round(x0)), int(round(y0)), int(round(x1)), int(round(y1))
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
    err = dx + dy
    r = width // 2
    while True:
        for oy in range(-r, width - r):
            for ox in range(-r, width - r):
                px, py = x0 + ox, y0 + oy
                if 0 <= px < w and 0 <= py < h:
                    img[py, px] = color
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy


def _draw_text(img, x: int, y: int, s: str, color) -> None:
    """5×7 glyphs with 1px spacing, (x, y) = top-left of the run."""
    h, w = img.shape[:2]
    cx = x
    for ch in s:
        rows = _FONT.get(ch, _BOX)
        for ry, bits in enumerate(rows):
            for rx in range(5):
                if bits & (1 << (4 - rx)):
                    px, py = cx + rx, y + ry
                    if 0 <= px < w and 0 <= py < h:
                        img[py, px] = color
        cx += 6


_W, _H = 720, 360
_PAD_L, _PAD_R, _PAD_T, _PAD_B = 50, 16, 34, 22
_INK = _hex_rgb("#1a1a19")
_MUTED = _hex_rgb("#6b6a62")
_GRID = _hex_rgb("#e8e8e4")


def png_chart(
    title: str,
    series: list[tuple[str, list[int], list[float]]],
    vlines: list[int],
    colors: list[str],
) -> bytes:
    """Rasterize the SAME chart content as `report._svg_chart` (same
    geometry constants, palette order, grid/vline/legend structure)
    and return genuine PNG bytes."""
    import numpy as np

    img = np.full((_H, _W, 3), 255, dtype=np.uint8)
    xs_all = [x for _, xs, _ in series for x in xs]
    ys_all = [y for _, _, ys in series for y in ys if y == y]
    if not xs_all or not ys_all:
        return _encode_png(img)
    x0, x1 = min(xs_all), max(xs_all)
    y0, y1 = min(ys_all + [0.0]), max(ys_all + [0.0])
    if x1 == x0:
        x1 = x0 + 1
    if y1 == y0:
        y1 = y0 + 1
    pw = _W - _PAD_L - _PAD_R
    # floor at 40px: ~20+ series would otherwise drive ph <= 0 and flip
    # the sy() mapping (grid/legend drawn outside the canvas).  With the
    # floor, excess legend rows clip harmlessly below the canvas — all
    # draw helpers bounds-check (ADVICE r08; mirrored in
    # report._svg_chart).
    ph = max(40, _H - _PAD_T - _PAD_B - 16 * len(series))

    def sx(x: float) -> float:
        return _PAD_L + (x - x0) / (x1 - x0) * pw

    def sy(y: float) -> float:
        return _PAD_T + (1 - (y - y0) / (y1 - y0)) * ph

    _draw_text(img, _PAD_L, 8, title, _INK)
    for i in range(5):
        gy = int(round(_PAD_T + ph * i / 4))
        gv = y1 - (y1 - y0) * i / 4
        _draw_hline(img, gy, _PAD_L, _W - _PAD_R, _GRID)
        label = f"{gv:.2f}"
        _draw_text(img, _PAD_L - 6 - 6 * len(label), gy - 3, label, _MUTED)
    for v in vlines:
        _draw_vline(img, int(round(sx(v))), _PAD_T,
                    int(round(_PAD_T + ph)), _MUTED, dash=4)
    for i, (label, xs, ys) in enumerate(series):
        color = _hex_rgb(colors[i % len(colors)])
        pts = [(sx(x), sy(y)) for x, y in zip(xs, ys) if y == y]
        for (ax, ay), (bx, by) in zip(pts, pts[1:]):
            _draw_line(img, ax, ay, bx, by, color, width=2)
        ly = int(_PAD_T + ph + 16 + 16 * i)
        img[max(0, ly - 9):ly + 1, _PAD_L:_PAD_L + 10] = color
        _draw_text(img, _PAD_L + 16, ly - 8, label, _INK)
    return _encode_png(img)
