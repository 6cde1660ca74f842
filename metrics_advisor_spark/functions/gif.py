"""GIF87a/89a decoder (+ a minimal real encoder for fixtures) — pure
stdlib + numpy, in the same no-external-library codec family as
`functions.jpeg` (T.81) and `functions.png` (RFC 2083).

GIF is the last of the four ubiquitous web image formats
(JPEG/PNG/GIF/BMP) the multimodal ingest path dispatches on — real
crawl corpora are full of it, and animated GIFs straddle the
image/video boundary (frames + per-frame delays), so the decoder
covers BOTH: `decode_gif` returns the first frame composited onto the
logical screen (the still-image contract every browser implements),
and `gif_frames` replays the full animation with the GIF89a disposal
semantics (1 = leave, 2 = restore-to-background, 3 = restore-to-
previous) the way a frame-sampling pipeline needs.

Spec coverage (GIF89a specification, CompuServe 1990 — public):
  - logical screen descriptor + global color table
  - image descriptors with local color tables, arbitrary placement
    rects, and the 4-pass row interlace (rows 0::8, 4::8, 2::4, 1::2)
  - variable-width LZW decompression (code width grows 3..12 bits,
    CLEAR resets the table, deferred-clear streams where the table
    saturates at 4096 are honored)
  - GIF89a extensions: graphic control (delay, transparency index,
    disposal), and skip-over for comment/plaintext/application blocks
    (NETSCAPE looping etc. carry no pixel semantics)

Malformed payloads raise with a clear message (bad signature,
truncated sub-block chain, LZW code beyond the table, missing image
data) — like the other codecs, payloads are parsed per spec, never
guessed around.

The encoder exists so fixtures are REAL: `encode_gif` runs genuine
greedy LZW (dictionary up to 4096, CLEAR emitted on saturation), so
the decoder is validated by (a) bit-exact roundtrip through its own
encoder, (b) decoding files written by an INDEPENDENT codec (the
JVM's ImageIO GIF writer), and (c) the JVM decoding files written
here — the same two-sided cross-validation the PNG suite uses.

Scale: LZW is an inherently sequential per-payload bitstream (exactly
like the JPEG Huffman scan); each payload decodes inside the existing
mapInPandas Arrow batches, so parallelism comes from payloads per
partition, never from within one stream.  Index→RGB expansion and
interlace reordering are vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# 4-pass interlace row schedule (GIF89a spec, appendix E):
# (first_row, step) per pass.
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_POW2 = (1 << np.arange(12, dtype=np.int64)).astype(np.int64)


# ---------------------------------------------------------------------------
# bit-level LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, mcs: int, n_px: int) -> np.ndarray:
    """Decode a GIF LZW stream (already de-sub-blocked) of pixel
    indices.  ``mcs`` is the 'LZW minimum code size' byte; codes start
    at mcs+1 bits (LSB-first packing) and grow to 12.  Returns exactly
    ``n_px`` uint8 indices; a stream that ends early raises."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"GIF: invalid LZW minimum code size {mcs}")
    clear = 1 << mcs
    end = clear + 1
    # table as parallel arrays: prefix link + last byte (fast, no
    # per-entry python lists); roots are their own byte
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)  # first byte of each entry
    last[:clear] = np.arange(clear, dtype=np.uint8)
    first[:clear] = np.arange(clear, dtype=np.uint8)

    out = np.empty(n_px, dtype=np.uint8)
    n_out = 0
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8).reshape(-1, 1),
        axis=1, bitorder="little",
    ).ravel()
    pos = 0
    nbits = len(bits)

    width = mcs + 1
    next_code = end + 1
    prev = -1
    # scratch buffer for unrolling one entry's byte chain (max 4096)
    chain = np.empty(4096, dtype=np.uint8)

    while True:
        if pos + width > nbits:
            if n_out == n_px:
                break  # stream ended exactly at the raster — accept
            raise ValueError(
                "GIF: LZW stream truncated "
                f"({n_out}/{n_px} pixels decoded)"
            )
        code = int(bits[pos:pos + width] @ _POW2[:width])
        pos += width
        if code == clear:
            next_code = end + 1
            width = mcs + 1
            prev = -1
            continue
        if code == end:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError(
                    f"GIF: first LZW code {code} is not a root"
                )
            if n_out >= n_px:
                raise ValueError("GIF: LZW emits more pixels than raster")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:  # known entry
            cur = code
        elif code == next_code:  # KwKwK case
            cur = -2
        else:
            raise ValueError(
                f"GIF: LZW code {code} beyond table ({next_code})"
            )
        # materialize entry bytes (walk the prefix chain backwards)
        if cur == -2:
            # prev's bytes + first byte of prev
            c, n = prev, 0
            while c != -1:
                chain[n] = last[c]
                n += 1
                c = prefix[c]
            seq_len = n + 1
            if n_out + seq_len > n_px:
                raise ValueError("GIF: LZW emits more pixels than raster")
            out[n_out:n_out + n] = chain[:n][::-1]
            out[n_out + n] = first[prev]
        else:
            c, n = cur, 0
            while c != -1:
                chain[n] = last[c]
                n += 1
                c = prefix[c]
            seq_len = n
            if n_out + seq_len > n_px:
                raise ValueError("GIF: LZW emits more pixels than raster")
            out[n_out:n_out + n] = chain[:n][::-1]
        # add prev + first(cur) to the table (unless saturated —
        # deferred-clear streams keep emitting 12-bit codes)
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = out[n_out] if cur != -2 else first[prev]
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        n_out += seq_len
        prev = code if cur != -2 else next_code - 1
        if n_out == n_px:
            # consume a trailing END code if present; either way stop
            break

    if n_out != n_px:
        raise ValueError(
            f"GIF: LZW stream ended early ({n_out}/{n_px} pixels)"
        )
    return out


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """Real greedy LZW for the fixture encoder: dictionary of byte
    strings up to 4096 entries, CLEAR emitted when the table
    saturates, END terminates.  Output is the raw code stream
    (sub-blocking is the caller's job)."""
    clear = 1 << mcs
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1

    out_bits: list[int] = []

    def emit(code: int, w: int) -> None:
        for i in range(w):
            out_bits.append((code >> i) & 1)

    emit(clear, width)
    data = indices.astype(np.uint8).tobytes()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        w = data[i:j]
        while j < n and data[i:j + 1] in table:
            j += 1
            w = data[i:j]
        emit(table[w], width)
        if j < n:
            if next_code < 4096:
                table[w + data[j:j + 1]] = next_code
                if next_code == (1 << width) and width < 12:
                    width += 1
                next_code += 1
            else:
                emit(clear, width)
                table = {bytes([k]): k for k in range(clear)}
                next_code = end + 1
                width = mcs + 1
        i = j
    emit(end, width)
    bits = np.array(out_bits, dtype=np.uint8)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(
        bits.reshape(-1, 8), axis=1, bitorder="little"
    ).ravel().tobytes()


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF: truncated sub-block chain")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > n:
            raise ValueError("GIF: truncated sub-block data")
        chunks.append(payload[pos:pos + ln])
        pos += ln


def _screen(payload: bytes):
    """Parse header + logical screen descriptor; returns
    (width, height, global_color_table or None, bg_index, pos)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    if len(payload) < 13:
        raise ValueError("GIF: truncated logical screen descriptor")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 3 * (2 << (packed & 0x07))
        if pos + sz > len(payload):
            raise ValueError("GIF: truncated global color table")
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=sz, offset=pos
        ).reshape(-1, 3).copy()
        pos += sz
    return w, h, gct, bg, pos


def _walk(payload: bytes):
    """Yield parsed blocks in stream order.  Each is one of
    ('gce', disposal, delay_ms, transparent_index_or_None) or
    ('img', left, top, w, h, interlaced, lct_or_None, indices).
    Raises on unknown introducers / missing trailer."""
    sw, sh, gct, bg, pos = _screen(payload)
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF: missing trailer (0x3B)")
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            return
        if intro == 0x21:  # extension
            if pos >= n:
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("GIF: short graphic control block")
                packed, delay = struct.unpack("<BH", data[:3])
                tidx = data[3] if packed & 0x01 else None
                disposal = (packed >> 2) & 0x07
                yield ("gce", disposal, delay * 10, tidx)
            # comment/plaintext/application: no pixel semantics — skip
            continue
        if intro == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("GIF: truncated image descriptor")
            left, top, w, h, packed = struct.unpack(
                "<HHHHB", payload[pos:pos + 9]
            )
            pos += 9
            lct = None
            if packed & 0x80:
                sz = 3 * (2 << (packed & 0x07))
                if pos + sz > n:
                    raise ValueError("GIF: truncated local color table")
                lct = np.frombuffer(
                    payload, dtype=np.uint8, count=sz, offset=pos
                ).reshape(-1, 3).copy()
                pos += sz
            if pos >= n:
                raise ValueError("GIF: missing LZW minimum code size")
            mcs = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            idx = _lzw_decode(data, mcs, w * h)
            if packed & 0x40:  # interlaced: scatter rows
                grid = idx.reshape(h, w)
                un = np.empty_like(grid)
                src = 0
                for start, step in _INTERLACE:
                    rows = range(start, h, step)
                    for r in rows:
                        un[r] = grid[src]
                        src += 1
                idx = un.ravel()
            yield ("img", left, top, w, h, bool(packed & 0x40), lct, idx)
            continue
        raise ValueError(f"GIF: unknown block introducer 0x{intro:02x}")


def gif_meta(payload: bytes) -> tuple[int, int, int, int | None]:
    """(width, height, n_frames, duration_ms) from the block walk
    WITHOUT LZW decode — image data sub-blocks are skipped over, so
    this is the cheap triage pass.  duration_ms is the sum of
    graphic-control delays, or None for a plain still (no GCE)."""
    sw, sh, _, _, pos = _screen(payload)
    n = len(payload)
    n_frames = 0
    total_delay = 0
    saw_gce = False
    while True:
        if pos >= n:
            raise ValueError("GIF: missing trailer (0x3B)")
        intro = payload[pos]
        pos += 1
        if intro == 0x3B:
            break
        if intro == 0x21:
            if pos >= n:
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                saw_gce = True
                total_delay += struct.unpack("<H", data[1:3])[0] * 10
            continue
        if intro == 0x2C:
            if pos + 9 > n:
                raise ValueError("GIF: truncated image descriptor")
            packed = payload[pos + 8]
            pos += 9
            if packed & 0x80:
                pos += 3 * (2 << (packed & 0x07))
            pos += 1  # LZW mcs
            _, pos = _read_subblocks(payload, pos)
            n_frames += 1
            continue
        raise ValueError(f"GIF: unknown block introducer 0x{intro:02x}")
    if n_frames == 0:
        raise ValueError("GIF: no image data")
    return sw, sh, n_frames, (total_delay if saw_gce else None)


def _compose(canvas, left, top, w, h, lct, gct, idx, tidx):
    pal = lct if lct is not None else gct
    if pal is None:
        raise ValueError("GIF: frame has neither local nor global "
                         "color table")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("GIF: pixel index beyond color table")
    if top + h > canvas.shape[0] or left + w > canvas.shape[1]:
        raise ValueError("GIF: frame rect escapes logical screen")
    grid = idx.reshape(h, w)
    rgb = pal[grid]
    target = canvas[top:top + h, left:left + w]
    if tidx is None:
        target[:] = rgb
    else:
        mask = grid != tidx
        target[mask] = rgb[mask]


def gif_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Replay the full animation: returns [(delay_ms, frame_rgb)]
    with each frame the COMPOSITED logical screen (h, w, 3) uint8 —
    disposal 1 (leave) / 2 (restore background) / 3 (restore
    previous) applied between frames per GIF89a §23.  The initial
    canvas is the background color (global table) or black."""
    sw, sh, gct, bg, _ = _screen(payload)
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[tuple[int, np.ndarray]] = []
    pending = (0, 0, None)  # (disposal, delay_ms, tidx)
    for blk in _walk(payload):
        if blk[0] == "gce":
            pending = (blk[1], blk[2], blk[3])
            continue
        _, left, top, w, h, _, lct, idx = blk
        disposal, delay_ms, tidx = pending
        before = canvas.copy() if disposal == 3 else None
        _compose(canvas, left, top, w, h, lct, gct, idx, tidx)
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:
            canvas[top:top + h, left:left + w] = bg_rgb
        elif disposal == 3:
            canvas = before
        pending = (0, 0, None)
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame composited onto the logical screen, (h, w, 3)
    uint8 RGB — the still-image contract (what a browser shows before
    the animation advances)."""
    sw, sh, gct, bg, _ = _screen(payload)
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    tidx = None
    for blk in _walk(payload):
        if blk[0] == "gce":
            tidx = blk[3]
            continue
        _, left, top, w, h, _, lct, idx = blk
        _compose(canvas, left, top, w, h, lct, gct, idx, tidx)
        return canvas
    raise ValueError("GIF: no image data")


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames: list[tuple[int, np.ndarray]] | np.ndarray,
    palette: np.ndarray,
    *,
    bg_index: int = 0,
    interlace: bool = False,
    transparent_index: int | None = None,
    disposal: int = 1,
) -> bytes:
    """Encode INDEX arrays (not RGB) as a genuine GIF89a: ``frames``
    is either one (h, w) uint8 index array (still — no GCE) or a list
    of (delay_ms, index_array) (animated — one graphic-control block
    per frame).  ``palette`` is (k, 3) uint8, padded to the next
    power of two ≥ 2.  Real greedy LZW per frame."""
    if isinstance(frames, np.ndarray):
        seq = [(None, frames)]
    else:
        seq = list(frames)
    k = len(palette)
    bits = max(1, int(np.ceil(np.log2(max(k, 2)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:k] = palette
    sh, sw = seq[0][1].shape

    out = [b"GIF89a",
           struct.pack("<HHBBB", sw, sh, 0x80 | ((bits - 1) & 7),
                       bg_index, 0),
           pal.tobytes()]
    mcs = max(2, bits)
    for delay_ms, arr in seq:
        h, w = arr.shape
        if delay_ms is not None:
            packed = ((disposal & 7) << 2) | (
                1 if transparent_index is not None else 0
            )
            out.append(b"\x21\xf9\x04" + struct.pack(
                "<BHB", packed, delay_ms // 10,
                transparent_index or 0) + b"\x00")
        idx = arr
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, h, step))
            idx = arr[np.array(rows)]
        out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                               0x40 if interlace else 0x00))
        out.append(bytes([mcs]))
        stream = _lzw_encode(idx.ravel(), mcs)
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)
