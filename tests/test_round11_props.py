"""Property-based tests for the round-11 additions (SURVEY.md §5.4
style).  All pure numpy/python — no Spark session — so hypothesis can
afford real example counts.

- PNG: a reference ENCODER (independent re-implementation of the five
  RFC 2083 filters and the Adam7 pass split, written forward from the
  spec rather than by inverting the decoder's code) must round-trip
  bit-exactly through `decode_png` for random sizes, color types,
  depths, per-row filter choices and interlacing.
- Adam7: the seven passes PARTITION the pixel grid — every (x, y) is
  emitted by exactly one pass (the bug class the r11 pass-table typo
  belonged to).
- JPEG: T.81 EXTEND is the exact inverse of the encoder's magnitude
  encoding for every representable coefficient.
- BPE: `_admit_batch` admits a prefix-greedy, pairwise NON-INTERACTING
  batch — no shared symbols, no symbol equal to another admitted
  pair's concatenation — and every rejection is justified by an
  earlier admitted pair (or the budget).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

PROP = settings(max_examples=30, deadline=None)


# ---------------------------------------------------------------- PNG

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(rows: np.ndarray, bpp: int, filters) -> bytes:
    """Forward-apply RFC 2083 filters (the encoder side the decoder
    never contains): rows (n, row_bytes) -> filter-tagged scanlines."""
    n, rb = rows.shape
    out = bytearray()
    prev = np.zeros(rb, dtype=np.int64)
    for y in range(n):
        cur = rows[y].astype(np.int64)
        f = filters[y % len(filters)]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]]) \
                if rb > bpp else np.zeros(rb, np.int64)
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]]) \
                if rb > bpp else np.zeros(rb, np.int64)
            enc = (cur - (left + prev) // 2) & 0xFF
        else:  # Paeth
            enc = np.empty(rb, dtype=np.int64)
            for i in range(rb):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                enc[i] = (cur[i] - _paeth(a, prev[i], c)) & 0xFF
        out += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    return bytes(out)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _encode_png(px: np.ndarray, ctype: int, depth: int, filters,
                interlace: int = 0, plte: np.ndarray | None = None) -> bytes:
    """Reference encoder: samples (h, w, ch) -> PNG bytes."""
    h, w, ch = px.shape
    bpp = max(1, depth // 8) * ch

    def pack_rows(sub: np.ndarray) -> np.ndarray:
        sh, sw = sub.shape[:2]
        flat = sub.reshape(sh, sw * ch)
        if depth == 8:
            return flat.astype(np.uint8)
        if depth == 16:
            b = np.zeros((sh, sw * ch * 2), dtype=np.uint8)
            b[:, 0::2] = (flat >> 8) & 0xFF
            b[:, 1::2] = flat & 0xFF
            return b
        # sub-byte: MSB-first bit packing with row padding
        rb = (sw * ch * depth + 7) // 8
        out = np.zeros((sh, rb), dtype=np.uint8)
        for y in range(sh):
            bits = np.zeros(rb * 8, dtype=np.uint8)
            for i in range(sw * ch):
                for k in range(depth):
                    bits[i * depth + k] = (flat[y, i] >> (depth - 1 - k)) & 1
            out[y] = np.packbits(bits)
        return out

    if interlace == 0:
        raw = _filter_rows(pack_rows(px), bpp, filters)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_rows(pack_rows(sub), bpp, filters))
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    body = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", bytes(plte.astype(np.uint8).reshape(-1)))
    return body + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


@PROP
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 16),
    ctype=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**16),
    f0=st.integers(0, 4),
    f1=st.integers(0, 4),
    f2=st.integers(0, 4),
)
def test_png_depth8_roundtrip_any_filters(w, h, ctype, seed, f0, f1, f2):
    from metrics_advisor_spark.functions.png import decode_png

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch), dtype=np.int64)
    payload = _encode_png(px, ctype, 8, (f0, f1, f2))
    got = decode_png(payload)
    if ctype in (0, 4):
        assert (got[:, :, 0] == px[:, :, 0]).all()
        assert (got[:, :, 2] == px[:, :, 0]).all()  # gray replicated
    else:
        assert (got == px[:, :, :3]).all()


@PROP
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 14),
    ctype=st.sampled_from([0, 2]),
    seed=st.integers(0, 2**16),
    f0=st.integers(0, 4),
    f1=st.integers(0, 4),
)
def test_png_depth16_roundtrip_high_byte(w, h, ctype, seed, f0, f1):
    from metrics_advisor_spark.functions.png import decode_png

    ch = {0: 1, 2: 3}[ctype]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 65536, (h, w, ch), dtype=np.int64)
    payload = _encode_png(px, ctype, 16, (f0, f1))
    got = decode_png(payload)
    want = px >> 8
    if ctype == 0:
        assert (got[:, :, 0] == want[:, :, 0]).all()
    else:
        assert (got == want).all()


@PROP
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 22),
    seed=st.integers(0, 2**16),
    f0=st.integers(0, 4),
    f1=st.integers(0, 4),
    depth=st.sampled_from([8, 16]),
)
def test_png_adam7_roundtrip(w, h, seed, f0, f1, depth):
    """Interlaced encode -> decode is the identity for ANY size,
    including the degenerate sizes where some passes are empty
    (w or h < the pass stride)."""
    from metrics_advisor_spark.functions.png import decode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 1 << depth, (h, w, 3), dtype=np.int64)
    payload = _encode_png(px, 2, depth, (f0, f1), interlace=1)
    got = decode_png(payload)
    want = px if depth == 8 else px >> 8
    assert (got == want).all()


@PROP
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**16),
    depth=st.sampled_from([1, 2, 4, 8]),
    f=st.integers(0, 4),
)
def test_png_palette_roundtrip(w, h, seed, depth, f):
    from metrics_advisor_spark.functions.png import decode_png

    rng = np.random.default_rng(seed)
    n_pal = 1 << depth
    plte = rng.integers(0, 256, (n_pal, 3), dtype=np.int64)
    idx = rng.integers(0, n_pal, (h, w, 1), dtype=np.int64)
    payload = _encode_png(idx, 3, depth, (f,), plte=plte)
    got = decode_png(payload)
    assert (got == plte[idx[:, :, 0]]).all()


@PROP
@given(w=st.integers(1, 64), h=st.integers(1, 64))
def test_adam7_passes_partition_the_grid(w, h):
    """Every pixel is emitted by EXACTLY one Adam7 pass — the property
    the r11 pass-table typo (wrong offsets for passes 4 and 6) would
    have violated."""
    from metrics_advisor_spark.functions.png import _ADAM7 as TBL

    count = np.zeros((h, w), dtype=np.int64)
    for x0, y0, dx, dy in TBL:
        count[y0::dy, x0::dx] += 1
    assert (count == 1).all()


# --------------------------------------------------------------- JPEG

@PROP
@given(size=st.integers(1, 15), seed=st.integers(0, 2**16))
def test_jpeg_extend_inverts_magnitude_encoding(size, seed):
    """T.81 F.1.2.1 table: a coefficient x with |x| in
    [2^(s-1), 2^s - 1] is sent as s magnitude bits — x itself when
    positive, x + 2^s - 1 when negative; EXTEND must invert this for
    every representable value."""
    from metrics_advisor_spark.functions.jpeg import _extend

    rng = np.random.default_rng(seed)
    lo, hi = 1 << (size - 1), (1 << size) - 1
    for _ in range(8):
        mag = int(rng.integers(lo, hi + 1))
        x = mag if rng.integers(2) else -mag
        bits = x if x > 0 else x + (1 << size) - 1
        assert _extend(bits, size) == x
    assert _extend(0, 0) == 0


# ---------------------------------------------------------------- BPE

_sym = st.text(alphabet="abcd", min_size=1, max_size=3)


@PROP
@given(
    cands=st.lists(
        st.tuples(_sym, _sym, st.integers(1, 100)),
        min_size=1, max_size=20,
    ),
    budget=st.integers(1, 8),
)
def test_bpe_admit_batch_invariants(cands, budget):
    from metrics_advisor_spark.functions.bpe import _admit_batch

    rows = [
        {"left": left, "right": right, "pair_count": c}
        for left, right, c in cands
    ]
    got = _admit_batch(rows, budget)
    assert len(got) <= budget
    # admission preserves candidate order
    order = [(r["left"], r["right"], r["pair_count"]) for r in rows]
    idxs = [order.index(g) for g in got]
    assert idxs == sorted(idxs)

    def interacts(p, q):
        ps, qs = {p[0], p[1]}, {q[0], q[1]}
        return bool(
            ps & qs
            or (p[0] + p[1]) in qs
            or (q[0] + q[1]) in ps
        )

    # pairwise non-interacting
    for i in range(len(got)):
        for j in range(i + 1, len(got)):
            assert not interacts(got[i], got[j]), (got[i], got[j])
    # every rejected candidate (while budget remained) conflicts with
    # an EARLIER admitted pair
    admitted: list = []
    for cand in order:
        if cand in got[len(admitted):len(admitted) + 1]:
            admitted.append(cand)
            continue
        if len(admitted) >= budget or cand in got:
            continue
        assert any(interacts(cand, a) for a in admitted), cand
