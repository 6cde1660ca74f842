"""Pure-numpy baseline JPEG (ITU-T T.81) decoder.

The engine's multimodal path decodes BMP/WAV/AVI with struct+numpy
alone; real crawl data is overwhelmingly JPEG, so this module extends
the magic-byte dispatch with a REAL baseline-sequential-DCT decoder in
the same dependency-free spirit (r09 verdict item 8 — "the next step is
a baseline-JPEG decoder, pure-numpy IDCT, wired behind the magic-byte
dispatch").

Scope (exactly baseline JPEG, the format ~95% of real-world JPEGs use):
- SOI/APPn/COM/DQT/DHT/SOF0/SOS/DRI/RSTn/EOI marker structure
- 8-bit sample precision, 1 (grayscale) or 3 (YCbCr) components
- arbitrary H/V sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0)
- canonical Huffman entropy decode with byte stuffing + restart
  intervals
- dequantize -> de-zigzag -> 8x8 IDCT-II (one einsum over all blocks
  of a component — the orthonormal DCT basis C: block = C^T X C)
- chroma upsampling by PIXEL REPLICATION (documented: libjpeg's
  "fancy" triangular filter is a decoder choice, not part of T.81;
  tests compare against an independent codec with the tolerance the
  spec's compliance annex uses)
- integer YCbCr -> RGB (BT.601 as specified in JFIF)

Progressive (SOF2), arithmetic coding, 12-bit precision and hierarchical
modes raise with a clear message — they are deployment codec swaps, the
same boundary the AVI path draws at compressed video.

Scale: the marker parse + IDCT are vectorized numpy; the entropy decode
is inherently bit-serial per scan (true of every JPEG implementation —
libjpeg is serial here too) and runs per payload inside the existing
mapInPandas batches, so corpus-level parallelism is Spark's, not the
codec's.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8x8 DCT-II basis: C[k, n] = s(k) cos((2n+1) k pi / 16)
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


class _Huff:
    """Canonical Huffman table: (code-length run counts, symbols) from
    a DHT segment -> a flat (maxlen) lookup keyed by (length, code)."""

    def __init__(self, counts, symbols):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops (raises _Marker) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("JPEG: entropy segment ran past EOF")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _Restart(nxt - 0xD0)
            else:
                raise _Marker()
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return out

    def huffman(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code in scan")

    def byte_align(self):
        self.nbits = 0
        self.bits = 0

    def skip_restart_marker(self):
        # called between restart intervals: consume the RSTn marker
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _Marker(Exception):
    pass


class _Restart(Exception):
    def __init__(self, n):
        self.n = n


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude to its signed
    coefficient value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def jpeg_meta(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF0 header — the cheap
    metadata parse `extract_media_meta` uses (no entropy decode)."""
    hdr = _parse_segments(payload, stop_at_sos=True)
    return hdr["w"], hdr["h"], len(hdr["components"])


def _parse_segments(payload: bytes, stop_at_sos: bool = False) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    out: dict = {"qt": qt, "huff": huff, "restart_interval": 0}
    while pos < len(payload):
        if pos + 2 > len(payload):
            raise ValueError("JPEG: truncated stream (marker cut off)")
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        if pos + 2 > len(payload):
            raise ValueError("JPEG: truncated stream (length cut off)")
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        if pos + seg_len > len(payload):
            raise ValueError(
                "JPEG: truncated stream (segment declares "
                f"{seg_len} bytes past EOF)"
            )
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError(
                    f"JPEG: only 8-bit precision supported, got {precision}"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            out.update(w=w, h=h, components=comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG: only baseline sequential DCT (SOF0/SOF1) is "
                f"supported; marker SOF{marker - 0xC0} (progressive/"
                "arithmetic/hierarchical) is a deployment codec swap"
            )
        elif marker == 0xDD:  # DRI
            (out["restart_interval"],) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ncomp_s = seg[0]
            scan = []
            for i in range(ncomp_s):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append({"id": cs, "dc": tdta >> 4, "ac": tdta & 0xF})
            out["scan"] = scan
            out["scan_pos"] = pos + seg_len
            return out  # entropy data follows; caller decodes
        # APPn / COM / anything else: skip
        pos += seg_len
    if stop_at_sos and "w" in out:
        return out
    if "scan" not in out:
        raise ValueError("JPEG: no SOS segment found")
    return out


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array
    (grayscale replicates into 3 channels — the raster contract the
    BMP path's consumers already use)."""
    hdr = _parse_segments(payload)
    w, h, comps, scan = hdr["w"], hdr["h"], hdr["components"], hdr["scan"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("JPEG: sampling factors above 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scan:
        sc.update(by_id[sc["id"]])
    # coefficient store: per component, (blocks_y, blocks_x, 64)
    coef = {
        sc["id"]: np.zeros(
            (mcuy * sc["v"], mcux * sc["h"], 64), dtype=np.int32
        )
        for sc in scan
    }
    reader = _BitReader(payload, hdr["scan_pos"])
    pred = {sc["id"]: 0 for sc in scan}
    ri = hdr["restart_interval"]
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_index and mcu_index % ri == 0:
                reader.byte_align()
                reader.skip_restart_marker()
                for k in pred:
                    pred[k] = 0
            mcu_index += 1
            for sc in scan:
                dc_t = hdr["huff"][(0, sc["dc"])]
                ac_t = hdr["huff"][(1, sc["ac"])]
                for by in range(sc["v"]):
                    for bx in range(sc["h"]):
                        blk = np.zeros(64, dtype=np.int32)
                        try:
                            size = reader.huffman(dc_t)
                            diff = _extend(reader.read(size), size)
                            pred[sc["id"]] += diff
                            blk[0] = pred[sc["id"]]
                            k = 1
                            while k < 64:
                                sym = reader.huffman(ac_t)
                                if sym == 0x00:  # EOB
                                    break
                                run, size = sym >> 4, sym & 0xF
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += run
                                if k > 63:
                                    raise ValueError(
                                        "JPEG: AC run past block end"
                                    )
                                blk[k] = _extend(reader.read(size), size)
                                k += 1
                        except _Restart:
                            raise ValueError(
                                "JPEG: unexpected restart marker "
                                "mid-block"
                            ) from None
                        coef[sc["id"]][
                            my * sc["v"] + by, mx * sc["h"] + bx
                        ] = blk
    # dequantize -> de-zigzag -> IDCT, one einsum per component
    planes = {}
    for sc in scan:
        q = hdr["qt"][sc["tq"]]
        c = coef[sc["id"]]
        deq = (c * q[None, None, :]).astype(np.float64)
        blocks = np.zeros((c.shape[0], c.shape[1], 8, 8))
        blocks.reshape(c.shape[0], c.shape[1], 64)[
            :, :, ZIGZAG
        ] = deq
        spat = np.einsum("ki,yxkl,lj->yxij", _C, blocks, _C)
        # blocks -> plane
        plane = (
            spat.transpose(0, 2, 1, 3)
            .reshape(c.shape[0] * 8, c.shape[1] * 8)
        )
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # upsample by replication to full MCU-padded resolution
        plane = np.repeat(
            np.repeat(plane, vmax // sc["v"], axis=0),
            hmax // sc["h"],
            axis=1,
        )
        planes[sc["id"]] = plane[:h, :w]
    if len(scan) == 1:
        g = planes[scan[0]["id"]].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = (planes[sc["id"]] for sc in scan)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
