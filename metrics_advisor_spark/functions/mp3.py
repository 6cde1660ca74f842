"""MPEG-1 Layer III (MP3) stream triage — ID3v2 tag walk + per-frame
header validation, per the public MPEG-1 audio spec (ISO/IEC 11172-3)
and the ID3v2.3 informal standard.

The audio counterpart of the MP4/H.264 container work: real crawl
audio is MP3-heavy, and the triage a pipeline runs before deciding
what to transcode is exactly this — skip the ID3v2 tag, validate the
sync pattern, read version/layer/bitrate/samplerate from the first
frame header, then WALK every frame boundary (frame length is a
closed-form function of the header) counting frames to a duration.
No MDCT/huffman audio decode (same documented deployment swap as
H.264 frame decode); frame PAYLOADS are opaque — but every header
byte is parsed per spec and inconsistent streams raise.

Scope: MPEG-1 Layer III CBR (the dominant real-world layout).
Free-format (bitrate index 0), reserved indices, mid-stream header
changes, and MPEG-2/2.5 raise with clear messages — per the codec
family's rule, payloads are parsed per spec, never guessed around.

Frame arithmetic (ISO 11172-3 §2.4.3.1): frame_bytes =
144000·kbps // sample_rate + padding_bit; 1152 samples per frame.
"""

from __future__ import annotations

import struct

# bitrate-index table, MPEG-1 Layer III (kbps); 0 = free format
# (unsupported here), 15 = forbidden
_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320, None,
)
_SAMPLE_RATES = (44100, 48000, 32000, None)
_SAMPLES_PER_FRAME = 1152


def _id3v2_size(payload: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 if absent): 10-byte
    header + syncsafe 28-bit size (ID3v2.3 §3.1), plus the 10-byte
    footer when the ID3v2.4 footer flag (0x10) is set — the size
    field counts neither header nor footer (ID3v2.4 §3.1), so
    ignoring the flag lands the frame walk on the '3DI' footer
    (ADVICE r12)."""
    if payload[:3] != b"ID3":
        return 0
    if len(payload) < 10:
        raise ValueError("MP3: truncated ID3v2 header")
    flags = payload[5]
    if flags & 0x0F:
        raise ValueError(
            f"MP3: undefined ID3v2 flag bits set (0x{flags:02x})"
        )
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("MP3: ID3v2 size bytes are not syncsafe")
    size = (
        (payload[6] << 21) | (payload[7] << 14)
        | (payload[8] << 7) | payload[9]
    )
    total = 10 + size + (10 if flags & 0x10 else 0)
    if total > len(payload):
        raise ValueError("MP3: ID3v2 tag escapes the payload")
    return total


def _frame_header(payload: bytes, pos: int) -> tuple[int, int, int]:
    """Validate the 4-byte frame header at ``pos``; returns
    (bitrate_kbps, sample_rate, frame_bytes)."""
    if pos + 4 > len(payload):
        raise ValueError("MP3: truncated frame header")
    b0, b1, b2, _ = payload[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(
            f"MP3: lost frame sync at byte {pos} "
            f"(0x{b0:02x}{b1:02x})"
        )
    version = (b1 >> 3) & 0x03
    layer = (b1 >> 1) & 0x03
    if version != 3:
        raise ValueError(
            "MP3: only MPEG-1 is supported "
            f"(version bits {version:02b}; MPEG-2/2.5 out of scope)"
        )
    if layer != 1:
        raise ValueError(
            f"MP3: only Layer III is supported (layer bits {layer:02b})"
        )
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    padding = (b2 >> 1) & 0x01
    kbps = _BITRATES[br_idx]
    if kbps is None:
        raise ValueError(
            f"MP3: bitrate index {br_idx} is "
            f"{'free-format (unsupported)' if br_idx == 0 else 'forbidden'}"
        )
    sr = _SAMPLE_RATES[sr_idx]
    if sr is None:
        raise ValueError("MP3: reserved sample-rate index 3")
    frame_bytes = 144000 * kbps // sr + padding
    return kbps, sr, frame_bytes


def mp3_meta(payload: bytes) -> tuple[int, int, int, int, bool]:
    """(sample_rate, bitrate_kbps, n_frames, duration_ms, has_id3)
    from a full frame-boundary walk: every frame's header is
    validated against the first (CBR — a header that changes
    bitrate/samplerate mid-stream raises), the walk must land exactly
    on end-of-payload, and duration is n_frames·1152/rate."""
    tag = _id3v2_size(payload)
    pos = tag
    if pos >= len(payload):
        raise ValueError("MP3: no audio frames after the ID3v2 tag")
    kbps, sr, _ = _frame_header(payload, pos)
    n_frames = 0
    while pos < len(payload):
        k2, s2, fb = _frame_header(payload, pos)
        if (k2, s2) != (kbps, sr):
            raise ValueError(
                f"MP3: header changes mid-stream at byte {pos} "
                f"({kbps}kbps/{sr}Hz → {k2}kbps/{s2}Hz); "
                f"VBR is out of scope"
            )
        if pos + fb > len(payload):
            raise ValueError(
                f"MP3: final frame truncated at byte {pos} "
                f"({len(payload) - pos} of {fb} bytes)"
            )
        pos += fb
        n_frames += 1
    duration_ms = n_frames * _SAMPLES_PER_FRAME * 1000 // sr
    return sr, kbps, n_frames, duration_ms, tag > 0


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------

_SR_INDEX = {44100: 0, 48000: 1, 32000: 2}
_BR_INDEX = {v: i for i, v in enumerate(_BITRATES) if v}


def encode_mp3(
    n_frames: int, *, kbps: int = 128, sample_rate: int = 44100,
    id3_body: bytes = b"", seed: int = 0,
) -> bytes:
    """A genuine CBR MPEG-1 Layer III frame sequence: real ID3v2.3
    tag (when ``id3_body`` is non-empty), real 4-byte headers, opaque
    deterministic payload bytes (audio decode is the documented
    deployment swap, exactly like the MP4 fixture's mdat)."""
    if kbps not in _BR_INDEX:
        raise ValueError(f"unsupported bitrate {kbps}")
    if sample_rate not in _SR_INDEX:
        raise ValueError(f"unsupported sample rate {sample_rate}")
    out = bytearray()
    if id3_body:
        size = len(id3_body)
        out += b"ID3" + bytes([3, 0, 0]) + bytes([
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F,
        ]) + id3_body
    hdr = struct.pack(
        ">BBBB",
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,   # MPEG-1, Layer III, no CRC
        (_BR_INDEX[kbps] << 4) | (_SR_INDEX[sample_rate] << 2),
        0x00,                              # stereo, no flags
    )
    frame_bytes = 144000 * kbps // sample_rate  # padding bit 0
    body_len = frame_bytes - 4
    import numpy as np

    base = np.arange(body_len, dtype=np.int64)
    for f in range(n_frames):
        out += hdr
        out += ((seed * 7 + f * 13 + base) % 256).astype(
            np.uint8
        ).tobytes()
    return bytes(out)
