"""H.264/AVC codec-configuration parsing — the avcC record and the
SPS (sequence parameter set) bitstream, per ITU-T H.264 §7.3.2.1.1
and ISO/IEC 14496-15 §5.2.4 (both public specs).

Container-level triage (`_parse_mp4_meta`) reads only box structure;
but the dims a *decoder* will produce, the profile, and the level —
what a transcode pipeline actually keys its routing on — live inside
the avcC box's SPS NAL unit as exp-Golomb-coded fields.  This module
parses exactly that: no slice/frame decoding (the documented
deployment swap), just the DecoderConfigurationRecord and the SPS,
the same scope as `ffprobe -show_streams` codec metadata.

Implemented:
  - RBSP extraction (emulation-prevention 0x000003 removal, §7.4.1)
  - unsigned/signed exp-Golomb (ue/se, §9.1) bit reader + writer
  - seq_parameter_set parse: profile_idc / constraint flags /
    level_idc, the high-profile chroma/bit-depth/scaling-list
    branch, pic-order-cnt types 0/1/2, and the frame-cropping
    arithmetic (CropUnitX/Y per chroma format) that turns macroblock
    counts into display dims — the 1920x1088→1080 case every real
    stream exercises
  - avcC record parse (configurationVersion, NAL length size,
    SPS/PPS arrays) and a fixture-side encoder (real SPS/PPS
    bitstreams, emulation prevention applied on write)

Validation: encode→parse roundtrip across the dim/profile grid,
hand-computed classics (1920x1080 = 120x68 MBs + bottom crop 4), and
rejection tests (wrong NAL type, truncated stream, bad version).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# RBSP + exp-Golomb
# ---------------------------------------------------------------------------


def _ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes: 0x00 0x00 0x03 → 0x00 0x00
    (§7.4.1: the 0x03 exists so RBSP never contains a start code)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes on write."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("H.264: SPS bitstream truncated")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Unsigned exp-Golomb (§9.1): count leading zeros z, then
        value = 2^z - 1 + read(z)."""
        z = 0
        while self.u(1) == 0:
            z += 1
            if z > 31:
                raise ValueError("H.264: malformed exp-Golomb code")
        return (1 << z) - 1 + (self.u(z) if z else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        """rbsp_stop_one_bit + zero-pad to a byte boundary (§7.3.2.11
        rbsp_trailing_bits)."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# profiles whose SPS carries the chroma/bit-depth/scaling branch
# (§7.3.2.1.1 condition on profile_idc)
_HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)

# (SubWidthC, SubHeightC) per chroma_format_idc (table 6-1);
# chroma_format_idc 0 = monochrome, 3 = 4:4:4
_SUB_WH = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}


def parse_sps(nal: bytes) -> dict:
    """Parse a seq_parameter_set NAL unit (header byte included) into
    {profile_idc, level_idc, width, height, frame_mbs_only}.  Width/
    height apply the frame-cropping arithmetic (§7.4.2.1.1 equations
    7-13..7-16): crop offsets are in CropUnit multiples, which depend
    on the chroma format and field/frame coding."""
    if not nal:
        raise ValueError("H.264: empty SPS NAL")
    hdr = nal[0]
    if hdr & 0x80:
        raise ValueError("H.264: forbidden_zero_bit set in SPS NAL")
    if hdr & 0x1F != 7:
        raise ValueError(
            f"H.264: NAL unit type {hdr & 0x1F} is not an SPS (7)"
        )
    r = _BitReader(_ebsp_to_rbsp(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved_zero_2bits
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    # scaling_list() §7.3.2.1.1.1 — skip the deltas
                    size = 16 if i < 6 else 64
                    next_scale, last_scale = 8, 8
                    for _ in range(size):
                        if next_scale != 0:
                            next_scale = (last_scale + r.se() + 256) % 256
                        last_scale = (
                            last_scale if next_scale == 0 else next_scale
                        )
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    elif poc_type > 2:
        raise ValueError(f"H.264: invalid pic_order_cnt_type {poc_type}")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = pic_width_in_mbs * 16
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16
    if r.u(1):  # frame_cropping_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        if separate_colour_plane or chroma_format_idc == 0:
            cw, ch = 1, 2 - frame_mbs_only
        else:
            sw, sh = _SUB_WH[chroma_format_idc]
            cw, ch = sw, sh * (2 - frame_mbs_only)
        width -= (left + right) * cw
        height -= (top + bottom) * ch
    if width <= 0 or height <= 0:
        raise ValueError(
            f"H.264: cropping leaves degenerate dims {width}x{height}"
        )
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": frame_mbs_only,
    }


def encode_sps(
    width: int, height: int, *, profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """A genuine Baseline/Main-style SPS NAL for the given display
    dims: macroblock counts are rounded up to 16 and the remainder
    expressed as right/bottom frame cropping — exactly how real
    encoders code 1920x1080 (120x68 MBs, bottom crop 4).  Only
    non-high profiles (no chroma branch) are emitted; parse_sps
    handles both."""
    if profile_idc in _HIGH_PROFILES:
        raise ValueError(
            "fixture encoder emits non-high profiles only "
            "(the parser handles high-profile streams)"
        )
    w_mbs = (width + 15) // 16
    h_units = (height + 15) // 16
    crop_r = (w_mbs * 16 - width)
    crop_b = (h_units * 16 - height)
    if crop_r % 2 or crop_b % 2:
        raise ValueError(
            "4:2:0 cropping moves in 2-pixel units; dims must be even"
        )
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)   # constraint flags
    w.u(level_idc, 8)
    w.ue(0)     # seq_parameter_set_id
    w.ue(0)     # log2_max_frame_num_minus4
    w.ue(2)     # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)     # max_num_ref_frames
    w.u(0, 1)   # gaps_in_frame_num_value_allowed_flag
    w.ue(w_mbs - 1)
    w.ue(h_units - 1)
    w.u(1, 1)   # frame_mbs_only_flag
    w.u(1, 1)   # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)               # left
        w.ue(crop_r // 2)     # right (CropUnitX = 2 at 4:2:0)
        w.ue(0)               # top
        w.ue(crop_b // 2)     # bottom (CropUnitY = 2, frame coding)
    else:
        w.u(0, 1)
    w.u(0, 1)   # vui_parameters_present_flag
    return bytes([0x67]) + _rbsp_to_ebsp(w.rbsp())


def encode_pps() -> bytes:
    """A minimal genuine pic_parameter_set NAL (§7.3.2.2): ids 0/0,
    CAVLC, one slice group, no weighted prediction, zero QP offsets."""
    w = _BitWriter()
    w.ue(0)     # pic_parameter_set_id
    w.ue(0)     # seq_parameter_set_id
    w.u(0, 1)   # entropy_coding_mode_flag (CAVLC)
    w.u(0, 1)   # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)     # num_slice_groups_minus1
    w.ue(0)     # num_ref_idx_l0_default_active_minus1
    w.ue(0)     # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)   # weighted_pred_flag
    w.u(0, 2)   # weighted_bipred_idc
    w.se(0)     # pic_init_qp_minus26
    w.se(0)     # pic_init_qs_minus26
    w.se(0)     # chroma_qp_index_offset
    w.u(1, 1)   # deblocking_filter_control_present_flag
    w.u(0, 1)   # constrained_intra_pred_flag
    w.u(0, 1)   # redundant_pic_cnt_present_flag
    return bytes([0x68]) + _rbsp_to_ebsp(w.rbsp())


# ---------------------------------------------------------------------------
# AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.2.4.1)
# ---------------------------------------------------------------------------


def parse_avcc(avcc: bytes) -> dict:
    """Parse the avcC box body: configuration version, profile/level
    bytes, NAL length size, and the SPS/PPS arrays; the first SPS is
    fully parsed (dims/profile/level from the bitstream, not the
    record's copy — the record's bytes CAN disagree with the SPS, and
    the SPS is what the decoder obeys)."""
    if len(avcc) < 7:
        raise ValueError("H.264: avcC record truncated")
    if avcc[0] != 1:
        raise ValueError(
            f"H.264: avcC configurationVersion {avcc[0]} != 1"
        )
    nal_length_size = (avcc[4] & 0x03) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        if pos + 2 > len(avcc):
            raise ValueError("H.264: avcC SPS array truncated")
        (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
        pos += 2
        if pos + ln > len(avcc):
            raise ValueError("H.264: avcC SPS bytes truncated")
        sps_list.append(avcc[pos:pos + ln])
        pos += ln
    if pos >= len(avcc):
        raise ValueError("H.264: avcC PPS count missing")
    n_pps = avcc[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        if pos + 2 > len(avcc):
            raise ValueError("H.264: avcC PPS array truncated")
        (ln,) = struct.unpack(">H", avcc[pos:pos + 2])
        pos += 2
        if pos + ln > len(avcc):
            raise ValueError("H.264: avcC PPS bytes truncated")
        pps_list.append(avcc[pos:pos + ln])
        pos += ln
    if not sps_list:
        raise ValueError("H.264: avcC carries no SPS")
    sps = parse_sps(sps_list[0])
    return {
        "nal_length_size": nal_length_size,
        "n_sps": n_sps,
        "n_pps": n_pps,
        **sps,
    }


def encode_avcc(
    width: int, height: int, *, profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """A genuine avcC record wrapping one real SPS + one real PPS
    (4-byte NAL lengths, the near-universal convention)."""
    sps = encode_sps(
        width, height, profile_idc=profile_idc, level_idc=level_idc
    )
    pps = encode_pps()
    return (
        bytes([1, profile_idc, 0, level_idc, 0xFC | 3, 0xE0 | 1])
        + struct.pack(">H", len(sps)) + sps
        + bytes([1])
        + struct.pack(">H", len(pps)) + pps
    )
