"""H.264 SPS / avcC parsing (`functions/h264.py`): encode→parse
roundtrips across the dim/profile grid, the hand-computed 1920x1080
cropping classic, emulation-prevention round-trip, and the rejection
matrix."""

from __future__ import annotations

import pytest

from metrics_advisor_spark.functions.h264 import (
    _BitReader,
    _BitWriter,
    _ebsp_to_rbsp,
    _rbsp_to_ebsp,
    encode_avcc,
    encode_pps,
    encode_sps,
    parse_avcc,
    parse_sps,
)


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    vals_ue = [0, 1, 2, 3, 7, 8, 254, 255, 1023]
    vals_se = [0, 1, -1, 2, -2, 17, -31]
    for v in vals_ue:
        w.ue(v)
    for v in vals_se:
        w.se(v)
    r = _BitReader(w.rbsp())
    assert [r.ue() for _ in vals_ue] == vals_ue
    assert [r.se() for _ in vals_se] == vals_se


def test_emulation_prevention_roundtrip():
    # sequences containing 00 00 0x for x<=3 must gain a 03 byte and
    # strip back losslessly
    for raw in (
        b"\x00\x00\x00\x00\x01\x02",
        b"\x00\x00\x01",
        b"\x00\x00\x02\x00\x00\x03",
        b"\xff\x00\x00\x00\xff",
        bytes(range(256)),
    ):
        ebsp = _rbsp_to_ebsp(raw)
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert _ebsp_to_rbsp(ebsp) == raw


@pytest.mark.parametrize("w,h", [
    (16, 16), (32, 48), (176, 144), (640, 480),
    (1920, 1080),          # bottom crop 4: 120x68 MBs → 1088-8
    (1280, 720), (854, 480), (3840, 2160), (142, 90),
])
def test_sps_roundtrip_dims(w, h):
    sps = encode_sps(w, h)
    out = parse_sps(sps)
    assert (out["width"], out["height"]) == (w, h)
    assert out["profile_idc"] == 66
    assert out["level_idc"] == 30
    assert out["frame_mbs_only"] == 1


def test_sps_1920x1080_is_the_classic_crop():
    # the canonical check: 1080 is not a multiple of 16, so the SPS
    # codes 68 map units (1088 px) and crops 8 px = 4 CropUnitY
    sps = encode_sps(1920, 1080)
    r_profile = parse_sps(sps)
    assert r_profile["height"] == 1080
    # and WITHOUT the cropping branch the height would be 1088:
    no_crop = encode_sps(1920, 1088)
    assert parse_sps(no_crop)["height"] == 1088


@pytest.mark.parametrize("profile,level", [
    (66, 10), (66, 51), (77, 30), (88, 40),
])
def test_sps_profile_level(profile, level):
    out = parse_sps(encode_sps(320, 240, profile_idc=profile,
                               level_idc=level))
    assert out["profile_idc"] == profile
    assert out["level_idc"] == level


def test_high_profile_chroma_branch():
    # hand-build a High (100) SPS: the parser must consume
    # chroma_format_idc/bit depths/scaling flag before the MB counts
    w = _BitWriter()
    w.u(100, 8)          # profile_idc High
    w.u(0, 8)
    w.u(41, 8)           # level 4.1
    w.ue(0)              # sps id
    w.ue(1)              # chroma_format_idc 4:2:0
    w.ue(0)              # bit_depth_luma_minus8
    w.ue(0)              # bit_depth_chroma_minus8
    w.u(0, 1)            # qpprime
    w.u(0, 1)            # no scaling matrix
    w.ue(0)              # log2_max_frame_num_minus4
    w.ue(2)              # poc type 2
    w.ue(1)              # max refs
    w.u(0, 1)
    w.ue(79)             # 80 MBs = 1280
    w.ue(44)             # 45 units = 720
    w.u(1, 1)            # frame_mbs_only
    w.u(1, 1)            # direct_8x8
    w.u(0, 1)            # no cropping
    w.u(0, 1)            # no vui
    nal = bytes([0x67]) + _rbsp_to_ebsp(w.rbsp())
    out = parse_sps(nal)
    assert (out["width"], out["height"]) == (1280, 720)
    assert out["profile_idc"] == 100
    assert out["level_idc"] == 41


def test_avcc_roundtrip():
    rec = encode_avcc(1920, 1080, profile_idc=66, level_idc=42)
    out = parse_avcc(rec)
    assert out["nal_length_size"] == 4
    assert (out["n_sps"], out["n_pps"]) == (1, 1)
    assert (out["width"], out["height"]) == (1920, 1080)
    assert (out["profile_idc"], out["level_idc"]) == (66, 42)
    # the PPS is structurally real too (NAL type 8)
    assert encode_pps()[0] & 0x1F == 8


def test_rejections():
    with pytest.raises(ValueError, match="not an SPS"):
        parse_sps(bytes([0x68]) + b"\x00\x00")      # PPS NAL type
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        parse_sps(bytes([0xE7]) + b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_sps(encode_sps(640, 480)[:5])
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_avcc(bytes([2, 66, 0, 30, 0xFF, 0xE1, 0]))
    with pytest.raises(ValueError, match="truncated|no SPS"):
        parse_avcc(encode_avcc(640, 480)[:9])
    with pytest.raises(ValueError, match="carries no SPS"):
        parse_avcc(bytes([1, 66, 0, 30, 0xFF, 0xE0, 0]))
    with pytest.raises(ValueError, match="even"):
        encode_sps(641, 480)
