"""H.264 Annex-B metadata: Exp-Golomb, emulation prevention, SPS
dimension rule, NAL walk (functions/h264meta.py) — pure-Python."""

import pytest

from ctgov_ai_etl_spark.functions.h264meta import (
    NAL_IDR,
    NAL_NON_IDR,
    NAL_PPS,
    NAL_SPS,
    BitReader,
    BitWriter,
    H264Error,
    build_annexb,
    build_sps,
    ebsp_to_rbsp,
    parse_annexb,
    parse_sps,
    rbsp_to_ebsp,
)


@pytest.mark.parametrize("v", [0, 1, 2, 3, 7, 8, 255, 65535])
def test_exp_golomb_ue_roundtrip(v):
    w = BitWriter()
    w.ue(v)
    assert BitReader(w.rbsp_trailing()).ue() == v


@pytest.mark.parametrize("v", [0, 1, -1, 2, -2, 17, -17, 1000, -1000])
def test_exp_golomb_se_roundtrip(v):
    w = BitWriter()
    w.se(v)
    assert BitReader(w.rbsp_trailing()).se() == v


def test_ue_known_encodings():
    # ue(0)='1', ue(1)='010', ue(2)='011' (spec §9.1 table)
    w = BitWriter()
    w.ue(0); w.ue(1); w.ue(2)  # noqa: E702
    # bits: 1 010 011 + stop 1 -> 10100111 = 0xA7
    assert w.rbsp_trailing() == bytes([0xA7])


def test_emulation_prevention_roundtrip():
    rbsp = b"\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00\x00"
    ebsp = rbsp_to_ebsp(rbsp)
    assert b"\x00\x00\x01" not in ebsp
    assert b"\x00\x00\x02" not in ebsp
    assert ebsp_to_rbsp(ebsp) == rbsp


def test_sps_dimensions_no_crop():
    sps = build_sps(width_mbs=8, height_mbs=6, level_idc=30)
    m = parse_sps(sps)
    assert (m["width"], m["height"]) == (128, 96)
    assert m["profile_idc"] == 66
    assert m["level_idc"] == 30


def test_sps_dimensions_with_crop():
    # 4:2:0 frame-coded: each crop unit is 2 luma samples
    sps = build_sps(8, 6, 31, crop_right=3, crop_bottom=1)
    m = parse_sps(sps)
    assert (m["width"], m["height"]) == (128 - 6, 96 - 2)


def test_annexb_walk_counts_and_offsets():
    sps = build_sps(4, 4, 20)
    stream = build_annexb(
        [
            (NAL_SPS, sps),
            (NAL_PPS, b"\xc8\x42"),
            (NAL_IDR, b"\x11" * 9),
            (NAL_NON_IDR, b"\x22" * 5),
            (NAL_IDR, b"\x33" * 9),
        ]
    )
    recs = parse_annexb(stream)
    assert [r["nal_type"] for r in recs] == [7, 8, 5, 1, 5]
    # SPS fields merged into the first SPS record only
    assert recs[0]["width"] == 64 and recs[0]["height"] == 64
    assert "width" not in recs[1]
    # offsets: each start code is 4 bytes; sizes = header + payload
    assert recs[0]["offset"] == 4
    assert recs[0]["size"] == 1 + len(sps)
    assert recs[1]["offset"] == recs[0]["offset"] + recs[0]["size"] + 4


def test_three_byte_start_codes_accepted():
    raw = b"\x00\x00\x01" + bytes([(3 << 5) | NAL_PPS]) + b"\x55"
    recs = parse_annexb(raw + b"\x00\x00\x01" + bytes([0x41]) + b"\x66")
    assert [r["nal_type"] for r in recs] == [NAL_PPS, NAL_NON_IDR]
    assert recs[0]["offset"] == 3


def test_sps_survives_emulation_prevention():
    """An SPS whose RBSP contains 00 00 0x runs must round-trip
    through the 0x03 insertion/strip — width_mbs=1, height_mbs=1,
    level 0 packs leading zeros tight enough to force it."""
    for wm in range(1, 20):
        sps = build_sps(wm, 1, 0)
        m = parse_sps(sps)
        assert m["width"] == wm * 16
        assert m["height"] == 16


def test_no_start_code_rejected():
    with pytest.raises(H264Error, match="start code"):
        parse_annexb(b"\x65rubbish")


def test_forbidden_bit_rejected():
    with pytest.raises(H264Error, match="forbidden"):
        parse_annexb(b"\x00\x00\x00\x01" + b"\x87payload")


def test_empty_nal_rejected():
    with pytest.raises(H264Error, match="empty NAL"):
        parse_annexb(b"\x00\x00\x00\x01\x00\x00\x00\x01\x65x")


def test_scaling_matrix_rejected_loudly():
    w = BitWriter()
    w.u(100, 8)  # high profile
    w.u(0, 8)
    w.u(40, 8)
    w.ue(0)  # sps id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0); w.ue(0)  # bit depths  # noqa: E702
    w.u(0, 1)
    w.u(1, 1)  # seq_scaling_matrix_present_flag -> unsupported
    with pytest.raises(H264Error, match="scaling"):
        parse_sps(rbsp_to_ebsp(w.rbsp_trailing()))


# --------------------------------------------------- property tests

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100_000), min_size=1,
                max_size=40))
def test_exp_golomb_ue_sequence_roundtrip(values):
    """Any ue(v) sequence round-trips through one RBSP — bit
    alignment never drifts across values."""
    w = BitWriter()
    for v in values:
        w.ue(v)
    r = BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in values] == values


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_emulation_prevention_total_roundtrip(rbsp):
    """rbsp->ebsp->rbsp is the identity for ARBITRARY payloads, and
    the ebsp never contains a start-code or a bare 00 00 03 that the
    decoder would mis-strip."""
    ebsp = rbsp_to_ebsp(rbsp)
    assert ebsp_to_rbsp(ebsp) == rbsp
    assert b"\x00\x00\x00" not in ebsp
    assert b"\x00\x00\x01" not in ebsp
    assert b"\x00\x00\x02" not in ebsp


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=256),
    st.integers(min_value=1, max_value=256),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=7),
    st.integers(min_value=0, max_value=7),
)
def test_sps_dimension_rule_property(wm, hm, lvl, cr, cb):
    m = parse_sps(build_sps(wm, hm, lvl, crop_right=cr, crop_bottom=cb))
    assert m["width"] == wm * 16 - 2 * cr
    assert m["height"] == hm * 16 - 2 * cb
    assert m["level_idc"] == lvl
