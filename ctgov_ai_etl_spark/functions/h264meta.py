"""H.264/AVC Annex-B metadata parsing — NAL walk + SPS decode without
touching slice data, stdlib-pure.

The video half of the crawl-triage story (functions/mp3meta.py is the
audio half): a 100 TB crawl's video corpus is mostly H.264, and
curation needs dimensions / profile / level / IDR density long before
it needs pixels.  All of that lives in the Annex-B framing (start
codes + 1-byte NAL headers) and the sequence parameter set, whose
fields are Exp-Golomb bit-coded (ITU-T H.264 §7.3.2.1, §9.1):

    ue(v): leadingZeroBits = count zeros to first 1;
           value = 2^lz - 1 + read(lz)
    se(v): mapped from ue(v) by (-1)^(k+1) * ceil(k/2)

plus the emulation-prevention byte (0x03 inserted after 0x0000 so no
RBSP run of 0x000001/2/3 fakes a start code) which must be stripped
before bit-reading and re-inserted when building.  Dimension
extraction follows §7.4.2.1.1 exactly for 4:2:0 frame-coded streams:

    width  = (pic_width_in_mbs_minus1 + 1) * 16
             - 2 * (crop_left + crop_right)
    height = (pic_height_in_map_units_minus1 + 1) * 16
             - 2 * (crop_top + crop_bottom)        (frame_mbs_only=1)

Full slice decode (CABAC/CAVLC, inter prediction, deblocking) stays
behind the documented native-codec seam in functions/imagecodec.py.

Reference behavioral contract: the reference repo has no video path
(/root/reference/etl.py is a REST+LLM ETL); this extends the
beyond-reference multimodal surface of SURVEY.md §2.3.
"""

from __future__ import annotations


class H264Error(ValueError):
    """Malformed Annex-B payload (bad start code, NAL, or SPS)."""


class BitWriter:
    """MSB-first bit assembler with Exp-Golomb ue/se and RBSP
    trailing-bits closure."""

    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        if value < 0 or value >= 1 << n:
            raise H264Error(f"u({n}) value {value} out of range")
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        if value < 0:
            raise H264Error("ue(v) is unsigned")
        k = value + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def rbsp_trailing(self) -> bytes:
        """Close the RBSP: stop bit then zero-pad to a byte."""
        self._bits.append(1)
        while len(self._bits) % 8:
            self._bits.append(0)
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class BitReader:
    """MSB-first bit reader with Exp-Golomb ue/se."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte, off = divmod(self._pos, 8)
            if byte >= len(self._d):
                raise H264Error("bit read past end of RBSP")
            v = (v << 1) | ((self._d[byte] >> (7 - off)) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 31:
                raise H264Error("Exp-Golomb run too long (corrupt RBSP)")
        return (1 << lz) - 1 + self.u(lz)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 0x03 after any 0x0000 followed by
    a byte <= 0x03 (§7.4.1.1) so no start-code pattern appears."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 -> 00 00."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def build_sps(
    width_mbs: int,
    height_mbs: int,
    level_idc: int,
    crop_right: int = 0,
    crop_bottom: int = 0,
) -> bytes:
    """Baseline-profile (66) SPS RBSP for a 4:2:0 frame-coded stream,
    emulation-prevention applied.  Crop units are 2 luma samples
    (§7.4.2.1.1 with chroma_format_idc=1, frame_mbs_only=1)."""
    w = BitWriter()
    w.u(66, 8)  # profile_idc: baseline
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)  # pic_width_in_mbs_minus1
    w.ue(height_mbs - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    cropping = 1 if (crop_right or crop_bottom) else 0
    w.u(cropping, 1)
    if cropping:
        w.ue(0)  # frame_crop_left_offset
        w.ue(crop_right)
        w.ue(0)  # frame_crop_top_offset
        w.ue(crop_bottom)
    w.u(0, 1)  # vui_parameters_present_flag
    return rbsp_to_ebsp(w.rbsp_trailing())


def parse_sps(ebsp: bytes) -> dict:
    """Decode an SPS RBSP (after the NAL header byte) to exact
    integers: profile_idc, level_idc, width, height.  High-profile
    chroma/bit-depth trees are parsed when flagged; scaling matrices
    are rejected loudly (they carry no metadata this extractor
    reports and a silent skip would desync every later field)."""
    r = BitReader(ebsp_to_rbsp(ebsp))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    r.ue()  # sps id
    chroma = 1
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
                   134, 135):
        chroma = r.ue()
        if chroma == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):
            raise H264Error("scaling matrices unsupported in SPS parse")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    cl = cr = ct = cb = 0
    if r.u(1):  # frame_cropping_flag
        cl, cr, ct, cb = r.ue(), r.ue(), r.ue(), r.ue()
    if chroma != 1:
        raise H264Error(
            f"dimension rule implemented for 4:2:0 only, got "
            f"chroma_format_idc={chroma}"
        )
    crop_x = 2  # CropUnitX for 4:2:0
    crop_y = 2 * (2 - frame_mbs_only)
    return {
        "profile_idc": profile,
        "level_idc": level,
        "width": w_mbs * 16 - crop_x * (cl + cr),
        "height": (2 - frame_mbs_only) * h_units * 16 - crop_y * (ct + cb),
    }


# NAL unit types this walker distinguishes (§7.4.1, Table 7-1).
NAL_NON_IDR = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8


def build_annexb(nals: list[tuple[int, bytes]]) -> bytes:
    """Annex-B byte stream: each (nal_type, ebsp_payload) gets a
    4-byte start code and a NAL header with nal_ref_idc=3 for
    SPS/PPS/IDR, 2 otherwise."""
    out = bytearray()
    for ntype, payload in nals:
        if not 1 <= ntype <= 23:
            raise H264Error(f"nal_unit_type {ntype} out of range")
        ref_idc = 3 if ntype in (NAL_SPS, NAL_PPS, NAL_IDR) else 2
        out += b"\x00\x00\x00\x01"
        out.append((ref_idc << 5) | ntype)
        out += payload
    return bytes(out)


def parse_annexb(data: bytes) -> list[dict]:
    """Start-code walk: returns per NAL ``{offset, nal_type, size}``
    (size = header + payload, start code excluded) and, merged into
    the FIRST SPS entry, the parsed SPS fields.  Both 3- and 4-byte
    start codes are accepted; a forbidden_zero_bit or an empty NAL
    fails loudly."""
    out: list[dict] = []
    n = len(data)
    i = 0
    # locate first start code; leading garbage is a structural error
    if data[:4] == b"\x00\x00\x00\x01":
        i = 4
    elif data[:3] == b"\x00\x00\x01":
        i = 3
    else:
        raise H264Error("payload does not begin with an Annex-B start code")
    while i < n:
        start = i
        # find next start code (3-byte form covers the 4-byte one too)
        j = data.find(b"\x00\x00\x01", i)
        end = n if j < 0 else (j - 1 if j > 0 and data[j - 1] == 0 else j)
        nxt = n if j < 0 else j + 3
        if end <= start:
            raise H264Error(f"empty NAL unit at byte {start}")
        hdr = data[start]
        if hdr & 0x80:
            raise H264Error(f"forbidden_zero_bit set at byte {start}")
        ntype = hdr & 0x1F
        rec = {
            "offset": start,
            "nal_type": ntype,
            "size": end - start,
        }
        if ntype == NAL_SPS and not any(
            r["nal_type"] == NAL_SPS for r in out
        ):
            rec.update(parse_sps(data[start + 1 : end]))
        out.append(rec)
        i = nxt
    if not out:
        raise H264Error("no NAL units found")
    return out
