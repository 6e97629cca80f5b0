"""H.264/AVC (ISO/IEC 14496-10) — STRUCTURAL layer only (r12).

Through r11 compressed video was the one wholly-stubbed modality
("H.264-class codecs need CABAC — a genuinely larger engineering job",
SURVEY §2.10 L5). That remains true for the ENTROPY and RECONSTRUCTION
layers and they stay stubbed; this module makes the STRUCTURAL layer
real, the part that is closed-form bitstream machinery of the same
class as the MP3 entropy work in operators/codecs.py:

- **Annex-B byte-stream framing**: start-code scan (3- and 4-byte),
  emulation-prevention unescape (00 00 03 xx -> 00 00 xx) and escape on
  the encode side — real, round-trip tested including payloads that
  contain start-code patterns in their RBSP.
- **Exp-Golomb** ue(v)/se(v) — closed-form, real.
- **SPS / PPS / slice-header prefix parsing** for the
  baseline/main-profile subset (profile_idc 66/77, pic_order_cnt_type
  0/2, frame_mbs_only): width/height incl. cropping, frame-num field
  widths, entropy mode (CAVLC vs CABAC flag), slice types. Everything
  outside the subset raises ``NotImplementedError`` — a clean refusal,
  never wrong metadata.
- **In-repo encoder** (:func:`encode_h264_structural`) that emits the
  same subset the parser reads, so round-trips certify the machinery.

PROVENANCE: syntax element order follows the public spec (§7.3) from
memory and is marked UNVERIFIED against real streams — no H.264 library
or sample stream exists in this container. What the round-trip tests
certify is the FRAMING MACHINERY (start codes, escaping, Exp-Golomb,
field accounting); parsing a real camera stream additionally needs the
field order to be exactly right, which only a reference decoder could
confirm. The honest claim is therefore: structural layer real and
self-consistent, entropy/reconstruction stubbed, real-stream parity
unverified by construction of the environment.
"""

from __future__ import annotations

__all__ = [
    "h264_split_nals",
    "h264_parse_sps",
    "h264_parse_pps",
    "h264_parse_slice_prefix",
    "h264_stream_info",
    "encode_h264_structural",
]

_START3 = b"\x00\x00\x01"

#: nal_unit_type names for the types the structural layer knows about
NAL_TYPES = {
    1: "slice_non_idr",
    5: "slice_idr",
    6: "sei",
    7: "sps",
    8: "pps",
    9: "aud",
}

#: slice_type (mod 5) -> letter, §7.4.3
SLICE_TYPES = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI"}


class _ExpGolombWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []

    def u(self, value: int, width: int) -> None:
        self.bits.append(format(value, f"0{width}b"))

    def ue(self, value: int) -> None:
        # codeNum -> [M zeros] 1 [M-bit info], M = floor(log2(v+1))
        v = value + 1
        m = v.bit_length() - 1
        self.bits.append("0" * m + format(v, "b"))

    def se(self, value: int) -> None:
        # §9.1.1: k>0 -> 2k-1, k<=0 -> -2k
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def rbsp(self) -> bytes:
        # rbsp_stop_one_bit + alignment zeros
        s = "".join(self.bits) + "1"
        s += "0" * (-len(s) % 8)
        return int(s, 2).to_bytes(len(s) // 8, "big")


class _ExpGolombReader:
    def __init__(self, data: bytes) -> None:
        self.bits = "".join(format(b, "08b") for b in data)
        self.pos = 0

    def u(self, width: int) -> int:
        if self.pos + width > len(self.bits):
            raise ValueError("truncated RBSP")
        v = int(self.bits[self.pos : self.pos + width], 2) if width else 0
        self.pos += width
        return v

    def ue(self) -> int:
        m = 0
        while True:
            if self.pos >= len(self.bits):
                raise ValueError("truncated RBSP")
            bit = self.bits[self.pos]
            self.pos += 1
            if bit == "1":
                break
            m += 1
            if m > 32:
                raise ValueError("Exp-Golomb prefix too long")
        info = self.u(m)
        return (1 << m) - 1 + info

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    00/01/02/03 gets a 03 interposed (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape_rbsp(data: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in data:
        # §7.4.1: after two zeros a 0x03 is ALWAYS the emulation-
        # prevention byte (a conformant encoder only emits it before
        # 00/01/02/03, so no lookahead is needed — and a trailing
        # 00 00 03 at NAL end, e.g. escaped cabac_zero_words, must
        # drop the 03 too)
        if zeros >= 2 and b == 3:
            zeros = 0
        else:
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def h264_split_nals(payload: bytes) -> list[dict]:
    """Annex-B scan: returns ``[{"ref_idc", "type", "rbsp"}]`` with
    emulation-prevention bytes removed. Accepts 3- and 4-byte start
    codes; raises ``ValueError`` when the payload does not begin with
    one (not an Annex-B stream)."""
    i = payload.find(_START3)
    # any number of leading_zero_8bits before the first start code is
    # conformant (spec B.1.1); anything nonzero before it is not
    if i == -1 or any(payload[:i]):
        raise ValueError("not an Annex-B H.264 stream")
    nals = []
    while i != -1:
        start = i + 3
        nxt = payload.find(_START3, start)
        end = len(payload) if nxt == -1 else nxt
        # a 4-byte start code is 00 + the 3-byte one: trim the trailing
        # zero that belongs to the NEXT start code
        chunk = payload[start:end]
        while chunk.endswith(b"\x00"):
            chunk = chunk[:-1]
        if not chunk:
            raise ValueError("empty NAL unit")
        header = chunk[0]
        if header & 0x80:
            raise ValueError("forbidden_zero_bit set")
        nals.append(
            {
                "ref_idc": (header >> 5) & 3,
                "type": header & 0x1F,
                "rbsp": _unescape_rbsp(chunk[1:]),
            }
        )
        i = nxt
    return nals


def h264_parse_sps(rbsp: bytes) -> dict:
    """Sequence parameter set for the baseline/main subset. Raises
    ``NotImplementedError`` for high profiles (chroma_format syntax),
    pic_order_cnt_type 1, and interlace (frame_mbs_only_flag 0)."""
    r = _ExpGolombReader(rbsp)
    profile = r.u(8)
    constraints = r.u(8)
    level = r.u(8)
    sps_id = r.ue()
    if profile not in (66, 77):
        raise NotImplementedError(
            f"profile_idc {profile}: only baseline(66)/main(77) — high "
            "profiles carry chroma_format syntax outside the subset"
        )
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 2:
        log2_max_poc_lsb = 0
    else:
        raise NotImplementedError("pic_order_cnt_type 1")
    max_num_ref_frames = r.ue()
    gaps_allowed = r.u(1)
    w_mbs = r.ue() + 1
    h_map = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        raise NotImplementedError("interlace (frame_mbs_only_flag 0)")
    direct_8x8 = r.u(1)
    cropping = r.u(1)
    crop = (0, 0, 0, 0)
    if cropping:
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    vui = r.u(1)
    if vui:
        raise NotImplementedError("VUI parameters")
    # 4:2:0 frame_mbs_only crop units: x2 horizontally, x2 vertically
    width = w_mbs * 16 - 2 * (crop[0] + crop[1])
    height = h_map * 16 - 2 * (crop[2] + crop[3])
    return {
        "profile_idc": profile,
        "constraint_flags": constraints,
        "level_idc": level,
        "sps_id": sps_id,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "max_num_ref_frames": max_num_ref_frames,
        "gaps_allowed": gaps_allowed,
        "width_mbs": w_mbs,
        "height_mbs": h_map,
        "direct_8x8": direct_8x8,
        "crop": crop,
        "width": width,
        "height": height,
    }


def h264_parse_pps(rbsp: bytes) -> dict:
    """Picture parameter set prefix: ids + entropy mode (the CAVLC/CABAC
    flag — the boundary of what this layer implements)."""
    r = _ExpGolombReader(rbsp)
    return {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode": r.u(1),  # 0 = CAVLC, 1 = CABAC
        "bottom_field_pic_order": r.u(1),
        "num_slice_groups": r.ue() + 1,
    }


def h264_parse_slice_prefix(
    rbsp: bytes, sps: dict, idr: bool = False
) -> dict:
    """First syntax elements of a slice header: enough to classify the
    picture (I/P/B) and read frame_num (+ idr_pic_id on IDR NALs).
    Residual data beyond the prefix is entropy-coded and NOT parsed
    (the honest boundary) — only a bounded RBSP prefix is even
    bit-expanded, so multi-megabyte slices cost O(1) here."""
    # the prefix is < 30 bytes for any legal field values; never expand
    # the (potentially huge) entropy-coded remainder into a bit string
    r = _ExpGolombReader(rbsp[:64])
    first_mb = r.ue()
    slice_type = r.ue()
    pps_id = r.ue()
    frame_num = r.u(sps["log2_max_frame_num"])
    out = {
        "first_mb": first_mb,
        "slice_type": slice_type,
        "slice_letter": SLICE_TYPES.get(slice_type % 5, "?"),
        "pps_id": pps_id,
        "frame_num": frame_num,
    }
    if idr:
        out["idr_pic_id"] = r.ue()
    return out


def h264_stream_info(payload: bytes) -> dict:
    """Structural probe of an Annex-B stream: dimensions, profile/level,
    entropy mode, NAL-type counts and slice-type histogram. Raises the
    underlying ValueError/NotImplementedError for non-subset streams."""
    nals = h264_split_nals(payload)
    sps = None
    pps_by_id: dict[int, dict] = {}
    referenced: set[int] = set()
    counts: dict[str, int] = {}
    slices: dict[str, int] = {}
    for n in nals:
        name = NAL_TYPES.get(n["type"], f"type{n['type']}")
        counts[name] = counts.get(name, 0) + 1
        if n["type"] == 7:
            sps = h264_parse_sps(n["rbsp"])
        elif n["type"] == 8:
            p = h264_parse_pps(n["rbsp"])
            pps_by_id[p["pps_id"]] = p
        elif n["type"] in (1, 5):
            if sps is None:
                raise ValueError("slice before SPS")
            s = h264_parse_slice_prefix(n["rbsp"], sps, idr=n["type"] == 5)
            referenced.add(s["pps_id"])
            slices[s["slice_letter"]] = slices.get(s["slice_letter"], 0) + 1
    if sps is None:
        raise ValueError("no SPS in stream")
    # the entropy mode belongs to the PPS the slices actually REFERENCE
    # — taking "the last PPS seen" would silently misreport multi-PPS
    # streams (r12 review). With no slices, a single PPS speaks for the
    # stream; ambiguity refuses rather than guessing.
    ref = referenced if referenced else set(pps_by_id)
    missing = ref - set(pps_by_id)
    if missing:
        raise ValueError(f"slices reference undeclared PPS ids {missing}")
    modes = {pps_by_id[i]["entropy_coding_mode"] for i in ref}
    if len(modes) > 1:
        raise NotImplementedError(
            "mixed CAVLC/CABAC across referenced PPSes"
        )
    return {
        "width": sps["width"],
        "height": sps["height"],
        "profile_idc": sps["profile_idc"],
        "level_idc": sps["level_idc"],
        "entropy_mode": (
            "cabac" if modes and modes.pop() else "cavlc"
        ),
        "n_nals": len(nals),
        "nal_counts": counts,
        "slice_counts": slices,
    }


def encode_h264_structural(
    width: int,
    height: int,
    frame_types: str = "IPP",
    profile: int = 66,
    level: int = 30,
    cabac: bool = False,
    slice_payload: bytes = b"\x88",
) -> bytes:
    """In-repo Annex-B emitter for the parser's subset: SPS + PPS + one
    slice NAL per letter in ``frame_types`` (I -> IDR, P/B -> non-IDR).
    ``slice_payload`` stands in for the entropy-coded residual this
    layer does not implement; it rides after the slice-header prefix so
    NAL framing and escaping are exercised end-to-end. Dimensions not a
    multiple of 16 are expressed through frame cropping, exactly as a
    real encoder would."""
    if width <= 0 or height <= 0:
        raise ValueError("positive dimensions required")
    if slice_payload.endswith(b"\x00"):
        # Annex-B trailing_zero_8bits are stripped by any conformant
        # splitter, so a payload ending in 0x00 cannot round-trip —
        # real RBSPs end with the rbsp_stop_one_bit pattern (nonzero)
        raise ValueError("slice_payload must not end in a zero byte")
    if profile not in (66, 77):
        raise NotImplementedError("baseline(66)/main(77) only")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_mbs * 16 - height) // 2
    if (w_mbs * 16 - width) % 2 or (h_mbs * 16 - height) % 2:
        raise NotImplementedError(
            "odd crop (4:2:0 crop units are 2 luma samples)"
        )
    w = _ExpGolombWriter()
    w.u(profile, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level, 8)
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # no VUI
    sps_rbsp = w.rbsp()

    w = _ExpGolombWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(1 if cabac else 0, 1)
    w.u(0, 1)  # bottom_field_pic_order
    w.ue(0)  # num_slice_groups_minus1
    pps_rbsp = w.rbsp()

    out = bytearray()

    def emit(ref_idc: int, ntype: int, rbsp: bytes) -> None:
        out.extend(b"\x00\x00\x00\x01")
        out.append((ref_idc << 5) | ntype)
        out.extend(_escape_rbsp(rbsp))

    emit(3, 7, sps_rbsp)
    emit(3, 8, pps_rbsp)
    letters = {"I": 2, "P": 0, "B": 1}
    frame_num = 0
    idr_count = 0
    for ft in frame_types:
        if ft not in letters:
            raise ValueError(f"frame type {ft!r}: use I/P/B")
        if ft == "I":
            frame_num = 0  # §7.4.3: frame_num shall be 0 for IDR pics
        w = _ExpGolombWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(letters[ft])  # slice_type
        w.ue(0)  # pps_id
        w.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num = 4)
        if ft == "I":
            w.ue(idr_count % 65536)  # idr_pic_id (mandatory on type 5)
            idr_count += 1
        slice_rbsp = w.rbsp() + slice_payload
        emit(3 if ft == "I" else 2, 5 if ft == "I" else 1, slice_rbsp)
        frame_num += 1  # every pic here is a reference pic
    return bytes(out)
