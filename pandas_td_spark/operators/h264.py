"""H.264/AVC (ISO/IEC 14496-10) — structural layer (r12) + CAVLC
residual layer for I-slices (r13).

Through r11 compressed video was the one wholly-stubbed modality
("H.264-class codecs need CABAC — a genuinely larger engineering job",
SURVEY §2.10 L5). r12 made the STRUCTURAL layer real; r13 adds the
CAVLC ENTROPY layer for I-frames (the VERDICT r12 #5 item): coeff_token
/ total_zeros / run_before VLC tables, the §9.2.2 adaptive level
machinery, the I_4x4/I_16x16 macroblock syntax with CBP + nC neighbor
bookkeeping, an in-repo emitter (:func:`encode_h264_cavlc`) and the
exact-coefficient decoder (:func:`h264_decode_cavlc_islice`). r14
added full pixel RECONSTRUCTION for the subset (dequant, inverse
transforms, intra prediction — :func:`h264_reconstruct_islice`); r15
adds I_PCM macroblocks (raw-sample payloads, §7.3.5) end to end. What
remains stubbed and refuses cleanly: CABAC, inter prediction (P/B
residuals), and multi-slice pictures.
The structural layer is closed-form bitstream machinery of
the same class as the MP3 entropy work in operators/codecs.py:

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
    "cavlc_encode_block",
    "cavlc_decode_block",
    "encode_h264_cavlc",
    "encode_h264_cavlc_video",
    "h264_decode_cavlc_islice",
    "h264_residual_stats",
    "h264_reconstruct_islice",
    "h264_pixel_stats",
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
    """§7.4.1: after two zeros a 0x03 is ALWAYS the emulation-prevention
    byte (a conformant encoder only emits it before 00/01/02/03, so no
    lookahead is needed — and a trailing 00 00 03 at NAL end, e.g.
    escaped cabac_zero_words, must drop the 03 too).

    r13 (ADVICE r12): scan with ``bytes.find`` instead of a per-byte
    Python loop — payloads without ``00 00 03`` runs (the common case
    for entropy-coded slice bodies) cost one C-speed scan and zero
    copies, and payloads WITH runs cost O(#escapes) Python iterations,
    not O(bytes). Equivalent to the old per-byte zeros-counter: every
    ``00 00 03`` match has two zeros immediately before the 03 (the
    counter's ``zeros >= 2`` state), dropping the 03 resets the counter
    exactly as restarting the search after the match does, and matches
    cannot overlap a dropped byte because the search resumes past it.
    """
    i = data.find(b"\x00\x00\x03")
    if i == -1:
        return data
    out = bytearray()
    start = 0
    while i != -1:
        out += data[start : i + 2]  # keep the two zeros
        start = i + 3  # drop the 03
        i = data.find(b"\x00\x00\x03", start)
    out += data[start:]
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
    """Picture parameter set: ids + entropy mode, plus (r13, for the
    CAVLC residual layer) the remaining §7.3.2.2 fields when present —
    pic_init_qp and deblocking/constrained-intra flags. Legacy in-repo
    fixtures carry only the 5-field prefix (the r12 structural subset);
    for those the extended fields are absent from the result and the
    ``full`` key is False. A full PPS needs >= 13 more payload bits, a
    prefix-only PPS has at most the stop bit + 7 alignment zeros left,
    so the two shapes cannot be confused."""
    r = _ExpGolombReader(rbsp)
    out = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "entropy_coding_mode": r.u(1),  # 0 = CAVLC, 1 = CABAC
        "bottom_field_pic_order": r.u(1),
        "num_slice_groups": r.ue() + 1,
        "full": False,
    }
    mark = r.pos
    try:
        out.update(
            {
                "num_ref_idx_l0": r.ue() + 1,
                "num_ref_idx_l1": r.ue() + 1,
                "weighted_pred": r.u(1),
                "weighted_bipred_idc": r.u(2),
                "pic_init_qp": r.se() + 26,
                "pic_init_qs": r.se() + 26,
                "chroma_qp_index_offset": r.se(),
                "deblocking_control_present": r.u(1),
                "constrained_intra_pred": r.u(1),
                "redundant_pic_cnt_present": r.u(1),
                "full": True,
            }
        )
    except ValueError:
        r.pos = mark  # 5-field prefix PPS (r12 in-repo subset)
    return out


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
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    referenced: set[int] = set()
    counts: dict[str, int] = {}
    slices: dict[str, int] = {}
    for n in nals:
        name = NAL_TYPES.get(n["type"], f"type{n['type']}")
        counts[name] = counts.get(name, 0) + 1
        if n["type"] == 7:
            sps = h264_parse_sps(n["rbsp"])
            sps_by_id[sps["sps_id"]] = sps
        elif n["type"] == 8:
            p = h264_parse_pps(n["rbsp"])
            pps_by_id[p["pps_id"]] = p
        elif n["type"] in (1, 5):
            if sps is None:
                raise ValueError("slice before SPS")
            # resolve the slice's SPS through its PPS's sps_id rather
            # than "last SPS seen": a multi-SPS stream would otherwise
            # silently misparse frame_num via a wrong
            # log2_max_frame_num field width (ADVICE r12). The pps_id
            # sits BEFORE frame_num in the header, so a cheap prefix
            # read resolves it first.
            r = _ExpGolombReader(n["rbsp"][:16])
            r.ue()  # first_mb
            r.ue()  # slice_type
            ref_pps = pps_by_id.get(r.ue())
            s_sps = sps
            if ref_pps is not None:
                s_sps = sps_by_id.get(ref_pps["sps_id"])
                if s_sps is None:
                    raise ValueError(
                        f"PPS {ref_pps['pps_id']} references undeclared "
                        f"SPS {ref_pps['sps_id']}"
                    )
            s = h264_parse_slice_prefix(
                n["rbsp"], s_sps, idr=n["type"] == 5
            )
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
    # dimensions likewise come from the SPS(es) the referenced PPSes
    # point at, not "last SPS seen" (ADVICE r12): with no PPS in the
    # stream the lone SPS speaks; distinct referenced SPSes refuse.
    ref_sps_ids = {pps_by_id[i]["sps_id"] for i in ref}
    if ref_sps_ids:
        missing_sps = ref_sps_ids - set(sps_by_id)
        if missing_sps:
            raise ValueError(
                f"PPSes reference undeclared SPS ids {missing_sps}"
            )
        ref_spses = [sps_by_id[i] for i in sorted(ref_sps_ids)]
        if any(ref_spses[0] != s for s in ref_spses[1:]):
            raise NotImplementedError(
                "multiple differing SPSes referenced by the stream"
            )
        sps = ref_spses[0]
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


# ===========================================================================
# CAVLC residual layer (r13, VERDICT r12 #5) — the entropy decode for
# I-slices that was the module's last honest stub. Same class of work as
# the MP3 entropy layer in operators/codecs.py: static VLC tables +
# closed-form bit machinery, no external library, exercised at MODEL
# grain (bounded distinct stream classes, broadcast-joined — never
# per-row Python over the corpus).
#
# Scope (everything else refuses with NotImplementedError):
# - CAVLC only (entropy_coding_mode 0); CABAC stays stubbed — its
#   arithmetic-coding state machine is the genuinely larger job.
# - I-slices only (I_4x4 and I_16x16 macroblocks; I_PCM refuses).
#   Inter prediction (P/B residuals, MVs, ref indices) refuses.
# - 4:2:0 frame-coded streams (the structural subset).
# - RESIDUAL COEFFICIENTS, not pixels: the transform/prediction
#   reconstruction stays out of scope — the decode target is the exact
#   quantized coefficient surface, which is what the round-trip gate
#   and the media_features stats consume.
#
# PROVENANCE: the VLC tables below (coeff_token Table 9-5, total_zeros
# Tables 9-7/9-8/9-9, run_before Table 9-10, the CBP mapping of Table
# 9-4, and the §9.2.2 level machinery) are reproduced FROM MEMORY of
# the public spec and are UNVERIFIED against a reference decoder (none
# exists in this container). What the tests certify is structural
# soundness (every table prefix-free and unambiguous) plus exact
# encode->decode round-trips through the in-repo emitter; real-stream
# parity additionally needs every table entry to match the spec, which
# only a conformance stream could prove. Same honest claim as the
# structural layer above and the MP3 subset.
# ===========================================================================


def _vlc(spec: str) -> dict:
    """Parse a 'key:code key:code ...' table literal into {key: bits}."""
    out = {}
    for item in spec.split():
        k, code = item.split(":")
        out[int(k)] = code
    return out


# Table 9-5 coeff_token: key = total_coeff*4 + trailing_ones.
# Context 0: 0 <= nC < 2
_CT0 = _vlc("""
0:1
4:000101 5:01
8:00000111 9:000100 10:001
12:000000111 13:00000110 14:0000101 15:00011
16:0000000111 17:000000110 18:00000101 19:000011
20:00000000111 21:0000000110 22:000000101 23:0000100
24:0000000001111 25:00000000110 26:0000000101 27:00000100
28:0000000001011 29:0000000001110 30:00000000101 31:000000100
32:0000000001000 33:0000000001010 34:0000000001101 35:0000000100
36:00000000001111 37:00000000001110 38:0000000001001 39:00000000100
40:00000000001011 41:00000000001010 42:00000000001101 43:0000000001100
44:000000000001111 45:000000000001110 46:00000000001001 47:00000000001100
48:000000000001011 49:000000000001010 50:000000000001101 51:00000000001000
52:0000000000001111 53:000000000000001 54:000000000001001 55:000000000001100
56:0000000000001011 57:0000000000001110 58:0000000000001101 59:000000000001000
60:0000000000000111 61:0000000000001010 62:0000000000001001 63:0000000000001100
64:0000000000000100 65:0000000000000110 66:0000000000000101 67:0000000000001000
""")

# Context 1: 2 <= nC < 4
_CT1 = _vlc("""
0:11
4:001011 5:10
8:000111 9:00111 10:011
12:0000111 13:001010 14:001001 15:0101
16:00000111 17:000110 18:000101 19:0100
20:00000100 21:0000110 22:0000101 23:00110
24:000000111 25:00000110 26:00000101 27:001000
28:00000001111 29:000000110 30:000000101 31:000100
32:00000001011 33:00000001110 34:00000001101 35:0000100
36:000000001111 37:00000001010 38:00000001001 39:000000100
40:000000001011 41:000000001110 42:000000001101 43:00000001100
44:000000001000 45:000000001010 46:000000001001 47:00000001000
48:0000000001111 49:0000000001110 50:0000000001101 51:000000001100
52:0000000001011 53:0000000001010 54:0000000001001 55:0000000001100
56:0000000000111 57:00000000001011 58:0000000000110 59:0000000001000
60:00000000001001 61:00000000001000 62:00000000001010 63:0000000000001
64:00000000000111 65:00000000000110 66:00000000000101 67:00000000000100
""")

# Context 2: 4 <= nC < 8. Entry 54 = (total 13, t1s 2) is a REPAIRED
# codeword: the remembered value ('000000110') prefix-collided with the
# (13,0)/(14,1) codes, so at least one of the three was misremembered;
# '0000000000' is the unique free slot that keeps the table prefix-free
# without touching the other 67 entries. Flagged for re-anchoring
# against the spec (module provenance note).
_CT2 = _vlc("""
0:1111
4:001111 5:1110
8:001011 9:01111 10:1101
12:001000 13:01100 14:01110 15:1100
16:0001111 17:01010 18:01011 19:1011
20:0001011 21:01000 22:01001 23:1010
24:0001001 25:001110 26:001101 27:1001
28:0001000 29:001010 30:001001 31:1000
32:00001111 33:0001110 34:0001101 35:01101
36:00001011 37:00001110 38:00001101 39:001100
40:000001111 41:00001010 42:00001001 43:0001100
44:000001011 45:000001110 46:000001101 47:00001100
48:000001000 49:000001010 50:000001001 51:00001000
52:0000001101 53:000000111 54:0000000000 55:000001100
56:0000001001 57:0000001100 58:0000001011 59:0000001010
60:0000000101 61:0000001000 62:0000000111 63:0000000110
64:0000000001 65:0000000100 66:0000000011 67:0000000010
""")

# Chroma-DC context (nC == -1, 4:2:0: max 4 coefficients)
_CTC = _vlc("""
0:01
4:000111 5:1
8:000100 9:000110 10:001
12:000011 13:0000011 14:0000010 15:000101
16:000010 17:00000011 18:00000010 19:0000000
""")

# total_zeros, 4x4 blocks (Tables 9-7/9-8): [tc-1] -> {total_zeros: code}
_TZ4 = [
    _vlc("0:1 1:011 2:010 3:0011 4:0010 5:00011 6:00010 7:000011 8:000010"
         " 9:0000011 10:0000010 11:00000011 12:00000010 13:000000011"
         " 14:000000010 15:000000001"),
    _vlc("0:111 1:110 2:101 3:100 4:011 5:0101 6:0100 7:0011 8:0010"
         " 9:00011 10:00010 11:000011 12:000010 13:000001 14:000000"),
    _vlc("0:0101 1:111 2:110 3:101 4:0100 5:0011 6:100 7:011 8:0010"
         " 9:00011 10:00010 11:000001 12:00001 13:000000"),
    _vlc("0:00011 1:111 2:0101 3:0100 4:110 5:101 6:100 7:0011 8:011"
         " 9:0010 10:00010 11:00001 12:00000"),
    _vlc("0:0101 1:0100 2:0011 3:111 4:110 5:101 6:100 7:011 8:0010"
         " 9:00001 10:0001 11:00000"),
    _vlc("0:000001 1:00001 2:111 3:110 4:101 5:100 6:011 7:010 8:0001"
         " 9:001 10:000000"),
    _vlc("0:000001 1:00001 2:101 3:100 4:011 5:11 6:010 7:0001 8:001"
         " 9:000000"),
    _vlc("0:000001 1:0001 2:00001 3:011 4:11 5:10 6:010 7:001 8:000000"),
    _vlc("0:000001 1:000000 2:0001 3:11 4:10 5:001 6:01 7:00001"),
    _vlc("0:00001 1:00000 2:001 3:11 4:10 5:01 6:0001"),
    _vlc("0:0000 1:0001 2:001 3:010 4:1 5:011"),
    _vlc("0:0000 1:0001 2:01 3:1 4:001"),
    _vlc("0:000 1:001 2:1 3:01"),
    _vlc("0:00 1:01 2:1"),
    _vlc("0:0 1:1"),
]

# total_zeros, chroma DC 2x2 (Table 9-9, 4:2:0): [tc-1]
_TZC = [
    _vlc("0:1 1:01 2:001 3:000"),
    _vlc("0:1 1:01 2:00"),
    _vlc("0:1 1:0"),
]

# run_before (Table 9-10): [min(zeros_left, 7) - 1] -> {run: code};
# runs >= 7 in the zl>6 column extend as '1' preceded by run-4 zeros.
_RB = [
    _vlc("0:1 1:0"),
    _vlc("0:1 1:01 2:00"),
    _vlc("0:11 1:10 2:01 3:00"),
    _vlc("0:11 1:10 2:01 3:001 4:000"),
    _vlc("0:11 1:10 2:011 3:010 4:001 5:000"),
    _vlc("0:11 1:000 2:001 3:011 4:010 5:101 6:100"),
    _vlc("0:111 1:110 2:101 3:100 4:011 5:010 6:001"),
]

# Table 9-4 (intra column): coded_block_pattern me(v) mapping,
# code_num -> cbp. FROM MEMORY, UNVERIFIED (a bijection either way, so
# round-trips are insensitive to assignment errors; real-stream parity
# is not).
_CBP_INTRA = [
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
]
_CBP_INTRA_INV = {cbp: i for i, cbp in enumerate(_CBP_INTRA)}


def _ct_table(nc: int) -> dict | None:
    """coeff_token context for nC; None selects the nC>=8 6-bit FLC."""
    if nc == -1:
        return _CTC
    if nc < 2:
        return _CT0
    if nc < 4:
        return _CT1
    if nc < 8:
        return _CT2
    return None


class _VlcDecoder:
    """Longest-is-bounded prefix decode over a {key: bits} table."""

    def __init__(self, table: dict[int, str]) -> None:
        self.by_code = {v: k for k, v in table.items()}
        self.max_len = max(len(v) for v in table.values())

    def read(self, r: "_ExpGolombReader") -> int:
        code = ""
        for _ in range(self.max_len):
            code += "1" if r.u(1) else "0"
            hit = self.by_code.get(code)
            if hit is not None:
                return hit
        raise ValueError(f"invalid VLC codeword {code!r}")


from functools import lru_cache as _lru_cache  # noqa: E402


@_lru_cache(maxsize=None)
def _decoder_for(table_id: int) -> _VlcDecoder:
    tables = {
        0: _CT0, 1: _CT1, 2: _CT2, 3: _CTC,
    }
    if table_id < 4:
        return _VlcDecoder(tables[table_id])
    if table_id < 4 + len(_TZ4):
        return _VlcDecoder(_TZ4[table_id - 4])
    if table_id < 4 + len(_TZ4) + len(_TZC):
        return _VlcDecoder(_TZC[table_id - 4 - len(_TZ4)])
    return _VlcDecoder(_RB[table_id - 4 - len(_TZ4) - len(_TZC)])


def _tz_decoder(total_coeff: int, chroma_dc: bool) -> _VlcDecoder:
    if chroma_dc:
        return _decoder_for(4 + len(_TZ4) + total_coeff - 1)
    return _decoder_for(4 + total_coeff - 1)


def _rb_decoder(zeros_left: int) -> _VlcDecoder:
    return _decoder_for(4 + len(_TZ4) + len(_TZC) + min(zeros_left, 7) - 1)


def cavlc_encode_block(
    w: "_ExpGolombWriter", coeffs: list[int], nc: int, max_coeff: int
) -> int:
    """Encode one residual block (coefficients in scan order, length
    ``max_coeff``) per §9.2; returns total_coeff for the caller's nC
    bookkeeping. ``nc`` selects the coeff_token context (-1 = chroma
    DC)."""
    if len(coeffs) != max_coeff:
        raise ValueError("coeffs length must equal max_coeff")
    nz = [(i, v) for i, v in enumerate(coeffs) if v]
    total = len(nz)
    if total > max_coeff:
        raise ValueError("too many coefficients")
    # trailing ones: up to 3 consecutive |v|==1 at the high-frequency end
    t1s = 0
    while t1s < min(3, total) and abs(nz[total - 1 - t1s][1]) == 1:
        t1s += 1
    table = _ct_table(nc)
    if table is None:  # nC >= 8: 6-bit FLC, total 0 -> 000011
        if total == 0:
            w.u(3, 6)
        else:
            w.u(((total - 1) << 2) | t1s, 6)
    else:
        code = table.get(total * 4 + t1s)
        if code is None:
            raise ValueError(f"no coeff_token for ({total},{t1s})")
        w.bits.append(code)
    if total == 0:
        return 0
    # trailing-one signs, high-frequency first
    for i in range(t1s):
        w.u(1 if nz[total - 1 - i][1] < 0 else 0, 1)
    # remaining levels, high-frequency first, adaptive suffix
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for idx in range(total - 1 - t1s, -1, -1):
        level = nz[idx][1]
        first = idx == total - 1 - t1s
        level_code = 2 * abs(level) - 2 if level > 0 else 2 * abs(level) - 1
        if first and t1s < 3:
            level_code -= 2
        if suffix_len == 0:
            if level_code < 14:
                w.bits.append("0" * level_code + "1")
            elif level_code < 30:
                w.bits.append("0" * 14 + "1")
                w.u(level_code - 14, 4)
            else:
                rem = level_code - 30  # prefix 15 escape base
                prefix = 15
                while rem >= (1 << (prefix - 3)) and prefix < 32:
                    rem = level_code - 30 - ((1 << (prefix - 2)) - 4096)
                    prefix += 1
                w.bits.append("0" * prefix + "1")
                w.u(rem, prefix - 3)
        else:
            if level_code < (15 << suffix_len):
                w.bits.append("0" * (level_code >> suffix_len) + "1")
                w.u(level_code & ((1 << suffix_len) - 1), suffix_len)
            else:
                rem = level_code - (15 << suffix_len)
                prefix = 15
                while rem >= (1 << (prefix - 3)) and prefix < 32:
                    rem = (
                        level_code
                        - (15 << suffix_len)
                        - ((1 << (prefix - 2)) - 4096)
                    )
                    prefix += 1
                w.bits.append("0" * prefix + "1")
                w.u(rem, prefix - 3)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros: zeros below the highest-frequency nonzero coefficient
    total_zeros = nz[-1][0] + 1 - total
    if total < max_coeff:
        tz_table = _TZC[total - 1] if nc == -1 else _TZ4[total - 1]
        code = tz_table.get(total_zeros)
        if code is None:
            raise ValueError("total_zeros out of range")
        w.bits.append(code)
    # run_before, high-frequency first (last run implied)
    zeros_left = total_zeros
    for idx in range(total - 1, 0, -1):
        if zeros_left <= 0:
            break
        run = nz[idx][0] - nz[idx - 1][0] - 1
        if zeros_left <= 6:
            w.bits.append(_RB[zeros_left - 1][run])
        elif run < 7:
            w.bits.append(_RB[6][run])
        else:
            w.bits.append("0" * (run - 4) + "1")
        zeros_left -= run
    return total


def cavlc_decode_block(
    r: "_ExpGolombReader", nc: int, max_coeff: int
) -> list[int]:
    """Decode one residual block (inverse of :func:`cavlc_encode_block`);
    returns the ``max_coeff`` coefficients in scan order."""
    table = _ct_table(nc)
    if table is None:
        flc = r.u(6)
        if flc == 3:
            total, t1s = 0, 0
        else:
            total, t1s = (flc >> 2) + 1, flc & 3
    else:
        tid = {id(_CT0): 0, id(_CT1): 1, id(_CT2): 2, id(_CTC): 3}[id(table)]
        key = _decoder_for(tid).read(r)
        total, t1s = key >> 2, key & 3
    if total == 0:
        return [0] * max_coeff
    if total > max_coeff:
        raise ValueError("total_coeff exceeds block size")
    levels: list[int] = []
    for _ in range(t1s):
        levels.append(-1 if r.u(1) else 1)
    suffix_len = 1 if (total > 10 and t1s < 3) else 0
    for i in range(total - t1s):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("level_prefix too long")
        suffix_size = suffix_len
        if prefix == 14 and suffix_len == 0:
            suffix_size = 4
        elif prefix >= 15:
            suffix_size = prefix - 3
        suffix = r.u(suffix_size) if suffix_size else 0
        level_code = (min(15, prefix) << suffix_len) + suffix
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == 0 and t1s < 3:
            level_code += 2
        level = (
            (level_code + 2) >> 1
            if level_code % 2 == 0
            else -((level_code + 1) >> 1)
        )
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = 0
    if total < max_coeff:
        total_zeros = _tz_decoder(total, nc == -1).read(r)
    # place coefficients: levels[] is high-frequency first
    coeffs = [0] * max_coeff
    zeros_left = total_zeros
    pos = total + total_zeros - 1  # scan index of the highest-freq coeff
    if pos >= max_coeff:
        raise ValueError("total_zeros out of range")
    for i, level in enumerate(levels):
        coeffs[pos] = level
        if i == total - 1:
            break
        run = 0
        if zeros_left > 0:
            if zeros_left <= 6:
                run = _rb_decoder(zeros_left).read(r)
            else:
                # zl>6 column: 3-bit codes for runs 0..6; '000' opens
                # the extension '1' preceded by run-4 zeros (run >= 7)
                first3 = r.u(3)
                if first3:
                    run = 7 - first3
                else:
                    zeros = 3
                    while r.u(1) == 0:
                        zeros += 1
                        if zeros > 20:
                            raise ValueError("run_before too long")
                    run = zeros + 4
        zeros_left -= run
        pos -= run + 1
        if pos < 0:
            raise ValueError("run_before underflow")
    return coeffs


# ---------------------------------------------------------------------------
# I-slice macroblock layer over the CAVLC block codec: mb_type /
# intra-pred-mode / CBP / qp-delta syntax plus the §9.2.1 nC neighbor
# bookkeeping (per-4x4 total_coeff grids for luma and each chroma
# component). Decode target is the exact quantized coefficient surface;
# prediction/transform reconstruction is out of scope by design.
# ---------------------------------------------------------------------------


def _blk_xy(blk: int) -> tuple[int, int]:
    """Luma 4x4 block index (§6.4.3 inverse scan: 2x2 quadrants of 2x2
    blocks) -> (x, y) in 4x4-sample units within the macroblock."""
    q, w = blk >> 2, blk & 3
    return ((q & 1) * 2 + (w & 1), (q >> 1) * 2 + (w >> 1))


class _NcGrid:
    """Per-4x4-block total_coeff bookkeeping for nC derivation (§9.2.1:
    nC = (nA + nB + 1) >> 1 when both neighbors are in-frame, else the
    available one, else 0)."""

    def __init__(self) -> None:
        self.tc: dict[tuple[int, int], int] = {}

    def nc(self, gx: int, gy: int) -> int:
        na = self.tc.get((gx - 1, gy)) if gx > 0 else None
        nb = self.tc.get((gx, gy - 1)) if gy > 0 else None
        if na is not None and nb is not None:
            return (na + nb + 1) >> 1
        if na is not None:
            return na
        if nb is not None:
            return nb
        return 0

    def put(self, gx: int, gy: int, total: int) -> None:
        self.tc[(gx, gy)] = total


def _mb16_cbp(mb_type: int) -> tuple[int, int, int]:
    """I_16x16 mb_type (1..24) -> (pred_mode, cbp_chroma, cbp_luma)."""
    m = mb_type - 1
    return m & 3, (m >> 2) % 3, 15 if m >= 12 else 0


def _iter_mb_blocks(
    mb: int,
    w_mbs: int,
    is16: bool,
    cbp_luma: int,
    cbp_chroma: int,
    luma_grid: "_NcGrid",
    chroma_grids: "tuple[_NcGrid, _NcGrid]",
):
    """Yield the residual blocks of one macroblock in coding order as
    (kind, comp, blk, max_coeff, nc_fn, put_fn): kind in
    {'dc16','luma','chroma_dc','chroma_ac'}. nc is computed lazily at
    coding time (the grid must reflect every previously-coded block)."""
    mbx, mby = mb % w_mbs, mb // w_mbs

    def luma_pos(blk: int) -> tuple[int, int]:
        bx, by = _blk_xy(blk)
        return mbx * 4 + bx, mby * 4 + by

    if is16:
        gx, gy = luma_pos(0)
        yield ("dc16", 0, 0, 16, lambda: luma_grid.nc(gx, gy), None)
        if cbp_luma:
            for blk in range(16):
                bgx, bgy = luma_pos(blk)
                yield (
                    "luma", 0, blk, 15,
                    (lambda x=bgx, y=bgy: luma_grid.nc(x, y)),
                    (lambda t, x=bgx, y=bgy: luma_grid.put(x, y, t)),
                )
        else:
            for blk in range(16):
                bgx, bgy = luma_pos(blk)
                luma_grid.put(bgx, bgy, 0)
    else:
        for blk in range(16):
            bgx, bgy = luma_pos(blk)
            if cbp_luma & (1 << (blk >> 2)):
                yield (
                    "luma", 0, blk, 16,
                    (lambda x=bgx, y=bgy: luma_grid.nc(x, y)),
                    (lambda t, x=bgx, y=bgy: luma_grid.put(x, y, t)),
                )
            else:
                luma_grid.put(bgx, bgy, 0)
    if cbp_chroma >= 1:
        for comp in range(2):
            yield ("chroma_dc", comp, 0, 4, lambda: -1, None)
    for comp in range(2):
        g = chroma_grids[comp]
        for blk in range(4):
            cx, cy = mbx * 2 + (blk & 1), mby * 2 + (blk >> 1)
            if cbp_chroma == 2:
                yield (
                    "chroma_ac", comp, blk, 15,
                    (lambda x=cx, y=cy, gg=g: gg.nc(x, y)),
                    (lambda t, x=cx, y=cy, gg=g: gg.put(x, y, t)),
                )
            else:
                g.put(cx, cy, 0)


def encode_h264_cavlc(
    w_mbs: int,
    h_mbs: int,
    luma: "list[list[list[int]]]",
    chroma: "list[list[list[list[int]]]]",
    mb16: "list[bool]",
    qp: int = 26,
    level: int = 30,
    pred16: "list[int] | None" = None,
    chroma_modes: "list[int] | None" = None,
) -> bytes:
    """Annex-B emitter for one IDR I-frame with REAL CAVLC residual
    data. ``luma[mb][blk][ci]`` is the 16x16-coefficient luma surface
    per macroblock (for I_16x16 MBs ci=0 routes to the DC block and
    ci 1..15 to that block's AC levels — the spec's own partition);
    ``chroma[mb][comp][blk][ci]`` likewise with ci=0 the chroma-DC
    entry. CBP is DERIVED from coefficient nonzero-ness, so any surface
    round-trips exactly. Single slice covering the frame, poc_type 2,
    full-field PPS (pic_init_qp = ``qp``), baseline profile."""
    return encode_h264_cavlc_video(
        w_mbs, h_mbs, [(luma, chroma, mb16)], qp=qp, level=level,
        pred16=pred16, chroma_modes=chroma_modes,
    )


def encode_h264_cavlc_video(
    w_mbs: int,
    h_mbs: int,
    frames: "list[tuple]",
    qp: int = 26,
    level: int = 30,
    pred16: "list[int] | None" = None,
    chroma_modes: "list[int] | None" = None,
) -> bytes:
    """All-intra multi-frame emitter (r13): one IDR I slice per
    ``(luma, chroma, mb16)`` entry in ``frames`` — the shape an
    intra-only screen-capture / fixture video has. One SPS + PPS,
    idr_pic_id increments per picture, each slice carries its own nC
    bookkeeping (neighbor state never crosses pictures).

    ``pred16`` / ``chroma_modes`` (r14, pixel-reconstruction fixtures):
    per-MB I_16x16 luma prediction modes (0 V / 1 H / 2 DC / 3 Plane)
    and intra chroma modes (0 DC / 1 H / 2 V / 3 Plane), applied to
    every frame. ``None`` keeps the r13 defaults (pred 0, ``mb % 4``)
    BYTE-IDENTICAL so the q277 fixture hashes stand — those defaults
    predate reconstruction and are mode-nonconforming on frame borders
    (V needs a top neighbor), which the r13 coefficient-only consumers
    never noticed; reconstruction fixtures must pass explicit modes."""
    n_mbs = w_mbs * h_mbs
    if not frames:
        raise ValueError("at least one frame required")
    for luma, chroma, mb16 in frames:
        if len(luma) != n_mbs or len(chroma) != n_mbs or len(mb16) != n_mbs:
            raise ValueError("surface/mb16 length must equal w_mbs*h_mbs")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range")

    w = _ExpGolombWriter()
    w.u(66, 8)  # baseline
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # poc_type 2
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no VUI
    sps_rbsp = w.rbsp()

    w = _ExpGolombWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # CAVLC
    w.u(0, 1)
    w.ue(0)  # one slice group
    w.ue(0)  # num_ref_idx_l0_active_minus1
    w.ue(0)  # num_ref_idx_l1_active_minus1
    w.u(0, 1)  # weighted_pred
    w.u(0, 2)  # weighted_bipred_idc
    w.se(qp - 26)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(0, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred
    w.u(0, 1)  # redundant_pic_cnt_present
    pps_rbsp = w.rbsp()

    slice_rbsps = []
    for idr_id, (luma, chroma, mb16) in enumerate(frames):
        w = _ExpGolombWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices in picture)
        w.ue(0)  # pps_id
        w.u(0, 4)  # frame_num (log2_max_frame_num = 4; 0 on IDR)
        w.ue(idr_id % 65536)  # idr_pic_id (changes between IDR pics)
        w.u(0, 1)  # no_output_of_prior_pics
        w.u(0, 1)  # long_term_reference_flag
        w.se(0)  # slice_qp_delta

        luma_grid = _NcGrid()
        chroma_grids = (_NcGrid(), _NcGrid())
        for mb in range(n_mbs):
            if mb16[mb] == "pcm":
                # I_PCM (§7.3.5, r15): mb_type 25, pcm_alignment_zero_
                # bits to the byte boundary, then raw 8-bit samples —
                # 256 luma (raster), 64 Cb, 64 Cr. luma[mb] is 16 rows
                # x 16 samples, chroma[mb] is [2][8][8]. Neighbor nC is
                # 16 for every block of an I_PCM macroblock (§9.2.1).
                mbx, mby = mb % w_mbs, mb // w_mbs
                if len(luma[mb]) != 16 or any(
                    len(r_) != 16 for r_ in luma[mb]
                ):
                    raise ValueError("I_PCM luma must be 16x16 samples")
                if len(chroma[mb]) != 2 or any(
                    len(cp) != 8 or any(len(r_) != 8 for r_ in cp)
                    for cp in chroma[mb]
                ):
                    raise ValueError("I_PCM chroma must be [2][8][8]")
                w.ue(25)
                pad = -sum(len(b) for b in w.bits) % 8
                if pad:
                    w.u(0, pad)
                for row in luma[mb]:
                    for s in row:
                        if not 0 <= s <= 255:
                            raise ValueError("I_PCM sample out of range")
                        w.u(s, 8)
                for cp in chroma[mb]:
                    for row in cp:
                        for s in row:
                            if not 0 <= s <= 255:
                                raise ValueError(
                                    "I_PCM sample out of range"
                                )
                            w.u(s, 8)
                for blk in range(16):
                    bx, by = _blk_xy(blk)
                    luma_grid.put(mbx * 4 + bx, mby * 4 + by, 16)
                for comp in range(2):
                    for blk in range(4):
                        chroma_grids[comp].put(
                            mbx * 2 + (blk & 1), mby * 2 + (blk >> 1), 16
                        )
                continue
            is16 = bool(mb16[mb])
            any_luma_ac = any(
                luma[mb][blk][ci]
                for blk in range(16)
                for ci in range(1, 16)
            )
            if is16:
                cbp_luma = 15 if any_luma_ac else 0
            else:
                cbp_luma = 0
                for blk in range(16):
                    if any(luma[mb][blk]):
                        cbp_luma |= 1 << (blk >> 2)
            any_cdc = any(
                chroma[mb][c][b][0] for c in range(2) for b in range(4)
            )
            any_cac = any(
                chroma[mb][c][b][ci]
                for c in range(2) for b in range(4) for ci in range(1, 16)
            )
            cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
            if is16:
                # pred_mode in the mb_type composition (default 0 —
                # r13 byte-compat); the DC block is always coded for
                # I_16x16 (an all-zero one costs one coeff_token with
                # total 0)
                p16 = pred16[mb] if pred16 is not None else 0
                w.ue(1 + p16 + 4 * cbp_chroma + 12 * (1 if cbp_luma else 0))
            else:
                w.ue(0)  # I_4x4
                for _ in range(16):
                    w.u(1, 1)  # prev_intra4x4_pred_mode_flag = 1
            w.ue(
                chroma_modes[mb] if chroma_modes is not None else mb % 4
            )  # intra_chroma_pred_mode
            if not is16:
                w.ue(_CBP_INTRA_INV[cbp_luma | (cbp_chroma << 4)])
            if is16 or cbp_luma or cbp_chroma:
                w.se(0)  # mb_qp_delta
            for kind, comp, blk, mc, nc_fn, put_fn in _iter_mb_blocks(
                mb, w_mbs, is16, cbp_luma, cbp_chroma,
                luma_grid, chroma_grids,
            ):
                if kind == "dc16":
                    coeffs = [luma[mb][b][0] for b in range(16)]
                elif kind == "luma":
                    coeffs = (
                        luma[mb][blk][1:] if mc == 15 else list(luma[mb][blk])
                    )
                elif kind == "chroma_dc":
                    coeffs = [chroma[mb][comp][b][0] for b in range(4)]
                else:
                    coeffs = chroma[mb][comp][blk][1:]
                total = cavlc_encode_block(w, list(coeffs), nc_fn(), mc)
                if put_fn is not None:
                    put_fn(total)
        slice_rbsps.append(w.rbsp())

    out = bytearray()
    for ref_idc, ntype, rbsp in [(3, 7, sps_rbsp), (3, 8, pps_rbsp)] + [
        (3, 5, s) for s in slice_rbsps
    ]:
        out.extend(b"\x00\x00\x00\x01")
        out.append((ref_idc << 5) | ntype)
        out.extend(_escape_rbsp(rbsp))
    return bytes(out)


def h264_decode_cavlc_islice(payload: bytes) -> dict:
    """Decode the CAVLC I-frame subset back to exact coefficient
    surfaces: ``{"w_mbs", "h_mbs", "qp", "mb16": [bool], "luma":
    [mb][16][16], "chroma": [mb][2][4][16], "n_slices", "frames"}``.
    Multi-frame all-intra streams decode every picture into
    ``frames`` (a list of per-picture dicts; the top-level fields
    mirror frame 0). Refuses (NotImplementedError) CABAC, non-I
    slices, multi-slice PICTURES (first_mb != 0) and
    prefix-only PPSes; I_PCM macroblocks decode to raw sample
    surfaces (r15: ``mb_pcm``/``pcm_luma``/``pcm_chroma``); corrupt
    bitstreams raise ValueError."""
    nals = h264_split_nals(payload)
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    out: dict | None = None
    n_slices = 0
    for n in nals:
        if n["type"] == 7:
            s = h264_parse_sps(n["rbsp"])
            sps_by_id[s["sps_id"]] = s
        elif n["type"] == 8:
            p = h264_parse_pps(n["rbsp"])
            pps_by_id[p["pps_id"]] = p
        elif n["type"] in (1, 5):
            r = _ExpGolombReader(n["rbsp"])
            first_mb = r.ue()
            slice_type = r.ue()
            pps = pps_by_id.get(r.ue())
            if pps is None:
                raise ValueError("slice references undeclared PPS")
            if not pps["full"]:
                raise NotImplementedError(
                    "prefix-only PPS (r12 structural fixtures) carries "
                    "no pic_init_qp — residual decode needs a full PPS"
                )
            if pps["entropy_coding_mode"]:
                raise NotImplementedError("CABAC entropy coding")
            if slice_type % 5 != 2:
                raise NotImplementedError(
                    f"slice_type {slice_type}: only I slices"
                )
            sps = sps_by_id.get(pps["sps_id"])
            if sps is None:
                raise ValueError("PPS references undeclared SPS")
            if first_mb != 0:
                raise NotImplementedError("multi-slice pictures")
            r.u(sps["log2_max_frame_num"])  # frame_num
            if n["type"] == 5:
                r.ue()  # idr_pic_id
            if sps["poc_type"] == 0:
                r.u(sps["log2_max_poc_lsb"])
            if n["ref_idc"]:
                if n["type"] == 5:
                    r.u(1)
                    r.u(1)
                elif r.u(1):
                    raise NotImplementedError(
                        "adaptive ref pic marking"
                    )
            qp = pps["pic_init_qp"] + r.se()
            if pps["deblocking_control_present"]:
                if r.ue() != 1:
                    r.se()
                    r.se()
            w_mbs, h_mbs = sps["width_mbs"], sps["height_mbs"]
            n_mbs = w_mbs * h_mbs
            luma = [
                [[0] * 16 for _ in range(16)] for _ in range(n_mbs)
            ]
            chroma = [
                [[[0] * 16 for _ in range(4)] for _ in range(2)]
                for _ in range(n_mbs)
            ]
            mb16 = [False] * n_mbs
            pred16 = [None] * n_mbs
            chroma_mode = [0] * n_mbs
            i4_modes: list[list[int] | None] = [None] * n_mbs
            qp_mb = [0] * n_mbs
            mb_pcm = [False] * n_mbs
            pcm_luma: list = [None] * n_mbs
            pcm_chroma: list = [None] * n_mbs
            # per-4x4-block intra prediction mode grid for the §8.3.1.1
            # most-probable-mode derivation: blocks of non-I_4x4 MBs
            # count as DC (2); out-of-frame neighbors make the
            # predicted mode DC via the "not available" clause
            mode_grid: dict[tuple[int, int], int] = {}
            luma_grid = _NcGrid()
            chroma_grids = (_NcGrid(), _NcGrid())
            for mb in range(n_mbs):
                mbx, mby = mb % w_mbs, mb // w_mbs
                mb_type = r.ue()
                if mb_type == 25:
                    # I_PCM (§7.3.5, r15): byte-align then raw samples;
                    # QP is unchanged; every block counts nC = 16 for
                    # later neighbors (§9.2.1); I_4x4 most-probable-mode
                    # derivation sees the MB as DC (not Intra_4x4)
                    pad = -r.pos % 8
                    if pad and r.u(pad) != 0:
                        raise ValueError(
                            "nonzero pcm_alignment_zero_bit"
                        )
                    pcm_luma[mb] = [
                        [r.u(8) for _ in range(16)] for _ in range(16)
                    ]
                    pcm_chroma[mb] = [
                        [[r.u(8) for _ in range(8)] for _ in range(8)]
                        for _ in range(2)
                    ]
                    mb_pcm[mb] = True
                    qp_mb[mb] = qp
                    for blk in range(16):
                        bx, by = _blk_xy(blk)
                        gx, gy = mbx * 4 + bx, mby * 4 + by
                        luma_grid.put(gx, gy, 16)
                        mode_grid[(gx, gy)] = 2
                    for comp in range(2):
                        for blk in range(4):
                            chroma_grids[comp].put(
                                mbx * 2 + (blk & 1),
                                mby * 2 + (blk >> 1),
                                16,
                            )
                    continue
                if mb_type > 25:
                    raise ValueError(f"invalid I mb_type {mb_type}")
                is16 = mb_type >= 1
                mb16[mb] = is16
                if is16:
                    p16, cbp_chroma, cbp_luma = _mb16_cbp(mb_type)
                    pred16[mb] = p16
                    for blk in range(16):
                        bx, by = _blk_xy(blk)
                        mode_grid[(mbx * 4 + bx, mby * 4 + by)] = 2
                else:
                    modes = []
                    for blk in range(16):
                        bx, by = _blk_xy(blk)
                        gx, gy = mbx * 4 + bx, mby * 4 + by
                        ma = mode_grid.get((gx - 1, gy), 2) if gx else 2
                        mbv = mode_grid.get((gx, gy - 1), 2) if gy else 2
                        most_probable = min(ma, mbv)
                        if r.u(1):  # prev_intra4x4_pred_mode_flag
                            mode = most_probable
                        else:
                            rem = r.u(3)  # rem_intra4x4_pred_mode
                            mode = rem + (1 if rem >= most_probable else 0)
                        modes.append(mode)
                        mode_grid[(gx, gy)] = mode
                    i4_modes[mb] = modes
                chroma_mode[mb] = r.ue()  # intra_chroma_pred_mode
                if not is16:
                    code = r.ue()
                    if code >= len(_CBP_INTRA):
                        raise ValueError("invalid coded_block_pattern")
                    cbp = _CBP_INTRA[code]
                    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
                if is16 or cbp_luma or cbp_chroma:
                    qp += r.se()  # mb_qp_delta
                qp_mb[mb] = qp
                for kind, comp, blk, mc, nc_fn, put_fn in _iter_mb_blocks(
                    mb, w_mbs, is16, cbp_luma, cbp_chroma,
                    luma_grid, chroma_grids,
                ):
                    coeffs = cavlc_decode_block(r, nc_fn(), mc)
                    if put_fn is not None:
                        put_fn(sum(1 for v in coeffs if v))
                    if kind == "dc16":
                        for b in range(16):
                            luma[mb][b][0] = coeffs[b]
                    elif kind == "luma":
                        if mc == 15:
                            luma[mb][blk][1:] = coeffs
                        else:
                            luma[mb][blk] = coeffs
                    elif kind == "chroma_dc":
                        for b in range(4):
                            chroma[mb][comp][b][0] = coeffs[b]
                    else:
                        chroma[mb][comp][blk][1:] = coeffs
            # rbsp_slice_trailing_bits: stop bit + byte alignment
            if r.u(1) != 1:
                raise ValueError("missing rbsp_stop_one_bit")
            tail = len(r.bits) - r.pos
            if tail >= 8 or (r.u(tail) if tail else 0) != 0:
                raise ValueError("trailing garbage after slice data")
            n_slices += 1
            frame = {
                "w_mbs": w_mbs,
                "h_mbs": h_mbs,
                "qp": qp,
                "mb16": mb16,
                "luma": luma,
                "chroma": chroma,
                # r14 reconstruction inputs: per-MB I_16x16 pred mode
                # (None for I_4x4 MBs), intra chroma mode, the derived
                # per-block I_4x4 modes (None for I_16x16 MBs), and the
                # post-delta qp each MB's residuals were coded at
                "pred16": pred16,
                "chroma_mode": chroma_mode,
                "i4_modes": i4_modes,
                "qp_mb": qp_mb,
                # r15 I_PCM: raw-sample macroblocks (coeff surfaces
                # stay zero for them); pcm_luma[mb] is 16x16 rows,
                # pcm_chroma[mb] is [2][8][8], None for coded MBs
                "mb_pcm": mb_pcm,
                "pcm_luma": pcm_luma,
                "pcm_chroma": pcm_chroma,
            }
            if out is None:
                # top level mirrors frame 0 (the r13 single-frame shape)
                out = dict(frame)
                out["frames"] = [frame]
            else:
                # all-intra multi-frame stream (r13): every picture is a
                # full-frame IDR I slice; dimensions are SPS-wide
                if (frame["w_mbs"], frame["h_mbs"]) != (
                    out["w_mbs"], out["h_mbs"]
                ):
                    raise NotImplementedError(
                        "per-frame dimension change mid-stream"
                    )
                out["frames"].append(frame)
    if out is None:
        raise ValueError("no I slice in stream")
    out["n_slices"] = n_slices
    return out


def h264_residual_stats(payload: bytes) -> dict:
    """Integer stats over the decoded coefficient surfaces — the
    media_features / q277 consumer: per-frame macroblock count, nonzero
    count, |level| sum, signed sum, and a position-weighted checksum any
    SQL engine can replay from a closed-form surface definition.
    Multi-frame (all-intra) streams aggregate across frames; the
    per-frame checksum offset (``frame * 37_000_000``) is zero for frame
    0, so single-frame stats are unchanged from the r13 gate values.
    ``qp`` / ``n_mb16`` report frame 0 (SPS-constant grids make the
    per-frame values available in ``h264_decode_cavlc_islice``)."""
    d = h264_decode_cavlc_islice(payload)
    n_mbs = d["w_mbs"] * d["h_mbs"]
    n_nonzero = sum_vals = sum_abs = chk = 0
    for fi, fr in enumerate(d["frames"]):
        base = fi * 37_000_000
        for mb in range(n_mbs):
            for blk in range(16):
                for ci in range(16):
                    v = fr["luma"][mb][blk][ci]
                    if v:
                        n_nonzero += 1
                        sum_vals += v
                        sum_abs += abs(v)
                        chk += v * (base + 1 + mb * 1000 + blk * 50 + ci)
            for comp in range(2):
                for blk in range(4):
                    for ci in range(16):
                        v = fr["chroma"][mb][comp][blk][ci]
                        if v:
                            n_nonzero += 1
                            sum_vals += v
                            sum_abs += abs(v)
                            chk += v * (
                                base + 500000 + mb * 1000
                                + comp * 400 + blk * 50 + ci
                            )
    return {
        "n_mbs": n_mbs,
        "n_frames": len(d["frames"]),
        "qp": d["qp"],
        "n_mb16": sum(1 for b in d["mb16"] if b),
        "n_pcm": sum(1 for b in d.get("mb_pcm", []) if b),
        "n_nonzero": n_nonzero,
        "sum_vals": sum_vals,
        "sum_abs": sum_abs,
        "chk": chk,
    }


# ---------------------------------------------------------------------------
# Pixel reconstruction for the CAVLC I-slice subset (r14, VERDICT r13
# #5): dequantization (§8.5.9-11), the integer inverse 4x4 transform
# (§8.5.12), the luma-DC 4x4 and chroma-DC 2x2 inverse Hadamards, and
# intra prediction — I_16x16 V/H/DC/Plane (§8.3.3), I_4x4 DC (§8.3.1;
# the only 4x4 mode the in-repo emitter produces — others refuse), and
# intra chroma DC/H/V/Plane (§8.3.4). All arithmetic is exact integer
# (Python >> is the spec's arithmetic shift). PROVENANCE: formulas from
# public-spec memory, UNVERIFIED against a reference decoder (none in
# this container); the q278 gate certifies self-consistency of encode →
# decode → reconstruct against an independent closed-form SQL replay.
# Nonconforming mode/neighbor combinations (V prediction on the top MB
# row, etc.) raise ValueError; modes outside the subset raise
# NotImplementedError.
# ---------------------------------------------------------------------------

#: §8.5.9 dequant scale V[qp%6] = (v_cat0, v_cat1, v_cat2); position
#: categories: (0,0),(0,2),(2,0),(2,2) -> 0; (1,1),(1,3),(3,1),(3,3)
#: -> 1; else 2.
_V4X4 = (
    (10, 16, 13),
    (11, 18, 14),
    (13, 20, 16),
    (14, 23, 18),
    (16, 25, 20),
    (18, 29, 23),
)

#: 4x4 zigzag scan: coefficient index -> (row, col)
_ZIGZAG4 = (
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2), (1, 3), (2, 3), (3, 2), (3, 3),
)

#: §8.4.4.1 chroma QP mapping for qp >= 30 (below 30: identity)
_CHROMA_QP = (
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
    36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39,
)


def _chroma_qp(qp: int) -> int:
    return qp if qp < 30 else _CHROMA_QP[qp - 30]


def _v_cat(i: int, j: int) -> int:
    if (i & 1) == 0 and (j & 1) == 0:
        return 0
    if (i & 1) == 1 and (j & 1) == 1:
        return 1
    return 2


def _ihadamard4(c: "list[list[int]]") -> "list[list[int]]":
    """4x4 inverse Hadamard for the I_16x16 luma DC array (§8.5.10):
    f = H · c · H^T with the ±1 butterfly (no scaling here)."""
    h = (
        (1, 1, 1, 1),
        (1, 1, -1, -1),
        (1, -1, -1, 1),
        (1, -1, 1, -1),
    )
    t = [
        [sum(h[i][k] * c[k][j] for k in range(4)) for j in range(4)]
        for i in range(4)
    ]
    return [
        [sum(t[i][k] * h[j][k] for k in range(4)) for j in range(4)]
        for i in range(4)
    ]


def _idct4x4(d: "list[list[int]]") -> "list[list[int]]":
    """§8.5.12.2 integer inverse core transform; output needs the
    caller's (x + 32) >> 6 rounding applied (done here)."""
    e = []
    for i in range(4):
        d0, d1, d2, d3 = d[i]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        e.append((e0 + e3, e1 + e2, e1 - e2, e0 - e3))
    out = [[0] * 4 for _ in range(4)]
    for j in range(4):
        d0, d1, d2, d3 = e[0][j], e[1][j], e[2][j], e[3][j]
        f0, f1 = d0 + d2, d0 - d2
        f2, f3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        col = (f0 + f3, f1 + f2, f1 - f2, f0 - f3)
        for i in range(4):
            out[i][j] = (col[i] + 32) >> 6
    return out


def _dequant_block4(coeffs_zig: "list[int]", qp: int,
                    skip_dc: bool = False) -> "list[list[int]]":
    """Zigzag coefficient list -> dequantized 4x4 array d (§8.5.12.1,
    flat scaling lists): d_ij = c_ij * V[qp%6][cat] << (qp // 6).
    ``skip_dc`` leaves d[0][0] = 0 for I_16x16 AC blocks (the DC comes
    from the Hadamard path)."""
    m, s = qp % 6, qp // 6
    d = [[0] * 4 for _ in range(4)]
    for ci, c in enumerate(coeffs_zig):
        if c == 0 or (skip_dc and ci == 0):
            continue
        i, j = _ZIGZAG4[ci]
        d[i][j] = (c * _V4X4[m][_v_cat(i, j)]) << s
    return d


def _clip1(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


class _Plane:
    """A w x h sample plane with -1-indexed neighbor reads."""

    def __init__(self, w: int, h: int) -> None:
        self.w, self.h = w, h
        self.px = [[0] * w for _ in range(h)]

    def get(self, x: int, y: int) -> int:
        return self.px[y][x]


def _pred_dc(plane: _Plane, x0: int, y0: int, size: int) -> int:
    """DC prediction over a size x size block: mean of the available
    top row / left column neighbor samples (§8.3.1.2.3 / §8.3.3.3)."""
    top = y0 > 0
    left = x0 > 0
    if top and left:
        s = sum(plane.get(x0 + i, y0 - 1) for i in range(size)) + sum(
            plane.get(x0 - 1, y0 + i) for i in range(size)
        )
        return (s + size) >> (size.bit_length() + 0)
    if top:
        s = sum(plane.get(x0 + i, y0 - 1) for i in range(size))
        return (s + (size >> 1)) >> (size.bit_length() - 1)
    if left:
        s = sum(plane.get(x0 - 1, y0 + i) for i in range(size))
        return (s + (size >> 1)) >> (size.bit_length() - 1)
    return 128


def _pred16(plane: _Plane, x0: int, y0: int, mode: int) -> "list[list[int]]":
    """I_16x16 luma prediction (§8.3.3): 0 V, 1 H, 2 DC, 3 Plane."""
    if mode == 0:
        if y0 == 0:
            raise ValueError("nonconforming: I16 V prediction without top")
        row = [plane.get(x0 + i, y0 - 1) for i in range(16)]
        return [list(row) for _ in range(16)]
    if mode == 1:
        if x0 == 0:
            raise ValueError("nonconforming: I16 H prediction without left")
        return [[plane.get(x0 - 1, y0 + y)] * 16 for y in range(16)]
    if mode == 2:
        dc = _pred_dc(plane, x0, y0, 16)
        return [[dc] * 16 for _ in range(16)]
    if mode == 3:
        if x0 == 0 or y0 == 0:
            raise ValueError("nonconforming: I16 Plane needs both edges")
        h = sum(
            (i + 1)
            * (plane.get(x0 + 8 + i, y0 - 1) - plane.get(x0 + 6 - i, y0 - 1))
            for i in range(8)
        )
        v = sum(
            (i + 1)
            * (plane.get(x0 - 1, y0 + 8 + i) - plane.get(x0 - 1, y0 + 6 - i))
            for i in range(8)
        )
        a = 16 * (plane.get(x0 + 15, y0 - 1) + plane.get(x0 - 1, y0 + 15))
        b = (5 * h + 32) >> 6
        c = (5 * v + 32) >> 6
        return [
            [
                _clip1((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
                for x in range(16)
            ]
            for y in range(16)
        ]
    raise ValueError(f"invalid I_16x16 prediction mode {mode}")


def _pred4_dc(plane: _Plane, x0: int, y0: int) -> int:
    return _pred_dc(plane, x0, y0, 4)


def _pred_chroma(
    plane: _Plane, x0: int, y0: int, mode: int
) -> "list[list[int]]":
    """Intra chroma prediction over the 8x8 component plane (§8.3.4):
    0 DC (per-4x4-block neighbor rules), 1 H, 2 V, 3 Plane."""
    if mode == 1:
        if x0 == 0:
            raise ValueError("nonconforming: chroma H without left")
        return [[plane.get(x0 - 1, y0 + y)] * 8 for y in range(8)]
    if mode == 2:
        if y0 == 0:
            raise ValueError("nonconforming: chroma V without top")
        row = [plane.get(x0 + i, y0 - 1) for i in range(8)]
        return [list(row) for _ in range(8)]
    if mode == 3:
        if x0 == 0 or y0 == 0:
            raise ValueError("nonconforming: chroma Plane needs both edges")
        h = sum(
            (i + 1)
            * (plane.get(x0 + 4 + i, y0 - 1) - plane.get(x0 + 2 - i, y0 - 1))
            for i in range(4)
        )
        v = sum(
            (i + 1)
            * (plane.get(x0 - 1, y0 + 4 + i) - plane.get(x0 - 1, y0 + 2 - i))
            for i in range(4)
        )
        a = 16 * (plane.get(x0 + 7, y0 - 1) + plane.get(x0 - 1, y0 + 7))
        b = (17 * h + 16) >> 5
        c = (17 * v + 16) >> 5
        return [
            [
                _clip1((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
                for x in range(8)
            ]
            for y in range(8)
        ]
    if mode != 0:
        raise ValueError(f"invalid intra chroma prediction mode {mode}")
    # DC: each 4x4 sub-block averages specific neighbor runs. Spec
    # §8.3.4.1 groups blocks (0,0) and (4,4): both edges available ->
    # (tsum+lsum+4)>>3; blocks (1,0)/(0,1) prefer their own edge (top /
    # left) falling back to the other. With single-edge availability
    # every rule collapses to that edge; the 2x2-MB-grid fixture in
    # test_h264.py exercises the both-edges interior path.
    top, left = y0 > 0, x0 > 0
    out = [[0] * 8 for _ in range(8)]
    for by in range(2):
        for bx in range(2):
            tsum = (
                sum(plane.get(x0 + bx * 4 + i, y0 - 1) for i in range(4))
                if top
                else None
            )
            lsum = (
                sum(plane.get(x0 - 1, y0 + by * 4 + i) for i in range(4))
                if left
                else None
            )
            if (bx, by) == (0, 0):
                if top and left:
                    dc = (tsum + lsum + 4) >> 3
                elif top:
                    dc = (tsum + 2) >> 2
                elif left:
                    dc = (lsum + 2) >> 2
                else:
                    dc = 128
            elif (bx, by) == (1, 0):
                dc = (
                    (tsum + 2) >> 2 if top
                    else ((lsum + 2) >> 2 if left else 128)
                )
            elif (bx, by) == (0, 1):
                dc = (
                    (lsum + 2) >> 2 if left
                    else ((tsum + 2) >> 2 if top else 128)
                )
            else:
                # spec §8.3.4.1 groups block (4,4) with (0,0): both
                # edges available -> full (tsum+lsum+4)>>3 average
                if top and left:
                    dc = (tsum + lsum + 4) >> 3
                elif top:
                    dc = (tsum + 2) >> 2
                elif left:
                    dc = (lsum + 2) >> 2
                else:
                    dc = 128
            for y in range(4):
                for x in range(4):
                    out[by * 4 + y][bx * 4 + x] = dc
    return out


def h264_reconstruct_islice(payload: bytes) -> dict:
    """Decode + reconstruct the CAVLC I-slice subset to PIXELS:
    ``{"w", "h", "frames": [{"y": [[...]], "cb": [[...]], "cr":
    [[...]], "n_clip"}]}`` where planes are row-major lists of ints in
    [0, 255] and ``n_clip`` counts samples that hit the clip rails.
    Inherits the decoder's refusals (CABAC, P/B, multi-slice);
    I_PCM macroblocks copy their raw samples into the planes (r15) and
    serve as prediction neighbors for later macroblocks;
    additionally refuses I_4x4 prediction modes other than DC
    (NotImplementedError — the in-repo emitter never produces them)
    and raises ValueError on mode/neighbor nonconformance."""
    d = h264_decode_cavlc_islice(payload)
    w_mbs, h_mbs = d["w_mbs"], d["h_mbs"]
    out_frames = []
    for fr in d["frames"]:
        y_pl = _Plane(w_mbs * 16, h_mbs * 16)
        c_pl = (_Plane(w_mbs * 8, h_mbs * 8), _Plane(w_mbs * 8, h_mbs * 8))
        n_clip = 0

        def put(plane: _Plane, x0: int, y0: int, pred, res) -> None:
            nonlocal n_clip
            for yy in range(len(res)):
                row = plane.px[y0 + yy]
                prow = pred[yy]
                rrow = res[yy]
                for xx in range(len(rrow)):
                    v = prow[xx] + rrow[xx]
                    if v < 0 or v > 255:
                        n_clip += 1
                        v = 0 if v < 0 else 255
                    row[x0 + xx] = v

        for mb in range(w_mbs * h_mbs):
            mbx, mby = mb % w_mbs, mb // w_mbs
            qp = fr["qp_mb"][mb]
            if fr.get("mb_pcm") and fr["mb_pcm"][mb]:
                # I_PCM: samples copy straight into the planes (no
                # prediction, no residual, no clipping — already 8-bit)
                # and later MBs predict from them via the plane state
                for yy in range(16):
                    prow = y_pl.px[mby * 16 + yy]
                    prow[mbx * 16 : mbx * 16 + 16] = list(
                        fr["pcm_luma"][mb][yy]
                    )
                for comp in range(2):
                    for yy in range(8):
                        prow = c_pl[comp].px[mby * 8 + yy]
                        prow[mbx * 8 : mbx * 8 + 8] = list(
                            fr["pcm_chroma"][mb][comp][yy]
                        )
                continue
            if fr["mb16"][mb]:
                pred = _pred16(y_pl, mbx * 16, mby * 16, fr["pred16"][mb])
                # luma DC: zigzag-scanned 4x4 DC array -> inverse
                # Hadamard -> §8.5.10 scaling
                dcz = [fr["luma"][mb][b][0] for b in range(16)]
                c4 = [[0] * 4 for _ in range(4)]
                for b, v in enumerate(dcz):
                    i, j = _ZIGZAG4[b]
                    c4[i][j] = v
                f = _ihadamard4(c4)
                ls = _V4X4[qp % 6][0]
                s = qp // 6
                if qp >= 36:
                    dcy = [
                        [(f[i][j] * ls) << (s - 6) for j in range(4)]
                        for i in range(4)
                    ]
                else:
                    rnd = 1 << (5 - s)
                    dcy = [
                        [(f[i][j] * ls + rnd) >> (6 - s) for j in range(4)]
                        for i in range(4)
                    ]
                for blk in range(16):
                    bx, by = _blk_xy(blk)
                    dd = _dequant_block4(fr["luma"][mb][blk], qp,
                                         skip_dc=True)
                    dd[0][0] = dcy[by][bx]
                    res = _idct4x4(dd)
                    p4 = [
                        pred[by * 4 + yy][bx * 4:bx * 4 + 4]
                        for yy in range(4)
                    ]
                    put(y_pl, mbx * 16 + bx * 4, mby * 16 + by * 4, p4, res)
            else:
                for blk in range(16):
                    bx, by = _blk_xy(blk)
                    mode = fr["i4_modes"][mb][blk]
                    if mode != 2:
                        raise NotImplementedError(
                            f"I_4x4 prediction mode {mode}: only DC (2) "
                            "— the in-repo emitter's sole mode"
                        )
                    x0, y0 = mbx * 16 + bx * 4, mby * 16 + by * 4
                    dc = _pred4_dc(y_pl, x0, y0)
                    p4 = [[dc] * 4 for _ in range(4)]
                    res = _idct4x4(
                        _dequant_block4(fr["luma"][mb][blk], qp)
                    )
                    put(y_pl, x0, y0, p4, res)
            # chroma: both components, 8x8 each
            qpc = _chroma_qp(qp)
            for comp in range(2):
                pl = c_pl[comp]
                pred = _pred_chroma(
                    pl, mbx * 8, mby * 8, fr["chroma_mode"][mb]
                )
                dcz = [fr["chroma"][mb][comp][b][0] for b in range(4)]
                f00 = dcz[0] + dcz[1] + dcz[2] + dcz[3]
                f01 = dcz[0] - dcz[1] + dcz[2] - dcz[3]
                f10 = dcz[0] + dcz[1] - dcz[2] - dcz[3]
                f11 = dcz[0] - dcz[1] - dcz[2] + dcz[3]
                lsc = _V4X4[qpc % 6][0]
                sc = qpc // 6
                dcc = [
                    [((f00 * lsc) << sc) >> 5, ((f01 * lsc) << sc) >> 5],
                    [((f10 * lsc) << sc) >> 5, ((f11 * lsc) << sc) >> 5],
                ]
                for blk in range(4):
                    bx, by = blk & 1, blk >> 1
                    dd = _dequant_block4(
                        fr["chroma"][mb][comp][blk], qpc, skip_dc=True
                    )
                    dd[0][0] = dcc[by][bx]
                    res = _idct4x4(dd)
                    p4 = [
                        pred[by * 4 + yy][bx * 4:bx * 4 + 4]
                        for yy in range(4)
                    ]
                    put(pl, mbx * 8 + bx * 4, mby * 8 + by * 4, p4, res)
        out_frames.append(
            {
                "y": y_pl.px,
                "cb": c_pl[0].px,
                "cr": c_pl[1].px,
                "n_clip": n_clip,
            }
        )
    return {
        "w": w_mbs * 16,
        "h": h_mbs * 16,
        "w_mbs": w_mbs,
        "h_mbs": h_mbs,
        "qp": d["qp"],
        "frames": out_frames,
    }


def h264_pixel_stats(payload: bytes) -> dict:
    """Integer stats over RECONSTRUCTED pixels (the q278 consumer):
    per-stream luma/chroma sums plus a position-weighted checksum a SQL
    oracle can replay from the closed-form surface + prediction
    recurrence. Weight collapses over y within a 4x4 block row via the
    arithmetic-series factor so flat-in-y fixtures stay closed-form."""
    r = h264_reconstruct_islice(payload)
    luma_sum = luma_chk = chroma_sum = chroma_chk = n_clip = 0
    for fi, fr in enumerate(r["frames"]):
        base = fi * 1_000_003
        n_clip += fr["n_clip"]
        for y, row in enumerate(fr["y"]):
            for x, v in enumerate(row):
                luma_sum += v
                luma_chk += v * (base + 1 + y * r["w"] + x)
        for comp, key in ((0, "cb"), (1, "cr")):
            for y, row in enumerate(fr[key]):
                for x, v in enumerate(row):
                    chroma_sum += v
                    chroma_chk += v * (
                        base + 500_000 + comp * 250_000
                        + y * (r["w"] // 2) + x
                    )
    return {
        "w": r["w"],
        "h": r["h"],
        "qp": r["qp"],
        "n_frames": len(r["frames"]),
        "luma_sum": luma_sum,
        "luma_chk": luma_chk,
        "chroma_sum": chroma_sum,
        "chroma_chk": chroma_chk,
        "n_clip": n_clip,
    }
