"""Pure-python H.264/AVC (ITU-T H.264 / ISO 14496-10) subset codec.

REAL, spec-conformant layers — NAL framing in both Annex-B (start codes
+ emulation prevention) and MP4/avcC (length-prefixed) forms, Exp-Golomb
bit parsing, full SPS / PPS / slice-header field walks, and macroblock
reconstruction for **I_PCM** macroblocks (§7.3.5 mb_type 25: raw 4:2:0
samples, part of every profile). The encoder writes conforming
constrained-baseline streams whose every macroblock is I_PCM, so
avc1-in-MP4 fixtures decode end-to-end through the engine's own stack
(mp4codec demux → this decoder → FrameSample).

Declared stub: predicted/transformed macroblocks — CAVLC/CABAC residual
entropy decode + intra/inter prediction — raise NotImplementedError
naming the tool. That is the honest line: a full H.264 decoder needs an
external library; the container/bitstream/PCM layers above it do not,
and header parsing (probe) works on any baseline/main/high stream.

Reference parity note: the reference stores media blobs untouched; this
codec backs the engine's multimodal stages (multimodal.py), extending
the real-path family (jpeg/png/gif/mp4/webp codecs)."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bitstream primitives
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an RBSP (emulation bytes removed)."""

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0                            # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i = self.p >> 3
            if byte_i >= len(self.d):
                raise ValueError("H.264: bitstream truncated")
            v = (v << 1) | ((self.d[byte_i] >> (7 - (self.p & 7))) & 1)
            self.p += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("H.264: bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_align(self):
        while self.p & 7:
            self.u(1)

    def bytes_(self, n: int) -> bytes:
        assert (self.p & 7) == 0
        s = self.p >> 3
        if s + n > len(self.d):
            raise ValueError("H.264: PCM samples truncated")
        self.p += 8 * n
        return self.d[s: s + n]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc, self.n = 0, 0

    def ue(self, v: int):
        code = v + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self):
        while self.n:
            self.u(0, 1)

    def bytes_(self, b: bytes):
        assert self.n == 0
        self.buf += b

    def trailing(self) -> bytes:
        """rbsp_stop_one_bit + alignment zeros."""
        self.u(1, 1)
        self.byte_align_zero()
        return bytes(self.buf)


def _strip_emulation(b: bytes) -> bytes:
    """NAL payload → RBSP (drop emulation_prevention_three_bytes)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(b):
        c = b[i]
        if zeros >= 2 and c == 3:
            zeros = 0
            i += 1
            continue
        out.append(c)
        zeros = zeros + 1 if c == 0 else 0
        i += 1
    return bytes(out)


def _add_emulation(b: bytes) -> bytes:
    """RBSP → NAL payload (insert 0x03 after 00 00 before 00/01/02/03)."""
    out = bytearray()
    zeros = 0
    for c in b:
        if zeros >= 2 and c <= 3:
            out.append(3)
            zeros = 0
        out.append(c)
        zeros = zeros + 1 if c == 0 else 0
    return bytes(out)


def iter_nals_annexb(b: bytes):
    """Yield NAL-unit byte strings (header byte included) from an
    Annex-B stream."""
    i = 0
    starts = []
    while i + 3 <= len(b):
        if b[i:i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else len(b)
        while e > s and b[e - 1] == 0:        # trailing_zero_8bits
            # keep zeros that belong to a 4-byte next start code only
            if k + 1 < len(starts) and e - 1 >= starts[k + 1] - 4:
                e -= 1
            else:
                break
        yield b[s:e]


def iter_nals_length_prefixed(b: bytes, length_size: int = 4):
    pos = 0
    while pos + length_size <= len(b):
        n = int.from_bytes(b[pos: pos + length_size], "big")
        pos += length_size
        yield b[pos: pos + n]
        pos += n


def is_annexb_h264(b: bytes) -> bool:
    return (b[:4] == b"\x00\x00\x00\x01" or b[:3] == b"\x00\x00\x01")


# ---------------------------------------------------------------------------
# parameter sets (§7.3.2)
# ---------------------------------------------------------------------------

_HIGH_PROFILES = (100, 110, 122, 244, 44, 83, 86, 118, 128,
                  138, 139, 134, 135)


def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)                                    # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    if profile in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)                            # separate_colour_plane
        r.ue()                                # bit_depth_luma_minus8
        r.ue()                                # bit_depth_chroma_minus8
        r.u(1)                                # qpprime bypass
        if r.u(1):                            # scaling matrices
            raise NotImplementedError(
                "H.264 SPS scaling lists not supported (high-profile "
                "stream; decode requires an external library)")
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
        log2_max_poc_lsb = 0
    else:
        log2_max_poc_lsb = 0
    r.ue()                                    # max_num_ref_frames
    r.u(1)                                    # gaps allowed
    mb_w = r.ue() + 1
    map_h = r.ue() + 1
    if mb_w > 1 << 13 or map_h > 1 << 13:     # beyond any H.264 level —
        raise ValueError("H.264: implausible SPS dimensions")  # garbage
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                                # mb_adaptive
    mb_h = map_h * (2 - frame_mbs_only)
    r.u(1)                                    # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):                                # frame_cropping
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # 4:2:0 crop units: x=2, y=2*(2-frame_mbs_only)
    cx = 2 if chroma_format_idc in (1, 2) else 1
    cy = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    return {
        "sps_id": sps_id, "profile": profile, "level": level,
        "chroma_format_idc": chroma_format_idc,
        "log2_max_frame_num": log2_max_frame_num, "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "mb_w": mb_w, "mb_h": mb_h, "frame_mbs_only": frame_mbs_only,
        "width": mb_w * 16 - cx * (crop_l + crop_r),
        "height": mb_h * 16 - cy * (crop_t + crop_b),
        "crop": (crop_l * cx, crop_r * cx, crop_t * cy, crop_b * cy),
    }


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    cabac = r.u(1)
    bottom_field_poc = r.u(1)
    if r.ue() != 0:                           # num_slice_groups_minus1
        raise NotImplementedError("H.264 slice groups (FMO) unsupported")
    r.ue()
    r.ue()                                    # num_ref_idx defaults
    r.u(1)                                    # weighted_pred
    r.u(2)                                    # weighted_bipred
    init_qp = r.se() + 26
    r.se()                                    # pic_init_qs
    r.se()                                    # chroma_qp_offset
    deblock_ctrl = r.u(1)
    r.u(1)                                    # constrained_intra
    r.u(1)                                    # redundant_pic_cnt
    return {"pps_id": pps_id, "sps_id": sps_id, "cabac": cabac,
            "bottom_field_poc": bottom_field_poc, "init_qp": init_qp,
            "deblock_ctrl": deblock_ctrl}


def probe_h264(b: bytes) -> dict:
    """Annex-B stream → {profile, level, width, height} from the first
    SPS (header-only; works for any profile without scaling lists)."""
    for nal in iter_nals_annexb(b):
        if nal and (nal[0] & 0x1F) == 7:
            sps = parse_sps(_strip_emulation(nal[1:]))
            return {k: sps[k] for k in ("profile", "level",
                                        "width", "height")}
    raise ValueError("H.264: no SPS NAL found")


# ---------------------------------------------------------------------------
# slice + I_PCM macroblock decode
# ---------------------------------------------------------------------------


def _decode_slice_ipcm(rbsp: bytes, sps: dict, pps: dict, idr: bool):
    """I-slice with all-I_PCM macroblocks → (Y, Cb, Cr) planes."""
    r = _BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    if slice_type % 5 != 2:                   # I slice (2 or 7)
        raise NotImplementedError(
            f"H.264 slice_type {slice_type} (P/B/SP/SI) requires inter "
            "prediction — external decoder needed")
    if pps["cabac"]:
        raise NotImplementedError(
            "H.264 CABAC entropy decoding not implemented")
    r.ue()                                    # pps id
    r.u(sps["log2_max_frame_num"])            # frame_num
    if idr:
        r.ue()                                # idr_pic_id
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    if idr:
        r.u(1)                                # no_output_of_prior_pics
        r.u(1)                                # long_term_reference
    r.se()                                    # slice_qp_delta
    if pps["deblock_ctrl"]:
        if r.ue() != 1:                       # disable_deblocking_idc
            r.se()
            r.se()
    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    if first_mb != 0:
        raise NotImplementedError("H.264 multi-slice pictures unsupported")
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    Cb = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    Cr = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    for mb in range(mb_w * mb_h):
        mb_type = r.ue()
        if mb_type != 25:                     # I_PCM
            raise NotImplementedError(
                f"H.264 predicted macroblock (I mb_type {mb_type}) needs "
                "CAVLC residual decoding + intra prediction — external "
                "decoder needed; this engine decodes I_PCM streams")
        r.byte_align()                        # pcm_alignment_zero_bit
        my, mx = (mb // mb_w) * 16, (mb % mb_w) * 16
        Y[my:my + 16, mx:mx + 16] = np.frombuffer(
            r.bytes_(256), np.uint8).reshape(16, 16)
        cy, cx = my // 2, mx // 2
        Cb[cy:cy + 8, cx:cx + 8] = np.frombuffer(
            r.bytes_(64), np.uint8).reshape(8, 8)
        Cr[cy:cy + 8, cx:cx + 8] = np.frombuffer(
            r.bytes_(64), np.uint8).reshape(8, 8)
    return Y, Cb, Cr


def _yuv_to_rgb(Y: np.ndarray, Cb: np.ndarray, Cr: np.ndarray,
                w: int, h: int) -> np.ndarray:
    """Full-range BT.601 4:2:0 → HxWx3 uint8 (chroma nearest-upsampled),
    cropped to (h, w)."""
    y = Y[:h, :w].astype(np.float32)
    cb = np.repeat(np.repeat(Cb, 2, 0), 2, 1)[:h, :w].astype(np.float32) \
        - 128.0
    cr = np.repeat(np.repeat(Cr, 2, 0), 2, 1)[:h, :w].astype(np.float32) \
        - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], -1) + 0.5, 0, 255).astype(np.uint8)


def _rgb_to_yuv(arr: np.ndarray):
    """HxWx3 uint8 → full-range BT.601 (Y, Cb, Cr) with 2×2-mean 4:2:0
    chroma. Dimensions must be even (the encoder pads first)."""
    f = arr.astype(np.float32)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = (f[..., 2] - y) * 0.564 + 128.0
    cr = (f[..., 0] - y) * 0.713 + 128.0

    def sub(c):
        return ((c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2]
                 + c[1::2, 1::2]) / 4.0)

    to8 = lambda x: np.clip(x + 0.5, 0, 255).astype(np.uint8)  # noqa: E731
    return to8(y), to8(sub(cb)), to8(sub(cr))


def decode_annexb(b: bytes) -> list[np.ndarray]:
    """Annex-B H.264 stream → list of HxWx3 RGB frames (I_PCM streams;
    predicted macroblocks raise naming the missing tool)."""
    sps_map: dict[int, dict] = {}
    pps_map: dict[int, dict] = {}
    frames: list[np.ndarray] = []
    for nal in iter_nals_annexb(b):
        if not nal:
            continue
        ntype = nal[0] & 0x1F
        rbsp = _strip_emulation(nal[1:])
        if ntype == 7:
            s = parse_sps(rbsp)
            sps_map[s["sps_id"]] = s
        elif ntype == 8:
            p = parse_pps(rbsp)
            pps_map[p["pps_id"]] = p
        elif ntype in (1, 5):
            if not sps_map or not pps_map:
                raise ValueError("H.264: slice before SPS/PPS")
            # single-SPS/PPS streams (ours) — take the active sets
            pps = next(iter(pps_map.values()))
            sps = sps_map[pps["sps_id"]]
            Y, Cb, Cr = _decode_slice_ipcm(rbsp, sps, pps, idr=(ntype == 5))
            frames.append(_yuv_to_rgb(Y, Cb, Cr,
                                      sps["width"], sps["height"]))
    if not frames:
        raise ValueError("H.264: no coded slices found")
    return frames


def decode_avcc(avcc: bytes, samples: list[bytes]) -> list[np.ndarray]:
    """avcC decoder configuration + length-prefixed samples → RGB frames
    (the MP4 route; mp4codec hands the stsd avcC box and mdat samples)."""
    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("avcC: bad configuration record")
    length_size = (avcc[4] & 0x3) + 1
    pos = 5
    n_sps = avcc[pos] & 0x1F
    pos += 1
    sps_map: dict[int, dict] = {}
    for _ in range(n_sps):
        ln = struct.unpack(">H", avcc[pos:pos + 2])[0]
        pos += 2
        s = parse_sps(_strip_emulation(avcc[pos + 1: pos + ln]))
        sps_map[s["sps_id"]] = s
        pos += ln
    n_pps = avcc[pos]
    pos += 1
    pps_map: dict[int, dict] = {}
    for _ in range(n_pps):
        ln = struct.unpack(">H", avcc[pos:pos + 2])[0]
        pos += 2
        p = parse_pps(_strip_emulation(avcc[pos + 1: pos + ln]))
        pps_map[p["pps_id"]] = p
        pos += ln
    frames = []
    for sample in samples:
        for nal in iter_nals_length_prefixed(sample, length_size):
            if not nal:
                continue
            ntype = nal[0] & 0x1F
            if ntype in (1, 5):
                pps = next(iter(pps_map.values()))
                sps = sps_map[pps["sps_id"]]
                Y, Cb, Cr = _decode_slice_ipcm(
                    _strip_emulation(nal[1:]), sps, pps, idr=(ntype == 5))
                frames.append(_yuv_to_rgb(Y, Cb, Cr,
                                          sps["width"], sps["height"]))
    return frames


# ---------------------------------------------------------------------------
# encoder (conforming I_PCM fixture writer)
# ---------------------------------------------------------------------------


def _sps_rbsp(w: int, h: int) -> bytes:
    mb_w = (w + 15) // 16
    mb_h = (h + 15) // 16
    bw = _BitWriter()
    bw.u(66, 8)                               # baseline profile
    bw.u(0xC0, 8)                             # constraint_set0+1, rest 0
    bw.u(20, 8)                               # level 2.0
    bw.ue(0)                                  # sps_id
    bw.ue(0)                                  # log2_max_frame_num_minus4
    bw.ue(2)                                  # poc_type 2 (no extra fields)
    bw.ue(1)                                  # max_num_ref_frames
    bw.u(0, 1)                                # gaps allowed
    bw.ue(mb_w - 1)
    bw.ue(mb_h - 1)
    bw.u(1, 1)                                # frame_mbs_only
    bw.u(0, 1)                                # direct_8x8_inference
    crop_r = (mb_w * 16 - w) // 2             # crop unit x = 2 (4:2:0)
    crop_b = (mb_h * 16 - h) // 2             # crop unit y = 2
    if crop_r or crop_b:
        bw.u(1, 1)
        bw.ue(0)
        bw.ue(crop_r)
        bw.ue(0)
        bw.ue(crop_b)
    else:
        bw.u(0, 1)
    bw.u(0, 1)                                # vui absent
    return bw.trailing()


def _pps_rbsp() -> bytes:
    bw = _BitWriter()
    bw.ue(0)                                  # pps_id
    bw.ue(0)                                  # sps_id
    bw.u(0, 1)                                # CAVLC
    bw.u(0, 1)                                # bottom_field_poc
    bw.ue(0)                                  # one slice group
    bw.ue(0)
    bw.ue(0)                                  # ref idx defaults
    bw.u(0, 1)                                # weighted_pred
    bw.u(0, 2)                                # weighted_bipred
    bw.se(0)                                  # pic_init_qp-26
    bw.se(0)                                  # pic_init_qs-26
    bw.se(0)                                  # chroma_qp_offset
    bw.u(1, 1)                                # deblocking control present
    bw.u(0, 1)                                # constrained_intra
    bw.u(0, 1)                                # redundant_pic_cnt
    return bw.trailing()


def _slice_rbsp(arr: np.ndarray, frame_num: int, idr: bool,
                idr_pic_id: int = 0) -> bytes:
    h, w = arr.shape[:2]
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    # pad to macroblock grid with edge replication (cropped on decode)
    pad = np.pad(arr, ((0, mb_h * 16 - h), (0, mb_w * 16 - w), (0, 0)),
                 mode="edge")
    Y, Cb, Cr = _rgb_to_yuv(pad)
    bw = _BitWriter()
    bw.ue(0)                                  # first_mb_in_slice
    bw.ue(7)                                  # slice_type I (all-I pic)
    bw.ue(0)                                  # pps_id
    bw.u(frame_num & 0xF, 4)                  # frame_num (log2=4)
    if idr:
        bw.ue(idr_pic_id)
        bw.u(0, 1)                            # no_output_of_prior_pics
        bw.u(0, 1)                            # long_term_reference
    bw.se(0)                                  # slice_qp_delta
    bw.ue(1)                                  # deblocking disabled
    for mb in range(mb_w * mb_h):
        bw.ue(25)                             # I_PCM
        bw.byte_align_zero()                  # pcm_alignment_zero_bit
        my, mx = (mb // mb_w) * 16, (mb % mb_w) * 16
        bw.bytes_(Y[my:my + 16, mx:mx + 16].tobytes())
        cy, cx = my // 2, mx // 2
        bw.bytes_(Cb[cy:cy + 8, cx:cx + 8].tobytes())
        bw.bytes_(Cr[cy:cy + 8, cx:cx + 8].tobytes())
    return bw.trailing()


def _nal(ntype: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return bytes([(ref_idc << 5) | ntype]) + _add_emulation(rbsp)


def encode_annexb(frames: list[np.ndarray]) -> bytes:
    """RGB frames (even dims) → conforming Annex-B H.264 stream of IDR
    pictures whose macroblocks are all I_PCM."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if w % 2 or h % 2:
        raise ValueError("H.264 4:2:0 needs even dimensions")
    sc = b"\x00\x00\x00\x01"
    out = [sc + _nal(7, _sps_rbsp(w, h)), sc + _nal(8, _pps_rbsp())]
    for i, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        # frame_num MUST be 0 on IDR pictures (§7.4.3); idr_pic_id
        # alternates so consecutive IDRs are distinguishable
        out.append(sc + _nal(5, _slice_rbsp(f, 0, idr=True,
                                            idr_pic_id=i & 1)))
    return b"".join(out)


def avcc_config(w: int, h: int) -> bytes:
    """avcC decoder-configuration record for the fixture SPS/PPS."""
    sps = _nal(7, _sps_rbsp(w, h))
    pps = _nal(8, _pps_rbsp())
    return (bytes([1, 66, 0xC0, 20, 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


def encode_samples(frames: list[np.ndarray]) -> list[bytes]:
    """Per-frame length-prefixed IDR samples for the MP4 route
    (frame_num pinned 0 on IDR per §7.4.3)."""
    out = []
    for i, f in enumerate(frames):
        nal = _nal(5, _slice_rbsp(f, 0, idr=True, idr_pic_id=i & 1))
        out.append(struct.pack(">I", len(nal)) + nal)
    return out
