"""H.264 intra-frame coding layer (ITU-T H.264 §8.3/§8.5/§9.2): CAVLC
entropy coding, the 4x4 integer transform pair with quantization, and the
full intra prediction mode set (9×4x4, 4×16x16, 4×chroma) for baseline
I-slices. Used by :mod:`h264codec` — the slice decoder for Intra_4x4 /
Intra_16x16 / I_PCM macroblocks and the conforming CAVLC fixture encoder.

Everything here is the public spec re-expressed in numpy; the transform /
quantization identities rely on the flat (weightScale=16) baseline
matrices, under which the spec's two-branch scaling collapses to
``c · V[qp%6] << (qp//6)`` exactly (the added rounding term vanishes
because 16·V is a multiple of the divisor).

Reference parity note: the reference (git-prov) stores media blobs
untouched; this layer backs the engine's multimodal FrameSample stages.

No deblocking filter is applied: the fixture encoder always writes
``disable_deblocking_filter_idc = 1`` so its streams reconstruct
pixel-exactly; foreign streams that enable the loop filter decode without
it (sharper block edges than a conforming decoder — documented
approximation)."""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# CAVLC code tables (§9.2, Tables 9-5 .. 9-10)
# ---------------------------------------------------------------------------
# coeff_token: [table][TotalCoeff][TrailingOnes] → (length, bits).
# Table index 0: 0<=nC<2, 1: 2<=nC<4, 2: 4<=nC<8 (nC>=8 is a 6-bit FLC,
# nC==-1 is the chroma-DC table below).

_CT_LEN = [
    [[1, 0, 0, 0], [6, 2, 0, 0], [8, 6, 3, 0], [9, 8, 7, 5],
     [10, 9, 8, 6], [11, 10, 9, 7], [13, 11, 10, 8], [13, 13, 11, 9],
     [13, 13, 13, 10], [14, 14, 13, 11], [14, 14, 14, 13],
     [15, 15, 14, 14], [15, 15, 15, 14], [16, 15, 15, 15],
     [16, 16, 16, 15], [16, 16, 16, 16], [16, 16, 16, 16]],
    [[2, 0, 0, 0], [6, 2, 0, 0], [6, 5, 3, 0], [7, 6, 6, 4],
     [8, 6, 6, 4], [8, 7, 7, 5], [9, 8, 8, 6], [11, 9, 9, 6],
     [11, 11, 11, 7], [12, 11, 11, 9], [12, 12, 12, 11],
     [12, 12, 12, 11], [13, 13, 13, 12], [13, 13, 13, 13],
     [13, 14, 13, 13], [14, 14, 14, 13], [14, 14, 14, 14]],
    [[4, 0, 0, 0], [6, 4, 0, 0], [6, 5, 4, 0], [6, 5, 5, 4],
     [7, 5, 5, 4], [7, 5, 5, 4], [7, 6, 5, 4], [7, 6, 6, 4],
     [8, 7, 7, 6], [8, 8, 7, 7], [9, 8, 8, 8], [9, 9, 8, 8],
     [9, 9, 9, 9], [10, 9, 9, 10], [10, 10, 10, 10],
     [10, 10, 10, 10], [10, 10, 10, 10]],
]

_CT_BITS = [
    [[1, 0, 0, 0], [5, 1, 0, 0], [7, 4, 1, 0], [7, 6, 5, 3],
     [7, 6, 5, 3], [7, 6, 5, 4], [15, 6, 5, 4], [11, 14, 5, 4],
     [8, 10, 13, 4], [15, 14, 9, 4], [11, 10, 13, 12],
     [15, 14, 9, 12], [11, 10, 13, 8], [15, 1, 9, 12],
     [11, 14, 13, 8], [7, 10, 9, 12], [4, 6, 5, 8]],
    [[3, 0, 0, 0], [11, 2, 0, 0], [7, 7, 3, 0], [7, 10, 9, 5],
     [7, 6, 5, 4], [4, 6, 5, 6], [7, 6, 5, 8], [15, 6, 5, 4],
     [11, 14, 13, 4], [15, 10, 9, 4], [11, 14, 13, 12],
     [8, 10, 9, 8], [15, 14, 13, 12], [11, 10, 9, 12],
     [7, 11, 6, 8], [9, 8, 10, 1], [7, 6, 5, 4]],
    [[15, 0, 0, 0], [15, 14, 0, 0], [11, 15, 13, 0], [8, 12, 14, 12],
     [15, 10, 11, 11], [11, 8, 9, 10], [9, 14, 13, 9], [8, 10, 9, 8],
     [15, 14, 13, 12], [11, 14, 10, 12], [15, 10, 13, 12],
     [11, 14, 9, 8], [8, 10, 13, 12], [13, 7, 9, 0],
     [9, 12, 11, 10], [5, 8, 7, 6], [1, 4, 3, 2]],
]

# chroma DC (nC == -1, 4:2:0): [TotalCoeff][TrailingOnes]
_CT_CHROMA_LEN = [[2, 0, 0, 0], [6, 1, 0, 0], [6, 6, 3, 0],
                  [6, 7, 7, 6], [6, 8, 8, 7]]
_CT_CHROMA_BITS = [[1, 0, 0, 0], [7, 1, 0, 0], [4, 6, 1, 0],
                   [3, 3, 2, 5], [2, 3, 2, 0]]

# total_zeros, 4x4 blocks (Tables 9-7/9-8): [TotalCoeff-1][total_zeros]
_TZ_LEN = [
    [1, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 9],
    [3, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 6, 6, 6, 6],
    [4, 3, 3, 3, 4, 4, 3, 3, 4, 5, 5, 6, 5, 6],
    [5, 3, 4, 4, 3, 3, 3, 4, 3, 4, 5, 5, 5],
    [4, 4, 4, 3, 3, 3, 3, 3, 4, 5, 4, 5],
    [6, 5, 3, 3, 3, 3, 3, 3, 4, 3, 6],
    [6, 5, 3, 3, 3, 2, 3, 4, 3, 6],
    [6, 4, 5, 3, 2, 2, 3, 3, 6],
    [6, 6, 4, 2, 2, 3, 2, 5],
    [5, 5, 3, 2, 2, 2, 4],
    [4, 4, 3, 3, 1, 3],
    [4, 4, 2, 1, 3],
    [3, 3, 1, 2],
    [2, 2, 1],
    [1, 1],
]
_TZ_BITS = [
    [1, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 1],
    [7, 6, 5, 4, 3, 5, 4, 3, 2, 3, 2, 3, 2, 1, 0],
    [5, 7, 6, 5, 4, 3, 4, 3, 2, 3, 2, 1, 1, 0],
    [3, 7, 5, 4, 6, 5, 4, 3, 3, 2, 2, 1, 0],
    [5, 4, 3, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 7, 6, 5, 4, 3, 2, 1, 1, 0],
    [1, 1, 5, 4, 3, 3, 2, 1, 1, 0],
    [1, 1, 1, 3, 3, 2, 2, 1, 0],
    [1, 0, 1, 3, 2, 1, 1, 1],
    [1, 0, 1, 3, 2, 1, 1],
    [0, 1, 1, 2, 1, 3],
    [0, 1, 1, 1, 1],
    [0, 1, 1, 1],
    [0, 1, 1],
    [0, 1],
]

# total_zeros, chroma DC 2x2 (Table 9-9a): [TotalCoeff-1][total_zeros]
_TZC_LEN = [[1, 2, 3, 3], [1, 2, 2], [1, 1]]
_TZC_BITS = [[1, 1, 1, 0], [1, 1, 0], [1, 0]]

# run_before (Table 9-10): [min(zerosLeft,7)-1][run_before]; zerosLeft>6
# continues 0001, 00001, ... for run 7..14.
_RB_LEN = [
    [1, 1],
    [1, 2, 2],
    [2, 2, 2, 2],
    [2, 2, 2, 3, 3],
    [2, 2, 3, 3, 3, 3],
    [2, 3, 3, 3, 3, 3, 3],
    [3, 3, 3, 3, 3, 3, 3, 4, 5, 6, 7, 8, 9, 10, 11],
]
_RB_BITS = [
    [1, 0],
    [1, 1, 0],
    [3, 2, 1, 0],
    [3, 2, 1, 1, 0],
    [3, 2, 3, 2, 1, 0],
    [3, 0, 1, 3, 2, 5, 4],
    [7, 6, 5, 4, 3, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1],
]


def _invert(len_tab, bits_tab):
    """(length, bits) table → {(length, bits): index-tuple} decode map."""
    out = {}
    for i, (lens, bits) in enumerate(zip(len_tab, bits_tab)):
        for j, (ln, bt) in enumerate(zip(lens, bits)):
            if ln:
                out[(ln, bt)] = (i, j)
    return out


_CT_DEC = [_invert(t, b) for t, b in zip(_CT_LEN, _CT_BITS)]
_CT_CHROMA_DEC = _invert(_CT_CHROMA_LEN, _CT_CHROMA_BITS)
# (0,0) entries carry length with index (0,0) — valid codes, keep them.
_TZ_DEC = [_invert([row], [brow]) for row, brow in zip(_TZ_LEN, _TZ_BITS)]
_TZC_DEC = [_invert([row], [brow]) for row, brow in zip(_TZC_LEN, _TZC_BITS)]
_RB_DEC = [_invert([row], [brow]) for row, brow in zip(_RB_LEN, _RB_BITS)]


def _read_vlc(r, dec: dict):
    """Prefix-decode against a {(length, bits): value} map (≤16 bits)."""
    v = 0
    for ln in range(1, 17):
        v = (v << 1) | r.u(1)
        hit = dec.get((ln, v))
        if hit is not None:
            return hit
    raise ValueError("H.264 CAVLC: invalid codeword")


def _ct_table_for(nC: int):
    if nC < 2:
        return 0
    if nC < 4:
        return 1
    return 2


def decode_coeff_token(r, nC: int):
    """→ (TotalCoeff, TrailingOnes)."""
    if nC == -1:
        tc, t1 = _read_vlc(r, _CT_CHROMA_DEC)
        return tc, t1
    if nC >= 8:
        v = r.u(6)
        if v == 3:
            return 0, 0
        return (v >> 2) + 1, v & 3
    tc, t1 = _read_vlc(r, _CT_DEC[_ct_table_for(nC)])
    return tc, t1


def encode_coeff_token(w, nC: int, tc: int, t1: int):
    if nC == -1:
        w.u(_CT_CHROMA_BITS[tc][t1], _CT_CHROMA_LEN[tc][t1])
    elif nC >= 8:
        w.u(3 if tc == 0 else (((tc - 1) << 2) | t1), 6)
    else:
        tbl = _ct_table_for(nC)
        w.u(_CT_BITS[tbl][tc][t1], _CT_LEN[tbl][tc][t1])


def decode_residual_block(r, nC: int, max_coeffs: int) -> np.ndarray:
    """CAVLC residual_block_cavlc (§9.2) → int32 array of ``max_coeffs``
    coefficient levels in scan order. ``nC == -1`` selects the chroma-DC
    table."""
    coeffs = np.zeros(max_coeffs, np.int32)
    tc, t1 = decode_coeff_token(r, nC)
    if tc == 0:
        return coeffs
    levels = []
    for _ in range(t1):
        levels.append(1 - 2 * r.u(1))
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("H.264 CAVLC: bad level_prefix")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        code = min(15, prefix) << suffix_len
        if size:
            code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    if tc < max_coeffs:
        if nC == -1:
            _, tz = _read_vlc(r, _TZC_DEC[tc - 1])
        else:
            _, tz = _read_vlc(r, _TZ_DEC[tc - 1])
    else:
        tz = 0
    runs = []
    zeros_left = tz
    for i in range(tc - 1):
        if zeros_left > 0:
            _, run = _read_vlc(r, _RB_DEC[min(zeros_left, 7) - 1])
        else:
            run = 0
        runs.append(run)
        zeros_left -= run
    runs.append(zeros_left)
    # levels[0] is the highest-frequency coefficient
    pos = -1
    for i in range(tc - 1, -1, -1):
        pos += runs[i] + 1
        coeffs[pos] = levels[i]
    return coeffs


def encode_residual_block(w, coeffs, nC: int, max_coeffs: int) -> int:
    """Inverse of :func:`decode_residual_block`; returns TotalCoeff (the
    caller records it as the CAVLC context of this block)."""
    coeffs = np.asarray(coeffs)
    nz = np.nonzero(coeffs[:max_coeffs])[0]
    tc = len(nz)
    if tc > max_coeffs:
        raise ValueError("too many coefficients")
    if tc == 0:
        encode_coeff_token(w, nC, 0, 0)
        return 0
    # levels from highest frequency downward
    levels = [int(coeffs[i]) for i in nz[::-1]]
    t1 = 0
    for v in levels[:3]:
        if abs(v) == 1:
            t1 += 1
        else:
            break
    encode_coeff_token(w, nC, tc, t1)
    for v in levels[:t1]:
        w.u(0 if v > 0 else 1, 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        v = levels[i]
        code = 2 * v - 2 if v > 0 else -2 * v - 1
        if i == t1 and t1 < 3:
            code -= 2
        if suffix_len == 0:
            if code < 14:
                w.u(1, code + 1)                     # code zeros + stop 1
            elif code < 30:
                w.u(1, 15)                           # prefix 14
                w.u(code - 14, 4)
            else:
                if code - 30 >= 4096:
                    raise ValueError("H.264 CAVLC: level too large")
                w.u(1, 16)                           # prefix 15
                w.u(code - 30, 12)
        else:
            if code < (15 << suffix_len):
                prefix = code >> suffix_len
                w.u(1, prefix + 1)
                w.u(code & ((1 << suffix_len) - 1), suffix_len)
            else:
                if code - (15 << suffix_len) >= 4096:
                    raise ValueError("H.264 CAVLC: level too large")
                w.u(1, 16)
                w.u(code - (15 << suffix_len), 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(v) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    tz = int(nz[-1]) + 1 - tc
    if tc < max_coeffs:
        if nC == -1:
            w.u(_TZC_BITS[tc - 1][tz], _TZC_LEN[tc - 1][tz])
        else:
            w.u(_TZ_BITS[tc - 1][tz], _TZ_LEN[tc - 1][tz])
    # runs, highest-frequency coefficient first
    zeros_left = tz
    positions = nz[::-1]
    for i in range(tc - 1):
        run = int(positions[i]) - int(positions[i + 1]) - 1
        if zeros_left > 0:
            zl = min(zeros_left, 7) - 1
            w.u(_RB_BITS[zl][run], _RB_LEN[zl][run])
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# transforms + quantization (§8.5)
# ---------------------------------------------------------------------------

# dequant table V[qp%6][pos-class]: class 0 = (0,0),(0,2),(2,0),(2,2);
# class 1 = (1,1),(1,3),(3,1),(3,3); class 2 = the rest.
_V = np.array([[10, 16, 13], [11, 18, 14], [13, 20, 16],
               [14, 23, 18], [16, 25, 20], [18, 29, 23]], np.int64)
# quant multipliers MF[qp%6][pos-class] (encoder side)
_MF = np.array([[13107, 5243, 8066], [11916, 4660, 7490],
                [10082, 4194, 6554], [9362, 3647, 5825],
                [8192, 3355, 5243], [7282, 2893, 4559]], np.int64)
_POS_CLASS = np.array([[0, 2, 0, 2], [2, 1, 2, 1],
                       [0, 2, 0, 2], [2, 1, 2, 1]], np.int64)

ZIGZAG = np.array([0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])

_CHROMA_QP = np.array(
    list(range(30)) + [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
                       37, 37, 37, 38, 38, 38, 39, 39, 39, 39], np.int64)

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], np.int64)
_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                [1, -1, -1, 1], [1, -1, 1, -1]], np.int64)


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    return int(_CHROMA_QP[np.clip(qp_y + offset, 0, 51)])


def forward4x4(block: np.ndarray) -> np.ndarray:
    return _CF @ block.astype(np.int64) @ _CF.T


def quant4x4(W: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3 if intra else (1 << qbits) // 6
    mf = _MF[qp % 6][_POS_CLASS]
    return (np.sign(W) * ((np.abs(W) * mf + f) >> qbits)).astype(np.int64)


def dequant4x4(Z: np.ndarray, qp: int) -> np.ndarray:
    # flat-matrix identity: d = Z * V[qp%6] << (qp//6), exact for all qp
    return (Z.astype(np.int64) * _V[qp % 6][_POS_CLASS]) << (qp // 6)


def inverse4x4(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 core transform; output needs (x + 32) >> 6."""
    d = d.astype(np.int64)

    def pass_(m):
        e0 = m[0] + m[2]
        e1 = m[0] - m[2]
        e2 = (m[1] >> 1) - m[3]
        e3 = m[1] + (m[3] >> 1)
        return np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])

    h = pass_(d)                      # columns (operate on rows of d^T)
    return pass_(h.T).T


def reconstruct4x4(pred: np.ndarray, d: np.ndarray) -> np.ndarray:
    r = (inverse4x4(d) + 32) >> 6
    return np.clip(pred.astype(np.int64) + r, 0, 255).astype(np.uint8)


def luma_dc_dequant(c: np.ndarray, qp: int) -> np.ndarray:
    """§8.5.10: inverse 4x4 Hadamard on the Intra_16x16 DC coefficients,
    then DC-specific scaling."""
    f = _H4 @ c.astype(np.int64) @ _H4
    ls = 16 * _V[qp % 6][0]
    if qp >= 36:
        return (f * ls) << (qp // 6 - 6)
    return (f * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6)


def luma_dc_quant(dc: np.ndarray, qp: int) -> np.ndarray:
    """Encoder DC path: forward Hadamard (with /2) then doubled-deadzone
    quantization (JM-style, conforming)."""
    f = (_H4 @ dc.astype(np.int64) @ _H4) // 2
    qbits = 15 + qp // 6
    r = (1 << qbits) // 3
    mf = _MF[qp % 6][0]
    return (np.sign(f) * ((np.abs(f) * mf + 2 * r) >> (qbits + 1))) \
        .astype(np.int64)


def chroma_dc_dequant(c: np.ndarray, qp_c: int) -> np.ndarray:
    """§8.5.11.2: 2x2 transform + scaling."""
    a = np.array([[1, 1], [1, -1]], np.int64)
    f = a @ c.astype(np.int64) @ a
    ls = 16 * _V[qp_c % 6][0]
    return ((f * ls) << (qp_c // 6)) >> 5


def chroma_dc_quant(dc: np.ndarray, qp_c: int) -> np.ndarray:
    a = np.array([[1, 1], [1, -1]], np.int64)
    f = a @ dc.astype(np.int64) @ a
    qbits = 15 + qp_c // 6
    r = (1 << qbits) // 3
    mf = _MF[qp_c % 6][0]
    return (np.sign(f) * ((np.abs(f) * mf + 2 * r) >> (qbits + 1))) \
        .astype(np.int64)


# ---------------------------------------------------------------------------
# intra prediction (§8.3)
# ---------------------------------------------------------------------------


def pred4x4(mode: int, left, top, topleft, avail_l: bool, avail_t: bool,
            avail_tl: bool) -> np.ndarray:
    """4x4 intra prediction (§8.3.1.2). ``left`` = 4 samples (top→down),
    ``top`` = 8 samples (left→right, above-right extended by the caller),
    ``topleft`` = corner sample. Availability must satisfy the mode's
    requirements (the caller/encoder only selects legal modes)."""
    P = np.zeros((4, 4), np.int64)
    l = np.asarray(left, np.int64) if left is not None else None
    t = np.asarray(top, np.int64) if top is not None else None
    c = int(topleft) if topleft is not None else 0
    if mode == 0:                                    # Vertical
        P[:] = t[:4][None, :]
    elif mode == 1:                                  # Horizontal
        P[:] = l[:, None]
    elif mode == 2:                                  # DC
        if avail_l and avail_t:
            P[:] = (int(l.sum()) + int(t[:4].sum()) + 4) >> 3
        elif avail_l:
            P[:] = (int(l.sum()) + 2) >> 2
        elif avail_t:
            P[:] = (int(t[:4].sum()) + 2) >> 2
        else:
            P[:] = 128
    elif mode == 3:                                  # Diagonal Down-Left
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    P[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    P[y, x] = (t[x + y] + 2 * t[x + y + 1]
                               + t[x + y + 2] + 2) >> 2
    elif mode == 4:                                  # Diagonal Down-Right
        for y in range(4):
            for x in range(4):
                if x > y:
                    P[y, x] = (t[x - y - 2] + 2 * t[x - y - 1]
                               + t[x - y] + 2) >> 2
                elif x < y:
                    P[y, x] = (l[y - x - 2] + 2 * l[y - x - 1]
                               + l[y - x] + 2) >> 2
                else:
                    P[y, x] = (t[0] + 2 * c + l[0] + 2) >> 2
    elif mode == 5:                                  # Vertical-Right
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    P[y, x] = (t[x - (y >> 1) - 1] + t[x - (y >> 1)]
                               + 1) >> 1
                elif z >= 0:
                    P[y, x] = (t[x - (y >> 1) - 2]
                               + 2 * t[x - (y >> 1) - 1]
                               + t[x - (y >> 1)] + 2) >> 2
                elif z == -1:
                    P[y, x] = (l[0] + 2 * c + t[0] + 2) >> 2
                else:
                    P[y, x] = (l[y - 1] + 2 * l[y - 2]
                               + (l[y - 3] if y - 3 >= 0 else c) + 2) >> 2
    elif mode == 6:                                  # Horizontal-Down
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    P[y, x] = (l[y - (x >> 1) - 1] + l[y - (x >> 1)]
                               + 1) >> 1
                elif z >= 0:
                    P[y, x] = (l[y - (x >> 1) - 2]
                               + 2 * l[y - (x >> 1) - 1]
                               + l[y - (x >> 1)] + 2) >> 2
                elif z == -1:
                    P[y, x] = (t[0] + 2 * c + l[0] + 2) >> 2
                else:
                    P[y, x] = (t[x - 1] + 2 * t[x - 2]
                               + (t[x - 3] if x - 3 >= 0 else c) + 2) >> 2
    elif mode == 7:                                  # Vertical-Left
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    P[y, x] = (t[x + (y >> 1)] + t[x + (y >> 1) + 1]
                               + 1) >> 1
                else:
                    P[y, x] = (t[x + (y >> 1)] + 2 * t[x + (y >> 1) + 1]
                               + t[x + (y >> 1) + 2] + 2) >> 2
    elif mode == 8:                                  # Horizontal-Up
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    P[y, x] = (l[y + (x >> 1)] + l[y + (x >> 1) + 1]
                               + 1) >> 1
                elif z < 5:
                    P[y, x] = (l[y + (x >> 1)] + 2 * l[y + (x >> 1) + 1]
                               + l[y + (x >> 1) + 2] + 2) >> 2
                elif z == 5:
                    P[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    P[y, x] = l[3]
    else:
        raise ValueError(f"bad intra 4x4 mode {mode}")
    return P


def mode4x4_requires(mode: int):
    """→ (needs_left, needs_top, needs_topleft)."""
    return {
        0: (False, True, False), 1: (True, False, False),
        2: (False, False, False), 3: (False, True, False),
        4: (True, True, True), 5: (True, True, True),
        6: (True, True, True), 7: (False, True, False),
        8: (True, False, False),
    }[mode]


def pred16x16(mode: int, left, top, topleft,
              avail_l: bool, avail_t: bool) -> np.ndarray:
    """16x16 luma intra prediction (§8.3.3). Modes: 0 V, 1 H, 2 DC,
    3 Plane."""
    P = np.zeros((16, 16), np.int64)
    l = np.asarray(left, np.int64) if left is not None else None
    t = np.asarray(top, np.int64) if top is not None else None
    if mode == 0:
        P[:] = t[None, :]
    elif mode == 1:
        P[:] = l[:, None]
    elif mode == 2:
        if avail_l and avail_t:
            P[:] = (int(l.sum()) + int(t.sum()) + 16) >> 5
        elif avail_l:
            P[:] = (int(l.sum()) + 8) >> 4
        elif avail_t:
            P[:] = (int(t.sum()) + 8) >> 4
        else:
            P[:] = 128
    elif mode == 3:
        c = int(topleft)
        th = np.concatenate([[c], t])                # p[-1, -1..15]
        lv = np.concatenate([[c], l])
        H = sum((x + 1) * (int(th[9 + x]) - int(th[7 - x]))
                for x in range(8))
        V = sum((y + 1) * (int(lv[9 + y]) - int(lv[7 - y]))
                for y in range(8))
        a = 16 * (int(l[15]) + int(t[15]))
        b = (5 * H + 32) >> 6
        cc = (5 * V + 32) >> 6
        ys, xs = np.mgrid[0:16, 0:16]
        P = np.clip((a + b * (xs - 7) + cc * (ys - 7) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"bad intra 16x16 mode {mode}")
    return P


def pred_chroma8x8(mode: int, left, top, topleft,
                   avail_l: bool, avail_t: bool) -> np.ndarray:
    """8x8 chroma intra prediction (§8.3.4). Modes: 0 DC, 1 H, 2 V,
    3 Plane."""
    P = np.zeros((8, 8), np.int64)
    l = np.asarray(left, np.int64) if left is not None else None
    t = np.asarray(top, np.int64) if top is not None else None
    if mode == 0:
        # per-4x4 DC with the §8.3.4.1 availability combinations
        def dc(ls, ts):
            if ls is not None and ts is not None:
                return (int(ls.sum()) + int(ts.sum()) + 4) >> 3
            if ls is not None:
                return (int(ls.sum()) + 2) >> 2
            if ts is not None:
                return (int(ts.sum()) + 2) >> 2
            return 128

        L0 = l[0:4] if avail_l else None
        L1 = l[4:8] if avail_l else None
        T0 = t[0:4] if avail_t else None
        T1 = t[4:8] if avail_t else None
        P[0:4, 0:4] = dc(L0, T0)
        P[0:4, 4:8] = dc(None, T1) if avail_t else dc(L0, None)
        P[4:8, 0:4] = dc(L1, None) if avail_l else dc(None, T0)
        P[4:8, 4:8] = dc(L1, T1)
    elif mode == 1:
        P[:] = l[:, None]
    elif mode == 2:
        P[:] = t[None, :]
    elif mode == 3:
        c = int(topleft)
        th = np.concatenate([[c], t])
        lv = np.concatenate([[c], l])
        H = sum((x + 1) * (int(th[5 + x]) - int(th[3 - x]))
                for x in range(4))
        V = sum((y + 1) * (int(lv[5 + y]) - int(lv[3 - y]))
                for y in range(4))
        a = 16 * (int(l[7]) + int(t[7]))
        b = (17 * H + 16) >> 5
        cc = (17 * V + 16) >> 5
        ys, xs = np.mgrid[0:8, 0:8]
        P = np.clip((a + b * (xs - 3) + cc * (ys - 3) + 16) >> 5, 0, 255)
    else:
        raise ValueError(f"bad chroma mode {mode}")
    return P


# CBP me(v) mapping, Table 9-4 (ChromaArrayType 1), intra column:
# codeNum → coded_block_pattern
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
             16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
             8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
CBP_INTRA_INV = {v: i for i, v in enumerate(CBP_INTRA)}


# luma 4x4 block index (z-scan) → (x4, y4) position within the MB
BLK4_POS = [(((k >> 2) & 1) * 2 + (k & 1),
             ((k >> 2) >> 1) * 2 + ((k >> 1) & 1)) for k in range(16)]
BLK4_IDX = {pos: k for k, pos in enumerate(BLK4_POS)}
