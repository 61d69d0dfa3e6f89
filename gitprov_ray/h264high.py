"""H.264 High-profile 8x8 intra tools (Rec. ITU-T H.264): Intra_8x8
luma prediction with reference-sample filtering (§8.3.2), the 8x8
integer transform pair (§8.5.12/8.5.13, normative inverse + the
published JM-style forward), position-classed 8x8 dequantization
(§8.5.9 weighting), the 8x8 zigzag scan (Table 8-8) with CAVLC's
4-way coefficient interleave, and a High-profile I-slice
decoder/encoder pair (transform_size_8x8_flag, mb_type 0).

Scope: Intra_8x8 in I slices under CAVLC — the shape x264's High
profile emits for intra frames. The transform/quant/prediction layers
are shared building blocks for a future inter/CABAC 8x8 extension
(the CABAC transform_size flag + category-5 residual contexts are the
remaining named stub there). Only the INVERSE transform and
dequantization are normative; the encoder's forward transform and
quantizer just need self-consistency, which the pixel-exact
encoder↔decoder round-trip tests pin.

Reference parity note: the reference (git-prov) stores media blobs
untouched; this module extends the engine's multimodal real-decode
family (multimodal.py FrameSample) to High-profile intra streams.
"""

from __future__ import annotations

import numpy as np

# 8x8 zigzag scan (Table 8-8 frame scan == the classic JPEG walk),
# generated to avoid transcription slips: flat index = 8*row + col
def _zigzag8() -> np.ndarray:
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - c, c) for c in rng]          # (row, col), row falls
        if s % 2 == 1:
            diag = diag[::-1]                     # odd sums: row rises
        out.extend(8 * r + c for r, c in diag)
    z = np.array(out, dtype=np.int64)
    assert len(set(z.tolist())) == 64
    return z


ZIGZAG8 = _zigzag8()

# §8.5.9 8x8 dequant weighting: six values per qp%6 row, spread over
# the position classes below
_V8 = np.array([
    [20, 18, 32, 19, 25, 24],
    [22, 19, 35, 21, 28, 26],
    [26, 23, 42, 24, 33, 31],
    [28, 25, 45, 26, 35, 33],
    [32, 28, 51, 30, 40, 38],
    [36, 32, 58, 34, 46, 43]], dtype=np.int64)


def _class8(i: int, j: int) -> int:
    if i % 4 == 0 and j % 4 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    if i % 4 == 2 and j % 4 == 2:
        return 2
    if (i % 4 == 0 and j % 2 == 1) or (i % 2 == 1 and j % 4 == 0):
        return 3
    if (i % 4 == 0 and j % 4 == 2) or (i % 4 == 2 and j % 4 == 0):
        return 4
    return 5


_CLASS8 = np.array([[_class8(i, j) for j in range(8)]
                    for i in range(8)], dtype=np.int64)
_M8 = _V8[:, _CLASS8.reshape(-1)].reshape(6, 8, 8)   # m[qp%6][i][j]


def dequant8x8(z: np.ndarray, qp: int) -> np.ndarray:
    """Position-weighted 8x8 scaling: d = z·m(qp%6)·2^(qp/6 − 2) with
    a rounded right shift below qp/6 == 2. The m weights are the
    published §8.5.9 values; the normalization EXPONENT is the one
    8x8 constant this offline sandbox could not cross-check against a
    reference decoder (module docstring) — chosen so the quantization
    step tracks the 4x4 path's gray-level progression (same class of
    documented risk as the CABAC context init; self-consistency and
    the step-size sanity test pin it)."""
    m = _M8[qp % 6]
    q6 = qp // 6
    w = z.astype(np.int64) * m
    if q6 >= 2:
        return w << (q6 - 2)
    return (w + (1 << (1 - q6))) >> (2 - q6)


# JM forward-quant multipliers per position class (the published
# companions of the _V8 dequant weights; encoder-side, informative —
# only self-consistency with the normative dequant/inverse matters)
_MF8 = np.array([
    [13107, 11428, 20972, 12222, 16777, 15481],
    [11916, 10826, 19174, 11058, 14980, 14290],
    [10082, 8943, 15978, 9675, 12710, 11985],
    [9362, 8228, 14913, 8931, 11984, 11259],
    [8192, 7346, 13159, 7740, 10486, 9777],
    [7282, 6428, 11570, 6830, 9118, 8640]], dtype=np.int64)
_MF8_POS = _MF8[:, _CLASS8.reshape(-1)].reshape(6, 8, 8)


def quant8x8(w: np.ndarray, qp: int, intra: bool = True) -> np.ndarray:
    """Quantizer matched to dequant8x8 over the derived forward: the
    reconstruction must satisfy z·m·2^(qp/6)/64 ≈ w, so the step per
    position is m·2^(qp/6)/64 (half-away rounding)."""
    m = _M8[qp % 6]
    step = m.astype(np.float64) * (2.0 ** (qp // 6)) / 4.0
    v = w.astype(np.float64) / step
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def _inv_basis_matrix() -> np.ndarray:
    """Exact linear 8-point matrix of the normative inverse butterfly
    (i1d with real halves instead of arithmetic shifts)."""
    M = np.zeros((8, 8))
    for i in range(8):
        x = np.zeros(8)
        x[i] = 1.0
        a0 = x[0] + x[4]
        a4 = x[0] - x[4]
        a2 = x[2] / 2 - x[6]
        a6 = x[2] + x[6] / 2
        b0 = a0 + a6
        b2 = a4 + a2
        b4 = a4 - a2
        b6 = a0 - a6
        a1 = -x[3] + x[5] - x[7] - x[7] / 2
        a3 = x[1] + x[7] - x[3] - x[3] / 2
        a5 = -x[1] + x[7] + x[5] + x[5] / 2
        a7 = x[3] + x[5] + x[1] + x[1] / 2
        b1 = a1 + a7 / 4
        b7 = a7 - a1 / 4
        b3 = a3 + a5 / 4
        b5 = a3 / 4 - a5
        M[:, i] = [b0 + b7, b2 + b5, b4 + b3, b6 + b1,
                   b6 - b1, b4 - b3, b2 - b5, b0 - b7]
    return M


_FWD8 = 8.0 * np.linalg.inv(_inv_basis_matrix())


def forward8x8(block: np.ndarray) -> np.ndarray:
    """Forward transform derived as the scaled exact inverse of the
    NORMATIVE inverse basis (per axis: 8·M⁻¹, so the 2D pair has the
    64× gain the >>6 output scaling undoes). The forward side is
    informative in the spec; deriving it from the normative basis
    guarantees the encode→decode loop needs no basis-norm fixups
    beyond the m/MF quantizer weighting."""
    w = _FWD8 @ block.astype(np.float64) @ _FWD8.T
    return (np.sign(w) * np.floor(np.abs(w) + 0.5)).astype(np.int64)


def inverse8x8(d: np.ndarray) -> np.ndarray:
    """§8.5.12.2 normative inverse butterfly (rows then columns), then
    the (e + 32) >> 6 output scaling."""

    def i1d(x):
        x = x.astype(np.int64)
        a0 = x[0] + x[4]
        a4 = x[0] - x[4]
        a2 = (x[2] >> 1) - x[6]
        a6 = x[2] + (x[6] >> 1)
        b0 = a0 + a6
        b2 = a4 + a2
        b4 = a4 - a2
        b6 = a0 - a6
        a1 = -x[3] + x[5] - x[7] - (x[7] >> 1)
        a3 = x[1] + x[7] - x[3] - (x[3] >> 1)
        a5 = -x[1] + x[7] + x[5] + (x[5] >> 1)
        a7 = x[3] + x[5] + x[1] + (x[1] >> 1)
        b1 = a1 + (a7 >> 2)
        b7 = a7 - (a1 >> 2)
        b3 = a3 + (a5 >> 2)
        b5 = (a3 >> 2) - a5
        y = np.empty_like(x)
        y[0] = b0 + b7
        y[1] = b2 + b5
        y[2] = b4 + b3
        y[3] = b6 + b1
        y[4] = b6 - b1
        y[5] = b4 - b3
        y[6] = b2 - b5
        y[7] = b0 - b7
        return y

    t = np.stack([i1d(row) for row in d.astype(np.int64)])
    e = np.stack([i1d(col) for col in t.T]).T
    return (e + 32) >> 6


def reconstruct8x8(pred: np.ndarray, d: np.ndarray) -> np.ndarray:
    return np.clip(pred.astype(np.int64) + inverse8x8(d),
                   0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Intra_8x8 prediction (§8.3.2) with reference filtering (§8.3.2.2.1)
# ---------------------------------------------------------------------------


def _filter_refs(left, top, corner, avail_l: bool, avail_t: bool):
    """Low-pass the reference samples: top row of 16 (top + top-right,
    padded by replication), left column of 8, and the corner."""
    ft = fl = fc = None
    if avail_t:
        t = top.astype(np.int64)
        ft = np.empty(16, np.int64)
        if avail_l and corner is not None:
            ft[0] = (corner + 2 * t[0] + t[1] + 2) >> 2
        else:
            ft[0] = (3 * t[0] + t[1] + 2) >> 2
        ft[1:15] = (t[0:14] + 2 * t[1:15] + t[2:16] + 2) >> 2
        ft[15] = (t[14] + 3 * t[15] + 2) >> 2
    if avail_l:
        lt = left.astype(np.int64)
        fl = np.empty(8, np.int64)
        if avail_t and corner is not None:
            fl[0] = (corner + 2 * lt[0] + lt[1] + 2) >> 2
        else:
            fl[0] = (3 * lt[0] + lt[1] + 2) >> 2
        fl[1:7] = (lt[0:6] + 2 * lt[1:7] + lt[2:8] + 2) >> 2
        fl[7] = (lt[6] + 3 * lt[7] + 2) >> 2
    if corner is not None:
        a = top[0] if avail_t else corner
        b = left[0] if avail_l else corner
        fc = (int(a) + 2 * int(corner) + int(b) + 2) >> 2
    return fl, ft, fc


def pred8x8(mode: int, left, top, corner, avail_l: bool,
            avail_t: bool) -> np.ndarray:
    """All nine Intra_8x8 modes over FILTERED references. ``top`` is
    the 16-sample top+topright row (caller pads top-right by
    replication when unavailable), ``left`` the 8-sample column."""
    fl, ft, fc = _filter_refs(left, top, corner, avail_l, avail_t)
    p = np.empty((8, 8), np.int64)
    xs = np.arange(8)
    if mode == 0:                             # Vertical
        p[:] = ft[None, :8]
    elif mode == 1:                           # Horizontal
        p[:] = fl[:, None]
    elif mode == 2:                           # DC
        if avail_l and avail_t:
            dc = (int(ft[:8].sum()) + int(fl.sum()) + 8) >> 4
        elif avail_t:
            dc = (int(ft[:8].sum()) + 4) >> 3
        elif avail_l:
            dc = (int(fl.sum()) + 4) >> 3
        else:
            dc = 128
        p[:] = dc
    elif mode == 3:                           # Diagonal down-left
        for y in range(8):
            for x in range(8):
                if x == 7 and y == 7:
                    p[y, x] = (ft[14] + 3 * ft[15] + 2) >> 2
                else:
                    k = x + y
                    p[y, x] = (ft[k] + 2 * ft[k + 1] + ft[k + 2]
                               + 2) >> 2
    elif mode == 4:                           # Diagonal down-right
        for y in range(8):
            for x in range(8):
                if x > y:
                    k = x - y - 2
                    p[y, x] = (ft[k] + 2 * ft[k + 1] + ft[k + 2]
                               + 2) >> 2 if k >= 0 else \
                        (fc + 2 * ft[0] + ft[1] + 2) >> 2
                elif x < y:
                    k = y - x - 2
                    p[y, x] = (fl[k] + 2 * fl[k + 1] + fl[k + 2]
                               + 2) >> 2 if k >= 0 else \
                        (fc + 2 * fl[0] + fl[1] + 2) >> 2
                else:
                    p[y, x] = (ft[0] + 2 * fc + fl[0] + 2) >> 2
    elif mode == 5:                           # Vertical right
        for y in range(8):
            for x in range(8):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    k = x - (y >> 1) - 1
                    a = ft[k] if k >= 0 else fc
                    p[y, x] = (a + ft[k + 1] + 1) >> 1
                elif z >= 0:
                    k = x - (y >> 1) - 2
                    a = ft[k] if k >= 0 else fc
                    b = ft[k + 1] if k + 1 >= 0 else fc
                    p[y, x] = (a + 2 * b + ft[k + 2] + 2) >> 2
                elif z == -1:
                    p[y, x] = (fl[0] + 2 * fc + ft[0] + 2) >> 2
                else:
                    k = y - 2 * x - 2
                    a = fl[k] if k >= 0 else fc
                    b = fl[k + 1] if k + 1 >= 0 else fc
                    c = fl[k + 2] if k + 2 >= 0 else fc
                    p[y, x] = (a + 2 * b + c + 2) >> 2
    elif mode == 6:                           # Horizontal down
        for y in range(8):
            for x in range(8):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    k = y - (x >> 1) - 1
                    a = fl[k] if k >= 0 else fc
                    p[y, x] = (a + fl[k + 1] + 1) >> 1
                elif z >= 0:
                    k = y - (x >> 1) - 2
                    a = fl[k] if k >= 0 else fc
                    b = fl[k + 1] if k + 1 >= 0 else fc
                    p[y, x] = (a + 2 * b + fl[k + 2] + 2) >> 2
                elif z == -1:
                    p[y, x] = (ft[0] + 2 * fc + fl[0] + 2) >> 2
                else:
                    k = x - 2 * y - 2
                    a = ft[k] if k >= 0 else fc
                    b = ft[k + 1] if k + 1 >= 0 else fc
                    c = ft[k + 2] if k + 2 >= 0 else fc
                    p[y, x] = (a + 2 * b + c + 2) >> 2
    elif mode == 7:                           # Vertical left
        for y in range(8):
            half = y >> 1
            if y % 2 == 0:
                p[y, xs] = (ft[xs + half] + ft[xs + half + 1] + 1) >> 1
            else:
                p[y, xs] = (ft[xs + half] + 2 * ft[xs + half + 1]
                            + ft[xs + half + 2] + 2) >> 2
    elif mode == 8:                           # Horizontal up
        for y in range(8):
            for x in range(8):
                z = x + 2 * y
                if z < 13 and z % 2 == 0:
                    k = y + (x >> 1)
                    p[y, x] = (fl[k] + fl[k + 1] + 1) >> 1
                elif z < 13:
                    k = y + (x >> 1)
                    p[y, x] = (fl[k] + 2 * fl[k + 1] + fl[k + 2]
                               + 2) >> 2
                elif z == 13:
                    p[y, x] = (fl[6] + 3 * fl[7] + 2) >> 2
                else:
                    p[y, x] = fl[7]
    else:
        raise ValueError(f"bad Intra_8x8 mode {mode}")
    return np.clip(p, 0, 255).astype(np.uint8)


def mode8x8_requires(mode: int):
    """(needs_left, needs_top) per mode — availability gate for the
    encoder's candidate set (mirrors hi.mode4x4_requires)."""
    return {0: (False, True), 1: (True, False), 2: (False, False),
            3: (False, True), 4: (True, True), 5: (True, True),
            6: (True, True), 7: (False, True), 8: (True, False)}[mode]


# ---------------------------------------------------------------------------
# Intra_8x8 macroblock layer (CAVLC I slices)
# ---------------------------------------------------------------------------


def _blk8_before(x8: int, y8: int, cx8: int, cy8: int, mb_w: int) -> bool:
    """Is 8x8-grid block (x8, y8) decoded before (cx8, cy8)? Decode
    order is MB raster with a 2x2 sub-raster inside each MB."""
    def key(x, y):
        return ((y // 2) * mb_w + (x // 2), (y % 2) * 2 + (x % 2))

    return key(x8, y8) < key(cx8, cy8)


def _luma8x8_refs(Y: np.ndarray, x8: int, y8: int, mb_w: int):
    """Reconstructed (left[8], top[16], corner, avail flags) for the
    8x8 block at 8x8-grid (x8, y8) — top-right replicated when the
    above-right block is not yet decoded (mirrors the 4x4 policy)."""
    px, py = x8 * 8, y8 * 8
    avail_l, avail_t = x8 > 0, y8 > 0
    avail_tl = avail_l and avail_t
    left = Y[py:py + 8, px - 1].astype(np.int64) if avail_l else None
    top = None
    if avail_t:
        t8 = Y[py - 1, px:px + 8].astype(np.int64)
        if (px + 8 < Y.shape[1]
                and _blk8_before(x8 + 1, y8 - 1, x8, y8, mb_w)):
            tr = Y[py - 1, px + 8:px + 16].astype(np.int64)
        else:
            tr = np.full(8, t8[7], np.int64)
        top = np.concatenate([t8, tr])
    corner = int(Y[py - 1, px - 1]) if avail_tl else None
    return left, top, corner, avail_l, avail_t, avail_tl


def _unzigzag64(levels: np.ndarray) -> np.ndarray:
    m = np.zeros(64, np.int64)
    m[ZIGZAG8] = levels
    return m.reshape(8, 8)


def decode_mb_i8x8(r, ctx, mbx: int, mby: int):
    """One Intra_8x8 macroblock (mb_type 0 + transform_size_8x8_flag)
    under CAVLC: four 8x8 luma predictions with mode prediction over
    the shared per-4x4 mode grid, CAVLC residuals as four interleaved
    4x4 scans per coded 8x8 (coefficient i of sub-block b sits at
    8x8-scan position 4i+b), chroma exactly as the 4x4 path."""
    from . import h264codec as H
    from . import h264intra as hi

    Y = ctx.Y
    ipm = ctx.ipm
    qp = ctx.qp
    mb_w = ctx.mb_w
    modes = []
    for k8 in range(4):
        bx = mbx * 4 + (k8 & 1) * 2
        by = mby * 4 + (k8 >> 1) * 2
        ma = int(ipm[by, bx - 1]) if bx > 0 else 2
        mb_ = int(ipm[by - 1, bx]) if by > 0 else 2
        pm = min(ma if ma >= 0 else 2, mb_ if mb_ >= 0 else 2)
        if r.u(1):                            # prev_intra8x8_pred_mode
            mode = pm
        else:
            rem = r.u(3)
            mode = rem if rem < pm else rem + 1
        modes.append(mode)
        ipm[by:by + 2, bx:bx + 2] = mode
    cmode = r.ue()
    cbp = hi.CBP_INTRA[r.ue()]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp:
        qp = (qp + r.se() + 52) % 52
    coeffs = [None] * 4
    for k8 in range(4):
        if not (cbp_luma & (1 << k8)):
            continue
        lv = np.zeros(64, np.int64)
        for sub in range(4):
            bx4 = mbx * 4 + (k8 & 1) * 2 + (sub & 1)
            by4 = mby * 4 + (k8 >> 1) * 2 + (sub >> 1)
            c = hi.decode_residual_block(
                r, H._nc_of(ctx.luma_nc, bx4, by4), 16)
            ctx.luma_nc[by4, bx4] = int(np.count_nonzero(c))
            lv[sub::4] = c
        coeffs[k8] = lv
    dc_cb = dc_cr = None
    ac_cb = [None] * 4
    ac_cr = [None] * 4
    if cbp_chroma:
        dc_cb = hi.decode_residual_block(r, -1, 4)
        dc_cr = hi.decode_residual_block(r, -1, 4)
    if cbp_chroma == 2:
        for grid, acc in ((ctx.cb_nc, ac_cb), (ctx.cr_nc, ac_cr)):
            for k in range(4):
                bx = mbx * 2 + (k & 1)
                by = mby * 2 + (k >> 1)
                c = hi.decode_residual_block(
                    r, H._nc_of(grid, bx, by), 15)
                grid[by, bx] = int(np.count_nonzero(c))
                acc[k] = c
    for k8 in range(4):
        x8 = mbx * 2 + (k8 & 1)
        y8 = mby * 2 + (k8 >> 1)
        refs = _luma8x8_refs(Y, x8, y8, mb_w)
        left, top, corner, al, at, _ = refs
        pred = pred8x8(modes[k8], left, top, corner, al, at)
        if coeffs[k8] is not None:
            d = dequant8x8(_unzigzag64(coeffs[k8]), qp)
            blk = reconstruct8x8(pred, d)
        else:
            blk = pred
        Y[y8 * 8:y8 * 8 + 8, x8 * 8:x8 * 8 + 8] = blk
    H._recon_chroma(ctx.Cb, ctx.Cr, mbx, mby, cmode, dc_cb, dc_cr,
                    ac_cb, ac_cr, hi.chroma_qp(qp, ctx.qpc_off),
                    mbx > 0, mby > 0)
    ctx.qp = qp
    ctx.mb_qp[mby, mbx] = qp
    ctx.mb_intra[mby, mbx] = True


def analyze_mb_i8x8(ctx, Ys, mbx: int, mby: int, qp: int):
    """SAD mode selection + transform/quant + reconstruction for one
    Intra_8x8 MB's luma → (modes, zs, cbp_luma); entropy-agnostic
    (shared by the CAVLC and CABAC writers)."""
    from . import h264codec as H

    Y = ctx.Y
    ipm = ctx.ipm
    mb_w = ctx.mb_w
    modes, zs = [], []
    cbp_luma = 0
    for k8 in range(4):
        x8 = mbx * 2 + (k8 & 1)
        y8 = mby * 2 + (k8 >> 1)
        refs = _luma8x8_refs(Y, x8, y8, mb_w)
        left, top, corner, al, at, atl = refs
        best = None
        for m in range(9):
            nl, nt = mode8x8_requires(m)
            if (nl and not al) or (nt and not at):
                continue
            if m in (4, 5, 6) and not atl:
                continue
            p = pred8x8(m, left, top, corner, al, at)
            src = Ys[y8 * 8:y8 * 8 + 8, x8 * 8:x8 * 8 + 8]
            s = H._sad(src, p)
            if best is None or s < best[0]:
                best = (s, m, p)
        _, m, p = best
        modes.append(m)
        bx = mbx * 4 + (k8 & 1) * 2
        by = mby * 4 + (k8 >> 1) * 2
        ipm[by:by + 2, bx:bx + 2] = m
        src = Ys[y8 * 8:y8 * 8 + 8, x8 * 8:x8 * 8 + 8]
        w = forward8x8(src.astype(np.int64) - p)
        z = quant8x8(w, qp)
        zs.append(z)
        if np.any(z):
            cbp_luma |= 1 << k8
            blk = reconstruct8x8(p, dequant8x8(z, qp))
        else:
            blk = p
        Y[y8 * 8:y8 * 8 + 8, x8 * 8:x8 * 8 + 8] = blk
    return modes, zs, cbp_luma


def encode_mb_i8x8(bw, ctx, Ys, mbx: int, mby: int, qp: int):
    """CAVLC writer over analyze_mb_i8x8; returns (modes, cbp_luma,
    write_modes, write_luma) — the slice writer interleaves chroma
    exactly like the 4x4 path."""
    from . import h264codec as H
    from . import h264intra as hi

    ipm = ctx.ipm
    modes, zs, cbp_luma = analyze_mb_i8x8(ctx, Ys, mbx, mby, qp)

    def write_modes(bw):
        # mode prediction must replay against the grid state the
        # DECODER sees; the analysis committed identical values, and
        # earlier blocks' cells are already final, so re-deriving pm
        # from the grid is exact
        for k8, m in enumerate(modes):
            bx = mbx * 4 + (k8 & 1) * 2
            by = mby * 4 + (k8 >> 1) * 2
            ma = int(ipm[by, bx - 1]) if bx > 0 else 2
            mb_ = int(ipm[by - 1, bx]) if by > 0 else 2
            pm = min(ma if ma >= 0 else 2, mb_ if mb_ >= 0 else 2)
            if m == pm:
                bw.u(1, 1)
            else:
                bw.u(0, 1)
                rem = m if m < pm else m - 1
                bw.u(rem, 3)

    def write_luma(bw):
        for k8 in range(4):
            if not (cbp_luma & (1 << k8)):
                continue
            lv = zs[k8].reshape(-1)[ZIGZAG8]
            for sub in range(4):
                bx4 = mbx * 4 + (k8 & 1) * 2 + (sub & 1)
                by4 = mby * 4 + (k8 >> 1) * 2 + (sub >> 1)
                tc = hi.encode_residual_block(
                    bw, lv[sub::4],
                    H._nc_of(ctx.luma_nc, bx4, by4), 16)
                ctx.luma_nc[by4, bx4] = tc

    return modes, cbp_luma, write_modes, write_luma


def encode_i_slice_high(arr: np.ndarray, qp: int, idr_pic_id: int = 0,
                        mix: bool = True):
    """One conforming-structure High-profile CAVLC IDR slice → (rbsp,
    recon RGB, recon planes): macroblocks cycle Intra_8x8 /
    Intra_16x16 / Intra_4x4 (``mix``; all-8x8 otherwise). The CABAC
    and inter 8x8 combinations remain named stubs."""
    from . import h264codec as H
    from . import h264intra as hi

    h, w0 = arr.shape[:2]
    mb_w, mb_h = (w0 + 15) // 16, (h + 15) // 16
    pad = np.pad(arr, ((0, mb_h * 16 - h), (0, mb_w * 16 - w0), (0, 0)),
                 mode="edge")
    Ys, Cbs, Crs = H._rgb_to_yuv(pad)
    sps = H.parse_sps(H._sps_rbsp(w0, h, high=True))
    pps = H.parse_pps(H._pps_rbsp(transform_8x8=True))
    ctx = H._PicCtx(sps, pps)
    ctx.qp = qp
    Yr, Cbr, Crr = ctx.Y, ctx.Cb, ctx.Cr
    qpc = hi.chroma_qp(qp, 0)

    bw = H._BitWriter()
    bw.ue(0)                                  # first_mb_in_slice
    bw.ue(7)                                  # slice_type I
    bw.ue(0)                                  # pps_id
    bw.u(0, 4)                                # frame_num (IDR)
    bw.ue(idr_pic_id)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.se(qp - 26)                            # slice_qp_delta
    bw.ue(1)                                  # deblocking disabled

    for mb in range(mb_w * mb_h):
        mby, mbx = mb // mb_w, mb % mb_w
        cy, cx = mby * 8, mbx * 8
        ctx.mb_intra[mby, mbx] = True
        cmode = H._chroma_mode_select(hi, Cbs, Cbr, Crs, Crr, mbx, mby)
        pred_cb, dcq_cb, Zcb = H._encode_chroma(
            hi, Cbs, Cbr, mbx, mby, cmode, qpc)
        pred_cr, dcq_cr, Zcr = H._encode_chroma(
            hi, Crs, Crr, mbx, mby, cmode, qpc)
        any_ac = any(np.any(z) for z in Zcb + Zcr)
        any_dc = np.any(dcq_cb) or np.any(dcq_cr)
        cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
        if cbp_chroma < 2:
            Zcb = [np.zeros((4, 4), np.int64)] * 4
            Zcr = [np.zeros((4, 4), np.int64)] * 4
        if cbp_chroma == 0:
            dcq_cb = np.zeros((2, 2), np.int64)
            dcq_cr = np.zeros((2, 2), np.int64)
        for pr, pred_c, dcq, Z in ((Cbr, pred_cb, dcq_cb, Zcb),
                                   (Crr, pred_cr, dcq_cr, Zcr)):
            dcC = hi.chroma_dc_dequant(dcq, qpc)
            for k in range(4):
                bx, by = k & 1, k >> 1
                d = hi.dequant4x4(Z[k], qpc)
                d[0, 0] = dcC[by, bx]
                py, px = cy + by * 4, cx + bx * 4
                pr[py:py + 4, px:px + 4] = hi.reconstruct4x4(
                    pred_c[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], d)

        def write_chroma():
            if cbp_chroma:
                for dcq in (dcq_cb, dcq_cr):
                    hi.encode_residual_block(bw, dcq.reshape(-1), -1, 4)
            if cbp_chroma == 2:
                for Z, grid in ((Zcb, ctx.cb_nc), (Zcr, ctx.cr_nc)):
                    for k in range(4):
                        bx = mbx * 2 + (k & 1)
                        by = mby * 2 + (k >> 1)
                        ac = Z[k].reshape(-1)[hi.ZIGZAG[1:]]
                        tc = hi.encode_residual_block(
                            bw, ac, H._nc_of(grid, bx, by), 15)
                        grid[by, bx] = tc

        kind = (mb % 3) if mix else 0
        if kind == 1:                         # Intra_16x16
            pm16, cbp_luma, write_luma = H._encode_mb_i16(
                hi, bw, Ys, Yr, mbx, mby, qp, ctx.luma_nc)
            mb_type = 1 + pm16 + 4 * cbp_chroma + 12 * (cbp_luma == 15)
            bw.ue(mb_type)
            bw.ue(cmode)
            bw.se(0)
            write_luma(bw)
            write_chroma()
            continue
        if kind == 2:                         # Intra_4x4 (flag 0)
            modes, Zs = [], []
            for k in range(16):
                x4, y4 = hi.BLK4_POS[k]
                bx, by = mbx * 4 + x4, mby * 4 + y4
                nbr = H._luma4x4_neighbors(Yr, bx, by, k, ctx.W4)
                left, top, corner, al, at, atl = nbr
                best = None
                for m in range(9):
                    nl, nt, ntl = hi.mode4x4_requires(m)
                    if (nl and not al) or (nt and not at) \
                            or (ntl and not atl):
                        continue
                    p = hi.pred4x4(m, *nbr)
                    src = Ys[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    sc = H._sad(src, p)
                    if best is None or sc < best[0]:
                        best = (sc, m, p)
                _, m, p = best
                modes.append(m)
                ctx.ipm[by, bx] = m
                src = Ys[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                z = hi.quant4x4(hi.forward4x4(
                    src.astype(np.int64) - p), qp)
                Zs.append(z)
                Yr[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                    hi.reconstruct4x4(p, hi.dequant4x4(z, qp))
            cbp_luma = 0
            for i8 in range(4):
                if any(np.any(Zs[4 * i8 + s]) for s in range(4)):
                    cbp_luma |= 1 << i8
            cbp = cbp_luma | (cbp_chroma << 4)
            bw.ue(0)                          # mb_type I_NxN
            bw.u(0, 1)                        # transform_size_8x8 = 0
            for k, m in enumerate(modes):
                x4, y4 = hi.BLK4_POS[k]
                bx, by = mbx * 4 + x4, mby * 4 + y4
                ma = int(ctx.ipm[by, bx - 1]) if bx > 0 else 2
                mb_ = int(ctx.ipm[by - 1, bx]) if by > 0 else 2
                pm = min(ma if ma >= 0 else 2, mb_ if mb_ >= 0 else 2)
                # NOTE: grid already holds this block's mode; pm uses
                # only earlier neighbors, so the replay is exact
                if m == pm:
                    bw.u(1, 1)
                else:
                    bw.u(0, 1)
                    rem = m if m < pm else m - 1
                    bw.u(rem, 3)
            bw.ue(cmode)
            bw.ue(hi.CBP_INTRA_INV[cbp])
            if cbp:
                bw.se(0)
            for i8 in range(4):
                if not (cbp_luma & (1 << i8)):
                    continue
                for sub in range(4):
                    k = 4 * i8 + sub
                    x4, y4 = hi.BLK4_POS[k]
                    bx, by = mbx * 4 + x4, mby * 4 + y4
                    lv = Zs[k].reshape(-1)[hi.ZIGZAG]
                    tc = hi.encode_residual_block(
                        bw, lv, H._nc_of(ctx.luma_nc, bx, by), 16)
                    ctx.luma_nc[by, bx] = tc
            write_chroma()
            continue
        # Intra_8x8
        modes, cbp_luma, write_modes, write_luma = encode_mb_i8x8(
            bw, ctx, Ys, mbx, mby, qp)
        cbp = cbp_luma | (cbp_chroma << 4)
        bw.ue(0)                              # mb_type I_NxN
        bw.u(1, 1)                            # transform_size_8x8 = 1
        write_modes(bw)
        bw.ue(cmode)
        bw.ue(hi.CBP_INTRA_INV[cbp])
        if cbp:
            bw.se(0)
        write_luma(bw)
        write_chroma()

    rbsp = bw.trailing()
    recon = H._yuv_to_rgb(Yr, Cbr, Crr, w0, h)
    return rbsp, recon, (Yr, Cbr, Crr)


def encode_gop_high(frames: list, qp: int = 26, mix: bool = True):
    """RGB frames → (Annex-B all-IDR High-profile stream with
    transform_8x8, reconstructions)."""
    from . import h264codec as H

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if w % 2 or h % 2:
        raise ValueError("H.264 4:2:0 needs even dimensions")
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, H._sps_rbsp(w, h, high=True)),
           sc + H._nal(8, H._pps_rbsp(transform_8x8=True))]
    recons = []
    for i, f in enumerate(frames):
        rbsp, recon, _ = encode_i_slice_high(f, qp, idr_pic_id=i & 1,
                                             mix=mix)
        out.append(sc + H._nal(5, rbsp))
        recons.append(recon)
    return b"".join(out), recons


def encode_gop_high_p(frames: list, qp: int = 26, gop: int = 8,
                      partition_cycle: bool = False):
    """RGB frames → (Annex-B High-profile IDR+P stream where BOTH the
    intra slices (Intra_8x8 cycle) and the inter residuals use the 8x8
    transform, reconstructions)."""
    from . import h264codec as H
    from . import h264inter as HI

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if w % 2 or h % 2:
        raise ValueError("H.264 4:2:0 needs even dimensions")
    sps_r = H._sps_rbsp(w, h, high=True)
    pps_r = H._pps_rbsp(transform_8x8=True)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, sps_r), sc + H._nal(8, pps_r)]
    recons = []
    refs: list = []
    frame_num = 0
    poc_state: dict = {}
    for i, f in enumerate(frames):
        if i % gop == 0:
            poc = H._poc_of(sps, 0, nonref=False, idr=True,
                            poc_state=poc_state)
            rbsp, recon, planes = encode_i_slice_high(
                f, qp, idr_pic_id=i & 1)
            out.append(sc + H._nal(5, rbsp))
            refs = [HI._enc_ref(planes, poc=poc)]
            frame_num = 1
        else:
            poc = H._poc_of(sps, frame_num, nonref=False, idr=False,
                            poc_state=poc_state)
            rbsp, ref, recon = HI.encode_p_slice(
                f, refs, qp, frame_num, sps, pps,
                partition_cycle=partition_cycle, poc=poc, t8=True)
            out.append(sc + H._nal(1, rbsp, ref_idc=2))
            refs = [ref]
            frame_num = (frame_num + 1) & 0xF
        recons.append(recon)
    return b"".join(out), recons
