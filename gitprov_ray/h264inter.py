"""H.264 P-slice (inter prediction) decode + fixture encoder, CAVLC.

Extends the intra codec (h264codec/h264intra) with the published inter
layers of ITU-T H.264 / ISO 14496-10:

  * **Motion vector prediction** (§8.4.1.3): median of the A/B/C(/D)
    neighboring 4x4 motion data with the directional 16x8/8x16
    shortcuts, the A-only edge rule, the unique-matching-refIdx rule,
    and the C→D substitution driven by the SAME decoded-before-order
    availability logic the intra predictor uses (h264codec._blk_before);
    **P_Skip** motion (§8.4.1.1: zero-mv shortcut when A/B missing or
    stationary with refIdx 0).
  * **Quarter-pel luma interpolation** (§8.4.2.2.1): the 6-tap
    (1,-5,20,20,-5,1) half-pel filter with the un-normalized
    intermediate path for the center j sample, quarter positions as
    spec-exact pairwise averages; **eighth-pel chroma bilinear**
    (§8.4.2.2.2). Unrestricted MVs via edge-clamped sample fetch.
  * **P macroblock/sub-macroblock types** (§7.3.5.1/.2, Tables 7-13/
    7-17): P_L0_16x16, 16x8, 8x16, P_8x8(ref0) with 8x8/8x4/4x8/4x4
    sub-partitions, mb_skip_run runs, te(v) ref_idx, CAVLC residuals
    through the shared h264intra entropy layer, the INTER column of
    the Table 9-4 coded_block_pattern mapping, and intra MBs inside P
    slices (mb_type − 5 → h264codec._decode_mb_intra).

The fixture encoder writes conforming P slices (IDR + P GOPs) whose
motion comes from a real diamond search over the engine's own
interpolators, with per-MB partition selection, P_Skip emission, and
optional forced partition cycling so every decode path is exercised;
reconstruction is pinned pixel-exact against the decoder by tests.

Declared stubs kept honest: B slices, CABAC, weighted prediction,
MMCO/list modification, constrained_intra_pred in P slices, multi-slice
pictures — each raises NotImplementedError naming the tool. The in-loop
deblocking filter is not applied (fixtures disable it).

Reference parity note: the reference (git-prov) stores media blobs
untouched; this module extends the engine's multimodal real-decode
family so FrameSample handles predicted-MB MP4 video.
"""

from __future__ import annotations

import numpy as np

# Table 9-4 coded_block_pattern me(v), INTER column (codeNum → cbp).
CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
             14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45,
             46, 17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22,
             25, 38, 41]
assert sorted(CBP_INTER) == list(range(48))
CBP_INTER_INV = {v: i for i, v in enumerate(CBP_INTER)}

# P macroblock partition layouts in 4x4-block units: (x4, y4, w4, h4)
_P_PARTS = {0: [(0, 0, 4, 4)],
            1: [(0, 0, 4, 2), (0, 2, 4, 2)],          # P_L0_L0_16x8
            2: [(0, 0, 2, 4), (2, 0, 2, 4)]}          # P_L0_L0_8x16
# sub_mb_type → sub-partitions within one 8x8, in decode order
_SUB_PARTS = {0: [(0, 0, 2, 2)],
              1: [(0, 0, 2, 1), (0, 1, 2, 1)],        # 8x4
              2: [(0, 0, 1, 2), (1, 0, 1, 2)],        # 4x8
              3: [(0, 0, 1, 1), (1, 0, 1, 1),
                  (0, 1, 1, 1), (1, 1, 1, 1)]}        # 4x4


# ---------------------------------------------------------------------------
# motion vector prediction (§8.4.1.3)
# ---------------------------------------------------------------------------

def _mv_info(ctx, nbx: int, nby: int, bx: int, by: int, k: int):
    """(available, refIdx, mvx, mvy) of the 4x4 block at (nbx, nby) as
    seen from the partition whose top-left block is (bx, by) with
    z-index k. Outside-picture / not-yet-decoded → unavailable; intra
    blocks are available with refIdx −1 and mv (0,0) (§8.4.1.3.2)."""
    from .h264codec import _blk_before

    if nbx < 0 or nby < 0 or nbx >= ctx.W4 or nby >= ctx.mb_h * 4:
        return (False, -1, 0, 0)
    if not _blk_before(nbx, nby, bx, by, k):
        return (False, -1, 0, 0)
    return (True, int(ctx.refidx[nby, nbx]),
            int(ctx.mvx[nby, nbx]), int(ctx.mvy[nby, nbx]))


def _median3(a: int, b: int, c: int) -> int:
    return a + b + c - min(a, b, c) - max(a, b, c)


def mvp_for(ctx, bx: int, by: int, w4: int, h4: int, refidx: int,
            shape: str = "", part: int = 0):
    """Motion vector predictor for the partition with top-left 4x4 block
    (bx, by), size (w4, h4) blocks, predicting from refIdx. ``shape``/
    ``part`` trigger the MB-level 16x8/8x16 directional shortcuts."""
    from .h264intra import BLK4_IDX

    k = BLK4_IDX[(bx % 4, by % 4)]
    a = _mv_info(ctx, bx - 1, by, bx, by, k)
    b = _mv_info(ctx, bx, by - 1, bx, by, k)
    c = _mv_info(ctx, bx + w4, by - 1, bx, by, k)
    if not c[0]:
        c = _mv_info(ctx, bx - 1, by - 1, bx, by, k)   # D substitution
    if shape == "16x8":
        if part == 0 and b[1] == refidx:
            return (b[2], b[3])
        if part == 1 and a[1] == refidx:
            return (a[2], a[3])
    elif shape == "8x16":
        if part == 0 and a[1] == refidx:
            return (a[2], a[3])
        if part == 1 and c[1] == refidx:
            return (c[2], c[3])
    matches = [n for n in (a, b, c) if n[1] == refidx]
    if len(matches) == 1:
        return (matches[0][2], matches[0][3])
    if not b[0] and not c[0] and a[0]:
        return (a[2], a[3])
    return (_median3(a[2], b[2], c[2]), _median3(a[3], b[3], c[3]))


def skip_mv(ctx, bx: int, by: int):
    """P_Skip motion (§8.4.1.1): (0,0) when the left/top neighbor is
    missing or is a stationary refIdx-0 block; else the 16x16 MVP."""
    from .h264intra import BLK4_IDX

    k = BLK4_IDX[(bx % 4, by % 4)]
    a = _mv_info(ctx, bx - 1, by, bx, by, k)
    b = _mv_info(ctx, bx, by - 1, bx, by, k)
    if not a[0] or not b[0]:
        return (0, 0)
    if a[1] == 0 and a[2] == 0 and a[3] == 0:
        return (0, 0)
    if b[1] == 0 and b[2] == 0 and b[3] == 0:
        return (0, 0)
    return mvp_for(ctx, bx, by, 4, 4, 0)


# ---------------------------------------------------------------------------
# fractional-sample interpolation (§8.4.2.2)
# ---------------------------------------------------------------------------

def _tap6_h(a: np.ndarray) -> np.ndarray:
    return (a[:, :-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
            + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])


def _tap6_v(a: np.ndarray) -> np.ndarray:
    return (a[:-5] - 5 * a[1:-4] + 20 * a[2:-3]
            + 20 * a[3:-2] - 5 * a[4:-1] + a[5:])


def mc_luma(ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int,
            w: int, h: int) -> np.ndarray:
    """Quarter-pel luma motion compensation of the w×h block at (x0,y0)
    displaced by (mvx,mvy) quarter-pel units. Edge-clamped fetch gives
    unrestricted-MV behavior."""
    H, W = ref.shape
    xi = x0 + (mvx >> 2)
    yi = y0 + (mvy >> 2)
    fx, fy = mvx & 3, mvy & 3
    ys = np.clip(np.arange(yi - 2, yi + h + 4), 0, H - 1)
    xs = np.clip(np.arange(xi - 2, xi + w + 4), 0, W - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int32)        # (h+6, w+6)
    if fx == 0 and fy == 0:
        return win[2:2 + h, 2:2 + w].astype(np.uint8)

    def clip8(a):
        return np.clip(a, 0, 255)

    G = win[2:2 + h + 1, 2:2 + w + 1]
    b1 = _tap6_h(win)                                  # (h+6, w+1) unnorm
    bb = clip8((b1[2:2 + h + 1] + 16) >> 5)            # half-horizontal
    hh = clip8((_tap6_v(win)[:, 2:2 + w + 1] + 16) >> 5)   # half-vertical
    jj = clip8((_tap6_v(b1) + 512) >> 10)              # center

    def sel(arr, dx, dy):
        return arr[dy:dy + h, dx:dx + w]

    def avg(p, q):
        return (p + q + 1) >> 1

    table = {
        (1, 0): lambda: avg(sel(G, 0, 0), sel(bb, 0, 0)),
        (2, 0): lambda: sel(bb, 0, 0),
        (3, 0): lambda: avg(sel(bb, 0, 0), sel(G, 1, 0)),
        (0, 1): lambda: avg(sel(G, 0, 0), sel(hh, 0, 0)),
        (0, 2): lambda: sel(hh, 0, 0),
        (0, 3): lambda: avg(sel(hh, 0, 0), sel(G, 0, 1)),
        (1, 1): lambda: avg(sel(bb, 0, 0), sel(hh, 0, 0)),
        (3, 1): lambda: avg(sel(bb, 0, 0), sel(hh, 1, 0)),
        (1, 3): lambda: avg(sel(hh, 0, 0), sel(bb, 0, 1)),
        (3, 3): lambda: avg(sel(hh, 1, 0), sel(bb, 0, 1)),
        (2, 1): lambda: avg(sel(bb, 0, 0), sel(jj, 0, 0)),
        (2, 3): lambda: avg(sel(jj, 0, 0), sel(bb, 0, 1)),
        (1, 2): lambda: avg(sel(hh, 0, 0), sel(jj, 0, 0)),
        (3, 2): lambda: avg(sel(jj, 0, 0), sel(hh, 1, 0)),
        (2, 2): lambda: sel(jj, 0, 0),
    }
    return table[(fx, fy)]().astype(np.uint8)


def mc_chroma(ref: np.ndarray, x0: int, y0: int, mvx: int, mvy: int,
              w: int, h: int) -> np.ndarray:
    """Eighth-pel bilinear chroma MC (§8.4.2.2.2); mv in LUMA
    quarter-pel units (chroma resolution halves them to eighth-pel)."""
    H, W = ref.shape
    xi = x0 + (mvx >> 3)
    yi = y0 + (mvy >> 3)
    dx, dy = mvx & 7, mvy & 7
    ys = np.clip(np.arange(yi, yi + h + 1), 0, H - 1)
    xs = np.clip(np.arange(xi, xi + w + 1), 0, W - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int32)
    out = ((8 - dx) * (8 - dy) * win[:h, :w]
           + dx * (8 - dy) * win[:h, 1:]
           + (8 - dx) * dy * win[1:, :w]
           + dx * dy * win[1:, 1:] + 32) >> 6
    return out.astype(np.uint8)


def _te(r, cmax: int) -> int:
    """te(v) truncated Exp-Golomb (§9.1.1)."""
    if cmax == 0:
        return 0
    if cmax == 1:
        return 1 - r.u(1)
    return r.ue()


# ---------------------------------------------------------------------------
# P-slice decoder
# ---------------------------------------------------------------------------

def _apply_parts(ctx, refs, mbx: int, mby: int, parts, pred_y, pred_cb,
                 pred_cr):
    """Motion-compensate each (x4, y4, w4, h4, refidx, mvx, mvy)
    partition into the MB-local prediction buffers and commit its
    motion to the per-4x4 grids (later partitions predict from it)."""
    for x4, y4, w4, h4, ri, mvx, mvy in parts:
        if ri >= len(refs):
            raise ValueError(
                f"H.264: ref_idx {ri} but only {len(refs)} reference "
                "frames decoded")
        ry, rcb, rcr = refs[ri]
        px, py = mbx * 16 + x4 * 4, mby * 16 + y4 * 4
        pred_y[y4 * 4:(y4 + h4) * 4, x4 * 4:(x4 + w4) * 4] = \
            mc_luma(ry, px, py, mvx, mvy, w4 * 4, h4 * 4)
        cx, cy = mbx * 8 + x4 * 2, mby * 8 + y4 * 2
        pred_cb[y4 * 2:(y4 + h4) * 2, x4 * 2:(x4 + w4) * 2] = \
            mc_chroma(rcb, cx, cy, mvx, mvy, w4 * 2, h4 * 2)
        pred_cr[y4 * 2:(y4 + h4) * 2, x4 * 2:(x4 + w4) * 2] = \
            mc_chroma(rcr, cx, cy, mvx, mvy, w4 * 2, h4 * 2)
        bx, by = mbx * 4 + x4, mby * 4 + y4
        ctx.mvx[by:by + h4, bx:bx + w4] = mvx
        ctx.mvy[by:by + h4, bx:bx + w4] = mvy
        ctx.refidx[by:by + h4, bx:bx + w4] = ri


def _store_mb(ctx, mbx: int, mby: int, pred_y, pred_cb, pred_cr):
    my, mx = mby * 16, mbx * 16
    ctx.Y[my:my + 16, mx:mx + 16] = pred_y
    cy, cx = mby * 8, mbx * 8
    ctx.Cb[cy:cy + 8, cx:cx + 8] = pred_cb
    ctx.Cr[cy:cy + 8, cx:cx + 8] = pred_cr


def _parse_motion(ctx, r, mb_type: int, mbx: int, mby: int, num_ref: int):
    """mb_pred / sub_mb_pred syntax (§7.3.5.1/.2) → resolved partition
    list [(x4, y4, w4, h4, refidx, mvx, mvy)] in decode order. Motion
    grids must be committed per partition BY THE CALLER via
    _apply_parts — but MVP depends on earlier partitions, so this
    resolves mvp incrementally, committing to the grids itself."""
    bx0, by0 = mbx * 4, mby * 4
    out = []
    if mb_type in _P_PARTS:
        geo = _P_PARTS[mb_type]
        shape = {0: "", 1: "16x8", 2: "8x16"}[mb_type]
        refs_i = [_te(r, num_ref - 1) for _ in geo]
        for part, ((x4, y4, w4, h4), ri) in enumerate(zip(geo, refs_i)):
            mvdx, mvdy = r.se(), r.se()
            px, py = bx0 + x4, by0 + y4
            mpx, mpy = mvp_for(ctx, px, py, w4, h4, ri, shape, part)
            mvx, mvy = mpx + mvdx, mpy + mvdy
            ctx.mvx[py:py + h4, px:px + w4] = mvx
            ctx.mvy[py:py + h4, px:px + w4] = mvy
            ctx.refidx[py:py + h4, px:px + w4] = ri
            out.append((x4, y4, w4, h4, ri, mvx, mvy))
        return out
    # P_8x8 (3) / P_8x8ref0 (4)
    subs = [r.ue() for _ in range(4)]
    for s in subs:
        if s > 3:
            raise ValueError(f"H.264: invalid P sub_mb_type {s}")
    if mb_type == 3:
        refs_i = [_te(r, num_ref - 1) for _ in range(4)]
    else:
        refs_i = [0, 0, 0, 0]
    for i8 in range(4):
        ox, oy = (i8 & 1) * 2, (i8 >> 1) * 2
        ri = refs_i[i8]
        for x4, y4, w4, h4 in _SUB_PARTS[subs[i8]]:
            mvdx, mvdy = r.se(), r.se()
            px, py = bx0 + ox + x4, by0 + oy + y4
            mpx, mpy = mvp_for(ctx, px, py, w4, h4, ri)
            mvx, mvy = mpx + mvdx, mpy + mvdy
            ctx.mvx[py:py + h4, px:px + w4] = mvx
            ctx.mvy[py:py + h4, px:px + w4] = mvy
            ctx.refidx[py:py + h4, px:px + w4] = ri
            out.append((ox + x4, oy + y4, w4, h4, ri, mvx, mvy))
    return out


def _decode_residual_inter(ctx, r, mbx: int, mby: int, pred_y, pred_cb,
                           pred_cr):
    """coded_block_pattern (inter me(v)) + CAVLC residuals on top of the
    motion-compensated prediction; reconstruct into the picture."""
    from . import h264intra as hi
    from .h264codec import _nc_of, _unzigzag15, _unzigzag16

    cbp = CBP_INTER[r.ue()]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp:
        ctx.qp = (ctx.qp + r.se() + 52) % 52
    qp = ctx.qp
    my, mx = mby * 16, mbx * 16
    Yout = ctx.Y[my:my + 16, mx:mx + 16]
    Yout[:] = pred_y
    for i8 in range(4):
        if not (cbp_luma & (1 << i8)):
            continue
        for sub in range(4):
            k = 4 * i8 + sub
            x4, y4 = hi.BLK4_POS[k]
            bx, by = mbx * 4 + x4, mby * 4 + y4
            c = hi.decode_residual_block(
                r, _nc_of(ctx.luma_nc, bx, by), 16)
            ctx.luma_nc[by, bx] = int(np.count_nonzero(c))
            d = hi.dequant4x4(_unzigzag16(c), qp)
            Yout[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4] = \
                hi.reconstruct4x4(
                    pred_y[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4], d)
    qpc = hi.chroma_qp(qp, ctx.qpc_off)
    dc = {0: None, 1: None}
    ac = {0: [None] * 4, 1: [None] * 4}
    if cbp_chroma:
        dc[0] = hi.decode_residual_block(r, -1, 4)
        dc[1] = hi.decode_residual_block(r, -1, 4)
    if cbp_chroma == 2:
        for comp, grid in ((0, ctx.cb_nc), (1, ctx.cr_nc)):
            for k in range(4):
                bx = mbx * 2 + (k & 1)
                by = mby * 2 + (k >> 1)
                c = hi.decode_residual_block(r, _nc_of(grid, bx, by), 15)
                grid[by, bx] = int(np.count_nonzero(c))
                ac[comp][k] = c
    cy, cx = mby * 8, mbx * 8
    for comp, (plane, pred_c) in enumerate(((ctx.Cb, pred_cb),
                                            (ctx.Cr, pred_cr))):
        tgt = plane[cy:cy + 8, cx:cx + 8]
        if dc[comp] is None and all(a is None for a in ac[comp]):
            tgt[:] = pred_c
            continue
        dcC = hi.chroma_dc_dequant(
            np.asarray(dc[comp], np.int64).reshape(2, 2), qpc) \
            if dc[comp] is not None else np.zeros((2, 2), np.int64)
        for k in range(4):
            bx, by = k & 1, k >> 1
            d = hi.dequant4x4(_unzigzag15(ac[comp][k]), qpc) \
                if ac[comp][k] is not None else np.zeros((4, 4), np.int64)
            d[0, 0] = dcC[by, bx]
            tgt[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = hi.reconstruct4x4(
                pred_c[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], d)


def decode_slice_p(rbsp: bytes, sps: dict, pps: dict, nal_ref_idc: int,
                   refs: list):
    """P slice → (Y, Cb, Cr). ``refs``: decoded reference pictures as
    (Y, Cb, Cr) tuples, most recent first (reference list 0 for the
    sliding-window, no-reordering streams this decoder accepts)."""
    from . import h264codec as H
    from .h264codec import _BitReader, _more_rbsp_data, _PicCtx

    r = _BitReader(rbsp)
    first_mb = r.ue()
    slice_type = r.ue()
    assert slice_type % 5 == 0
    if pps["cabac"]:
        raise NotImplementedError(
            "H.264 CABAC entropy decoding not implemented")
    if first_mb != 0:
        raise NotImplementedError("H.264 multi-slice pictures unsupported")
    if not refs:
        raise ValueError("H.264: P slice with no decoded reference frame")
    r.ue()                                    # pps id
    r.u(sps["log2_max_frame_num"])            # frame_num
    if sps["poc_type"] == 0:
        r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    elif sps["poc_type"] == 1:
        raise NotImplementedError(
            "H.264 poc_type 1 slice fields not supported")
    num_ref = pps["num_ref_l0"]
    if r.u(1):                                # num_ref_idx override
        num_ref = r.ue() + 1
    if r.u(1):                                # ref_pic_list_modification
        raise NotImplementedError(
            "H.264 reference picture list modification not supported")
    if pps["weighted_pred"]:
        raise NotImplementedError(
            "H.264 weighted prediction (pred_weight_table) not supported")
    if nal_ref_idc:
        if r.u(1):                            # adaptive marking (MMCO)
            raise NotImplementedError(
                "H.264 adaptive reference marking (MMCO) not supported")
    if pps["constrained_intra"]:
        raise NotImplementedError(
            "H.264 constrained_intra_pred in P slices not supported")
    qp = pps["init_qp"] + r.se()
    if pps["deblock_ctrl"]:
        if r.ue() != 1:
            r.se()
            r.se()
    ctx = _PicCtx(sps, pps)
    ctx.qp = qp
    total = ctx.mb_w * ctx.mb_h
    mb = 0
    while mb < total:
        run = r.ue()                          # mb_skip_run
        if run > total - mb:
            raise ValueError("H.264: mb_skip_run past end of picture")
        for _ in range(run):
            mby, mbx = mb // ctx.mb_w, mb % ctx.mb_w
            pred_y = np.empty((16, 16), np.uint8)
            pred_cb = np.empty((8, 8), np.uint8)
            pred_cr = np.empty((8, 8), np.uint8)
            mvx, mvy = skip_mv(ctx, mbx * 4, mby * 4)
            _apply_parts(ctx, refs, mbx, mby,
                         [(0, 0, 4, 4, 0, mvx, mvy)],
                         pred_y, pred_cb, pred_cr)
            _store_mb(ctx, mbx, mby, pred_y, pred_cb, pred_cr)
            mb += 1
        if mb >= total or not _more_rbsp_data(r):
            break
        mby, mbx = mb // ctx.mb_w, mb % ctx.mb_w
        mb_type = r.ue()
        if mb_type >= 5:                      # intra MB in P slice
            it = mb_type - 5
            if it > 25:
                raise ValueError(f"H.264: invalid P mb_type {mb_type}")
            H._decode_mb_intra(r, ctx, it, mbx, mby, mbx > 0, mby > 0)
            mb += 1
            continue
        pred_y = np.empty((16, 16), np.uint8)
        pred_cb = np.empty((8, 8), np.uint8)
        pred_cr = np.empty((8, 8), np.uint8)
        parts = _parse_motion(ctx, r, mb_type, mbx, mby, num_ref)
        _apply_parts(ctx, refs, mbx, mby, parts, pred_y, pred_cb,
                     pred_cr)
        _decode_residual_inter(ctx, r, mbx, mby, pred_y, pred_cb,
                               pred_cr)
        mb += 1
    return ctx.Y, ctx.Cb, ctx.Cr


# ---------------------------------------------------------------------------
# fixture encoder: IDR + P GOPs
# ---------------------------------------------------------------------------

_SHAPES = {"16x16": [(0, 0, 4, 4)],
           "16x8": [(0, 0, 4, 2), (0, 2, 4, 2)],
           "8x16": [(0, 0, 2, 4), (2, 0, 2, 4)],
           "8x8": [(0, 0, 2, 2), (2, 0, 2, 2),
                   (0, 2, 2, 2), (2, 2, 2, 2)]}
_SHAPE_MBTYPE = {"16x16": 0, "16x8": 1, "8x16": 2, "8x8": 3}


def _search_mv(refY, src, px, py, w, h):
    """Integer ±4 exhaustive + half/quarter hill-climb over the REAL
    interpolators — the encoder's prediction is exactly the decoder's."""
    from .h264codec import _sad

    best = None
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            mv = (dx * 4, dy * 4)
            s = _sad(src, mc_luma(refY, px, py, mv[0], mv[1], w, h))
            if best is None or s < best[0]:
                best = (s, mv)
    for step in (2, 1):
        improved = True
        while improved:
            improved = False
            bmv = best[1]
            for dy in (-step, 0, step):
                for dx in (-step, 0, step):
                    if dx == 0 and dy == 0:
                        continue
                    mv = (bmv[0] + dx, bmv[1] + dy)
                    s = _sad(src, mc_luma(refY, px, py, mv[0], mv[1],
                                          w, h))
                    if s < best[0]:
                        best = (s, mv)
                        improved = True
    return best[1]


def _enc_chroma_inter(hi, src8, pred8, qpc):
    """Quantized chroma residual (inter rounding) on an MC prediction."""
    resid = src8.astype(np.int64) - pred8
    dc = np.zeros((2, 2), np.int64)
    Z = [None] * 4
    for k in range(4):
        bx, by = k & 1, k >> 1
        W = hi.forward4x4(resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
        dc[by, bx] = W[0, 0]
        z = hi.quant4x4(W, qpc, intra=False)
        z[0, 0] = 0
        Z[k] = z
    return hi.chroma_dc_quant(dc, qpc), Z


def _recon_chroma_blocks(hi, plane_r, cx, cy, pred8, dcq, Z, qpc,
                         coded: bool):
    """Write one component's chroma recon exactly as the decoder does."""
    if not coded:
        plane_r[cy:cy + 8, cx:cx + 8] = pred8
        return
    dcC = hi.chroma_dc_dequant(dcq, qpc)
    for k in range(4):
        bx, by = k & 1, k >> 1
        d = hi.dequant4x4(Z[k], qpc)
        d[0, 0] = dcC[by, bx]
        plane_r[cy + by * 4:cy + by * 4 + 4, cx + bx * 4:cx + bx * 4 + 4] \
            = hi.reconstruct4x4(
                pred8[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4], d)


def _write_chroma_bits(hi, bw, ctx, mbx, mby, cbp_chroma, dcq_cb, dcq_cr,
                       Zcb, Zcr):
    from .h264codec import _nc_of

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
                    bw, ac, _nc_of(grid, bx, by), 15)
                grid[by, bx] = tc


def encode_p_slice(arr: np.ndarray, refs: list, qp: int, frame_num: int,
                   sps: dict, pps: dict, partition_cycle: bool = False,
                   intra_every: int = 0):
    """One conforming P slice predicting from ``refs[0]`` → (rbsp,
    recon planes, recon RGB). Per MB: real motion search (integer ±4 +
    sub-pel refinement through the decoder's own interpolators), P_Skip
    when the skip-motion prediction quantizes residual-free, and —
    with ``partition_cycle`` — a forced 16x16/16x8/8x16/8x8 rotation so
    every partition decode path is exercised. ``intra_every`` injects an
    Intra_16x16 MB every N MBs (mb_type ≥ 5 in P). Reconstruction is
    the decoder's exact output."""
    from . import h264codec as H
    from . import h264intra as hi
    from .h264codec import _nc_of

    h, w = arr.shape[:2]
    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    pad = np.pad(arr, ((0, mb_h * 16 - h), (0, mb_w * 16 - w), (0, 0)),
                 mode="edge")
    Ys, Cbs, Crs = H._rgb_to_yuv(pad)
    ctx = H._PicCtx(sps, pps)
    ctx.qp = qp
    Yr, Cbr, Crr = ctx.Y, ctx.Cb, ctx.Cr
    refY, refCb, refCr = refs[0]
    qpc = hi.chroma_qp(qp, ctx.qpc_off)

    bw = H._BitWriter()
    bw.ue(0)                                  # first_mb_in_slice
    bw.ue(5)                                  # slice_type P (all pics)
    bw.ue(0)                                  # pps_id
    bw.u(frame_num & ((1 << sps["log2_max_frame_num"]) - 1),
         sps["log2_max_frame_num"])
    if sps["poc_type"] == 0:
        bw.u(0, sps["log2_max_poc_lsb"])
    bw.u(0, 1)                                # no num_ref_idx override
    bw.u(0, 1)                                # no list modification
    bw.u(0, 1)                                # sliding-window marking
    bw.se(qp - pps["init_qp"])                # slice_qp_delta
    if pps["deblock_ctrl"]:
        bw.ue(1)                              # deblocking disabled

    skip_run = 0
    cycle = ("16x16", "16x8", "8x16", "8x8")
    for mb in range(mb_w * mb_h):
        mby, mbx = divmod(mb, mb_w)
        my, mx = mby * 16, mbx * 16
        cy, cx = mby * 8, mbx * 8

        if intra_every and mb % intra_every == intra_every - 1:
            bw.ue(skip_run)
            skip_run = 0
            ctx.mb_intra[mby, mbx] = True
            cmode = H._chroma_mode_select(hi, Cbs, Cbr, Crs, Crr,
                                          mbx, mby)
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
            _recon_chroma_blocks(hi, Cbr, cx, cy, pred_cb, dcq_cb, Zcb,
                                 qpc, True)
            _recon_chroma_blocks(hi, Crr, cx, cy, pred_cr, dcq_cr, Zcr,
                                 qpc, True)
            pm16, cbp_luma, write_luma = H._encode_mb_i16(
                hi, bw, Ys, Yr, mbx, mby, qp, ctx.luma_nc)
            mb_type = 1 + pm16 + 4 * cbp_chroma + 12 * (cbp_luma == 15)
            bw.ue(5 + mb_type)
            bw.ue(cmode)
            bw.se(0)                          # mb_qp_delta
            write_luma(bw)
            _write_chroma_bits(hi, bw, ctx, mbx, mby, cbp_chroma,
                               dcq_cb, dcq_cr, Zcb, Zcr)
            continue

        shape = cycle[mb % 4] if partition_cycle else "16x16"
        geo = _SHAPES[shape]
        shape_tag = shape if shape in ("16x8", "8x16") else ""
        smv = skip_mv(ctx, mbx * 4, mby * 4)
        pred_y = np.empty((16, 16), np.uint8)
        pred_cb8 = np.empty((8, 8), np.uint8)
        pred_cr8 = np.empty((8, 8), np.uint8)
        mvds = []
        mvs = []
        for pi, (x4, y4, w4, h4) in enumerate(geo):
            px, py = mx + x4 * 4, my + y4 * 4
            src = Ys[py:py + h4 * 4, px:px + w4 * 4]
            mv = _search_mv(refY, src, px, py, w4 * 4, h4 * 4)
            mpx, mpy = mvp_for(ctx, mbx * 4 + x4, mby * 4 + y4, w4, h4,
                               0, shape_tag, pi)
            mvds.append((mv[0] - mpx, mv[1] - mpy))
            mvs.append(mv)
            _apply_parts(ctx, [(refY, refCb, refCr)], mbx, mby,
                         [(x4, y4, w4, h4, 0, mv[0], mv[1])],
                         pred_y, pred_cb8, pred_cr8)

        srcY = Ys[my:my + 16, mx:mx + 16]
        Z = [None] * 16
        for k in range(16):
            x4, y4 = hi.BLK4_POS[k]
            d = (srcY[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
                 .astype(np.int64)
                 - pred_y[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4])
            Z[k] = hi.quant4x4(hi.forward4x4(d), qp, intra=False)
        cbp_luma = 0
        for i8 in range(4):
            if any(np.any(Z[4 * i8 + s]) for s in range(4)):
                cbp_luma |= 1 << i8
        dcq_cb, Zcb = _enc_chroma_inter(
            hi, Cbs[cy:cy + 8, cx:cx + 8], pred_cb8, qpc)
        dcq_cr, Zcr = _enc_chroma_inter(
            hi, Crs[cy:cy + 8, cx:cx + 8], pred_cr8, qpc)
        any_ac = any(np.any(z) for z in Zcb + Zcr)
        any_dc = np.any(dcq_cb) or np.any(dcq_cr)
        cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
        if cbp_chroma < 2:
            Zcb = [np.zeros((4, 4), np.int64)] * 4
            Zcr = [np.zeros((4, 4), np.int64)] * 4
        if cbp_chroma == 0:
            dcq_cb = np.zeros((2, 2), np.int64)
            dcq_cr = np.zeros((2, 2), np.int64)
        cbp = cbp_luma | (cbp_chroma << 4)

        if shape == "16x16" and mvs[0] == smv and cbp == 0:
            skip_run += 1                      # P_Skip
            Yr[my:my + 16, mx:mx + 16] = pred_y
            Cbr[cy:cy + 8, cx:cx + 8] = pred_cb8
            Crr[cy:cy + 8, cx:cx + 8] = pred_cr8
            continue

        bw.ue(skip_run)
        skip_run = 0
        bw.ue(_SHAPE_MBTYPE[shape])
        if shape == "8x8":
            for _ in range(4):
                bw.ue(0)                      # sub_mb_type 8x8
        # num_ref_l0 == 1 → te(v) cMax 0 → ref_idx absent
        for dx, dy in mvds:
            bw.se(dx)
            bw.se(dy)
        bw.ue(CBP_INTER_INV[cbp])
        if cbp:
            bw.se(0)                          # mb_qp_delta
        for i8 in range(4):
            if not (cbp_luma & (1 << i8)):
                for s in range(4):
                    k = 4 * i8 + s
                    x4, y4 = hi.BLK4_POS[k]
                    Yr[my + y4 * 4:my + y4 * 4 + 4,
                       mx + x4 * 4:mx + x4 * 4 + 4] = \
                        pred_y[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4]
                continue
            for s in range(4):
                k = 4 * i8 + s
                x4, y4 = hi.BLK4_POS[k]
                bx, by = mbx * 4 + x4, mby * 4 + y4
                levels = Z[k].reshape(-1)[hi.ZIGZAG]
                tc = hi.encode_residual_block(
                    bw, levels, _nc_of(ctx.luma_nc, bx, by), 16)
                ctx.luma_nc[by, bx] = tc
                d = hi.dequant4x4(Z[k], qp)
                Yr[my + y4 * 4:my + y4 * 4 + 4,
                   mx + x4 * 4:mx + x4 * 4 + 4] = hi.reconstruct4x4(
                    pred_y[y4 * 4:y4 * 4 + 4, x4 * 4:x4 * 4 + 4], d)
        _write_chroma_bits(hi, bw, ctx, mbx, mby, cbp_chroma,
                           dcq_cb, dcq_cr, Zcb, Zcr)
        _recon_chroma_blocks(hi, Cbr, cx, cy, pred_cb8, dcq_cb, Zcb,
                             qpc, cbp_chroma > 0)
        _recon_chroma_blocks(hi, Crr, cx, cy, pred_cr8, dcq_cr, Zcr,
                             qpc, cbp_chroma > 0)
    if skip_run:
        bw.ue(skip_run)
    recon = H._yuv_to_rgb(Yr, Cbr, Crr, sps["width"], sps["height"])
    return bw.trailing(), (Yr, Cbr, Crr), recon


def encode_gop_annexb(frames: list, qp: int = 26, gop: int = 8,
                      partition_cycle: bool = False, intra_every: int = 0,
                      mix_i4: bool = True):
    """RGB frames → (conforming Annex-B IDR+P stream, reconstructed
    frames). Frame 0 and every ``gop``-th frame are CAVLC intra IDRs
    (h264codec); the rest are P slices predicting from the previous
    reconstruction."""
    from . import h264codec as H

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if w % 2 or h % 2:
        raise ValueError("H.264 4:2:0 needs even dimensions")
    sps_r, pps_r = H._sps_rbsp(w, h), H._pps_rbsp()
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, sps_r), sc + H._nal(8, pps_r)]
    recons = []
    refs: list = []
    frame_num = 0
    for i, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        if i % gop == 0:
            rbsp, recon, planes = H._slice_rbsp_cavlc(
                f, qp, idr_pic_id=i & 1, mix_i4=mix_i4)
            out.append(sc + H._nal(5, rbsp))
            refs = [planes]
            frame_num = 1
        else:
            rbsp, planes, recon = encode_p_slice(
                f, refs, qp, frame_num, sps, pps,
                partition_cycle=partition_cycle, intra_every=intra_every)
            out.append(sc + H._nal(1, rbsp, ref_idc=2))
            refs = [planes]
            frame_num = (frame_num + 1) & 0xF
        recons.append(recon)
    return b"".join(out), recons


def encode_gop_samples(frames: list, qp: int = 26, gop: int = 8,
                       partition_cycle: bool = False,
                       intra_every: int = 0, mix_i4: bool = True):
    """Length-prefixed avc1 samples for the MP4 route → (samples,
    recon frames, sync flags). sync[i] is True for IDR samples (feeds
    the stss box)."""
    import struct

    from . import h264codec as H

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    sps, pps = H.parse_sps(H._sps_rbsp(w, h)), H.parse_pps(H._pps_rbsp())
    out, recons, sync = [], [], []
    refs: list = []
    frame_num = 0
    for i, f in enumerate(frames):
        if i % gop == 0:
            rbsp, recon, planes = H._slice_rbsp_cavlc(
                f, qp, idr_pic_id=i & 1, mix_i4=mix_i4)
            nal = H._nal(5, rbsp)
            refs = [planes]
            frame_num = 1
            sync.append(True)
        else:
            rbsp, planes, recon = encode_p_slice(
                f, refs, qp, frame_num, sps, pps,
                partition_cycle=partition_cycle, intra_every=intra_every)
            nal = H._nal(1, rbsp, ref_idc=2)
            refs = [planes]
            frame_num = (frame_num + 1) & 0xF
            sync.append(False)
        out.append(struct.pack(">I", len(nal)) + nal)
        recons.append(recon)
    return out, recons, sync
