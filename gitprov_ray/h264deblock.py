"""H.264 in-loop deblocking filter (ITU-T H.264 §8.7) — frame
macroblocks, 4:2:0, single-slice pictures (the subset the engine's
decoder accepts; MBAFF/field filtering is out of scope with the rest of
interlace support).

The filter runs AFTER the whole picture is constructed (§8.7: intra
prediction always reads unfiltered samples, so end-of-picture
application is exactly conforming for single-slice streams) and
processes macroblocks in raster order — per MB all vertical edges left
to right, then all horizontal edges top to bottom, each edge reading
the sample state left by every previous filtering operation.

Boundary strength (§8.7.2.1, frame mode):
  4  macroblock edge and either side intra
  3  internal edge and either side intra
  2  either 4x4 luma block has non-zero transform coefficient levels
  1  motion differs: different reference pictures, different number of
     motion vectors, or any used MV component differing by >= 4
     quarter-pel units (B blocks compare both the straight and the
     crossed list assignment; filtering is skipped only when ONE
     assignment matches completely)
  0  otherwise (no filtering)

Tables 8-16/8-17 (alpha, beta, t'C0) are transcribed from the published
spec; test_h264_deblock audits them (monotonicity, the documented
alpha ~ 0.8*(2^(x/6)-1) growth law, endpoint values) and pins the
filter against an independent scalar transcription of §8.7.2.3/8.7.2.4.

Reference parity note: the reference (git-prov) stores media blobs
untouched; this module completes the engine's own H.264 decode path
(h264codec/h264intra/h264inter) so deblocking-enabled baseline streams
reconstruct exactly.
"""

from __future__ import annotations

import numpy as np

# --- §8.7.2.2 Tables 8-16 / 8-17 ------------------------------------------

ALPHA = np.array(
    [0] * 16
    + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36,
       40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
       203, 226, 255, 255], np.int32)

BETA = np.array(
    [0] * 16
    + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10,
       11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18],
    np.int32)

# Table 8-17 (t'C0) transcribed row-per-indexA — the layout the spec
# (and the JM reference software's CLIP_TAB) prints, so each line is a
# direct visual check against the published table.
_TC0_ROWS = (
    # indexA 0..16 -> (0, 0, 0)
    [(0, 0, 0)] * 17
    + [(0, 0, 1)] * 4      # 17-20
    + [(0, 1, 1)] * 2      # 21-22
    + [(1, 1, 1)] * 4      # 23-26
    + [(1, 1, 2)] * 4      # 27-30
    + [(1, 2, 3)] * 2      # 31-32
    + [(2, 2, 3)]          # 33
    + [(2, 2, 4)]          # 34
    + [(2, 3, 4)] * 2      # 35-36
    + [(3, 3, 5)]          # 37
    + [(3, 4, 6)] * 2      # 38-39
    + [(4, 5, 7)]          # 40
    + [(4, 5, 8)]          # 41
    + [(5, 6, 9)]          # 42
    + [(6, 7, 10)]         # 43
    + [(6, 8, 11)]         # 44
    + [(7, 9, 13)]         # 45
    + [(8, 10, 16)]        # 46
    + [(9, 12, 18)]        # 47
    + [(10, 13, 20)]       # 48
    + [(11, 15, 23)]       # 49
    + [(13, 17, 25)] * 2   # 50-51
)
assert len(_TC0_ROWS) == 52
TC0 = np.array(_TC0_ROWS, np.int32).T        # shape (3, 52): [bS-1][idxA]


def _clip3(lo, hi, v):
    return np.clip(v, lo, hi)


# --- boundary strength ------------------------------------------------------


def _normalize_lists(pid0, pid1, mvx0, mvy0, mvx1, mvy1):
    """Per-4x4 prediction slots normalized so slot A always holds the
    (single) used prediction and slot B is (-1, 0, 0) for one-MV
    blocks — lets one vectorized straight/crossed comparison implement
    all of §8.7.2.1's motion cases (P, B single-list, B bi-pred with
    distinct or identical reference pictures, differing MV counts)."""
    use0 = pid0 >= 0
    both = use0 & (pid1 >= 0)
    A = (np.where(use0, pid0, pid1),
         np.where(use0, mvx0, mvx1),
         np.where(use0, mvy0, mvy1))
    B = (np.where(both, pid1, -1),
         np.where(both, mvx1, 0),
         np.where(both, mvy1, 0))
    return A, B


def _mv_differs(ax, ay, bx, by):
    return (np.abs(ax - bx) >= 4) | (np.abs(ay - by) >= 4)


def compute_bs(ctx, pid0: np.ndarray, pid1: np.ndarray):
    """Boundary-strength grids at 4x4 granularity.

    Returns (bs_v, bs_h): ``bs_v[by, bx]`` is the strength of the
    vertical edge between blocks (bx-1, by) and (bx, by) (bx >= 1;
    column 0 is the picture boundary and never filtered), ``bs_h`` the
    horizontal edge between (bx, by-1) and (bx, by)."""
    intra4 = np.repeat(np.repeat(ctx.mb_intra, 4, 0), 4, 1)
    nz = ctx.luma_nc > 0
    A, B = _normalize_lists(pid0, pid1, ctx.mvx, ctx.mvy,
                            ctx.mvx1, ctx.mvy1)

    def one_dir(axis: int) -> np.ndarray:
        # p = block before along `axis`, q = block at the position
        def prev(a):
            return np.roll(a, 1, axis=axis)

        mb_edge = np.zeros_like(intra4, bool)
        if axis == 1:
            mb_edge[:, 0::4] = True
        else:
            mb_edge[0::4, :] = True
        either_intra = intra4 | prev(intra4)
        coeffs = nz | prev(nz)

        Ap = tuple(prev(x) for x in A)
        Bp = tuple(prev(x) for x in B)
        straight = ((Ap[0] == A[0]) & (Bp[0] == B[0])
                    & ~_mv_differs(Ap[1], Ap[2], A[1], A[2])
                    & ~_mv_differs(Bp[1], Bp[2], B[1], B[2]))
        crossed = ((Ap[0] == B[0]) & (Bp[0] == A[0])
                   & ~_mv_differs(Ap[1], Ap[2], B[1], B[2])
                   & ~_mv_differs(Bp[1], Bp[2], A[1], A[2]))
        motion_differs = ~(straight | crossed)

        bs = np.where(
            either_intra, np.where(mb_edge, 4, 3),
            np.where(coeffs, 2, np.where(motion_differs, 1, 0))
        ).astype(np.uint8)
        # the rolled-in wrap column/row is the picture boundary: callers
        # never read index 0 along `axis`, but zero it for hygiene
        if axis == 1:
            bs[:, 0] = 0
        else:
            bs[0, :] = 0
        return bs

    return one_dir(1), one_dir(0)


# --- edge filters (§8.7.2.3 normal, §8.7.2.4 strong) ------------------------


def _filter_edge(plane: np.ndarray, x0: int, y0: int, n: int,
                 vertical: bool, bs: np.ndarray, index_a: int,
                 index_b: int, chroma: bool) -> None:
    """Filter one edge of ``n`` samples in place. ``bs`` is the
    per-sample boundary strength (already expanded from 4x4 groups).
    All outputs are computed from the edge's INPUT samples (the spec's
    simultaneous assignment), then written back."""
    alpha = int(ALPHA[index_a])
    beta = int(BETA[index_b])
    if alpha == 0 or beta == 0 or not bs.any():
        return
    depth = 3 if chroma else 4               # samples touched per side

    if vertical:
        p = [plane[y0:y0 + n, x0 - 1 - i].astype(np.int32)
             for i in range(depth)]
        q = [plane[y0:y0 + n, x0 + i].astype(np.int32)
             for i in range(depth)]
    else:
        p = [plane[y0 - 1 - i, x0:x0 + n].astype(np.int32)
             for i in range(depth)]
        q = [plane[y0 + i, x0:x0 + n].astype(np.int32)
             for i in range(depth)]
    p0, p1, p2 = p[0], p[1], p[2]
    q0, q1, q2 = q[0], q[1], q[2]

    filt = ((bs > 0) & (np.abs(p0 - q0) < alpha)
            & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta))
    if not filt.any():
        return
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)

    np0, nq0 = p0.copy(), q0.copy()
    np1, nq1 = p1.copy(), q1.copy()
    np2 = p2.copy() if not chroma else None
    nq2 = q2.copy() if not chroma else None

    # normal filter, bS in 1..3
    normal = filt & (bs < 4)
    if normal.any():
        tc0 = TC0[np.clip(bs, 1, 3) - 1, index_a]
        if chroma:
            tc = tc0 + 1
        else:
            tc = tc0 + (ap < beta) + (aq < beta)
        delta = _clip3(-tc, tc,
                       (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
        np0 = np.where(normal, np.clip(p0 + delta, 0, 255), np0)
        nq0 = np.where(normal, np.clip(q0 - delta, 0, 255), nq0)
        if not chroma:
            dp1 = _clip3(-tc0, tc0,
                         (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
            np1 = np.where(normal & (ap < beta), p1 + dp1, np1)
            dq1 = _clip3(-tc0, tc0,
                         (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
            nq1 = np.where(normal & (aq < beta), q1 + dq1, nq1)

    # strong filter, bS == 4
    strong = filt & (bs == 4)
    if strong.any():
        if chroma:
            np0 = np.where(strong, (2 * p1 + p0 + q1 + 2) >> 2, np0)
            nq0 = np.where(strong, (2 * q1 + q0 + p1 + 2) >> 2, nq0)
        else:
            p3, q3 = p[3], q[3]
            small_gap = np.abs(p0 - q0) < ((alpha >> 2) + 2)
            sp = strong & small_gap & (ap < beta)
            np0 = np.where(
                strong,
                np.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4)
                         >> 3, (2 * p1 + p0 + q1 + 2) >> 2), np0)
            np1 = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, np1)
            np2 = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4)
                           >> 3, np2)
            sq = strong & small_gap & (aq < beta)
            nq0 = np.where(
                strong,
                np.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4)
                         >> 3, (2 * q1 + q0 + p1 + 2) >> 2), nq0)
            nq1 = np.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, nq1)
            nq2 = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4)
                           >> 3, nq2)

    outs_p = [np0, np1] + ([np2] if not chroma else [])
    outs_q = [nq0, nq1] + ([nq2] if not chroma else [])
    if vertical:
        for i, v in enumerate(outs_p):
            plane[y0:y0 + n, x0 - 1 - i] = v.astype(np.uint8)
        for i, v in enumerate(outs_q):
            plane[y0:y0 + n, x0 + i] = v.astype(np.uint8)
    else:
        for i, v in enumerate(outs_p):
            plane[y0 - 1 - i, x0:x0 + n] = v.astype(np.uint8)
        for i, v in enumerate(outs_q):
            plane[y0 + i, x0:x0 + n] = v.astype(np.uint8)


# --- picture-level driver ---------------------------------------------------


def filter_picture(ctx) -> None:
    """Apply §8.7 to a decoded/reconstructed picture context in place.

    ``ctx`` is an h264codec._PicCtx carrying ``deblock = (idc, offA,
    offB)`` from the slice header (idc 1 disables; 2 == 0 for the
    single-slice pictures this decoder accepts), ``mb_qp`` (per-MB QPY,
    0 for I_PCM), and — for inter pictures — ``ref_pids0/ref_pids1``
    (identity of each reference-list entry, e.g. ``id()`` of the
    picture object) so bS compares reference PICTURES, not indices."""
    from . import h264intra as hi

    idc, off_a, off_b = getattr(ctx, "deblock", (1, 0, 0))
    if idc == 1:
        return
    mb_w, mb_h = ctx.mb_w, ctx.mb_h
    H4, W4 = ctx.refidx.shape

    def pid_of(refidx, pids):
        if pids:
            lut = np.asarray(pids, np.int64)
            return np.where(refidx >= 0, lut[np.clip(refidx, 0, None)],
                            -1)
        return np.where(refidx >= 0, refidx.astype(np.int64), -1)

    pid0 = pid_of(ctx.refidx, getattr(ctx, "ref_pids0", None))
    pid1 = pid_of(ctx.refidx1, getattr(ctx, "ref_pids1", None))
    bs_v, bs_h = compute_bs(ctx, pid0, pid1)

    qpy = ctx.mb_qp
    qpc_cb = np.array([[hi.chroma_qp(int(q), ctx.qpc_off)
                        for q in row] for row in qpy], np.int32)

    def idx(qav, off):
        return int(np.clip(qav + off, 0, 51))

    Y, Cb, Cr = ctx.Y, ctx.Cb, ctx.Cr
    for mby in range(mb_h):
        for mbx in range(mb_w):
            my, mx = mby * 16, mbx * 16
            cy, cx = mby * 8, mbx * 8
            by, bx = mby * 4, mbx * 4
            q_cur = int(qpy[mby, mbx])
            qc_cur = int(qpc_cb[mby, mbx])

            # ---- vertical edges, left to right
            for k in range(4):
                if k == 0 and mbx == 0:
                    continue
                col = bx + k
                if k == 0:
                    qav = (int(qpy[mby, mbx - 1]) + q_cur + 1) >> 1
                else:
                    qav = q_cur
                bs16 = np.repeat(bs_v[by:by + 4, col], 4)
                _filter_edge(Y, mx + 4 * k, my, 16, True, bs16,
                             idx(qav, off_a), idx(qav, off_b), False)
            for ck in (0, 1):                # chroma cols 0 and 4
                if ck == 0 and mbx == 0:
                    continue
                col = bx + 2 * ck            # luma edge 0 / 2
                if ck == 0:
                    qav = (int(qpc_cb[mby, mbx - 1]) + qc_cur + 1) >> 1
                else:
                    qav = qc_cur
                bs8 = np.repeat(bs_v[by:by + 4, col], 2)
                for plane in (Cb, Cr):
                    _filter_edge(plane, cx + 4 * ck, cy, 8, True, bs8,
                                 idx(qav, off_a), idx(qav, off_b), True)

            # ---- horizontal edges, top to bottom
            for k in range(4):
                if k == 0 and mby == 0:
                    continue
                row = by + k
                if k == 0:
                    qav = (int(qpy[mby - 1, mbx]) + q_cur + 1) >> 1
                else:
                    qav = q_cur
                bs16 = np.repeat(bs_h[row, bx:bx + 4], 4)
                _filter_edge(Y, mx, my + 4 * k, 16, False, bs16,
                             idx(qav, off_a), idx(qav, off_b), False)
            for ck in (0, 1):
                if ck == 0 and mby == 0:
                    continue
                row = by + 2 * ck
                if ck == 0:
                    qav = (int(qpc_cb[mby - 1, mbx]) + qc_cur + 1) >> 1
                else:
                    qav = qc_cur
                bs8 = np.repeat(bs_h[row, bx:bx + 4], 2)
                for plane in (Cb, Cr):
                    _filter_edge(plane, cx, cy + 4 * ck, 8, False, bs8,
                                 idx(qav, off_a), idx(qav, off_b), True)
