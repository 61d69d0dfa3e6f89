"""H.264 in-loop deblocking filter (§8.7): table audits, an independent
scalar transcription of §8.7.2.3/8.7.2.4 pinning the vectorized filter,
boundary-strength derivation (incl. the B two-list motion rules), and
pixel-exact encode→decode round-trips with the filter ENABLED — the
filtered reconstruction feeds the reference list, so any encoder/decoder
divergence compounds across the GOP and cannot hide."""

import numpy as np
import pytest

from gitprov_ray import h264codec as H
from gitprov_ray import h264deblock as D
from gitprov_ray import h264inter as HI


# --------------------------------------------------------------------------
# Tables 8-16 / 8-17 audits
# --------------------------------------------------------------------------


def test_table_shapes_and_monotonicity():
    assert D.ALPHA.shape == (52,) and D.BETA.shape == (52,)
    assert D.TC0.shape == (3, 52)
    for t in (D.ALPHA, D.BETA, D.TC0[0], D.TC0[1], D.TC0[2]):
        assert (np.diff(t) >= 0).all()
    # t'C0 grows with bS at every index
    assert (D.TC0[0] <= D.TC0[1]).all() and (D.TC0[1] <= D.TC0[2]).all()


def test_alpha_growth_law_and_endpoints():
    """The spec's alpha values follow 0.8*(2^(x/6)-1) (List et al. 2003,
    the filter design paper) up to integer rounding and the 255 clip —
    a strong independent check on the transcription."""
    for x in range(16, 50):
        expect = 0.8 * (2 ** (x / 6.0) - 1)
        assert abs(int(D.ALPHA[x]) - expect) <= max(2, 0.02 * expect), x
    assert D.ALPHA[16] == 4 and D.ALPHA[36] == 50 and D.ALPHA[42] == 101
    assert D.ALPHA[50] == 255 and D.ALPHA[51] == 255
    assert (D.ALPHA[:16] == 0).all() and (D.BETA[:16] == 0).all()
    assert D.BETA[16] == 2 and D.BETA[51] == 18
    assert (D.TC0[:, :17] == 0).all()
    assert D.TC0[2, 17] == 1                  # first nonzero: bS=3 @ 17
    assert tuple(D.TC0[:, 51]) == (13, 17, 25)


# --------------------------------------------------------------------------
# independent scalar transcription of the sample filters
# --------------------------------------------------------------------------


def _scalar_filter(p, q, bs, index_a, index_b, chroma):
    """Straight line-by-line §8.7.2.3/8.7.2.4 on ONE sample line,
    written independently of the vectorized module (ints + ifs)."""
    alpha = int(D.ALPHA[index_a])
    beta = int(D.BETA[index_b])
    p = [int(v) for v in p]
    q = [int(v) for v in q]
    np_, nq_ = list(p), list(q)
    p0, p1, p2 = p[0], p[1], p[2]
    q0, q1, q2 = q[0], q[1], q[2]
    if bs == 0 or abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta \
            or abs(q1 - q0) >= beta:
        return np_, nq_
    ap, aq = abs(p2 - p0), abs(q2 - q0)
    if bs < 4:
        tc0 = int(D.TC0[bs - 1, index_a])
        if chroma:
            tc = tc0 + 1
        else:
            tc = tc0 + (1 if ap < beta else 0) + (1 if aq < beta else 0)
        delta = (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3
        delta = max(-tc, min(tc, delta))
        np_[0] = max(0, min(255, p0 + delta))
        nq_[0] = max(0, min(255, q0 - delta))
        if not chroma:
            if ap < beta:
                d = (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1
                np_[1] = p1 + max(-tc0, min(tc0, d))
            if aq < beta:
                d = (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1
                nq_[1] = q1 + max(-tc0, min(tc0, d))
        return np_, nq_
    # bS == 4
    if chroma:
        np_[0] = (2 * p1 + p0 + q1 + 2) >> 2
        nq_[0] = (2 * q1 + q0 + p1 + 2) >> 2
        return np_, nq_
    p3, q3 = p[3], q[3]
    small = abs(p0 - q0) < ((alpha >> 2) + 2)
    if small and ap < beta:
        np_[0] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        np_[1] = (p2 + p1 + p0 + q0 + 2) >> 2
        np_[2] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    else:
        np_[0] = (2 * p1 + p0 + q1 + 2) >> 2
    if small and aq < beta:
        nq_[0] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        nq_[1] = (q2 + q1 + q0 + p0 + 2) >> 2
        nq_[2] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    else:
        nq_[0] = (2 * q1 + q0 + p1 + 2) >> 2
    return np_, nq_


@pytest.mark.parametrize("chroma", [False, True], ids=["luma", "chroma"])
def test_vectorized_filter_matches_scalar_spec(chroma):
    rng = np.random.default_rng(42)
    depth = 3 if chroma else 4
    n = 16
    for trial in range(300):
        index_a = int(rng.integers(0, 52))
        index_b = int(rng.integers(0, 52))
        bs = rng.integers(0, 5, size=n).astype(np.uint8)
        # half the trials use near-flat lines so the |p0-q0|<alpha gate
        # passes often (pure noise almost never filters at low alpha)
        if trial % 2:
            base = rng.integers(0, 256)
            line = (base + rng.integers(-6, 7, size=(n, 2 * depth)))
            line = np.clip(line, 0, 255)
        else:
            line = rng.integers(0, 256, size=(n, 2 * depth))
        plane = line.astype(np.uint8)         # row i: p_depth-1..p0 q0..
        # build a plane where column depth-1 is the edge
        img = plane.copy()
        D._filter_edge(img, depth, 0, n, True, bs, index_a, index_b,
                       chroma)
        for i in range(n):
            p = [int(plane[i, depth - 1 - k]) for k in range(depth)]
            q = [int(plane[i, depth + k]) for k in range(depth)]
            ep, eq = _scalar_filter(p, q, int(bs[i]), index_a, index_b,
                                    chroma)
            got_p = [int(img[i, depth - 1 - k]) for k in range(depth)]
            got_q = [int(img[i, depth + k]) for k in range(depth)]
            assert got_p[:3] == [v % 256 for v in ep[:3]], \
                (trial, i, index_a, index_b, int(bs[i]), p, q)
            assert got_q[:3] == [v % 256 for v in eq[:3]]


# --------------------------------------------------------------------------
# boundary strength
# --------------------------------------------------------------------------


def _mini_ctx(mb_w=2, mb_h=1):
    import types

    W4 = mb_w * 4
    return types.SimpleNamespace(
        mb_w=mb_w, mb_h=mb_h,
        mb_intra=np.zeros((mb_h, mb_w), bool),
        luma_nc=np.zeros((mb_h * 4, W4), np.int32),
        mvx=np.zeros((mb_h * 4, W4), np.int32),
        mvy=np.zeros((mb_h * 4, W4), np.int32),
        refidx=np.zeros((mb_h * 4, W4), np.int32),
        mvx1=np.zeros((mb_h * 4, W4), np.int32),
        mvy1=np.zeros((mb_h * 4, W4), np.int32),
        refidx1=np.full((mb_h * 4, W4), -1, np.int32))


def _pids(ctx):
    p0 = np.where(ctx.refidx >= 0, ctx.refidx.astype(np.int64), -1)
    p1 = np.where(ctx.refidx1 >= 0, ctx.refidx1.astype(np.int64), -1)
    return p0, p1


def test_bs_intra_and_coeff_rules():
    ctx = _mini_ctx()
    ctx.mb_intra[0, 1] = True
    ctx.refidx[:, 4:] = -1                    # intra MB: no motion
    bs_v, bs_h = D.compute_bs(ctx, *_pids(ctx))
    assert bs_v[0, 4] == 4                    # MB boundary, one side intra
    assert bs_v[0, 5] == 3                    # internal edge of intra MB
    assert bs_v[0, 1] == 0                    # inter, same motion, no coeffs
    ctx2 = _mini_ctx()
    ctx2.luma_nc[0, 1] = 3                    # block (1,0) has coeffs
    bs_v2, _ = D.compute_bs(ctx2, *_pids(ctx2))
    assert bs_v2[0, 1] == 2 and bs_v2[0, 2] == 2 and bs_v2[0, 3] == 0


def test_bs_motion_rules_p_and_b():
    # P: MV component difference >= 4 quarter-pels -> bS 1
    ctx = _mini_ctx()
    ctx.mvx[:, 4:] = 4
    bs_v, _ = D.compute_bs(ctx, *_pids(ctx))
    assert bs_v[0, 4] == 1 and bs_v[0, 3] == 0
    ctx.mvx[:, 4:] = 3                        # < 4 -> no filter
    bs_v, _ = D.compute_bs(ctx, *_pids(ctx))
    assert bs_v[0, 4] == 0
    # P: different reference picture -> 1
    ctx = _mini_ctx()
    ctx.refidx[:, 4:] = 1
    bs_v, _ = D.compute_bs(ctx, *_pids(ctx))
    assert bs_v[0, 4] == 1
    # B: different MV COUNT (bi vs single) -> 1 even with same L0 motion
    ctx = _mini_ctx()
    ctx.refidx1[:, 4:] = 1                    # right MB bi-predicted
    bs_v, _ = D.compute_bs(ctx, *_pids(ctx))
    assert bs_v[0, 4] == 1
    # B crossed assignment: p uses (L0=ref0, L1=ref1), q swapped, with
    # matching per-picture MVs -> crossed match, NO filtering
    ctx = _mini_ctx()
    ctx.refidx[:] = 0
    ctx.refidx1[:] = 1
    ctx.mvx[:, :4] = 8                        # p: pic0 mv 8, pic1 mv 0
    ctx.refidx[:, 4:] = 1                     # q: L0 -> pic1
    ctx.refidx1[:, 4:] = 0                    # q: L1 -> pic0
    ctx.mvx1[:, 4:] = 8                       # q: pic0 mv 8 via L1
    p0 = np.where(ctx.refidx >= 0, ctx.refidx.astype(np.int64), -1)
    p1 = np.where(ctx.refidx1 >= 0, ctx.refidx1.astype(np.int64), -1)
    bs_v, _ = D.compute_bs(ctx, p0, p1)
    assert bs_v[0, 4] == 0
    # ... but if the crossed MVs differ, filtering kicks in
    ctx.mvx1[:, 4:] = 0
    bs_v, _ = D.compute_bs(ctx, p0, p1)
    assert bs_v[0, 4] == 1


# --------------------------------------------------------------------------
# end-to-end: encode with deblocking ON, decode pixel-exact
# --------------------------------------------------------------------------


def _frames(n=6, h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        f = (np.stack([(xx * 3 + t * 5) % 256, (yy * 4) % 256,
                       ((xx + yy) * 2) % 256], -1).astype(np.uint8))
        f[10 + t:26 + t, 12 + 2 * t:28 + 2 * t] = (200, 40, 90)
        out.append(f)
    return out


@pytest.mark.parametrize("qp,bframes", [(20, False), (28, True),
                                        (36, False)])
def test_gop_roundtrip_with_deblocking(qp, bframes):
    frames = _frames()
    stream, recons = HI.encode_gop_annexb(
        frames, qp=qp, gop=4, partition_cycle=True, intra_every=5,
        bframes=bframes, deblock=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == len(recons)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i} diverged"
    # the loop filter must actually fire (vs deblock-off reconstruction)
    _, off = HI.encode_gop_annexb(
        frames, qp=qp, gop=4, partition_cycle=True, intra_every=5,
        bframes=bframes, deblock=False)
    assert any(not np.array_equal(a, b) for a, b in zip(recons, off))


def test_intra_only_roundtrip_with_deblocking():
    frames = _frames(3)
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, H._sps_rbsp(64, 48)),
           sc + H._nal(8, H._pps_rbsp())]
    recons = []
    for i, f in enumerate(frames):
        rbsp, recon, _ = H._slice_rbsp_cavlc(f, 24, idr_pic_id=i & 1,
                                             deblock=True)
        out.append(sc + H._nal(5, rbsp))
        recons.append(recon)
    dec = H.decode_annexb(b"".join(out))
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_mp4_gop_deblock_through_framesample():
    """The MP4/avc1 route with deblocking on decodes pixel-exact through
    the engine's media stage machinery."""
    from gitprov_ray import mp4codec

    frames = _frames(5)
    blob, recons = mp4codec.encode_mp4_h264_gop(
        frames, qp=26, gop=4, bframes=False, deblock=True)
    dec = mp4codec.decode_mp4_frames(blob)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_deblocking_improves_low_qp_gradient_psnr():
    """On a smooth gradient at high QP the loop filter should not hurt
    fidelity (it was designed to remove blocking on exactly this
    content) — a directional sanity check, not an exact pin."""
    yy, xx = np.mgrid[0:48, 0:64]
    f = np.stack([(xx * 2) % 256, (yy * 2) % 256,
                  ((xx + yy)) % 256], -1).astype(np.uint8)

    def mse(a, b):
        return float(np.mean((a.astype(np.int64) - b) ** 2))

    _, r_off = HI.encode_gop_annexb([f] * 2, qp=40, gop=8, deblock=False)
    _, r_on = HI.encode_gop_annexb([f] * 2, qp=40, gop=8, deblock=True)
    assert mse(f, r_on[1]) <= mse(f, r_off[1]) * 1.05
