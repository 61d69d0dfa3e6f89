"""H.264 P-slice (inter) layer: interpolators pinned against an
independent scalar spec transcription, MVP rules, and IDR+P GOP
round-trips pixel-exact through every partition decode path."""

import numpy as np
import pytest

from gitprov_ray import h264codec as H
from gitprov_ray import h264inter as HI
from gitprov_ray import mp4codec as M

rng = np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# §8.4.2.2 interpolation vs a direct scalar transcription of the spec
# ---------------------------------------------------------------------------

def _luma_sample_spec(ref, x, y, fx, fy):
    """One luma sample at full-pel (x,y) + frac (fx,fy), written straight
    from §8.4.2.2.1 with per-sample loops (no sharing with mc_luma)."""
    Hh, Ww = ref.shape

    def P(xx, yy):
        return int(ref[min(max(yy, 0), Hh - 1), min(max(xx, 0), Ww - 1)])

    taps = (1, -5, 20, 20, -5, 1)

    def b1(xx, yy):                      # unnorm half-horizontal
        return sum(c * P(xx + i - 2, yy) for i, c in enumerate(taps))

    def h1(xx, yy):                      # unnorm half-vertical
        return sum(c * P(xx, yy + i - 2) for i, c in enumerate(taps))

    def clip(v):
        return min(max(v, 0), 255)

    def b(xx, yy):
        return clip((b1(xx, yy) + 16) >> 5)

    def hs(xx, yy):
        return clip((h1(xx, yy) + 16) >> 5)

    def j(xx, yy):
        j1 = sum(c * b1(xx, yy + i - 2) for i, c in enumerate(taps))
        return clip((j1 + 512) >> 10)

    G = P(x, y)
    tab = {
        (0, 0): lambda: G,
        (1, 0): lambda: (G + b(x, y) + 1) >> 1,
        (2, 0): lambda: b(x, y),
        (3, 0): lambda: (b(x, y) + P(x + 1, y) + 1) >> 1,
        (0, 1): lambda: (G + hs(x, y) + 1) >> 1,
        (0, 2): lambda: hs(x, y),
        (0, 3): lambda: (hs(x, y) + P(x, y + 1) + 1) >> 1,
        (1, 1): lambda: (b(x, y) + hs(x, y) + 1) >> 1,
        (3, 1): lambda: (b(x, y) + hs(x + 1, y) + 1) >> 1,
        (1, 3): lambda: (hs(x, y) + b(x, y + 1) + 1) >> 1,
        (3, 3): lambda: (hs(x + 1, y) + b(x, y + 1) + 1) >> 1,
        (2, 1): lambda: (b(x, y) + j(x, y) + 1) >> 1,
        (2, 3): lambda: (j(x, y) + b(x, y + 1) + 1) >> 1,
        (1, 2): lambda: (hs(x, y) + j(x, y) + 1) >> 1,
        (3, 2): lambda: (j(x, y) + hs(x + 1, y) + 1) >> 1,
        (2, 2): lambda: j(x, y),
    }
    return tab[(fx, fy)]()


def test_mc_luma_all_fracs_match_scalar_spec():
    ref = rng.integers(0, 256, (24, 28), dtype=np.uint8)
    for fy in range(4):
        for fx in range(4):
            for mvi_x, mvi_y in ((0, 0), (-3, 2), (5, -4)):
                mvx, mvy = mvi_x * 4 + fx, mvi_y * 4 + fy
                got = HI.mc_luma(ref, 6, 5, mvx, mvy, 8, 8)
                exp = np.array(
                    [[_luma_sample_spec(ref, 6 + mvi_x + xx,
                                        5 + mvi_y + yy, fx, fy)
                      for xx in range(8)] for yy in range(8)],
                    np.uint8)
                assert np.array_equal(got, exp), (fx, fy, mvi_x, mvi_y)


def test_mc_luma_negative_mv_frac():
    """Negative quarter-pel MVs floor-divide (arithmetic shift) per
    spec: mv −1 means full-pel −1 + frac 3."""
    ref = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    got = HI.mc_luma(ref, 4, 4, -1, -1, 4, 4)
    exp = np.array([[_luma_sample_spec(ref, 4 - 1 + xx, 4 - 1 + yy, 3, 3)
                     for xx in range(4)] for yy in range(4)], np.uint8)
    assert np.array_equal(got, exp)


def test_mc_chroma_matches_scalar_spec():
    ref = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    Hh, Ww = ref.shape

    def P(xx, yy):
        return int(ref[min(max(yy, 0), Hh - 1), min(max(xx, 0), Ww - 1)])

    for mvx, mvy in ((0, 0), (3, 5), (-9, 7), (13, -2)):
        got = HI.mc_chroma(ref, 3, 2, mvx, mvy, 4, 4)
        dx, dy = mvx & 7, mvy & 7
        xb, yb = 3 + (mvx >> 3), 2 + (mvy >> 3)
        exp = np.array(
            [[((8 - dx) * (8 - dy) * P(xb + xx, yb + yy)
               + dx * (8 - dy) * P(xb + xx + 1, yb + yy)
               + (8 - dx) * dy * P(xb + xx, yb + yy + 1)
               + dx * dy * P(xb + xx + 1, yb + yy + 1) + 32) >> 6
              for xx in range(4)] for yy in range(4)], np.uint8)
        assert np.array_equal(got, exp), (mvx, mvy)


def test_cbp_inter_table_sane():
    assert sorted(HI.CBP_INTER) == list(range(48))
    # most common inter patterns take the shortest codes (Table 9-4)
    assert HI.CBP_INTER[0] == 0        # no residual
    assert HI.CBP_INTER[1] == 16       # chroma DC only
    assert HI.CBP_INTER[2:6] == [1, 2, 4, 8]   # single luma 8x8


# ---------------------------------------------------------------------------
# MVP rules
# ---------------------------------------------------------------------------

def _ctx(mb_w=4, mb_h=4):
    sps = H.parse_sps(H._sps_rbsp(mb_w * 16, mb_h * 16))
    pps = H.parse_pps(H._pps_rbsp())
    return H._PicCtx(sps, pps)


def test_mvp_median_and_unique_ref():
    ctx = _ctx()
    # current MB (1,1): A=(3,4) grid block left, B above, C above-right
    ctx.refidx[4, 3] = 0
    ctx.mvx[4, 3], ctx.mvy[4, 3] = 8, 2      # A
    ctx.refidx[3, 4] = 0
    ctx.mvx[3, 4], ctx.mvy[3, 4] = 4, 6      # B
    ctx.refidx[3, 8] = 0
    ctx.mvx[3, 8], ctx.mvy[3, 8] = 12, 4     # C
    assert HI.mvp_for(ctx, 4, 4, 4, 4, 0) == (8, 4)   # medians
    # unique matching refIdx wins outright
    ctx.refidx[3, 4] = 1
    ctx.refidx[3, 8] = 1
    assert HI.mvp_for(ctx, 4, 4, 4, 4, 0) == (8, 2)   # only A matches


def test_mvp_top_row_uses_a_only():
    ctx = _ctx()
    ctx.refidx[0, 3] = 0
    ctx.mvx[0, 3], ctx.mvy[0, 3] = -4, 8
    # current MB (1,0): B/C outside the picture, A available
    assert HI.mvp_for(ctx, 4, 0, 4, 4, 0) == (-4, 8)


def test_skip_mv_zero_when_neighbors_stationary():
    ctx = _ctx()
    # left neighbor is a zero-mv ref0 block → P_Skip mv must be (0,0)
    ctx.refidx[4, 3] = 0
    assert HI.skip_mv(ctx, 4, 4) == (0, 0)
    # MB at picture corner: A/B unavailable → (0,0)
    assert HI.skip_mv(ctx, 0, 0) == (0, 0)
    # moving neighbors: falls through to the 16x16 MVP
    ctx.mvx[4, 3], ctx.mvy[4, 3] = 4, 4
    ctx.refidx[3, 4] = 0
    ctx.mvx[3, 4], ctx.mvy[3, 4] = 8, 8
    ctx.refidx[3, 8] = 0
    ctx.mvx[3, 8], ctx.mvy[3, 8] = 6, 2
    assert HI.skip_mv(ctx, 4, 4) == (6, 4)


# ---------------------------------------------------------------------------
# GOP round-trips (encoder recon IS the conforming decoder output)
# ---------------------------------------------------------------------------

def _moving_frames(n, h, w, step=3):
    """Translating texture + a moving block: P frames get real motion."""
    base = rng.integers(0, 256, (h + n * step, w + n * step),
                        dtype=np.uint8)
    out = []
    for i in range(n):
        f = np.stack([base[i * step:i * step + h,
                           i * step:i * step + w]] * 3, axis=-1).copy()
        y = (i * 5) % (h - 8)
        f[y:y + 8, 4:12] = (i * 37) % 255
        out.append(f)
    return out


def test_gop_roundtrip_pixel_exact_16x16():
    frames = _moving_frames(5, 32, 48)
    stream, recons = HI.encode_gop_annexb(frames, qp=24, gop=5)
    dec = H.decode_annexb(stream)
    assert len(dec) == 5
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
    # the P frames must be a real approximation of the source too
    err = np.abs(dec[3].astype(int) - frames[3].astype(int)).mean()
    assert err < 12


def test_gop_roundtrip_partition_cycle_and_intra_mbs():
    """16x8 / 8x16 / P_8x8 partitions + intra MBs inside P slices."""
    frames = _moving_frames(4, 48, 48, step=2)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=20, gop=4, partition_cycle=True, intra_every=5)
    dec = H.decode_annexb(stream)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_gop_roundtrip_multiple_qps_and_static_skip():
    static = [np.full((32, 32, 3), 77, np.uint8)] * 4
    for qp in (12, 30, 40):
        stream, recons = HI.encode_gop_annexb(static, qp=qp, gop=4)
        dec = H.decode_annexb(stream)
        for d, r in zip(dec, recons):
            assert np.array_equal(d, r)
    # static P pictures collapse into skip runs: tiny P slices
    nals = list(H.iter_nals_annexb(stream))
    p_sizes = [len(n) for n in nals if (n[0] & 0x1F) == 1]
    assert p_sizes and max(p_sizes) < 20


def test_gop_second_idr_resets_references():
    frames = _moving_frames(6, 32, 32)
    stream, recons = HI.encode_gop_annexb(frames, qp=26, gop=3)
    dec = H.decode_annexb(stream)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_mp4_gop_end_to_end_with_sync_table():
    frames = _moving_frames(6, 32, 32)
    b, recons = M.encode_mp4_h264_gop(frames, fps=5, qp=24, gop=3,
                                      partition_cycle=True)
    p = M.probe_mp4(b)
    t = p["tracks"][0]
    assert t["codec"] == "avc1" and t["sample_count"] == 6
    assert t["sync_samples"] == [1, 4]        # only the IDRs
    dec = M.decode_mp4_frames(b)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_inter_stub_boundaries():
    frames = _moving_frames(2, 16, 16)
    stream, _ = HI.encode_gop_annexb(frames, qp=26, gop=2)
    # SP/SI switching slices still raise (B decodes now — h264inter)
    sps = H._sps_rbsp(16, 16)
    pps = H._pps_rbsp()
    bw = H._BitWriter()
    bw.ue(0)
    bw.ue(3)          # slice_type SP
    bw.ue(0)
    bad = (b"\x00\x00\x00\x01" + H._nal(7, sps)
           + b"\x00\x00\x00\x01" + H._nal(8, pps)
           + b"\x00\x00\x00\x01" + H._nal(1, bw.trailing()))
    with pytest.raises(NotImplementedError, match="SP/SI"):
        H.decode_annexb(bad)
    # P/B slices with no prior reference picture are an error
    nals = list(H.iter_nals_annexb(stream))
    sc = b"\x00\x00\x00\x01"
    no_idr = b"".join(sc + n for n in nals if (n[0] & 0x1F) != 5)
    with pytest.raises(ValueError, match="no decoded reference"):
        H.decode_annexb(no_idr)
    bw = H._BitWriter()
    bw.ue(0)
    bw.ue(6)          # slice_type B, no refs decoded
    bw.ue(0)
    bad_b = (b"\x00\x00\x00\x01" + H._nal(7, sps)
             + b"\x00\x00\x00\x01" + H._nal(8, pps)
             + b"\x00\x00\x00\x01" + H._nal(1, bw.trailing()))
    with pytest.raises(ValueError, match="no decoded reference"):
        H.decode_annexb(bad_b)


# ---------------------------------------------------------------------------
# B slices (spatial direct, bi-prediction) round-trips
# ---------------------------------------------------------------------------

def test_b_gop_roundtrip_pixel_exact():
    """I P B P B P: non-reference B slices with direct/L0/L1/Bi 16x16
    selection and B_Skip; pixel-exact against the decoder."""
    frames = _moving_frames(6, 32, 48)
    stream, recons = HI.encode_gop_annexb(frames, qp=24, gop=6,
                                          bframes=True)
    # stream really contains non-reference NALs (B pictures)
    nals = list(H.iter_nals_annexb(stream))
    ref_idcs = [(n[0] >> 5) & 3 for n in nals if (n[0] & 0x1F) == 1]
    assert 0 in ref_idcs and 2 in ref_idcs
    dec = H.decode_annexb(stream)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
    err = np.abs(dec[4].astype(int) - frames[4].astype(int)).mean()
    assert err < 12


def test_b_gop_partition_cycle_and_intra():
    """Composite B types (B_L0_L1_16x8, B_L0_Bi_8x16), B_8x8 with a
    direct 8x8 sub-block + Bi_8x8 + L1_8x4, intra MBs in B slices."""
    frames = _moving_frames(5, 48, 48, step=2)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=20, gop=5, bframes=True, partition_cycle=True,
        intra_every=7)
    dec = H.decode_annexb(stream)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_b_static_collapses_to_skip():
    static = [np.full((32, 32, 3), 90, np.uint8)] * 5
    stream, recons = HI.encode_gop_annexb(static, qp=28, gop=5,
                                          bframes=True)
    dec = H.decode_annexb(stream)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
    nals = list(H.iter_nals_annexb(stream))
    b_sizes = [len(n) for n in nals
               if (n[0] & 0x1F) == 1 and (n[0] >> 5) == 0]
    assert b_sizes and max(b_sizes) < 20      # all B_Skip runs


def test_b_mp4_end_to_end():
    frames = _moving_frames(6, 32, 32)
    b, recons = M.encode_mp4_h264_gop(frames, fps=5, qp=24, gop=6,
                                      bframes=True,
                                      partition_cycle=True)
    t = M.probe_mp4(b)["tracks"][0]
    assert t["codec"] == "avc1" and t["sample_count"] == 6
    assert t["sync_samples"] == [1]
    dec = M.decode_mp4_frames(b)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_b_lists_swap_rule():
    """§8.2.4.2.3: with identical past-only lists, L1's first two
    entries swap so the lists differ."""
    r1, r2 = object(), object()
    L0, L1 = HI._b_lists([r1, r2])
    assert L0 == [r1, r2] and L1 == [r2, r1]
    L0, L1 = HI._b_lists([r1])
    assert L0 == [r1] and L1 == [r1]


def test_direct_spatial_rules():
    """§8.4.1.2.2/.3 pinned directly: min-positive neighbor refIdx per
    list, 16x16 MVP as base motion, colZeroFlag zeroing only refIdx-0
    lists, and direct-zero-prediction when no neighbor has a
    reference."""
    import types

    ctx = _ctx()
    col = types.SimpleNamespace(
        refidx=np.full((16, 16), -1, np.int32),
        mvx=np.zeros((16, 16), np.int32),
        mvy=np.zeros((16, 16), np.int32))
    # no neighbors referenced in either list → direct zero prediction
    r0, r1, mv0, mv1, cz = HI._direct_spatial(ctx, 1, 1, [col])
    assert (r0, r1, mv0, mv1) == (0, 0, (0, 0), (0, 0))
    assert not cz.any()
    # L0: A has ref 1, B has ref 0 → min positive = 0; L1 empty → -1
    ctx.refidx[4, 3] = 1
    ctx.mvx[4, 3], ctx.mvy[4, 3] = 40, 40
    ctx.refidx[3, 4] = 0
    ctx.mvx[3, 4], ctx.mvy[3, 4] = 8, 12
    r0, r1, mv0, mv1, cz = HI._direct_spatial(ctx, 1, 1, [col])
    assert r0 == 0 and r1 == -1
    # only B matches refIdx 0 → mvp = mvB
    assert mv0 == (8, 12)
    # colocated stationary ref-0 block → colZeroFlag for that 4x4
    col2 = types.SimpleNamespace(
        refidx=np.full((16, 16), 0, np.int32),
        mvx=np.ones((16, 16), np.int32),      # |mv| <= 1 → still zero
        mvy=np.zeros((16, 16), np.int32))
    r0b, r1b, mv0b, _, czb = HI._direct_spatial(ctx, 1, 1, [col2])
    assert czb.all() and r0b == 0
    # moving colocated (|mv| > 1) clears the flag
    col3 = types.SimpleNamespace(
        refidx=np.full((16, 16), 0, np.int32),
        mvx=np.full((16, 16), 2, np.int32),
        mvy=np.zeros((16, 16), np.int32))
    _, _, _, _, cz3 = HI._direct_spatial(ctx, 1, 1, [col3])
    assert not cz3.any()
    # the per-block zeroing applies only where the flag is set
    parts = HI._direct_parts(ctx, 1, 1, [col2], [(0, 0)])
    assert parts[0][4] == (0, 0, 0)           # ref0, mv forced to zero
    parts = HI._direct_parts(ctx, 1, 1, [col3], [(0, 0)])
    assert parts[0][4] == (0, 8, 12)          # base mvp survives


# ---------------------------------------------------------------------------
# explicit weighted prediction (§7.3.3.2 / §8.4.2.3.2)
# ---------------------------------------------------------------------------

def _fade_frames(n, h, w):
    """Moving texture under a global brightness ramp — the shape
    weighted prediction exists for."""
    base = rng.integers(0, 256, (h, w + n * 2, 3), dtype=np.uint8)
    out = []
    for i in range(n):
        f = base[:, i * 2:i * 2 + w].astype(np.int32)
        out.append(np.clip(f * (32 - i) // 32 + i * 3, 0,
                           255).astype(np.uint8))
    return out


def test_wp_uni_matches_scalar_spec():
    # eq. 8-269/8-271 straight-line integer twin (incl. logWD == 0
    # and negative weights, where >> must stay arithmetic)
    rng2 = np.random.default_rng(3)
    p = rng2.integers(0, 256, (4, 4), np.uint8)
    for w, o, d in ((40, -8, 5), (-13, 100, 5), (3, -2, 0), (1, 0, 0)):
        got = HI._wp_uni(p, w, o, d)
        for y in range(4):
            for x in range(4):
                v = int(p[y, x]) * w
                if d >= 1:
                    v = (v + (1 << (d - 1))) >> d
                v += o
                assert got[y, x] == min(255, max(0, v))


def test_wp_bi_matches_scalar_spec():
    rng2 = np.random.default_rng(4)
    p0 = rng2.integers(0, 256, (4, 4), np.uint8)
    p1 = rng2.integers(0, 256, (4, 4), np.uint8)
    for w0, o0, w1, o1, d in ((20, 5, 12, -3, 4), (-16, 0, 48, 7, 5)):
        got = HI._wp_bi(p0, p1, w0, o0, w1, o1, d)
        for y in range(4):
            for x in range(4):
                v = ((int(p0[y, x]) * w0 + int(p1[y, x]) * w1
                      + (1 << d)) >> (d + 1)) + ((o0 + o1 + 1) >> 1)
                assert got[y, x] == min(255, max(0, v))


def test_pred_weight_table_bit_exact_parse():
    # hand-written table: 2 refs — ref0 custom luma+chroma, ref1 default
    bw = H._BitWriter()
    HI._write_pred_weight_entries(
        bw, {"ld": 5, "cd": 4,
             "e": [(40, -8, 28, 4, 36, -2), (32, 0, 16, 0, 16, 0)]})
    r = H._BitReader(bw.trailing())
    wp = HI._parse_pred_weight_table(r, 2, 5, 4)
    assert wp["e"][0] == (40, -8, 28, 4, 36, -2)
    assert wp["e"][1] == (32, 0, 16, 0, 16, 0)   # flag-0 defaults


def test_weighted_p_gop_roundtrip_pixel_exact():
    frames = _fade_frames(6, 32, 48)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=24, gop=6, partition_cycle=True, intra_every=5,
        weighted=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == 6
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
    # weights genuinely engaged: stream with identical content but
    # weighting off must produce different P-slice bits
    stream0, _ = HI.encode_gop_annexb(
        frames, qp=24, gop=6, partition_cycle=True, intra_every=5,
        weighted=False)
    assert stream != stream0


def test_weighted_b_gop_roundtrip_pixel_exact():
    frames = _fade_frames(8, 32, 48)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=24, gop=8, bframes=True, partition_cycle=True,
        weighted=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == 8
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_weighted_mp4_route_roundtrip():
    frames = _fade_frames(6, 32, 32)
    blob, recons = M.encode_mp4_h264_gop(frames, qp=26, gop=6,
                                         bframes=True, weighted=True)
    decoded = M.decode_mp4_frames(blob)
    assert len(decoded) == len(recons)
    for d, r in zip(decoded, recons):
        assert np.array_equal(d, r)


# ---------------------------------------------------------------------------
# temporal direct + implicit weighted biprediction (POC-derived)
# ---------------------------------------------------------------------------

def test_temporal_direct_scaling_spec_exact():
    """§8.4.1.2.3 eq. 8-196..8-204 against a hand computation:
    colocated MV scaled by DistScaleFactor, refIdxL0 mapped through
    the colocated picture's list-0 identity."""
    import types

    sps = H.parse_sps(H._sps_rbsp(32, 32, 2))
    pps = H.parse_pps(H._pps_rbsp())
    ctx = H._PicCtx(sps, pps)
    ctx.poc = 5
    p_old = types.SimpleNamespace(poc=0, l0_pids=[])
    col = types.SimpleNamespace(
        poc=4, l0_pids=[id(p_old)],
        refidx=np.zeros((8, 8), np.int32),
        mvx=np.full((8, 8), 16, np.int32),
        mvy=np.full((8, 8), -8, np.int32))
    parts = HI._direct_parts_temporal(ctx, 0, 0, [col, p_old], [col],
                                      [(0, 0)])
    _, _, _, _, p0, p1 = parts[0]
    tx = (16384 + 2) // 4                     # td = 4
    dsf = (5 * tx + 32) >> 6                  # tb = 5
    assert p0 == (1, (dsf * 16 + 128) >> 8, (dsf * -8 + 128) >> 8)
    assert p1 == (0, p0[1] - 16, p0[2] + 8)
    # td == 0 → unscaled copy; colocated intra → zero motion
    col.poc = 0
    _, _, _, _, q0, q1 = HI._direct_parts_temporal(
        ctx, 0, 0, [col, p_old], [col], [(0, 0)])[0]
    assert q0 == (1, 16, -8) and q1 == (0, 0, 0)
    col.refidx[:] = -1
    _, _, _, _, z0, _ = HI._direct_parts_temporal(
        ctx, 0, 0, [col, p_old], [col], [(0, 0)])[0]
    assert z0[1:] == (0, 0)


def test_temporal_direct_gop_roundtrip():
    frames = _moving_frames(8, 32, 48)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=24, bframes=True, temporal_direct=True,
        partition_cycle=True)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"
    # the stream genuinely clears direct_spatial_mv_pred: a spatial
    # encode of the same frames produces different B-slice bits
    stream_sp, _ = HI.encode_gop_annexb(
        frames, qp=24, bframes=True, partition_cycle=True)
    assert stream != stream_sp


def test_implicit_weighted_bipred_gop_roundtrip():
    frames = _moving_frames(8, 32, 48)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=24, bframes=True, implicit_weighted=True)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_temporal_plus_implicit_roundtrip():
    frames = _moving_frames(8, 32, 48)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=26, bframes=True, temporal_direct=True,
        implicit_weighted=True, intra_every=5)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_poc_type2_wrap_consistency():
    """frame_num wraps at 2^4 in the fixture SPS; POC must keep
    increasing through the wrap on both sides (long GOP)."""
    frames = _moving_frames(20, 16, 16)
    stream, recons = HI.encode_gop_annexb(
        frames, qp=28, gop=20, bframes=True, temporal_direct=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == 20
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_ref_pic_list_modification_roundtrip():
    """§8.2.4.3.1 short-term reordering: P slices alternate between
    default order and a modification placing the second-most-recent
    picture first (num_ref_idx override + per-partition te ref_idx);
    decode must follow the reordered list exactly."""
    frames = _moving_frames(6, 32, 48)
    sps_r = H._sps_rbsp(48, 32, 2)
    pps_r = H._pps_rbsp()
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, sps_r), sc + H._nal(8, pps_r)]
    recons = []
    poc_state = {}
    poc = H._poc_of(sps, 0, nonref=False, idr=True,
                    poc_state=poc_state)
    rbsp, recon, planes = H._slice_rbsp_cavlc(frames[0], 24)
    out.append(sc + H._nal(5, rbsp))
    refs = [HI._enc_ref(planes, poc=poc)]
    recons.append(recon)
    fn = 1
    for f in frames[1:]:
        poc = H._poc_of(sps, fn, nonref=False, idr=False,
                        poc_state=poc_state)
        rbsp, ref, recon = HI.encode_p_slice(
            f, refs, 24, fn, sps, pps, partition_cycle=True,
            poc=poc, reorder_refs=(fn % 2 == 0))
        out.append(sc + H._nal(1, rbsp, ref_idc=2))
        refs.insert(0, ref)
        del refs[2:]
        fn = (fn + 1) & 0xF
        recons.append(recon)
    dec = H.decode_annexb(b"".join(out))
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_apply_list_mod_spec_cases():
    import types

    a = types.SimpleNamespace(fn=5)
    b = types.SimpleNamespace(fn=4)
    c = types.SimpleNamespace(fn=3)
    lst = [a, b, c]
    # name pic 3 (abs_diff 3 → v=2, idc 0) → moves to front
    out = HI._apply_list_mod(lst, [(0, 2)], cur_fn=6, max_fn=16)
    assert [p.fn for p in out] == [3, 5, 4]
    # two mods: 4 then 3
    out = HI._apply_list_mod(lst, [(0, 1), (0, 0)], cur_fn=6,
                             max_fn=16)
    assert [p.fn for p in out] == [4, 3, 5]
    # frame_num wrap: cur_fn 1, ref with fn 15 has PicNum -1
    w = types.SimpleNamespace(fn=15)
    x = types.SimpleNamespace(fn=0)
    out = HI._apply_list_mod([x, w], [(0, 1)], cur_fn=1, max_fn=16)
    assert [p.fn for p in out] == [15, 0]


def test_mmco_adaptive_marking_roundtrip():
    """§8.2.5.4.1 MMCO op 1: P slices with a 3-deep reference window
    periodically unmark the OLDEST short-term picture by PicNum
    difference; the decoder's window must track the encoder's."""
    frames = _moving_frames(8, 32, 48)
    sps_r = H._sps_rbsp(48, 32, 3)
    pps_r = H._pps_rbsp()
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    sc = b"\x00\x00\x00\x01"
    out = [sc + H._nal(7, sps_r), sc + H._nal(8, pps_r)]
    recons = []
    poc_state = {}
    poc = H._poc_of(sps, 0, nonref=False, idr=True,
                    poc_state=poc_state)
    rbsp, recon, planes = H._slice_rbsp_cavlc(frames[0], 24)
    out.append(sc + H._nal(5, rbsp))
    refs = [HI._enc_ref(planes, poc=poc)]
    recons.append(recon)
    fn = 1
    for i, f in enumerate(frames[1:]):
        poc = H._poc_of(sps, fn, nonref=False, idr=False,
                        poc_state=poc_state)
        mmco = None
        if len(refs) >= 3 and i % 3 == 2:
            oldest = refs[-1]
            pn = oldest.fn if oldest.fn <= fn else oldest.fn - 16
            mmco = [(1, fn - pn - 1)]
        rbsp, ref, recon = HI.encode_p_slice(
            f, refs, 24, fn, sps, pps, poc=poc, mmco=mmco)
        out.append(sc + H._nal(1, rbsp, ref_idc=2))
        if mmco:
            HI.apply_mmco(refs, mmco, fn, 16)
        refs.insert(0, ref)
        del refs[3:]
        fn = (fn + 1) & 0xF
        recons.append(recon)
    dec = H.decode_annexb(b"".join(out))
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"
    # long-term ops still raise by name
    bw = H._BitWriter()
    bw.ue(4)
    bw.ue(0)
    with pytest.raises(NotImplementedError, match="MMCO op 4"):
        HI._parse_mmco(H._BitReader(bw.trailing()))
