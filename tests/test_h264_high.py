"""High-profile Intra_8x8 (h264high): transform pair, zigzag, filtered
prediction, and pixel-exact slice round-trips."""

import numpy as np

from gitprov_ray import h264codec as H
from gitprov_ray import h264high as HH

rng = np.random.default_rng(55)


def test_zigzag8_is_the_classic_walk():
    z = HH.ZIGZAG8
    assert list(z[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert z[-1] == 63 and len(set(z.tolist())) == 64


def test_transform_pair_rate_distortion_progression():
    errs = {}
    for qp in (0, 12, 26, 40):
        e = []
        for _ in range(30):
            r = rng.integers(-80, 80, (8, 8)).astype(np.int64)
            z = HH.quant8x8(HH.forward8x8(r), qp)
            rec = HH.inverse8x8(HH.dequant8x8(z, qp))
            e.append(np.abs(rec - r).mean())
        errs[qp] = float(np.mean(e))
    assert errs[0] < 0.1                      # near-lossless at qp 0
    assert errs[0] < errs[12] < errs[26] < errs[40]


def test_inverse_butterfly_dc_impulse():
    d = np.zeros((8, 8), np.int64)
    d[0, 0] = 640
    out = HH.inverse8x8(d)
    assert (out == 10).all()                  # (640 + 32) >> 6


def test_dequant_weighting_classes():
    # the six position classes tile the 8x8 exactly
    counts = np.bincount(HH._CLASS8.reshape(-1), minlength=6)
    assert list(counts) == [4, 16, 4, 16, 8, 16]
    # DC weight row 0
    assert HH._M8[0, 0, 0] == 20 and HH._M8[0, 1, 1] == 18


def test_pred8x8_filtered_vertical_flat():
    top = np.full(16, 200, np.uint8)
    p = HH.pred8x8(0, np.zeros(8, np.uint8), top, None, False, True)
    assert (p == 200).all()                   # filter keeps flat flat


def test_pred8x8_dc_fallbacks():
    p = HH.pred8x8(2, np.zeros(8, np.uint8), np.zeros(16, np.uint8),
                   None, False, False)
    assert (p == 128).all()
    left = np.full(8, 60, np.uint8)
    p = HH.pred8x8(2, left, np.zeros(16, np.uint8), None, True, False)
    assert (p == 60).all()


def test_all_modes_all_availability():
    for al, at in ((True, True), (True, False), (False, True)):
        left = rng.integers(0, 256, 8, np.uint8)
        top = rng.integers(0, 256, 16, np.uint8)
        corner = 99 if (al and at) else None
        for m in range(9):
            nl, nt = HH.mode8x8_requires(m)
            if (nl and not al) or (nt and not at):
                continue
            if m in (4, 5, 6) and corner is None:
                continue
            p = HH.pred8x8(m, left, top, corner, al, at)
            assert p.shape == (8, 8) and p.dtype == np.uint8


def test_high_slice_roundtrip_all_8x8():
    arr = rng.integers(0, 256, (48, 64, 3), np.uint8)
    arr[:24] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None]
    stream, recons = HH.encode_gop_high([arr], qp=26, mix=False)
    dec = H.decode_annexb(stream)
    assert np.array_equal(dec[0], recons[0])
    # the stream is genuinely High profile with the 8x8 flag
    nal = next(n for n in H.iter_nals_annexb(stream)
               if (n[0] & 0x1F) == 7)
    assert nal[1] == 100


def test_high_slice_roundtrip_mixed_mb_kinds():
    for qp in (18, 26, 34):
        arr = rng.integers(0, 256, (32, 48, 3), np.uint8)
        stream, recons = HH.encode_gop_high([arr] * 2, qp=qp, mix=True)
        dec = H.decode_annexb(stream)
        for d, r in zip(dec, recons):
            assert np.array_equal(d, r), qp


def test_high_recon_approximates_source():
    y, x = np.mgrid[0:48, 0:64]
    arr = np.stack([(x * 3) % 256, (y * 5) % 256,
                    ((x + y) * 2) % 256], -1).astype(np.uint8)
    stream, recons = HH.encode_gop_high([arr], qp=20, mix=False)
    dec = H.decode_annexb(stream)
    err = np.abs(dec[0].astype(int) - arr.astype(int)).mean()
    assert err < 8                            # real compression quality


def test_cabac_high_intra_roundtrip():
    """CABAC + transform_8x8 — the exact shape x264 emits for High
    intra frames — through the full Annex-B route."""
    from gitprov_ray import h264cabac as C

    frames = [rng.integers(0, 256, (48, 64, 3), np.uint8)
              for _ in range(2)]
    frames[0][:24] = np.linspace(0, 255, 64,
                                 dtype=np.uint8)[None, :, None]
    stream, recons = C.encode_gop_cabac(frames, qp=26,
                                        transform_8x8=True)
    dec = H.decode_annexb(stream)
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"
    nal = next(n for n in H.iter_nals_annexb(stream)
               if (n[0] & 0x1F) == 7)
    assert nal[1] == 100                      # High profile SPS


def test_cabac_cat5_residual_roundtrip():
    from gitprov_ray import h264cabac as C

    for trial in range(20):
        lv = np.zeros(64, np.int64)
        nnz = int(rng.integers(0, 65))
        lv[rng.choice(64, nnz, replace=False)] = rng.integers(-60, 61,
                                                              nnz)
        cw = C.Ctxs(26)
        w = C.CabacWriter()
        cbf = C.write_residual8_cabac(w, cw, lv, 1)
        w.terminate(1)
        got = C.read_residual8_cabac(
            C.CabacReader(w.payload(), 0), C.Ctxs(26), 1)
        if not np.any(lv):
            assert cbf == 0 and got is None
        else:
            assert np.array_equal(got, lv)


def test_high_intra_mp4_route_both_entropy_modes():
    from gitprov_ray import mp4codec as M

    frames = [rng.integers(0, 256, (32, 48, 3), np.uint8)
              for _ in range(3)]
    for cabac in (False, True):
        blob, recons = M.encode_mp4_h264_gop(
            frames, qp=26, high_intra=True, cabac=cabac)
        dec = M.decode_mp4_frames(blob)
        for d, r in zip(dec, recons):
            assert np.array_equal(d, r), cabac


def test_inter_8x8_gop_roundtrip():
    """P slices under a transform_8x8 PPS: the flag follows cbp
    (§7.3.5) and coded 8x8 luma blocks carry the High transform over
    the motion-compensated prediction — full High-profile IDR+P."""
    def moving(n, h, w, step=3):
        base = rng.integers(0, 256, (h + n * step, w + n * step),
                            np.uint8)
        return [np.stack([base[i * step:i * step + h,
                               i * step:i * step + w]] * 3, -1).copy()
                for i in range(n)]

    frames = moving(6, 32, 48)
    stream, recons = HH.encode_gop_high_p(frames, qp=24,
                                          partition_cycle=True)
    dec = H.decode_annexb(stream)
    assert len(dec) == 6
    for i, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d, r), f"frame {i}"
    # P frames genuinely approximate the moving source
    err = np.abs(dec[3].astype(int) - frames[3].astype(int)).mean()
    assert err < 12
