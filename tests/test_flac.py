"""FLAC codec: lossless round-trip at several block sizes and signal
shapes, stereo decorrelation modes, STREAMINFO probe, and hand-crafted
bitstreams for the decoder paths our fixture encoder never emits (LPC
subframes, Rice2 coding, escape partitions, partition order > 0, wasted
bits) — each built bit-by-bit from the RFC 9639 layout and checked
against an independently computed sample reconstruction."""

import struct

import numpy as np
import pytest

import gitprov_ray.flaccodec as F
from gitprov_ray import multimodal as M


def _roundtrip(x, bs, **kw):
    b = F.encode_flac(x, rate=8000, block_size=bs, **kw)
    y, rate = F.decode_flac(b)
    ch0 = x[0] if np.asarray(x).ndim == 2 else x
    want = np.round(np.clip(ch0, -1, 1) * 32767).astype(np.int64)
    got = np.round(y.astype(np.float64) * 32768).astype(np.int64)
    assert rate == 8000
    assert len(got) == len(want)
    assert (got == want).all()
    return b


@pytest.mark.parametrize("bs", [192, 256, 1000, 4096])
def test_roundtrip_tone(bs):
    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(5000) / 8000)
    _roundtrip(x, bs)


def test_roundtrip_shapes():
    rng = np.random.RandomState(3)
    _roundtrip(rng.randn(3333) * 0.2, 512)          # noise → high-order
    b = _roundtrip(np.full(2048, 0.25), 1024)       # constant subframes
    assert len(b) < 100                             # really compressed
    _roundtrip(np.linspace(-1, 1, 4097), 1024)      # ramp → order-1/2
    _roundtrip(np.zeros(10), 256)                   # tiny tail block


def test_roundtrip_stereo_modes():
    rng = np.random.RandomState(5)
    t = np.arange(3000) / 8000
    st = np.stack([0.4 * np.sin(2 * np.pi * 300 * t),
                   0.4 * np.sin(2 * np.pi * 310 * t)
                   + 0.01 * rng.randn(3000)])
    _roundtrip(st, 512, stereo_mode="independent")
    _roundtrip(st, 512, stereo_mode="mid_side")


def test_probe_and_corrupt_crc():
    x = 0.3 * np.sin(2 * np.pi * 200 * np.arange(4000) / 8000)
    b = F.encode_flac(x, rate=44100, block_size=1024)
    p = F.probe_flac(b)
    assert p == {"codec": "flac", "rate": 44100, "channels": 1,
                 "bits": 16, "duration_ms": int(4000 * 1000 / 44100)}
    assert F.probe_flac(b"RIFFxxxx") is None
    bad = bytearray(b)
    bad[-1] ^= 0xFF                 # clobber last frame's CRC-16
    with pytest.raises(ValueError, match="CRC"):
        F.decode_flac(bytes(bad))


# ---------------------------------------------------------------------------
# hand-crafted bitstreams for decoder-only paths
# ---------------------------------------------------------------------------

def _manual_stream(n, write_subframe, bps=16, rate=8000):
    out = bytearray(b"fLaC")
    si = F._BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)                  # mono
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    w = F._BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)                   # 16-bit block size follows
    w.write(0, 4)                   # rate from STREAMINFO
    w.write(0, 4)                   # mono
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
    w.write(0, 1)
    for byte in F._utf8_encode(0):
        w.write(byte, 8)
    w.write(n - 1, 16)
    w.align()
    hdr = w.bytes()
    hdr += bytes([F.crc8(hdr)])
    w = F._BitWriter()
    write_subframe(w)
    w.align()
    frame = hdr + w.bytes()
    frame += struct.pack(">H", F.crc16(frame))
    return bytes(out + frame)


def _decode_ints(b, bps=16):
    y, _ = F.decode_flac(b)
    return np.round(y.astype(np.float64) * (1 << (bps - 1))).astype(np.int64)


def test_lpc_subframe_decodes():
    warm = [100, -50]
    coefs = [3, -1]                 # x[i] = (3*x[i-1] - x[i-2]) >> 1 + res
    shift = 1
    res = [5, -3, 0, 7, -2, 1]
    n = len(warm) + len(res)

    def sub(w):
        w.write(0, 1)
        w.write(32 + 1, 6)          # LPC order 2 (= 31 + order)
        w.write(0, 1)
        for v in warm:
            w.write(v, 16)
        w.write(4 - 1, 4)           # precision 4
        w.write(shift, 5)
        for c in coefs:
            w.write(c, 4)
        w.write(0, 2)               # Rice 4-bit
        w.write(0, 4)               # partition order 0
        u = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in res]
        k = 2
        w.write(k, 4)
        for v in u:
            w.write_unary(v >> k)
            w.write(v, k)

    got = _decode_ints(_manual_stream(n, sub))
    want = list(warm)
    for r in res:
        pred = (coefs[0] * want[-1] + coefs[1] * want[-2]) >> shift
        want.append(r + pred)
    assert (got == np.array(want)).all()


def test_rice2_and_partitions():
    # FIXED order 1, Rice2 (5-bit params), partition order 1 (2 partitions)
    warm = [10]
    res = [1, -2, 3, -1, 0, 2, -3]  # n = 8, partitions of 3 and 4
    n = 8

    def sub(w):
        w.write(0, 1)
        w.write(8 + 1, 6)           # FIXED order 1
        w.write(0, 1)
        w.write(warm[0], 16)
        w.write(1, 2)               # Rice2
        w.write(1, 4)               # partition order 1
        u = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in res]
        for part, k in ((u[:3], 1), (u[3:], 2)):
            w.write(k, 5)
            for v in part:
                w.write_unary(v >> k)
                w.write(v, k)

    got = _decode_ints(_manual_stream(n, sub))
    want = list(warm)
    for r in res:
        want.append(r + want[-1])
    assert (got == np.array(want)).all()


def test_escape_partition_and_wasted_bits():
    # CONSTANT with 3 wasted bits: stored at bps-3, shifted back up
    def sub_const(w):
        w.write(0, 1)
        w.write(0, 6)
        w.write(1, 1)               # wasted-bits flag
        w.write_unary(2)            # unary 2 → wasted = 3
        w.write(-12, 13)            # 16-3 bits

    got = _decode_ints(_manual_stream(4, sub_const))
    assert (got == np.full(4, -12 << 3)).all()

    # FIXED order 0 with an escape partition (raw 7-bit residuals)
    res = [63, -64, 17, -1]

    def sub_esc(w):
        w.write(0, 1)
        w.write(8, 6)               # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)
        w.write(0, 4)
        w.write(0b1111, 4)          # escape
        w.write(7, 5)               # raw bit width
        for v in res:
            w.write(v, 7)

    got = _decode_ints(_manual_stream(4, sub_esc))
    assert (got == np.array(res)).all()


# ---------------------------------------------------------------------------
# pipeline wiring
# ---------------------------------------------------------------------------

def test_parse_wav_routes_flac():
    x = M._synth_audio_signal(9)
    b = F.encode_flac(x, rate=8000, block_size=512)
    y, rate = M.parse_wav(b)
    assert rate == 8000 and len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3       # 16-bit quantization only


def test_probe_media_flac():
    b = F.encode_flac(M._synth_audio_signal(4), rate=8000, block_size=512)
    p = M.probe_media(b)
    assert p["format"] == "flac" and p["codec"] == "flac"
    assert p["duration_ms"] == 250


def test_corpus_carries_flac_and_features():
    t = M.synth_media_table(48)
    mimes = t.column("mime").to_pylist()
    assert "audio/flac" in mimes
    aud = t.filter(__import__("pyarrow").compute.equal(t["kind"], "audio"))
    out = M.AudioFeatures()(aud).to_pylist()
    assert len(out) == 16
    for r in out:
        assert r["duration_ms"] == 250 and 0.1 < r["rms"] < 1.0
