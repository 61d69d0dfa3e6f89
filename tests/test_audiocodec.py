"""WAV audio codecs beyond stdlib wave (audiocodec.py): G.711
μ-law/A-law pinned bit-exact against the stdlib audioop oracle, IMA
ADPCM roundtrip SNR, format probing, and the AudioFeatures stage on
compressed-audio payloads."""

import warnings

import numpy as np
import pytest

from gitprov_ray import audiocodec as A


def _sine(ms=250, rate=8000, amp=0.6, freq=440):
    t = np.arange(rate * ms // 1000) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_g711_tables_match_audioop():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    codes = bytes(range(256))
    assert (A._MULAW == np.frombuffer(audioop.ulaw2lin(codes, 2),
                                      "<i2")).all()
    assert (A._ALAW == np.frombuffer(audioop.alaw2lin(codes, 2),
                                     "<i2")).all()


@pytest.mark.parametrize("law", ["mulaw", "alaw"])
def test_g711_roundtrip_snr(law):
    x = _sine()
    y, rate, name = A.parse_wav_extended(A.write_wav_g711(x, law=law))
    assert name == law and rate == 8000 and len(y) == len(x)
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr > 30                       # 8-bit companding ≈ 37 dB


def test_ima_adpcm_roundtrip_snr():
    x = _sine()
    y, rate, name = A.parse_wav_extended(A.write_wav_ima_adpcm(x))
    assert name == "ima_adpcm"
    snr = 10 * np.log10(np.mean(x ** 2)
                        / np.mean((x - y[: len(x)]) ** 2))
    assert snr > 20                       # 4-bit ADPCM ≈ 30 dB


def test_ms_adpcm_roundtrip_snr_and_probe():
    x = _sine()
    wav = A.write_wav_ms_adpcm(x)
    y, rate, name = A.parse_wav_extended(wav)
    assert name == "ms_adpcm" and rate == 8000 and len(y) == len(x)
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr > 20                       # 4-bit ADPCM
    from gitprov_ray.multimodal import probe_media

    meta = probe_media(wav)
    assert (meta["format"], meta["codec"]) == ("wav", "ms_adpcm")
    # decoder == encoder's tracked reconstruction: re-encode is a fixpoint
    y2, _, _ = A.parse_wav_extended(A.write_wav_ms_adpcm(y))
    assert 10 * np.log10(np.mean(y ** 2)
                         / (np.mean((y - y2) ** 2) + 1e-12)) > 28


def test_float_and_24bit_pcm():
    x = _sine()
    y, rate, name = A.parse_wav_extended(A.write_wav_float(x))
    assert name == "float" and np.allclose(x, y)
    # hand-built 24-bit PCM
    import struct

    v = np.clip(x * 8388608, -8388608, 8388607).astype(np.int32)
    raw = b"".join(struct.pack("<i", s)[:3] for s in v)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    y24, _, name24 = A.parse_wav_extended(A._wav_container(fmt, raw))
    assert name24 == "pcm" and np.abs(y24 - x).max() < 1e-3


def test_mp3_in_wav_raises_named_but_probes():
    import struct

    fmt = struct.pack("<HHIIHH", 0x55, 1, 44100, 16000, 1, 0)
    b = A._wav_container(fmt, b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="mp3"):
        A.parse_wav_extended(b)
    p = A.probe_wav(b)
    assert p["codec"] == "mp3" and p["rate"] == 44100


def test_probe_wav_durations():
    x = _sine(ms=500)
    for payload, codec in [(A.write_wav_g711(x), "mulaw"),
                           (A.write_wav_ima_adpcm(x), "ima_adpcm"),
                           (A.write_wav_float(x), "float")]:
        p = A.probe_wav(payload)
        assert p["codec"] == codec
        assert abs(p["duration_ms"] - 500) < 70, (codec, p)


def test_audio_features_stage_compressed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray.multimodal import MEDIA_SCHEMA, AudioFeatures, probe_media

    x = _sine()
    rows = []
    for i, payload in enumerate([A.write_wav_g711(x, law="mulaw"),
                                 A.write_wav_g711(x, law="alaw"),
                                 A.write_wav_ima_adpcm(x)]):
        rows.append({"media_id": f"a{i}", "kind": "audio",
                     "payload": payload, "mime": "audio/wav",
                     "width": -1, "height": -1, "duration_ms": -1})
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert len(out) == 3
    # same sine through three codecs → nearly identical features
    assert out.duration_ms.between(240, 270).all()
    assert (np.abs(out.rms - out.rms.iloc[0]) < 0.02).all()
    meta = probe_media(A.write_wav_ima_adpcm(x))
    assert (meta["format"], meta["codec"]) == ("wav", "ima_adpcm")


def test_synth_corpus_carries_compressed_audio():
    from gitprov_ray.multimodal import probe_media, synth_media_table

    t = synth_media_table(n=48)
    codecs = set()
    for row in t.to_pylist():
        if row["kind"] == "audio":
            codecs.add(probe_media(row["payload"])["codec"])
    assert {"pcm16", "mulaw", "alaw", "ima_adpcm", "ms_adpcm",
            "flac"} <= codecs


# ---------------------------------------------------------------------------
# MP3 header probe (metadata-only; decode is the declared external stub)
# ---------------------------------------------------------------------------

def test_mp3_probe_all_versions():
    from gitprov_ray import audiocodec as a

    for kw, ver, sr in [
            (dict(n_frames=20), "1", 44100),
            (dict(n_frames=7, kbps=64, rate=22050, id3=True), "2", 22050),
            (dict(n_frames=5, kbps=40, rate=11025), "2.5", 11025)]:
        b = a.write_mp3_fixture(**kw)
        assert a.is_mp3(b)
        p = a.probe_mp3(b)
        assert p["version"] == ver and p["sample_rate"] == sr
        assert p["frames"] == kw["n_frames"]
        samples = 1152 if ver == "1" else 576
        assert p["duration_ms"] == int(kw["n_frames"] * samples * 1000.0 / sr)


def test_mp3_two_frame_rule_rejects_stray_sync():
    from gitprov_ray import audiocodec as a

    # one valid header followed by junk that is NOT a second frame
    b = a.write_mp3_fixture(1) + b"this is not audio at all" * 3
    one_frame = a.write_mp3_fixture(1)
    assert a.is_mp3(one_frame + one_frame)       # two frames back-to-back
    assert not a.is_mp3(b"\xff\xfb" + b"\x00" * 100)  # bad indices
    assert not a.is_mp3(b"")
    assert not a.is_mp3(b"RIFFxxxxWAVE")


def test_mp3_probe_media_dispatch_and_decode_stub():
    import pytest

    from gitprov_ray import audiocodec as a
    from gitprov_ray.multimodal import parse_wav, probe_media

    b = a.write_mp3_fixture(12, kbps=96)
    p = probe_media(b)
    assert p["format"] == "mp3" and p["codec"] == "mpeg1-layer3"
    assert p["frames"] == 12 and p["duration_ms"] > 0
    with pytest.raises(NotImplementedError, match="mp3"):
        parse_wav(b)


def test_mp3_vbr_flag():
    from gitprov_ray import audiocodec as a

    cbr = a.write_mp3_fixture(6, kbps=128)
    vbr = a.write_mp3_fixture(3, kbps=128) + a.write_mp3_fixture(3, kbps=192)
    assert a.probe_mp3(cbr)["vbr"] is False
    assert a.probe_mp3(vbr)["vbr"] is True


def test_ogg_probe_vorbis_and_opus():
    import pytest

    from gitprov_ray import audiocodec as a
    from gitprov_ray.multimodal import parse_wav, probe_media

    v = a.write_ogg_fixture("vorbis", channels=2, rate=44100,
                            n_samples=88200)
    p = a.probe_ogg(v)
    assert p == {"codec": "vorbis", "channels": 2, "sample_rate": 44100,
                 "duration_ms": 2000}
    o = a.write_ogg_fixture("opus", channels=1, n_samples=48000)
    p = a.probe_ogg(o)
    assert p["codec"] == "opus" and p["sample_rate"] == 48000
    assert p["duration_ms"] == 1000       # preskip subtracted (RFC 7845)

    pm = probe_media(v)
    assert pm["format"] == "ogg" and pm["codec"] == "vorbis"
    with pytest.raises(NotImplementedError, match="ogg"):
        parse_wav(o)
    assert a.probe_ogg(b"OggS\x01" + b"\x00" * 30) is None  # bad version


def test_ogg_page_crc_is_spec_correct():
    # known property: CRC over a page with the CRC field zeroed must
    # round-trip through _ogg_crc when re-verified the same way
    from gitprov_ray import audiocodec as a

    page = a._ogg_page(b"hello ogg", granule=7, serial=3, seq=2)
    zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
    stored = int.from_bytes(page[22:26], "little")
    assert a._ogg_crc(zeroed) == stored


def test_mp3_id3_tags_and_xing_header():
    from gitprov_ray import audiocodec as a

    b = a.write_mp3_fixture(5, tags={"TIT2": "A Song", "TPE1": "Someone"},
                            xing_frames=1234)
    p = a.probe_mp3(b)
    assert p["tags"] == {"TIT2": "A Song", "TPE1": "Someone"}
    assert p["frames"] == 1234 and p["vbr"] is True
    assert p["duration_ms"] == int(1234 * 1152 * 1000.0 / 44100)

    cbr = a.write_mp3_fixture(5, xing_frames=5, xing_vbr=False)
    pc = a.probe_mp3(cbr)
    assert pc["frames"] == 5 and pc["vbr"] is False

    plain = a.write_mp3_fixture(5)
    assert a.probe_mp3(plain)["tags"] == {}
    assert a.parse_id3v2(b"garbage") == {}


def test_adts_probe_and_two_frame_rule():
    from gitprov_ray import audiocodec

    b = audiocodec.write_adts_fixture(n_frames=25, rate=44100,
                                      channels=2, profile=1)
    assert audiocodec.is_adts_aac(b)
    p = audiocodec.probe_adts(b)
    assert p["codec"] == "aac-lc" and p["mpeg_version"] == "4"
    assert p["frames"] == 25 and p["channels"] == 2
    assert p["duration_ms"] == int(25 * 1024 * 1000 / 44100)
    # stray 0xFFFx sync with garbage after it is NOT adts
    assert not audiocodec.is_adts_aac(b"\xff\xf1" + b"\x00" * 50)
    # cross-probe isolation: adts is not mp3 and mp3 is not adts
    assert not audiocodec.is_mp3(b)
    m = audiocodec.write_mp3_fixture(n_frames=4)
    assert not audiocodec.is_adts_aac(m)
    # 8 kHz main-profile mono variant
    b2 = audiocodec.write_adts_fixture(n_frames=10, rate=8000,
                                       channels=1, profile=0)
    p2 = audiocodec.probe_adts(b2)
    assert p2["codec"] == "aac-main" and p2["sample_rate"] == 8000


def test_adts_probe_media_dispatch_and_decode_stub():
    import pytest as _pytest

    from gitprov_ray import audiocodec, multimodal

    b = audiocodec.write_adts_fixture(n_frames=12)
    out = multimodal.probe_media(b)
    assert out["format"] == "adts" and out["codec"] == "aac-lc"
    assert out["frames"] == 12
    with _pytest.raises(NotImplementedError, match="aac"):
        multimodal.parse_wav(b)
