"""Pure-numpy WAV audio codec layer beyond stdlib ``wave``.

The stdlib module only opens integer PCM; real-world WAV corpora carry
G.711 (μ-law format 7 / A-law format 6 — the telephony codecs), IEEE
float (format 3), and IMA/DVI ADPCM (format 0x11, 4-bit block-coded)
payloads. All four decode here from the public specs (ITU-T G.711,
IMA ADPCM reference algorithm) with numpy LUTs / vectorized unpacking;
μ-law and A-law are validated bit-exact against the stdlib ``audioop``
oracle in tests. Compressed formats that genuinely need external
decoders (MP3 format 0x55, AAC 0xFF) raise NotImplementedError naming
the codec.

Fixture writers emit valid WAV files for each format so the multimodal
stages exercise real compressed-audio payloads without vendored assets.
"""

from __future__ import annotations

import struct

import numpy as np

_FORMAT_NAMES = {1: "pcm", 2: "ms_adpcm", 3: "float", 6: "alaw",
                 7: "mulaw", 0x11: "ima_adpcm", 0x55: "mp3",
                 0xFF: "aac", 0x2000: "ac3", 0xFFFE: "extensible"}


def _riff_wave_chunks(b: bytes):
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


# ---------------------------------------------------------------------------
# G.711 (ITU-T): 8-bit log companding
# ---------------------------------------------------------------------------


def _mulaw_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int32) ^ 0xFF       # stored complemented
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55       # even-bit inversion
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8,
                   ((mant << 4) + 0x108) << (exp - 1))
    # A-law sign bit SET means positive (opposite of μ-law's layout)
    return np.where(sign, mag, -mag).astype(np.int16)


_MULAW = _mulaw_table()
_ALAW = _alaw_table()


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (4-bit, WAV block layout)
# ---------------------------------------------------------------------------

_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767],
    dtype=np.int32)
_IMA_INDEX_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int,
                        index: int) -> np.ndarray:
    """Sequential IMA step loop (inherently recursive; per-block only)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, nib in enumerate(nibbles):
        step = int(_IMA_STEPS[index])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        out[i] = pred
    return out


def _ima_decode_block(block: bytes) -> np.ndarray:
    """One mono IMA ADPCM WAV block → int16 samples (header sample +
    two samples per payload byte, low nibble first)."""
    if len(block) < 4:
        raise ValueError("IMA ADPCM: truncated block")
    pred, index = struct.unpack_from("<hB", block, 0)
    payload = np.frombuffer(block, np.uint8, offset=4)
    nibbles = np.empty(2 * len(payload), dtype=np.uint8)
    nibbles[0::2] = payload & 0x0F            # low nibble first (WAV)
    nibbles[1::2] = payload >> 4
    return np.concatenate([[np.int16(pred)],
                           _ima_decode_nibbles(nibbles, int(pred),
                                               int(index))])


def _ima_encode_block(samples: np.ndarray, index: int) -> tuple[bytes, int]:
    """int16 samples (first is the block header sample) → block bytes
    and the carried step index. The header stores the INITIAL
    (pred, index) state; we re-seed the index from the block's median
    step so adaptation tracks immediately instead of climbing from 7."""
    pred = int(samples[0])
    if len(samples) > 1:
        med = float(np.median(np.abs(np.diff(samples.astype(np.int32)))))
        index = int(np.clip(np.searchsorted(_IMA_STEPS, max(med, 1)),
                            0, 88))
    hdr = struct.pack("<hBB", pred, index, 0)
    nibbles = []
    for s in samples[1:]:
        step = int(_IMA_STEPS[index])
        delta = int(s) - pred
        nib = 0
        if delta < 0:
            nib = 8
            delta = -delta
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        # decoder-mirrored reconstruction
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        nibbles.append(nib)
    if len(nibbles) % 2:
        nibbles.append(0)
    payload = bytes((nibbles[i] | (nibbles[i + 1] << 4))
                    for i in range(0, len(nibbles), 2))
    return hdr + payload, index


# MS ADPCM (WAVE format 0x0002): 7-entry fixed coefficient set and the
# 16-entry delta-adaptation table from the published Microsoft WAV spec
# (Multimedia Programming Interface and Data Specifications / RIFF "New
# Multimedia Data Types and Data Techniques", msadpcm reference code).
_MS_COEFS = np.array([[256, 0], [512, -256], [0, 0], [192, 64],
                      [240, 0], [460, -208], [392, -232]], dtype=np.int64)
_MS_ADAPT = np.array([230, 230, 230, 230, 307, 409, 512, 614,
                      768, 614, 512, 409, 307, 230, 230, 230],
                     dtype=np.int64)


def _ms_decode_block(block: bytes) -> np.ndarray:
    """One mono MS ADPCM block → int16 samples. Header: predictor index
    (1 byte), initial delta (int16), sample1, sample2 (the block's first
    two PCM samples, NEWEST first); payload nibbles high-first."""
    if len(block) < 7:
        raise ValueError("MS ADPCM: truncated block")
    predictor = block[0]
    if predictor >= len(_MS_COEFS):
        raise ValueError(f"MS ADPCM: predictor {predictor} out of range")
    delta, s1, s2 = struct.unpack_from("<hhh", block, 1)
    c1, c2 = int(_MS_COEFS[predictor, 0]), int(_MS_COEFS[predictor, 1])
    payload = np.frombuffer(block, np.uint8, offset=7)
    nibbles = np.empty(2 * len(payload), dtype=np.uint8)
    nibbles[0::2] = payload >> 4              # high nibble first (MS)
    nibbles[1::2] = payload & 0x0F
    out = np.empty(len(nibbles) + 2, dtype=np.int16)
    out[0], out[1] = s2, s1                   # oldest first in the output
    for i, nib in enumerate(nibbles):
        signed = nib - 16 if nib >= 8 else int(nib)
        pred = (s1 * c1 + s2 * c2) >> 8
        sample = max(-32768, min(32767, pred + signed * delta))
        delta = max(16, (int(_MS_ADAPT[nib]) * delta) >> 8)
        s2, s1 = s1, sample
        out[i + 2] = sample
    return out


def _ms_encode_block(samples: np.ndarray) -> bytes:
    """int16 samples → one mono MS ADPCM block, trying all 7 predictors
    and keeping the least-squared-error reconstruction. The encoder's
    reconstruction mirrors the decoder exactly, so decode(encode(x))
    equals the encoder's tracked signal bit-for-bit."""
    best = None
    x = samples.astype(np.int64)
    for predictor in range(7):
        c1, c2 = int(_MS_COEFS[predictor, 0]), int(_MS_COEFS[predictor, 1])
        s2, s1 = int(x[0]), int(x[1]) if len(x) > 1 else int(x[0])
        delta = max(16, int(np.mean(np.abs(np.diff(x)))) // 4
                    if len(x) > 1 else 16)
        delta0 = delta
        nibbles, err = [], 0
        for s in x[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            want = int(s) - pred
            nib = int(np.clip(round(want / delta) if delta else 0, -8, 7))
            sample = max(-32768, min(32767, pred + nib * delta))
            err += (int(s) - sample) ** 2
            u = nib & 0x0F
            delta = max(16, (int(_MS_ADAPT[u]) * delta) >> 8)
            s2, s1 = s1, sample
            nibbles.append(u)
            if best is not None and err >= best[0]:
                break
        else:
            if best is None or err < best[0]:
                best = (err, predictor, delta0, nibbles)
    err, predictor, delta0, nibbles = best
    s2 = int(x[0])
    s1 = int(x[1]) if len(x) > 1 else int(x[0])
    hdr = struct.pack("<Bhhh", predictor, delta0, s1, s2)
    if len(nibbles) % 2:
        nibbles = nibbles + [0]
    payload = bytes(((nibbles[i] << 4) | nibbles[i + 1])
                    for i in range(0, len(nibbles), 2))
    return hdr + payload


# ---------------------------------------------------------------------------
# WAV parse / write
# ---------------------------------------------------------------------------


def parse_wav_extended(b: bytes):
    """WAV bytes (any of PCM 8/16/24/32, IEEE float, G.711 μ-law/A-law,
    IMA ADPCM) → (float32 mono samples in [-1, 1], rate, codec_name).
    Returns None for non-WAVE payloads; raises NotImplementedError
    naming genuinely external codecs (MP3/AAC/...)."""
    try:
        chunks = list(_riff_wave_chunks(b))
    except ValueError:
        return None
    fmt = data = None
    fact_samples = None
    for tag, off, size in chunks:
        if tag == b"fmt ":
            fmt = b[off: off + size]
        elif tag == b"data":
            data = b[off: off + size]
        elif tag == b"fact" and size >= 4:
            fact_samples = struct.unpack_from("<I", b, off)[0]
    if fmt is None or data is None or len(fmt) < 16:
        return None
    (wformat, nch, rate, _brate, balign,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if wformat == 0xFFFE and len(fmt) >= 26:  # EXTENSIBLE: GUID prefix
        wformat = struct.unpack_from("<H", fmt, 24)[0]
    name = _FORMAT_NAMES.get(wformat, f"format{wformat}")
    if wformat == 1:                          # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | raw[:, 1].astype(np.int32) << 8
                 | raw[:, 2].astype(np.int32) << 16)
            v = np.where(v & 0x800000, v - 0x1000000, v)
            x = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"WAV PCM bit depth {bits}")
    elif wformat == 3:                        # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8") \
            .astype(np.float32)
    elif wformat == 7:                        # G.711 μ-law
        x = _MULAW[np.frombuffer(data, np.uint8)].astype(np.float32) \
            / 32768.0
    elif wformat == 6:                        # G.711 A-law
        x = _ALAW[np.frombuffer(data, np.uint8)].astype(np.float32) \
            / 32768.0
    elif wformat == 2:                        # MS ADPCM
        if nch != 1:
            raise NotImplementedError("MS ADPCM: mono blocks only")
        blocks = [data[i: i + balign] for i in range(0, len(data), balign)]
        x = np.concatenate([_ms_decode_block(blk) for blk in blocks
                            if len(blk) >= 7]).astype(np.float32) / 32768.0
        if fact_samples is not None:
            x = x[:fact_samples]
        return x, rate, name
    elif wformat == 0x11:                     # IMA ADPCM
        if nch != 1:
            raise NotImplementedError("IMA ADPCM: mono blocks only")
        blocks = [data[i: i + balign] for i in range(0, len(data), balign)]
        x = np.concatenate([_ima_decode_block(blk) for blk in blocks
                            if len(blk) >= 4]).astype(np.float32) / 32768.0
        if fact_samples is not None:
            x = x[:fact_samples]
        return x, rate, name
    else:
        raise NotImplementedError(
            f"WAV codec {name!r} requires an external decoder")
    if nch > 1:
        x = x[::nch]
    return x, rate, name


def _wav_container(fmt_payload: bytes, data: bytes,
                   fact_samples: int | None = None) -> bytes:
    fact = (b"fact" + struct.pack("<II", 4, fact_samples)
            if fact_samples is not None else b"")
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_payload))
            + fmt_payload + fact
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_wav_g711(x: np.ndarray, rate: int = 8000,
                   law: str = "mulaw") -> bytes:
    """float32 [-1,1] mono → G.711 WAV (μ-law or A-law), encoded by
    nearest-level search against the decode table (exact companding)."""
    table = _MULAW if law == "mulaw" else _ALAW
    order = np.argsort(table.astype(np.int32))
    sorted_vals = table.astype(np.int32)[order]
    pcm = np.clip(x * 32768.0, -32768, 32767).astype(np.int32)
    pos = np.searchsorted(sorted_vals, pcm)
    pos = np.clip(pos, 1, 255)
    left = np.abs(sorted_vals[pos - 1] - pcm)
    right = np.abs(sorted_vals[np.minimum(pos, 255)] - pcm)
    best = np.where(left <= right, pos - 1, np.minimum(pos, 255))
    codes = order[best].astype(np.uint8)
    fmt = struct.pack("<HHIIHH", 7 if law == "mulaw" else 6, 1, rate,
                      rate, 1, 8)
    return _wav_container(fmt, codes.tobytes())


def write_wav_ima_adpcm(x: np.ndarray, rate: int = 8000,
                        block_samples: int = 505) -> bytes:
    """float32 [-1,1] mono → IMA ADPCM WAV (format 0x11)."""
    pcm = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    balign = 4 + (block_samples - 1 + 1) // 2
    blocks = []
    index = 0
    for i in range(0, len(pcm), block_samples):
        chunk = pcm[i: i + block_samples]
        blk, index = _ima_encode_block(chunk, index)
        blocks.append(blk.ljust(balign, b"\x00"))
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate,
                      max(rate * balign // block_samples, 1), balign,
                      4, 2, block_samples)
    # the fact chunk (required for non-PCM) carries the TRUE sample
    # count so decoders drop the final block's nibble padding
    return _wav_container(fmt, b"".join(blocks), fact_samples=len(pcm))


def write_wav_ms_adpcm(x: np.ndarray, rate: int = 8000,
                       samples_per_block: int = 500) -> bytes:
    """float [-1,1] mono → MS ADPCM (format 0x0002) WAV bytes, with the
    full 32-byte fmt extension (samples/block + the 7 coefficient pairs)
    and a fact chunk carrying the true sample count."""
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    balign = 7 + (samples_per_block - 2 + 1) // 2
    chunks = []
    for i in range(0, len(pcm), samples_per_block):
        seg = pcm[i: i + samples_per_block]
        if len(seg) < 2:
            seg = np.concatenate([seg, np.zeros(2 - len(seg), np.int16)])
        chunks.append(_ms_encode_block(seg).ljust(balign, b"\x00")
                      if len(seg) == samples_per_block
                      else _ms_encode_block(seg))
    data = b"".join(chunks)
    fmt = struct.pack("<HHIIHHHHH", 2, 1, rate,
                      rate * balign // samples_per_block, balign, 4,
                      32, samples_per_block, 7)
    for c1, c2 in _MS_COEFS:
        fmt += struct.pack("<hh", int(c1), int(c2))
    return _wav_container(fmt, data, fact_samples=len(pcm))


def write_wav_float(x: np.ndarray, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    return _wav_container(fmt, x.astype("<f4").tobytes())


def probe_wav(b: bytes) -> dict | None:
    """Header-only WAV metadata: {codec, rate, duration_ms} — works for
    every fmt tag including ones this module cannot decode (MP3-in-WAV
    still probes; that is the curation-pipeline contract)."""
    try:
        chunks = list(_riff_wave_chunks(b))
    except ValueError:
        return None
    fmt = None
    data_size = 0
    fact_samples = None
    for tag, off, size in chunks:
        if tag == b"fmt ":
            fmt = b[off: off + size]
        elif tag == b"data":
            data_size = size
        elif tag == b"fact" and size >= 4:
            fact_samples = struct.unpack_from("<I", b, off)[0]
    if fmt is None or len(fmt) < 16:
        return None
    (wformat, nch, rate, _brate, balign,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if wformat == 0xFFFE and len(fmt) >= 26:
        wformat = struct.unpack_from("<H", fmt, 24)[0]
    name = _FORMAT_NAMES.get(wformat, f"format{wformat}")
    if wformat in (1, 3):
        frames = data_size // max(balign, 1)
    elif wformat in (6, 7):
        frames = data_size // max(nch, 1)
    elif wformat == 0x11 and len(fmt) >= 20:
        spb = struct.unpack_from("<H", fmt, 18)[0]
        frames = fact_samples if fact_samples is not None \
            else (data_size // max(balign, 1)) * spb
    else:
        frames = 0
    return {"codec": name, "rate": rate,
            "duration_ms": int(frames * 1000 / max(rate, 1))}


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) header probe — metadata WITHOUT decode
# ---------------------------------------------------------------------------
# Real-crawl audio is overwhelmingly MP3; full decode is a declared
# external-codec stub (the Layer III Huffman tables are spec DATA), but
# the curation-pipeline contract is that probe_media still reports
# format/bitrate/duration from the frame headers alone.
# Header-field tables are the published ISO 11172-3 / 13818-3 constants.

_MP3_BR_V1 = {                       # kbps by layer, index 1..14
    1: (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)}
_MP3_BR_V2 = {
    1: (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)}
_MP3_RATES = {3: (44100, 48000, 32000),      # version bits 3=MPEG1
              2: (22050, 24000, 16000),      # 2=MPEG2
              0: (11025, 12000, 8000)}       # 0=MPEG2.5


def _mp3_frame_at(b: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos`` →
    (frame_len, samples, rate, bitrate_kbps, version, layer, channels)
    or None if the 4 bytes are not a valid header."""
    if pos + 4 > len(b) or b[pos] != 0xFF or (b[pos + 1] & 0xE0) != 0xE0:
        return None
    ver = (b[pos + 1] >> 3) & 3
    layer_bits = (b[pos + 1] >> 1) & 3
    if ver == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits                    # bits 3/2/1 → layer I/II/III
    br_idx = (b[pos + 2] >> 4) & 0xF
    sr_idx = (b[pos + 2] >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b[pos + 2] >> 1) & 1
    mode = (b[pos + 3] >> 6) & 3
    table = _MP3_BR_V1 if ver == 3 else _MP3_BR_V2
    kbps = table[layer][br_idx - 1]
    rate = _MP3_RATES[ver][sr_idx]
    if layer == 1:
        samples = 384
        flen = (12 * kbps * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or ver == 3) else 576
        flen = samples // 8 * kbps * 1000 // rate + padding
    channels = 1 if mode == 3 else 2
    return flen, samples, rate, kbps, ver, layer, channels


def _id3v2_size(b: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none)."""
    if b[:3] != b"ID3" or len(b) < 10:
        return 0
    sz = ((b[6] & 0x7F) << 21 | (b[7] & 0x7F) << 14
          | (b[8] & 0x7F) << 7 | (b[9] & 0x7F))
    return 10 + sz


def parse_id3v2(b: bytes) -> dict:
    """Text frames from a leading ID3v2.3/2.4 tag → {frame_id: text}
    (TIT2 title, TPE1 artist, TALB album, ...). Encodings 0 (latin-1),
    1 (UTF-16 w/ BOM), 3 (UTF-8) decoded; unknown/binary frames
    skipped. Returns {} when no tag — metadata extraction for curation,
    never an error."""
    total = _id3v2_size(b)
    if total == 0 or len(b) < 10:
        return {}
    out: dict[str, str] = {}
    pos, end = 10, min(total, len(b))
    ver = b[3]
    while pos + 10 <= end:
        fid = b[pos:pos + 4]
        if not fid.strip(b"\x00"):
            break
        if ver >= 4:                      # v2.4: syncsafe frame sizes
            fsz = ((b[pos + 4] & 0x7F) << 21 | (b[pos + 5] & 0x7F) << 14
                   | (b[pos + 6] & 0x7F) << 7 | (b[pos + 7] & 0x7F))
        else:
            fsz = int.from_bytes(b[pos + 4:pos + 8], "big")
        body = b[pos + 10: pos + 10 + fsz]
        pos += 10 + fsz
        if not fid.startswith(b"T") or len(body) < 1:
            continue
        enc, payload = body[0], body[1:]
        try:
            if enc == 0:
                txt = payload.decode("latin-1")
            elif enc == 1:
                txt = payload.decode("utf-16")
            elif enc == 3:
                txt = payload.decode("utf-8")
            else:
                continue
        except UnicodeDecodeError:
            continue
        out[fid.decode("ascii")] = txt.rstrip("\x00")
    return out


def _xing_frames(b: bytes, pos: int, flen: int):
    """(frame_count, is_vbr) from a Xing ('Xing' = VBR) or Info
    ('Info' = CBR, same layout) header inside the first frame — the
    LAME convention; flag bit 0 = frames field present. None when
    absent."""
    window = b[pos: pos + flen]
    for tag, vbr in ((b"Xing", True), (b"Info", False)):
        i = window.find(tag)
        if i >= 0 and len(window) >= i + 12:
            flags = int.from_bytes(window[i + 4:i + 8], "big")
            if flags & 1:
                return int.from_bytes(window[i + 8:i + 12], "big"), vbr
    return None


def is_mp3(b: bytes) -> bool:
    """True when the payload starts with an ID3v2 tag followed by a
    valid MPEG audio frame, or with TWO consecutive valid frames (the
    two-frame rule keeps 0xFFE sync bytes in random binaries from
    probing as mp3)."""
    start = _id3v2_size(b)
    f = _mp3_frame_at(b, start)
    if f is None:
        return False
    if start > 0:
        return True
    nxt = _mp3_frame_at(b, start + f[0])
    return nxt is not None


def probe_mp3(b: bytes) -> dict | None:
    """Walk every frame header → {codec, version, layer, bitrate_kbps
    (first frame), sample_rate, channels, frames, duration_ms, vbr}."""
    pos = _id3v2_size(b)
    tags = parse_id3v2(b)
    first = _mp3_frame_at(b, pos)
    if first is None:
        return None
    flen0, samples0, rate0, _, _, _, _ = first
    xing = _xing_frames(b, pos, flen0)
    n = 0
    dur_ms = 0.0
    kbps_seen = set()
    if xing is not None:
        n, xing_vbr = xing           # authoritative header frame count
        dur_ms = n * samples0 * 1000.0 / rate0
    else:
        while True:
            f = _mp3_frame_at(b, pos)
            if f is None:
                break
            flen, samples, rate, kbps, ver, layer, channels = f
            n += 1
            dur_ms += samples * 1000.0 / rate
            kbps_seen.add(kbps)
            pos += flen
            if pos >= len(b):
                break
    _, _, rate, kbps, ver, layer, channels = first
    vname = {3: "1", 2: "2", 0: "2.5"}[ver]
    return {"codec": f"mpeg{vname}-layer{layer}", "version": vname,
            "layer": layer, "bitrate_kbps": kbps, "sample_rate": rate,
            "channels": channels, "frames": n,
            "duration_ms": int(dur_ms),
            "vbr": xing_vbr if xing is not None else len(kbps_seen) > 1,
            "tags": tags}


def write_mp3_fixture(n_frames: int = 20, kbps: int = 128,
                      rate: int = 44100, id3: bool = False,
                      tags: dict | None = None,
                      xing_frames: int | None = None,
                      xing_vbr: bool = True) -> bytes:
    """Spec-valid MPEG-1 Layer III frame headers with zeroed payloads —
    a probe/metadata fixture (the payload is NOT decodable audio; decode
    is the declared external-codec stub). ``tags`` adds an ID3v2.3 tag
    with UTF-8 text frames; ``xing_frames`` embeds a Xing ('Info' when
    ``xing_vbr=False``) header in the first frame."""
    ver = next(v for v, rates in _MP3_RATES.items() if rate in rates)
    table = _MP3_BR_V1 if ver == 3 else _MP3_BR_V2
    br_idx = table[3].index(kbps) + 1
    sr_idx = _MP3_RATES[ver].index(rate)
    out = bytearray()
    if id3 or tags:
        body = b""
        for fid, txt in (tags or {}).items():
            payload = b"\x03" + txt.encode("utf-8")
            body += (fid.encode("ascii")
                     + len(payload).to_bytes(4, "big") + b"\x00\x00"
                     + payload)
        body = body or b"\x00" * 20
        out += b"ID3\x03\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
             (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body
    b1 = 0xE0 | (ver << 3) | (1 << 1) | 1    # layer III, no CRC
    hdr = bytes([0xFF, b1, (br_idx << 4) | (sr_idx << 2), 0x44])
    samples = 1152 if ver == 3 else 576
    flen = samples // 8 * kbps * 1000 // rate
    for i in range(n_frames):
        payload = bytearray(b"\x00" * (flen - 4))
        if i == 0 and xing_frames is not None:
            tag = b"Xing" if xing_vbr else b"Info"
            blob = tag + (1).to_bytes(4, "big") \
                + int(xing_frames).to_bytes(4, "big")
            payload[32:32 + len(blob)] = blob
        out += hdr + bytes(payload)
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg container probe (Vorbis / Opus / FLAC-in-Ogg) — metadata WITHOUT
# decode, same contract as the MP3 probe: the transform decoders are
# declared external stubs, but curation pipelines still get
# codec/channels/rate/duration from the container + ident header.
# ---------------------------------------------------------------------------

def _ogg_crc_table():
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_OGG_CRC = _ogg_crc_table()


def _ogg_crc(b: bytes) -> int:
    r = 0
    for byte in b:
        r = ((r << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((r >> 24) & 0xFF) ^ byte]
    return r


def _ogg_pages(b: bytes):
    """Yield (header_type, granule, serial, payload) per page."""
    pos = 0
    while pos + 27 <= len(b):
        if b[pos:pos + 4] != b"OggS" or b[pos + 4] != 0:
            break
        htype = b[pos + 5]
        granule, serial = struct.unpack_from("<qI", b, pos + 6)
        nseg = b[pos + 26]
        lace = b[pos + 27: pos + 27 + nseg]
        if len(lace) < nseg:
            break
        body_len = sum(lace)
        body = b[pos + 27 + nseg: pos + 27 + nseg + body_len]
        if len(body) < body_len:
            break
        yield htype, granule, serial, body
        pos += 27 + nseg + body_len


def is_ogg(b: bytes) -> bool:
    return b[:4] == b"OggS" and len(b) >= 27 and b[4] == 0


def probe_ogg(b: bytes) -> dict | None:
    """→ {codec, channels, sample_rate, duration_ms} from the ident
    packet + the last page's granule position. Vorbis granules count
    samples at the audio rate; Opus granules count 48 kHz samples and
    subtract the ident header's pre-skip (RFC 7845 §4/§5.1)."""
    if not is_ogg(b):
        return None
    codec, channels, rate, preskip = "unknown", -1, -1, 0
    last_granule = -1
    first = True
    for htype, granule, _serial, body in _ogg_pages(b):
        if first:
            first = False
            if body[:7] == b"\x01vorbis" and len(body) >= 16:
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack_from("<I", body, 12)[0]
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                codec = "opus"
                channels = body[9]
                preskip = struct.unpack_from("<H", body, 10)[0]
                rate = 48000          # Opus always plays out at 48 kHz
            elif body[:5] == b"\x7fFLAC":
                codec = "flac-in-ogg"
        if granule >= 0:
            last_granule = max(last_granule, granule)
    dur = -1
    if last_granule > 0 and rate > 0:
        dur = int(max(last_granule - preskip, 0) * 1000 / rate)
    return {"codec": codec, "channels": channels, "sample_rate": rate,
            "duration_ms": dur}


def _ogg_page(body: bytes, granule: int, serial: int = 1,
              seq: int = 0, htype: int = 0) -> bytes:
    nseg = (len(body) + 254) // 255 if body else 1
    lace = []
    rem = len(body)
    for _ in range(nseg):
        lace.append(min(rem, 255))
        rem -= min(rem, 255)
    hdr = (b"OggS\x00" + bytes([htype])
           + struct.pack("<qIII", granule, serial, seq, 0)
           + bytes([nseg]) + bytes(lace))
    crc = _ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def write_ogg_fixture(codec: str = "vorbis", channels: int = 2,
                      rate: int = 44100, n_samples: int = 44100,
                      preskip: int = 312) -> bytes:
    """Structurally valid Ogg pages (correct CRCs) carrying a real
    Vorbis/Opus ident header and a granule-stamped data page — a
    probe fixture; the audio payload itself is not decodable."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", rate) + struct.pack("<iii", -1, 128000,
                                                         -1) + b"\xb8\x01")
        granule_last = n_samples
    elif codec == "opus":
        ident = (b"OpusHead\x01" + bytes([channels])
                 + struct.pack("<H", preskip) + struct.pack("<I", rate)
                 + struct.pack("<h", 0) + b"\x00")
        granule_last = n_samples + preskip   # granules are 48 kHz + preskip
    else:
        raise ValueError(codec)
    return (_ogg_page(ident, 0, seq=0, htype=2)     # BOS
            + _ogg_page(b"\x00" * 64, granule_last, seq=1, htype=4))  # EOS


# ---------------------------------------------------------------------------
# AIFF (Apple/EA IFF-85 "Audio Interchange File Format", public spec) and
# Sun/NeXT AU (".snd") containers — big-endian PCM cousins of WAV.
# ---------------------------------------------------------------------------

def _f80_decode(b: bytes) -> int:
    """IEEE 754 80-bit extended float -> int sample rate (AIFF COMM)."""
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    if se == 0 and mant == 0:
        return 0
    exp = (se & 0x7FFF) - 16383 - 63
    val = mant * (2.0 ** exp)
    return int(round(-val if se & 0x8000 else val))


def _f80_encode(rate: int) -> bytes:
    """int -> 80-bit extended float bytes (explicit leading-1 mantissa)."""
    if rate <= 0:
        return b"\x00" * 10
    k = rate.bit_length()
    mant = rate << (64 - k)
    return struct.pack(">HQ", 16383 + k - 1, mant)


def is_aiff(b: bytes) -> bool:
    return b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC")


def probe_aiff(b: bytes) -> dict | None:
    if not is_aiff(b):
        return None
    out = {"format": "aiff", "variant": b[8:12].decode()}
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack(">I", b[pos + 4:pos + 8])[0]
        if cid == b"COMM":
            nch, nframes, bits = struct.unpack(">HIH", b[pos + 8:pos + 16])
            out.update(channels=int(nch), n_samples=int(nframes),
                       bits=int(bits),
                       sample_rate=_f80_decode(b[pos + 16:pos + 26]))
            if out["sample_rate"]:
                out["duration_ms"] = nframes * 1000 // out["sample_rate"]
        pos += 8 + sz + (sz & 1)             # chunks are word-aligned
    return out


def parse_aiff(b: bytes):
    """AIFF bytes -> (float32 mono samples, rate, codec). 8/16-bit
    big-endian PCM; AIFC compressed variants raise."""
    p = probe_aiff(b)
    if p is None:
        return None
    if p["variant"] == "AIFC":
        raise NotImplementedError(
            "AIFC: compressed AIFF variants are external codecs")
    bits, nch = p.get("bits"), p.get("channels", 1)
    pos = 12
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack(">I", b[pos + 4:pos + 8])[0]
        if cid == b"SSND":
            off = struct.unpack(">I", b[pos + 8:pos + 12])[0]
            data = b[pos + 16 + off:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if data is None or bits is None:
        raise ValueError("AIFF missing SSND/COMM")
    if bits == 16:
        x = np.frombuffer(data, dtype=">i2").astype(np.float32) / 32768.0
    elif bits == 8:                          # AIFF 8-bit is SIGNED
        x = np.frombuffer(data, dtype=np.int8).astype(np.float32) / 128.0
    else:
        raise NotImplementedError(f"AIFF PCM bit depth {bits}")
    if nch > 1:
        x = x[::nch]
    return x, p["sample_rate"], f"pcm_be{bits}"


def write_aiff(x: np.ndarray, rate: int = 8000, channels: int = 1) -> bytes:
    """float32 [-1,1] -> 16-bit big-endian AIFF (mono data duplicated
    across channels for fixture purposes)."""
    s = np.clip(np.asarray(x, np.float64) * 32767.0,
                -32768, 32767).astype(">i2")
    if channels > 1:
        s = np.repeat(s, channels)
    data = s.tobytes()
    comm = struct.pack(">HIH", channels, len(s) // channels, 16) \
        + _f80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + data
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    if len(ssnd) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


_AU_ENC = {1: "mulaw", 2: "pcm_s8", 3: "pcm_be16", 27: "alaw"}


def is_au(b: bytes) -> bool:
    return b[:4] == b".snd" and len(b) >= 24


def probe_au(b: bytes) -> dict | None:
    if not is_au(b):
        return None
    off, size, enc, rate, nch = struct.unpack(">IIIII", b[4:24])
    out = {"format": "au", "codec": _AU_ENC.get(enc, f"enc{enc}"),
           "sample_rate": int(rate), "channels": int(nch)}
    nbytes = (len(b) - off) if size == 0xFFFFFFFF else size
    per = 2 if enc == 3 else 1
    if rate and nch:
        out["n_samples"] = nbytes // (per * nch)
        out["duration_ms"] = out["n_samples"] * 1000 // rate
    return out


def parse_au(b: bytes):
    """Sun/NeXT AU -> (float32 mono samples, rate, codec): μ-law (the
    format's default telephony encoding), A-law, signed 8-bit and
    16-bit big-endian PCM."""
    p = probe_au(b)
    if p is None:
        return None
    off, size, enc, rate, nch = struct.unpack(">IIIII", b[4:24])
    data = b[off:] if size == 0xFFFFFFFF else b[off:off + size]
    if enc == 1:
        x = _mulaw_table()[np.frombuffer(data, np.uint8)] \
            .astype(np.float32) / 32768.0
    elif enc == 27:
        x = _alaw_table()[np.frombuffer(data, np.uint8)] \
            .astype(np.float32) / 32768.0
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.float32) / 128.0
    elif enc == 3:
        x = np.frombuffer(data, dtype=">i2").astype(np.float32) / 32768.0
    else:
        raise NotImplementedError(
            f"AU encoding {p['codec']}: external codec")
    if nch > 1:
        x = x[::nch]
    return x, int(rate), p["codec"]


def _mulaw_encode(s16: np.ndarray) -> np.ndarray:
    """int16 -> μ-law codes by nearest-level search against the decode
    table (same exact-companding trick as write_wav_g711)."""
    table = _MULAW.astype(np.int32)
    order = np.argsort(table)
    sorted_vals = table[order]
    pcm = np.asarray(s16, np.int32)
    pos = np.searchsorted(sorted_vals, pcm)
    pos = np.clip(pos, 1, 255)
    left = np.abs(sorted_vals[pos - 1] - pcm)
    right = np.abs(sorted_vals[np.minimum(pos, 255)] - pcm)
    best = np.where(left <= right, pos - 1, np.minimum(pos, 255))
    return order[best].astype(np.uint8)


def write_au(x: np.ndarray, rate: int = 8000, encoding: str = "mulaw",
             channels: int = 1) -> bytes:
    """float32 [-1,1] -> AU bytes (mulaw / pcm_be16)."""
    s16 = np.clip(np.asarray(x, np.float64) * 32767.0,
                  -32768, 32767).astype(np.int16)
    if channels > 1:
        s16 = np.repeat(s16, channels)
    if encoding == "mulaw":
        enc_id, data = 1, _mulaw_encode(s16).tobytes()
    elif encoding == "pcm_be16":
        enc_id, data = 3, s16.astype(">i2").tobytes()
    else:
        raise ValueError(encoding)
    hdr = b".snd" + struct.pack(">IIIII", 24, len(data), enc_id,
                                rate, channels)
    return hdr + data


# ---------------------------------------------------------------------------
# AAC ADTS stream probe (ISO/IEC 14496-3 §1.A.2.2) — metadata WITHOUT
# decode, same contract as the MP3/Ogg probes: AAC's spectral decode is
# a declared external codec (the scalefactor/spectrum Huffman codebooks
# are spec data), but crawl curation still gets codec/profile/rate/
# channels/duration from the fixed headers.
# ---------------------------------------------------------------------------

_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350]
_ADTS_PROFILES = {0: "main", 1: "lc", 2: "ssr", 3: "ltp"}


def _adts_frame_at(b: bytes, pos: int):
    """(frame_len, rate, channels, profile, mpeg_ver, blocks) of the
    ADTS frame at ``pos``, or None if the 7-byte fixed header doesn't
    validate (sync + layer==0 + valid rate index + nonzero length)."""
    if pos + 7 > len(b):
        return None
    h = b[pos:pos + 7]
    if h[0] != 0xFF or (h[1] & 0xF0) != 0xF0:
        return None
    if (h[1] >> 1) & 0x3 != 0:            # layer must be 00
        return None
    sf_idx = (h[2] >> 2) & 0xF
    if sf_idx >= len(_ADTS_RATES):
        return None
    profile = (h[2] >> 6) & 0x3
    chan = ((h[2] & 0x1) << 2) | (h[3] >> 6)
    flen = ((h[3] & 0x3) << 11) | (h[4] << 3) | (h[5] >> 5)
    if flen < 7:
        return None
    blocks = (h[6] & 0x3) + 1
    ver = "2" if (h[1] >> 3) & 1 else "4"
    return flen, _ADTS_RATES[sf_idx], chan, profile, ver, blocks


def is_adts_aac(b: bytes) -> bool:
    """TWO consecutive valid ADTS headers (the same two-frame rule as
    :func:`is_mp3` — a lone 0xFFFx sync in random bytes won't probe)."""
    f = _adts_frame_at(b, 0)
    if f is None:
        return False
    return _adts_frame_at(b, f[0]) is not None


def probe_adts(b: bytes) -> dict | None:
    """Walk every ADTS frame → {codec, profile, mpeg_version,
    sample_rate, channels, frames, duration_ms}. Each raw data block
    carries 1024 samples; a frame holds 1-4 blocks."""
    first = _adts_frame_at(b, 0)
    if first is None:
        return None
    _, rate, chan, profile, ver, _ = first
    pos = n = total_blocks = 0
    while True:
        f = _adts_frame_at(b, pos)
        if f is None:
            break
        n += 1
        total_blocks += f[5]
        pos += f[0]
        if pos >= len(b):
            break
    return {"codec": f"aac-{_ADTS_PROFILES[profile]}",
            "profile": _ADTS_PROFILES[profile], "mpeg_version": ver,
            "sample_rate": rate, "channels": chan, "frames": n,
            "duration_ms": int(total_blocks * 1024 * 1000 / rate)}


def write_adts_fixture(n_frames: int = 25, rate: int = 44100,
                       channels: int = 2, profile: int = 1,
                       payload_len: int = 200) -> bytes:
    """Spec-valid ADTS fixed headers with zeroed payloads — a probe
    fixture (decode is the declared external stub)."""
    sf_idx = _ADTS_RATES.index(rate)
    flen = 7 + payload_len
    out = bytearray()
    for _ in range(n_frames):
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1                       # MPEG-4, layer 00, no CRC
        h[2] = (profile << 6) | (sf_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0x3) << 6) | ((flen >> 11) & 0x3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 0x7) << 5) | 0x1F
        h[6] = 0xFC                       # fullness low bits, 1 block
        out += h + b"\x00" * payload_len
    return bytes(out)
