"""AVI (RIFF) container codec — demux + fixture mux, pure Python.

Layout per the published Microsoft Video-for-Windows / OpenDML spec:
``RIFF('AVI ')`` holding ``LIST('hdrl')`` (``avih`` MainAVIHeader, one
``LIST('strl')`` per stream with ``strh`` AVIStreamHeader + ``strf``
BITMAPINFOHEADER/WAVEFORMATEX), ``LIST('movi')`` with ``{NN}dc/db/wb``
data chunks (optionally grouped in ``LIST('rec ')``), and an optional
``idx1`` index. All chunks are word-aligned (odd sizes pad one byte).

Parity target: the reference treats media as opaque binary + typed
metadata (SURVEY.md §2.6); this gives FrameSample / AudioFeatures /
probe_media a real AVI path with no external libraries.

Decode support (everything else raises NotImplementedError naming the
fourcc/format tag — the engine's declared-stub contract):
  * video: ``MJPG`` (per-frame JPEG via jpegcodec) and raw DIB
    (biCompression 0: 24-bpp bottom-up BGR with 4-byte row padding,
    32-bpp BGRX, negative biHeight = top-down);
  * audio: WAVEFORMATEX tags 1 (PCM 8/16-bit), 6 (A-law), 7 (μ-law) —
    G.711 companding shares audiocodec's published tables.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["is_avi", "probe_avi", "decode_avi_frames", "decode_avi_audio",
           "encode_avi_mjpeg", "encode_avi_dib"]


def is_avi(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI "


def _iter_chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_end) for each chunk in [start,end);
    LIST chunks yield ('LIST:<type>', body_start, body_end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        data_start = pos + 8
        data_end = min(data_start + size, end)
        if fourcc == b"LIST" and data_end - data_start >= 4:
            yield (b"LIST:" + b[data_start:data_start + 4],
                   data_start + 4, data_end)
        else:
            yield fourcc, data_start, data_end
        pos = data_start + size + (size & 1)        # word alignment


def _parse(b: bytes) -> dict:
    if not is_avi(b):
        raise ValueError("not an AVI file")
    info: dict = {"streams": [], "movi": None, "avih": None}
    for four, s, e in _iter_chunks(b, 12, len(b)):
        if four == b"LIST:hdrl":
            for f2, s2, e2 in _iter_chunks(b, s, e):
                if f2 == b"avih" and e2 - s2 >= 40:
                    (us_per_frame, _maxbps, _pad, _flags, total_frames,
                     _init, n_streams, _sugg, w, h) = struct.unpack_from(
                        "<10I", b, s2)
                    info["avih"] = {"us_per_frame": us_per_frame,
                                    "total_frames": total_frames,
                                    "streams": n_streams,
                                    "width": w, "height": h}
                elif f2 == b"LIST:strl":
                    st: dict = {}
                    for f3, s3, e3 in _iter_chunks(b, s2, e2):
                        if f3 == b"strh" and e3 - s3 >= 48:
                            st["type"] = b[s3:s3 + 4].decode("latin-1")
                            st["handler"] = b[s3 + 4:s3 + 8] \
                                .decode("latin-1").strip("\0 ")
                            (st["scale"], st["rate"], _start,
                             st["length"]) = struct.unpack_from(
                                "<IIII", b, s3 + 20)
                        elif f3 == b"strf":
                            st["strf"] = bytes(b[s3:e3])
                    if "type" in st:
                        info["streams"].append(st)
        elif four == b"LIST:movi":
            info["movi"] = (s, e)
    if info["avih"] is None:
        raise ValueError("AVI without avih header")
    return info


def _movi_chunks(b: bytes, movi, stream_idx: int, kinds: tuple):
    """Data chunks of one stream, in file order, descending into
    LIST('rec ') groupings."""
    prefix = b"%02d" % stream_idx
    out = []

    def walk(s, e):
        for four, cs, ce in _iter_chunks(b, s, e):
            if four.startswith(b"LIST:"):
                walk(cs, ce)
            elif four[:2] == prefix and four[2:4] in kinds:
                out.append((cs, ce))

    if movi is not None:
        walk(*movi)
    return out


def _vids_strf(st: dict) -> dict:
    f = st.get("strf", b"")
    if len(f) < 40:
        raise ValueError("truncated BITMAPINFOHEADER")
    (_size, w, h, _planes, bpp) = struct.unpack_from("<iiihH", f, 0)
    compression = f[16:20]
    return {"width": w, "height": h, "bpp": bpp,
            "compression": compression}


def _auds_strf(st: dict) -> dict:
    f = st.get("strf", b"")
    if len(f) < 16:
        raise ValueError("truncated WAVEFORMATEX")
    (tag, channels, rate, _avg, block, bits) = struct.unpack_from(
        "<HHIIHH", f, 0)
    return {"tag": tag, "channels": channels, "rate": rate,
            "block": block, "bits": bits}


_AUDS_NAMES = {1: "pcm", 6: "alaw", 7: "mulaw", 2: "ms_adpcm",
               17: "ima_adpcm", 85: "mp3", 255: "aac"}


def probe_avi(b: bytes) -> dict:
    """Header-only AVI metadata: format/codec/width/height/frames/
    duration_ms (-1 for not-applicable), without touching movi data."""
    info = _parse(b)
    avih = info["avih"]
    out = {"format": "avi", "codec": "", "width": avih["width"] or -1,
           "height": avih["height"] or -1,
           "frames": avih["total_frames"] or -1, "duration_ms": -1}
    vids = [s for s in info["streams"] if s.get("type") == "vids"]
    auds = [s for s in info["streams"] if s.get("type") == "auds"]
    if vids:
        st = vids[0]
        sf = _vids_strf(st)
        comp = sf["compression"].decode("latin-1").strip("\0 ")
        out["codec"] = (comp or f"dib{sf['bpp']}").lower()
        if st.get("scale") and st.get("rate") and st.get("length"):
            out["duration_ms"] = int(
                st["length"] * st["scale"] * 1000 // st["rate"])
    elif auds:
        sf = _auds_strf(auds[0])
        out["codec"] = _AUDS_NAMES.get(sf["tag"], f"tag{sf['tag']}")
        st = auds[0]
        if st.get("scale") and st.get("rate") and st.get("length"):
            out["duration_ms"] = int(
                st["length"] * st["scale"] * 1000 // st["rate"])
    if out["duration_ms"] < 0 and avih["us_per_frame"] \
            and avih["total_frames"]:
        out["duration_ms"] = int(
            avih["us_per_frame"] * avih["total_frames"] // 1000)
    return out


def _decode_dib(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    top_down = h < 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    if len(data) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(data[:stride * h], np.uint8).reshape(h, stride)
    px = rows[:, :w * bytes_pp].reshape(h, w, bytes_pp)
    if not top_down:
        px = px[::-1]
    return px[..., 2::-1].copy()                    # BGR(X) → RGB


def decode_avi_frames(b: bytes) -> list:
    """AVI video → list of HxWx3 uint8 frames. MJPG and raw-DIB decode;
    other compressions raise NotImplementedError naming the fourcc."""
    info = _parse(b)
    vids = [(i, s) for i, s in enumerate(info["streams"])
            if s.get("type") == "vids"]
    if not vids:
        raise ValueError("no video stream in AVI")
    idx, st = vids[0]
    sf = _vids_strf(st)
    comp = sf["compression"].decode("latin-1").strip("\0 ").upper()
    chunks = _movi_chunks(b, info["movi"], idx, (b"dc", b"db"))
    frames = []
    if comp == "MJPG":
        from . import jpegcodec

        for s, e in chunks:
            arr = jpegcodec.decode_jpeg(bytes(b[s:e]))
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=2)
            frames.append(arr[..., :3])
    elif comp in ("", "DIB") and sf["bpp"] in (24, 32):
        for s, e in chunks:
            frames.append(_decode_dib(bytes(b[s:e]), sf["width"],
                                      sf["height"], sf["bpp"]))
    else:
        raise NotImplementedError(
            f"AVI video codec {comp or sf['bpp']!r} requires an external "
            "decoder (MJPG and raw DIB decode in pure Python)")
    return frames


def decode_avi_audio(b: bytes):
    """AVI audio → (float32 mono samples in [-1, 1], sample_rate).
    PCM 8/16-bit, A-law and μ-law decode; compressed tags raise."""
    info = _parse(b)
    auds = [(i, s) for i, s in enumerate(info["streams"])
            if s.get("type") == "auds"]
    if not auds:
        raise ValueError("no audio stream in AVI")
    idx, st = auds[0]
    sf = _auds_strf(st)
    data = b"".join(bytes(b[s:e]) for s, e in
                    _movi_chunks(b, info["movi"], idx, (b"wb",)))
    tag, bits, ch = sf["tag"], sf["bits"], max(sf["channels"], 1)
    if tag == 1 and bits == 16:
        x = np.frombuffer(data[:len(data) & ~1], "<i2") \
            .astype(np.float32) / 32768.0
    elif tag == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32)
             - 128.0) / 128.0
    elif tag in (6, 7):
        from .audiocodec import _alaw_table, _mulaw_table

        table = _mulaw_table() if tag == 7 else _alaw_table()
        x = table[np.frombuffer(data, np.uint8)].astype(np.float32) \
            / 32768.0
    else:
        raise NotImplementedError(
            f"AVI audio format tag {tag} "
            f"({_AUDS_NAMES.get(tag, 'unknown')}) requires an external "
            "decoder (PCM/G.711 decode in pure Python)")
    if ch > 1:
        x = x[::ch]
    return x, sf["rate"]


# ---------------------------------------------------------------------------
# fixture mux
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\0" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _strl_video(w: int, h: int, fps: int, n: int, compression: bytes,
                bpp: int, max_size: int) -> bytes:
    strh = _chunk(b"strh", b"vids" + compression
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                                max_size, 0xFFFFFFFF, 0)
                  + struct.pack("<4H", 0, 0, w, h))
    strf = _chunk(b"strf", struct.pack("<iiihH4sIiiII", 40, w, h, 1, bpp,
                                       compression, 0, 0, 0, 0, 0))
    return _list(b"strl", strh + strf)


def _strl_audio(rate: int, n_samples: int, tag: int, bits: int) -> bytes:
    block = max(bits // 8, 1)
    strh = _chunk(b"strh", b"auds" + b"\0" * 4
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, rate, 0,
                                n_samples, rate * block, 0xFFFFFFFF, block)
                  + struct.pack("<4H", 0, 0, 0, 0))
    strf = _chunk(b"strf", struct.pack("<HHIIHH", tag, 1, rate,
                                       rate * block, block, bits))
    return _list(b"strl", strh + strf)


def _mux(streams: list, movi_chunks: list, w: int, h: int, fps: int,
         n_frames: int) -> bytes:
    avih = _chunk(b"avih", struct.pack(
        "<10I", 1_000_000 // max(fps, 1), 0, 0, 0x10, n_frames, 0,
        len(streams), 0, w, h) + b"\0" * 16)
    hdrl = _list(b"hdrl", avih + b"".join(streams))
    movi_payload = b"".join(_chunk(f, d) for f, d in movi_chunks)
    movi = _list(b"movi", movi_payload)
    # idx1: offsets relative to the start of the movi list type fourcc
    idx_rows, off = [], 4
    for f, d in movi_chunks:
        idx_rows.append(f + struct.pack("<III", 0x10, off, len(d)))
        off += 8 + len(d) + (len(d) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_rows))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def encode_avi_mjpeg(frames: list, fps: int = 10, quality: int = 90,
                     audio=None) -> bytes:
    """uint8 frames → MJPG AVI bytes; optional ``audio=(x, rate)``
    (float in [-1,1]) adds a 16-bit PCM stream interleaved after the
    frames (single '01wb' chunk — legal, and what the demuxer reads)."""
    from . import jpegcodec

    if not frames:
        raise ValueError("need at least one frame")
    samples = [jpegcodec.encode_jpeg_baseline(f, quality=quality)
               for f in frames]
    h, w = frames[0].shape[:2]
    streams = [_strl_video(w, h, fps, len(samples), b"MJPG", 24,
                           max(len(s) for s in samples))]
    movi = [(b"00dc", s) for s in samples]
    if audio is not None:
        x, rate = audio
        pcm = np.clip(np.asarray(x, np.float64) * 32768.0,
                      -32768, 32767).astype("<i2").tobytes()
        streams.append(_strl_audio(rate, len(x), 1, 16))
        movi.append((b"01wb", pcm))
    return _mux(streams, movi, w, h, fps, len(samples))


def encode_avi_dib(frames: list, fps: int = 10) -> bytes:
    """uint8 HxWx3 frames → uncompressed 24-bpp DIB AVI bytes
    (bottom-up BGR rows padded to 4 bytes — the classic VfW layout)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    chunks = []
    for f in frames:
        rows = np.zeros((h, stride), np.uint8)
        rows[:, :w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        chunks.append((b"00db", rows.tobytes()))
    streams = [_strl_video(w, h, fps, len(frames), b"\0" * 4, 24,
                           stride * h)]
    return _mux(streams, chunks, w, h, fps, len(frames))
