"""Pure-numpy JPEG codec (no external codec dependency).

Implements the Huffman DCT processes of ITU-T T.81 (the public JPEG
spec): baseline sequential (SOF0/1) and progressive (SOF2, spectral
selection + successive approximation, DC and AC refinement scans,
EOB runs), 8-bit samples, grayscale or YCbCr with arbitrary 1-2 h/v
sampling factors (4:4:4, 4:2:2, 4:2:0), DRI/RSTn restart markers.
Arithmetic coding and 12-bit precision raise ``NotImplementedError`` —
this is the decode path that converts the engine's compressed-image
stub (multimodal.py ImageDecode/Resize/Feature stages) into a real
decode, not a general-purpose imaging library.

The encoders are minimal 4:4:4 writers using the spec's Annex K
quantization + Huffman tables (quality-scaled per the common IJG
formula): a baseline writer and a progressive writer (DC first +
refinement, per-component AC first + refinement — all four progressive
scan types). They exist so tests can round-trip real JPEG bitstreams
(decode∘encode ≈ identity within quantization loss; progressive decode
== baseline decode of the same coefficients) without any vendored
binary asset.

Performance note: entropy (Huffman) decode is bit-serial by nature; the
per-block pipeline after it (dequantize, zigzag, IDCT, level shift) is
vectorized over all blocks of a component with one einsum. Decoding runs
inside the multimodal actor-pool stages (one table/codec setup per actor,
per-batch work in __call__), so throughput scales with the actor pool, not
with single-image speed.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (the spec
# prints these as 8x8 matrices in natural raster order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
HT_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
HT_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
HT_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: C[k, n] = s(k) cos((2n+1)kπ/16)
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(0.125) if _k == 0 else 0.5
    _C[_k] = _s * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    """(N,8,8) frequency blocks → (N,8,8) samples, one einsum per call."""
    return np.einsum("ki,nkl,lj->nij", _C, blocks, _C, optimize=True)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


def _build_decode_table(bits, values):
    """(length, code) → symbol map per T.81 C.2 canonical code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None          # set when a marker interrupts the stream

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            self.marker = self.marker or 0xD9
            self.bitbuf = (self.bitbuf << 8) | 0
            self.nbits += 8
            return
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:                    # a real marker: pad with zero bits
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align_restart(self):
        """Consume the pending RSTn marker and resume after it."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.marker = None
                return
            p += 1
        self.pos = len(d)


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(data: bytes):
    """Huffman JPEG bytes → uint8 array (H,W) gray or (H,W,3) RGB.

    Handles baseline sequential (SOF0/1) and progressive (SOF2) streams.
    Raises ``NotImplementedError`` for arithmetic/lossless/12-bit
    streams and ``ValueError`` for malformed streams."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    progressive = False
    scanned = False
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = np.frombuffer(seg[i:i + 64], np.uint8) \
                    .astype(np.int32)[UNZIGZAG].reshape(8, 8)
                i += 64
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            precision, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            _prepare_frame(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-Huffman-DCT JPEG (arithmetic/lossless/hierarchical)")
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                values = list(seg[i + 17:i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _build_decode_table(bits, values)
                i += 17 + nv
        elif marker == 0xDD:                     # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:                     # SOS → entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + si * 2:3 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 15))
            ss, se, ahal = seg[1 + ns * 2:4 + ns * 2]
            if progressive:
                reader = _decode_progressive_scan(
                    data, pos + seglen, frame, scan, ss, se,
                    ahal >> 4, ahal & 15, huff_dc, huff_ac,
                    restart_interval)
            else:
                reader = _decode_baseline_scan(
                    data, pos + seglen, frame, scan, huff_dc, huff_ac,
                    restart_interval)
            scanned = True
            pos = reader.pos      # resume marker walk where entropy ended
            continue
        pos += seglen
    if frame is None or not scanned:
        raise ValueError("no SOS marker found")
    return _assemble(frame, qt)


def _prepare_frame(frame):
    """Compute MCU geometry and allocate zigzag-order coefficient grids."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcux"] = (w + 8 * hmax - 1) // (8 * hmax)
    frame["mcuy"] = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = frame["mcux"] * c["h"]         # mcu-padded block grid
        c["bh"] = frame["mcuy"] * c["v"]
        cw = (w * c["h"] + hmax - 1) // hmax     # component sample dims
        ch = (h * c["v"] + vmax - 1) // vmax
        c["nbx"] = (cw + 7) // 8                 # non-interleaved block dims
        c["nby"] = (ch + 7) // 8
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)


def _scan_mcus(frame, scan):
    """Yield MCUs as lists of (comp, td, ta, block_index) in decode order.

    A single-component scan is non-interleaved (T.81 A.2.2): one block
    per MCU over the component's own ceil(dim/8) grid, ignoring sampling
    factors. Multi-component scans interleave h×v blocks per component
    per MCU (A.2.3)."""
    if len(scan) == 1:
        c, td, ta = scan[0]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                yield [(c, td, ta, by * c["bw"] + bx)]
        return
    for my in range(frame["mcuy"]):
        for mx in range(frame["mcux"]):
            mcu = []
            for c, td, ta in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        mcu.append((c, td, ta,
                                    (my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx))
            yield mcu


def _decode_baseline_scan(data, pos, frame, scan, huff_dc, huff_ac,
                          restart_interval):
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    for i, mcu in enumerate(_scan_mcus(frame, scan)):
        if restart_interval and i and i % restart_interval == 0:
            reader.align_restart()
            for key in pred:
                pred[key] = 0
        for c, td, ta, idx in mcu:
            act = huff_ac[ta]
            blk = c["coef"][idx]
            t = reader.decode_symbol(huff_dc[td])
            diff = _extend(reader.receive(t), t)
            pred[c["id"]] += diff
            blk[0] = pred[c["id"]]
            k = 1
            while k < 64:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break                        # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run overflow")
                blk[k] = _extend(reader.receive(s), s)
                k += 1
    return reader


def _decode_progressive_scan(data, pos, frame, scan, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """One progressive scan (T.81 G.2): DC/AC × first/refinement."""
    reader = _BitReader(data, pos)
    if ss == 0:                                  # DC scan (Se must be 0)
        pred = {c["id"]: 0 for c, _, _ in scan}
        for i, mcu in enumerate(_scan_mcus(frame, scan)):
            if restart_interval and i and i % restart_interval == 0:
                reader.align_restart()
                for key in pred:
                    pred[key] = 0
            for c, td, _, idx in mcu:
                if ah == 0:                      # first DC scan
                    t = reader.decode_symbol(huff_dc[td])
                    pred[c["id"]] += _extend(reader.receive(t), t)
                    c["coef"][idx, 0] = pred[c["id"]] << al
                elif reader.read_bit():          # DC refinement: 1 raw bit
                    c["coef"][idx, 0] |= 1 << al
        return reader
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    c, _, ta = scan[0]
    act = huff_ac[ta]
    eobrun = 0
    for i, mcu in enumerate(_scan_mcus(frame, scan)):
        if restart_interval and i and i % restart_interval == 0:
            reader.align_restart()
            eobrun = 0
        idx = mcu[0][3]
        row = c["coef"][idx]
        if ah == 0:                              # first AC scan
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode_symbol(act)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:                  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1        # EOBn (current block ends)
                    if r:
                        eobrun += reader.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run overflow")
                row[k] = _extend(reader.receive(s), s) << al
                k += 1
        else:                                    # AC refinement scan
            eobrun = _refine_ac_block(reader, act, row, ss, se, al, eobrun)
    return reader


def _refine_ac_block(reader, act, row, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block (T.81 G.1.2.3).

    Correction bits ride along for every already-nonzero coefficient the
    scan passes; ``r`` counts only zero-history coefficients."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(act)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:                      # EOBn: rest of band refines
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15 (ZRL): skip 16 zero-history coeffs below
            else:
                if s != 1:
                    raise ValueError("invalid AC refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                coef = int(row[k])
                if coef:
                    if reader.read_bit() and (coef & p1) == 0:
                        row[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and val:
                row[k] = val
            k += 1
    if eobrun > 0:                               # tail of block inside an EOB run
        while k <= se:
            coef = int(row[k])
            if coef and reader.read_bit() and (coef & p1) == 0:
                row[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _assemble(frame, qt):
    """Dequantize + IDCT + upsample + color-convert all components."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        q = qt[c["tq"]]
        nat = c["coef"][:, UNZIGZAG].reshape(-1, 8, 8)
        spatial = _idct2((nat * q).astype(np.float64)) + 128.0
        bh, bw = c["bh"], c["bw"]
        img = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(bh * 8, bw * 8)
        # upsample to full resolution (nearest, per JFIF)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
        planes.append(img[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# minimal baseline encoder (4:4:4, Annex K tables) — test harness + synth
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _build_encode_table(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, blk, q, dc_tab, ac_tab, pred):
    coef = np.round(_dct2(blk[None].astype(np.float64) - 128.0)[0] / q) \
        .astype(np.int32)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    mag, nb = abs(diff), 0
    while mag:
        mag >>= 1
        nb += 1
    ln, code = dc_tab[nb]
    bw.write(code, ln)
    if nb:
        bw.write(diff if diff >= 0 else diff + (1 << nb) - 1, nb)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = last_nz[-1] + 2 if len(last_nz) else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        mag, nb = abs(v), 0
        while mag:
            mag >>= 1
            nb += 1
        ln, code = ac_tab[(run << 4) | nb]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << nb) - 1, nb)
        run = 0
    if end < 64:
        ln, code = ac_tab[0x00]
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg_baseline(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB → baseline JFIF bytes (4:4:4)."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = _scale_qt(QT_LUMA, quality)
    qc = _scale_qt(QT_CHROMA, quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, q in ([(0, qy)] if gray else [(0, qy), (1, qc)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    tabs = [(0, HT_DC_LUMA), (16, HT_AC_LUMA)] if gray else \
        [(0, HT_DC_LUMA), (16, HT_AC_LUMA), (1, HT_DC_CHROMA),
         (17, HT_AC_CHROMA)]
    for tcth, (bits, values) in tabs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tcth) \
            + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    dc_y = _build_encode_table(*HT_DC_LUMA)
    ac_y = _build_encode_table(*HT_AC_LUMA)
    dc_c = _build_encode_table(*HT_DC_CHROMA)
    ac_c = _build_encode_table(*HT_AC_CHROMA)
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = [np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
              for p in planes]
    bw = _BitWriter()
    preds = [0] * nc
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(nc):
                q = qy if ci == 0 else qc
                dct = dc_y if ci == 0 else dc_c
                act = ac_y if ci == 0 else ac_c
                blk = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                preds[ci] = _encode_block(bw, blk, q, dct, act, preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# minimal progressive encoder (4:4:4, Annex K tables) — exercises every
# progressive scan type the decoder handles: interleaved DC first scan,
# raw-bit DC refinement, per-component AC first scans with EOB, and AC
# successive-approximation refinement with buffered correction bits.
# ---------------------------------------------------------------------------

def _plane_zigzag_coefs(plane: np.ndarray, q: np.ndarray):
    """Float plane → (nby*nbx, 64) quantized zigzag coefficient rows."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8)
    coefs = np.round(_dct2(blocks - 128.0) / q).astype(np.int32)
    return coefs.reshape(-1, 64)[:, ZIGZAG]


def _emit_dc_diff(bw, dc_tab, diff: int):
    mag, nb = abs(diff), 0
    while mag:
        mag >>= 1
        nb += 1
    ln, code = dc_tab[nb]
    bw.write(code, ln)
    if nb:
        bw.write(diff if diff >= 0 else diff + (1 << nb) - 1, nb)


def _emit_ac_first(bw, ac_tab, vals):
    """One block of an AC first scan (values already point-transformed)."""
    nz = np.nonzero(vals)[0]
    end = nz[-1] + 1 if len(nz) else 0
    run = 0
    for k in range(end):
        v = int(vals[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        mag, nb = abs(v), 0
        while mag:
            mag >>= 1
            nb += 1
        ln, code = ac_tab[(run << 4) | nb]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << nb) - 1, nb)
        run = 0
    if end < len(vals):
        ln, code = ac_tab[0x00]                  # EOB (run of 1)
        bw.write(code, ln)


def _emit_ac_refine(bw, ac_tab, vals, al: int):
    """One block of an AC refinement scan (Ah = al+1 → Al = al).

    ``vals`` are the full-precision band coefficients; history is their
    value at the previous precision (>> (al+1))."""
    br: list[int] = []                           # buffered correction bits
    run = 0
    for k in range(len(vals)):
        v = int(vals[k])
        temp = abs(v) >> al                      # value at this precision
        if temp == 0:
            run += 1
            continue
        # Drain the zero run below 16 BEFORE buffering/emitting at any
        # nonzero position: every buffered correction bit must lie within
        # the next symbol's ≤16-zero skip window or the decoder reads the
        # stream out of order (the IJG BR-buffer invariant).
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            for bit in br:
                bw.write(bit, 1)
            br.clear()
            run -= 16
        if temp >> 1:                            # already nonzero in history
            br.append(temp & 1)
            continue
        ln, code = ac_tab[(run << 4) | 1]        # newly nonzero (temp == 1)
        bw.write(code, ln)
        bw.write(1 if v > 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br.clear()
        run = 0
    if run or br:                                # EOB, then pending bits
        ln, code = ac_tab[0x00]
        bw.write(code, ln)
        for bit in br:
            bw.write(bit, 1)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB → progressive (SOF2) JFIF bytes.

    Scan script: interleaved DC first (Al=1), DC refinement (raw bits),
    per-component AC first 1..63 (Al=1), per-component AC refinement.
    Decodes to exactly the same pixels as ``encode_jpeg_baseline`` at the
    same quality (identical coefficients, identical IDCT)."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    nc = 1 if gray else 3
    qy = _scale_qt(QT_LUMA, quality)
    qc = _scale_qt(QT_CHROMA, quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    coefs = [_plane_zigzag_coefs(p, (qy if ci == 0 else qc).astype(np.float64))
             for ci, p in enumerate(planes)]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, q in ([(0, qy)] if gray else [(0, qy), (1, qc)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) \
            + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    tabs = [(0, HT_DC_LUMA), (16, HT_AC_LUMA)] if gray else \
        [(0, HT_DC_LUMA), (16, HT_AC_LUMA), (1, HT_DC_CHROMA),
         (17, HT_AC_CHROMA)]
    for tcth, (bits, values) in tabs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tcth) \
            + bytes(bits) + bytes(values)
    dc_tabs = [_build_encode_table(*(HT_DC_LUMA if ci == 0 else HT_DC_CHROMA))
               for ci in range(nc)]
    ac_tabs = [_build_encode_table(*(HT_AC_LUMA if ci == 0 else HT_AC_CHROMA))
               for ci in range(nc)]

    def sos(members, ss, se, ah, al, huff_ids=True):
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(members),
                                        len(members))
        for ci in members:
            tdta = (0x00 if ci == 0 else 0x11) if huff_ids else 0x00
            hdr += struct.pack("BB", ci + 1, tdta)
        return hdr + struct.pack("BBB", ss, se, (ah << 4) | al)

    nblocks = len(coefs[0])
    # scan 1: DC first, all components interleaved, Al=1
    out += sos(list(range(nc)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for idx in range(nblocks):
        for ci in range(nc):
            dc = int(coefs[ci][idx, 0]) >> 1     # arithmetic shift (T.81 G.1.1.2)
            _emit_dc_diff(bw, dc_tabs[ci], dc - preds[ci])
            preds[ci] = dc
    bw.flush()
    out += bw.out
    # scan 2: DC refinement — one raw bit per block, no Huffman coding
    out += sos(list(range(nc)), 0, 0, 1, 0)
    bw = _BitWriter()
    for idx in range(nblocks):
        for ci in range(nc):
            bw.write(int(coefs[ci][idx, 0]) & 1, 1)
    bw.flush()
    out += bw.out
    # per-component AC first scans (Al=1): point transform |v|>>1 with sign
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, 1)
        bw = _BitWriter()
        band = coefs[ci][:, 1:]
        shifted = np.sign(band) * (np.abs(band) >> 1)
        for idx in range(nblocks):
            _emit_ac_first(bw, ac_tabs[ci], shifted[idx])
        bw.flush()
        out += bw.out
    # per-component AC refinement scans (Ah=1, Al=0)
    for ci in range(nc):
        out += sos([ci], 1, 63, 1, 0)
        bw = _BitWriter()
        for idx in range(nblocks):
            _emit_ac_refine(bw, ac_tabs[ci], coefs[ci][idx, 1:], 0)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def is_jpeg(b: bytes) -> bool:
    return len(b) >= 3 and b[:3] == b"\xff\xd8\xff"


def probe_jpeg(b: bytes) -> dict:
    """Header-only probe (marker walk to SOF, no entropy decode):
    width / height / components / progressive."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):           # EOI / SOS before any SOF
            break
        seglen = struct.unpack(">H", b[pos:pos + 2])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[pos + 3:pos + 7])
            return {"width": w, "height": h, "components": b[pos + 7],
                    "progressive": marker == 0xC2}
        pos += seglen
    raise ValueError("no SOF marker found")
