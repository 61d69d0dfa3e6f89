"""PDF text extraction (the crawl-corpus PDF→text stage).

Real subset of the public PDF spec (ISO 32000): object scan + page-tree
walk (trailer /Root → /Pages → /Kids → per-page /Contents), FlateDecode
stream decompression via stdlib zlib, and a content-stream tokenizer
that evaluates the text-showing operators — ``Tj``, ``TJ`` (kerning
numbers dropped), ``'`` and ``"`` — with literal-string escape decoding
(\\n \\r \\t \\b \\f, \\( \\) \\\\, 1-3-digit octal, line
continuations) and hex strings. Strings with a UTF-16BE BOM decode as
UTF-16; everything else is Latin-1 (PDF string objects are byte
strings). Line structure follows the text-positioning operators: each
``Td``/``TD``/``T*``/``'`` after text has been shown starts a new line,
which is exactly how line-oriented PDF writers (including
``encode_pdf_text`` below and ``provviz.to_pdf``) lay text out.

Out of scope (declared, NotImplementedError or skipped): encrypted
PDFs, CID/Type0 composite fonts with CMaps other than the UTF-16 BOM
convention, object streams (/ObjStm) and cross-reference streams —
the extractor falls back to an all-streams scan when the page tree
cannot be resolved, so linearized/simple real-world files still yield
their text.

The writer emits multi-page text PDFs (Helvetica, FlateDecode content
streams, valid xref) so tests round-trip REAL compressed PDF bytes with
no vendored asset; ``extract_pdf_text(encode_pdf_text(pages)) ==
"\\n".join(pages)``.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np  # noqa: F401  (parity with sibling codec modules)

_WS = b"\x00\t\n\x0c\r "


def is_pdf(b: bytes) -> bool:
    return b[:5] == b"%PDF-"


# ---------------------------------------------------------------------------
# object model: number → raw object body (dict part + optional stream)
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")


def _objects(b: bytes) -> dict:
    """{obj_num: body bytes} — tolerant linear scan (no xref needed;
    works for appended/incremental files too: later definitions win)."""
    out = {}
    for m in _OBJ_RE.finditer(b):
        start = m.end()
        # find the stream extent first so 'endobj'/'endstream' byte
        # sequences INSIDE compressed data can't truncate the object:
        # honor a direct /Length when the dict carries one
        sm = re.compile(rb"\bstream\r?\n").search(b, start)
        em = b.find(b"endobj", start)
        if em == -1:
            continue
        if sm and sm.start() < em:
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)",
                           b[start:sm.start()])
            scan_from = sm.end() + int(lm.group(1)) if lm else sm.end()
            ee = b.find(b"endstream", scan_from)
            if ee == -1:
                continue
            em = b.find(b"endobj", ee)
            if em == -1:
                continue
        out[int(m.group(1))] = b[start:em]
    return out


def _stream_of(body: bytes) -> bytes | None:
    """Raw (decoded) stream payload of an object body, or None."""
    sm = re.compile(rb"\bstream\r?\n").search(body)
    if not sm:
        return None
    lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", body[:sm.start()])
    if lm:                              # exact extent from /Length
        data = body[sm.end():sm.end() + int(lm.group(1))]
    else:
        ee = body.rfind(b"endstream")
        if ee == -1:
            return None
        data = body[sm.end():ee]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
    if b"/FlateDecode" in body[:sm.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"bad FlateDecode stream: {exc}") from exc
    return data


def _ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _refs_array(body: bytes, key: bytes) -> list:
    m = re.search(re.escape(key) + rb"\s*\[([^\]]*)\]", body)
    if not m:
        one = _ref(body, key)
        return [one] if one is not None else []
    return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def probe_pdf(b: bytes) -> dict:
    """Header-level probe: version, page count, encryption flag, object
    count, first-page MediaBox."""
    if not is_pdf(b):
        raise ValueError("not a PDF")
    version = b[5:8].decode("latin1", "replace")
    objs = _objects(b)
    pages = [n for n, body in objs.items()
             if re.search(rb"/Type\s*/Page\b", body)
             and not re.search(rb"/Type\s*/Pages\b", body)]
    box = (-1.0, -1.0)
    if pages:
        m = re.search(rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+"
                      rb"([\d.+-]+)\s+([\d.+-]+)", objs[min(pages)])
        if m:
            box = (float(m.group(3)) - float(m.group(1)),
                   float(m.group(4)) - float(m.group(2)))
    return {"version": version, "pages": len(pages),
            "encrypted": b"/Encrypt" in b, "objects": len(objs),
            "width": box[0], "height": box[1]}


# ---------------------------------------------------------------------------
# content-stream tokenizer → text
# ---------------------------------------------------------------------------

_ESC = {ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
        ord("b"): b"\b", ord("f"): b"\x0c",
        ord("("): b"(", ord(")"): b")", ord("\\"): b"\\"}


def _read_literal(s: bytes, i: int):
    """Parse a ``(…)`` literal string starting at the '(' → (bytes, next)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(s)
    while i < n and depth:
        c = s[i]
        if c == 0x5C:                              # backslash
            i += 1
            if i >= n:
                break
            e = s[i]
            if e in _ESC:
                out += _ESC[e]
                i += 1
            elif 0x30 <= e <= 0x37:                # 1-3 octal digits
                j = i
                while j < min(i + 3, n) and 0x30 <= s[j] <= 0x37:
                    j += 1
                out.append(int(s[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):                # line continuation
                i += 1
                if e == 0x0D and i < n and s[i] == 0x0A:
                    i += 1
            else:                                  # \x → x
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _str_decode(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", "replace")
    return raw.decode("latin1")


def extract_stream_text(data: bytes) -> list:
    """Content-stream bytes → list of text lines (the Td/TD/T*/' rule)."""
    lines = [""]
    shown = False
    i = 0
    n = len(data)
    pending = []                                    # strings since last op
    while i < n:
        c = data[i]
        if c == 0x28:                               # ( literal string
            raw, i = _read_literal(data, i)
            pending.append(_str_decode(raw))
        elif c == 0x3C and i + 1 < n and data[i + 1] != 0x3C:  # <hex>
            j = data.find(b">", i)
            if j == -1:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            pending.append(_str_decode(bytes.fromhex(hx.decode())))
            i = j + 1
        elif c == 0x3C:                             # << dict — skip token
            i += 2
        elif c == 0x25:                             # % comment
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        else:
            m = re.match(rb"[A-Za-z'\"*]+", data[i:])
            if m:
                op = m.group(0)
                if op in (b"Tj", b"TJ"):
                    lines[-1] += "".join(pending)
                    shown = True
                elif op in (b"'", b'"'):            # next-line + show
                    if shown:
                        lines.append("")
                    lines[-1] += "".join(pending)
                    shown = True
                elif op in (b"Td", b"TD", b"T*"):
                    if shown:
                        lines.append("")
                elif op == b"BT":
                    shown = False
                pending = []
                i += len(op)
            else:
                i += 1                              # number/name/array chars
    return [ln for ln in lines] if shown or lines != [""] else []


def extract_pdf_text(b: bytes) -> str:
    """PDF bytes → extracted text (pages joined with newlines)."""
    if not is_pdf(b):
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in b:
        raise NotImplementedError("encrypted PDF (no RC4/AES here)")
    objs = _objects(b)
    streams: list = []
    root = None
    m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R", b)
    if m:
        root = int(m.group(1))
    try:
        pages_obj = _ref(objs[root], b"/Pages") if root in objs else None
        kids = _refs_array(objs[pages_obj], b"/Kids") \
            if pages_obj in objs else []
        for k in kids:
            for cnum in _refs_array(objs.get(k, b""), b"/Contents"):
                data = _stream_of(objs.get(cnum, b""))
                if data is not None:
                    streams.append(data)
    except (KeyError, ValueError):
        streams = []
    if not streams:                                 # fallback: scan all
        for _num, body in sorted(objs.items()):
            try:
                data = _stream_of(body)
            except ValueError:
                continue
            if data is not None and (b"Tj" in data or b"TJ" in data
                                     or b"'" in data):
                streams.append(data)
    out_lines: list = []
    for data in streams:
        out_lines.extend(extract_stream_text(data))
    return "\n".join(out_lines)


# ---------------------------------------------------------------------------
# writer (fixtures + the doc→PDF envelope)
# ---------------------------------------------------------------------------

def _pdf_escape_bytes(line: str) -> bytes:
    """Text line → PDF literal-string body (Latin-1 when possible, else
    UTF-16BE with BOM), with (, ), \\ and CR/LF escaped."""
    try:
        raw = line.encode("latin1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + line.encode("utf-16-be")
    return (raw.replace(b"\\", rb"\\").replace(b"(", rb"\(")
            .replace(b")", rb"\)").replace(b"\r", rb"\r")
            .replace(b"\n", rb"\n"))


def encode_pdf_text(pages, compress: bool = True,
                    page_size=(612, 792)) -> bytes:
    """List of page texts → multi-page text PDF (Helvetica 11pt, one
    ``Tj`` per line with ``0 -14 Td`` line advances, FlateDecode content
    streams, valid xref)."""
    if isinstance(pages, str):
        pages = [pages]
    if not pages:
        raise ValueError("no pages")
    w, h = page_size
    n = len(pages)
    font_num = 3 + 2 * n
    objs: list = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        (b"<< /Type /Pages /Kids ["
         + b" ".join(f"{3 + 2 * i} 0 R".encode() for i in range(n))
         + f"] /Count {n} >>".encode()),
    ]
    for i, text in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
             f"/Contents {cont_num} 0 R /Resources << /Font "
             f"<< /F1 {font_num} 0 R >> >> >>").encode())
        ops = [b"BT /F1 11 Tf", f"50 {h - 50} Td".encode()]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _pdf_escape_bytes(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        filt = b""
        if compress:
            stream = zlib.compress(stream, 6)
            filt = b" /Filter /FlateDecode"
        objs.append(b"<< /Length " + str(len(stream)).encode() + filt
                    + b" >>\nstream\n" + stream + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>")
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
