"""PROV graph visualization serializers: DOT, SVG, PNG, JPEG.

Closes the S9 format matrix (reference ProvenanceService.java:216-250
serializes a document to PROVN/TURTLE/XML/RDFXML/PDF/JSON/DOT/SVG/PNG/
JPEG/TRIG via ProvToolbox): DOT and SVG are deterministic text written
directly; PNG and JPEG rasterize the same layout onto a numpy canvas
encoded by this engine's own codecs (pngcodec / jpegcodec); PDF is a
hand-written single-page vector document (1.4 subset) — no external
imaging dependency anywhere.

Layout: PROV-typed layered columns (agents | activities | entities |
other), rows sorted by node URI — deterministic for fixtures, like every
serializer in this package. These are SMALL-DOCUMENT serializers (the
reference's per-repo provenance documents are thousands of nodes, not
billions): callers serialize one graph's triples, and ``max_nodes``
truncates deterministically with a visible annotation rather than
attempting to plot a corpus.

Node styling follows the prov-dot conventions: entities are yellow
ellipses, activities blue rectangles, agents orange houses.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

_PROV = "http://www.w3.org/ns/prov#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# (column, dot shape, fill color RGB) per PROV class
_STYLE = {
    "agent": (0, "house", (253, 184, 99)),
    "activity": (1, "box", (158, 202, 225)),
    "entity": (2, "ellipse", (255, 252, 136)),
    "other": (3, "box", (221, 221, 221)),
}

_COL_W, _ROW_H, _MARGIN = 280, 70, 50
_NODE_W, _NODE_H = 180, 36


def _local(uri: str) -> str:
    for sep in ("#", "/"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1]
    return uri or "?"


def _classify(triples: pd.DataFrame) -> dict[str, str]:
    """node URI → prov kind from rdf:type triples (subclass names like
    SoftwareAgent / Collection map onto their base column)."""
    kinds: dict[str, str] = {}
    types = triples[(triples["pred"] == _RDF_TYPE)
                    & ~triples["obj_is_literal"].astype(bool)]
    for subj, obj in zip(types["subj"], types["obj"]):
        if not obj.startswith(_PROV):
            continue
        name = obj[len(_PROV):].lower()
        if "agent" in name or "person" in name or "organization" in name:
            kinds[subj] = "agent"
        elif "activity" in name:
            kinds[subj] = "activity"
        elif kinds.get(subj) is None:
            kinds[subj] = "entity"
    return kinds


def _graph_model(triples: pd.DataFrame, max_nodes: int):
    """(nodes, edges, truncated): nodes = [(uri, kind, col, row)] with
    deterministic layered positions; edges = [(src, dst, label)]."""
    if len(triples) == 0 or "pred" not in triples.columns:
        return [], [], False            # empty diagram, not a crash
    kinds = _classify(triples)
    rel = triples[(triples["pred"] != _RDF_TYPE)
                  & ~triples["obj_is_literal"].astype(bool)]
    node_set = set(rel["subj"]) | set(rel["obj"]) | set(kinds)
    ordered = sorted(node_set)
    truncated = len(ordered) > max_nodes
    keep = set(ordered[:max_nodes])
    rows = {k: 0 for k in _STYLE}
    nodes = []
    pos = {}
    for uri in sorted(keep):
        kind = kinds.get(uri, "other")
        col = _STYLE[kind][0]
        nodes.append((uri, kind, col, rows[kind]))
        pos[uri] = (col, rows[kind])
        rows[kind] += 1
    edges = [(s, o, _local(p)) for s, p, o in
             zip(rel["subj"], rel["pred"], rel["obj"])
             if s in keep and o in keep]
    edges = sorted(set(edges))
    return nodes, edges, truncated


def _center(col: int, row: int) -> tuple[int, int]:
    return (_MARGIN + col * _COL_W + _NODE_W // 2,
            _MARGIN + row * _ROW_H + _NODE_H // 2)


def to_dot(triples: pd.DataFrame, max_nodes: int = 500) -> str:
    """Triples → GraphViz DOT source (prov-dot node conventions)."""
    nodes, edges, truncated = _graph_model(triples, max_nodes)
    ids = {uri: f"n{i}" for i, (uri, _, _, _) in enumerate(nodes)}
    out = ["digraph prov {", "  rankdir=BT;"]
    if truncated:
        out.append(f'  label="truncated to {max_nodes} nodes";')
    for uri, kind, _, _ in nodes:
        _, shape, (r, g, b) = _STYLE[kind]
        out.append(
            f'  {ids[uri]} [label="{_local(uri)}" shape={shape} '
            f'style=filled fillcolor="#{r:02x}{g:02x}{b:02x}" '
            f'tooltip="{uri}"];')
    for s, o, label in edges:
        out.append(f'  {ids[s]} -> {ids[o]} [label="{label}"];')
    out.append("}")
    return "\n".join(out) + "\n"


def to_svg(triples: pd.DataFrame, max_nodes: int = 500) -> str:
    """Triples → standalone SVG (layered layout, arrowed edges)."""
    nodes, edges, truncated = _graph_model(triples, max_nodes)
    maxrow = max((r for _, _, _, r in nodes), default=0)
    w = _MARGIN * 2 + 4 * _COL_W
    h = _MARGIN * 2 + (maxrow + 1) * _ROW_H
    pos = {uri: _center(c, r) for uri, _, c, r in nodes}
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
        f'height="{h}" viewBox="0 0 {w} {h}">',
        "<defs><marker id='arr' markerWidth='8' markerHeight='8' "
        "refX='7' refY='3' orient='auto'>"
        "<path d='M0,0 L7,3 L0,6 z' fill='#555'/></marker></defs>",
    ]
    for s, o, label in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        out.append(
            f'<line x1="{x1}" y1="{y1}" x2="{x2}" y2="{y2}" '
            'stroke="#555" stroke-width="1" marker-end="url(#arr)"/>')
        out.append(
            f'<text x="{(x1 + x2) // 2}" y="{(y1 + y2) // 2 - 3}" '
            f'font-size="9" fill="#777">{label}</text>')
    for uri, kind, c, r in nodes:
        x = _MARGIN + c * _COL_W
        y = _MARGIN + r * _ROW_H
        cx, cy = _center(c, r)
        _, shape, (cr, cg, cb) = _STYLE[kind]
        fill = f"#{cr:02x}{cg:02x}{cb:02x}"
        if shape == "ellipse":
            out.append(
                f'<ellipse cx="{cx}" cy="{cy}" rx="{_NODE_W // 2}" '
                f'ry="{_NODE_H // 2}" fill="{fill}" stroke="#333"/>')
        elif shape == "house":
            roof = y - 10
            out.append(
                f'<polygon points="{x},{y} {cx},{roof} {x + _NODE_W},{y} '
                f'{x + _NODE_W},{y + _NODE_H} {x},{y + _NODE_H}" '
                f'fill="{fill}" stroke="#333"/>')
        else:
            out.append(
                f'<rect x="{x}" y="{y}" width="{_NODE_W}" '
                f'height="{_NODE_H}" fill="{fill}" stroke="#333"/>')
        label = _local(uri)
        if len(label) > 26:
            label = label[:23] + "..."
        out.append(
            f'<text x="{cx}" y="{cy + 4}" font-size="11" '
            f'text-anchor="middle">{_esc(label)}</text>')
    if truncated:
        out.append(f'<text x="{_MARGIN}" y="{h - 10}" font-size="11" '
                   f'fill="#900">truncated to {max_nodes} nodes</text>')
    out.append("</svg>")
    return "\n".join(out) + "\n"


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# ---------------------------------------------------------------------------
# rasterization (numpy canvas → own codecs)
# ---------------------------------------------------------------------------

def _draw_line(canvas, x0, y0, x1, y1, color):
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.clip(np.linspace(x0, x1, n).round().astype(int),
                 0, canvas.shape[1] - 1)
    ys = np.clip(np.linspace(y0, y1, n).round().astype(int),
                 0, canvas.shape[0] - 1)
    canvas[ys, xs] = color


def _render(triples: pd.DataFrame, max_nodes: int) -> np.ndarray:
    nodes, edges, _ = _graph_model(triples, max_nodes)
    maxrow = max((r for _, _, _, r in nodes), default=0)
    w = _MARGIN * 2 + 4 * _COL_W
    h = _MARGIN * 2 + (maxrow + 1) * _ROW_H
    canvas = np.full((h, w, 3), 255, np.uint8)
    pos = {uri: _center(c, r) for uri, _, c, r in nodes}
    for s, o, _ in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        _draw_line(canvas, x1, y1, x2, y2, (85, 85, 85))
    for uri, kind, c, r in nodes:
        cx, cy = _center(c, r)
        color = np.array(_STYLE[kind][2], np.uint8)
        _, shape, _ = _STYLE[kind]
        y0, y1 = cy - _NODE_H // 2, cy + _NODE_H // 2
        x0, x1 = cx - _NODE_W // 2, cx + _NODE_W // 2
        if shape == "ellipse":
            yy, xx = np.mgrid[y0:y1, x0:x1]
            mask = (((xx - cx) / (_NODE_W / 2)) ** 2
                    + ((yy - cy) / (_NODE_H / 2)) ** 2) <= 1.0
            canvas[y0:y1, x0:x1][mask] = color
        else:
            canvas[y0:y1, x0:x1] = color
            if shape == "house":
                for dy in range(10):            # roof triangle above
                    frac = dy / 10
                    half = int((_NODE_W // 2) * frac)
                    canvas[y0 - 10 + dy, cx - half:cx + half + 1] = color
        _draw_line(canvas, x0, y0, x1, y0, (51, 51, 51))
        _draw_line(canvas, x0, y1 - 1, x1, y1 - 1, (51, 51, 51))
        _draw_line(canvas, x0, y0, x0, y1 - 1, (51, 51, 51))
        _draw_line(canvas, x1 - 1, y0, x1 - 1, y1 - 1, (51, 51, 51))
    return canvas


def to_png(triples: pd.DataFrame, max_nodes: int = 500) -> bytes:
    """Triples → PNG diagram bytes (rasterized with this engine's own
    pngcodec — decode it back with pngcodec.decode_png)."""
    from . import pngcodec

    return pngcodec.encode_png(_render(triples, max_nodes))


def to_jpeg(triples: pd.DataFrame, max_nodes: int = 500,
            quality: int = 92) -> bytes:
    """Triples → JPEG diagram bytes (this engine's own jpegcodec)."""
    from . import jpegcodec

    return jpegcodec.encode_jpeg_baseline(_render(triples, max_nodes),
                                          quality=quality)


# ---------------------------------------------------------------------------
# PDF (vector): minimal single-page writer, PDF 1.4 subset — header,
# catalog/pages/page objects, one uncompressed content stream of path +
# text operators, Helvetica base font, hand-built xref. Completes the
# reference's 11-format S9 matrix.
# ---------------------------------------------------------------------------

_KAPPA = 0.5523                       # Bézier circle-approximation constant


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_content(triples: pd.DataFrame, max_nodes: int):
    """(content stream str, page width, page height)."""
    nodes, edges, truncated = _graph_model(triples, max_nodes)
    maxrow = max((r for _, _, _, r in nodes), default=0)
    w = _MARGIN * 2 + 4 * _COL_W
    h = _MARGIN * 2 + (maxrow + 1) * _ROW_H
    pos = {uri: _center(c, r) for uri, _, c, r in nodes}

    def Y(y):                         # PDF origin is bottom-left
        return h - y

    ops = ["0.33 0.33 0.33 RG", "1 w"]
    for s, o, label in edges:
        (x1, y1), (x2, y2) = pos[s], pos[o]
        ops.append(f"{x1} {Y(y1)} m {x2} {Y(y2)} l S")
        ops.append("BT /F1 7 Tf 0.47 0.47 0.47 rg "
                   f"{(x1 + x2) // 2} {Y((y1 + y2) // 2 - 3)} Td "
                   f"({_pdf_escape(label)}) Tj ET")
    for uri, kind, c, r in nodes:
        cx, cy = _center(c, r)
        _, shape, (cr, cg, cb) = _STYLE[kind]
        ops.append(f"{cr / 255:.3f} {cg / 255:.3f} {cb / 255:.3f} rg "
                   "0.2 0.2 0.2 RG")
        x0, y0 = cx - _NODE_W // 2, cy - _NODE_H // 2
        if shape == "ellipse":
            rx, ry = _NODE_W / 2, _NODE_H / 2
            kx, ky = rx * _KAPPA, ry * _KAPPA
            yc = Y(cy)
            ops.append(
                f"{cx + rx} {yc} m "
                f"{cx + rx} {yc + ky} {cx + kx} {yc + ry} {cx} {yc + ry} c "
                f"{cx - kx} {yc + ry} {cx - rx} {yc + ky} {cx - rx} {yc} c "
                f"{cx - rx} {yc - ky} {cx - kx} {yc - ry} {cx} {yc - ry} c "
                f"{cx + kx} {yc - ry} {cx + rx} {yc - ky} {cx + rx} {yc} c "
                "B")
        elif shape == "house":
            ops.append(
                f"{x0} {Y(y0)} m {cx} {Y(y0 - 10)} l "
                f"{x0 + _NODE_W} {Y(y0)} l "
                f"{x0 + _NODE_W} {Y(y0 + _NODE_H)} l "
                f"{x0} {Y(y0 + _NODE_H)} l h B")
        else:
            ops.append(f"{x0} {Y(y0 + _NODE_H)} {_NODE_W} {_NODE_H} re B")
        label = _local(uri)
        if len(label) > 26:
            label = label[:23] + "..."
        tw = int(len(label) * 5.0)    # ~Helvetica 9pt advance estimate
        ops.append("BT /F1 9 Tf 0 0 0 rg "
                   f"{cx - tw // 2} {Y(cy + 3)} Td "
                   f"({_pdf_escape(label)}) Tj ET")
    if truncated:
        ops.append("BT /F1 9 Tf 0.6 0 0 rg "
                   f"{_MARGIN} 12 Td (truncated to {max_nodes} nodes) "
                   "Tj ET")
    return "\n".join(ops), w, h


def to_pdf(triples: pd.DataFrame, max_nodes: int = 500) -> bytes:
    """Triples → single-page vector-PDF diagram bytes (PDF 1.4 subset
    written by hand: xref + catalog/pages/page/content/font objects,
    uncompressed content stream, base-14 Helvetica)."""
    content, w, h = _pdf_content(triples, max_nodes)
    stream = content.encode("latin1", "replace")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
         "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
         ).encode(),
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
        + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
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
