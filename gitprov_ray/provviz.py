"""PROV graph visualization serializers: DOT, SVG, PNG, JPEG.

Closes the S9 format matrix (reference ProvenanceService.java:216-250
serializes a document to PROVN/TURTLE/XML/RDFXML/PDF/JSON/DOT/SVG/PNG/
JPEG/TRIG via ProvToolbox): DOT and SVG are deterministic text written
directly; PNG and JPEG rasterize the same layout onto a numpy canvas
encoded by this engine's own codecs (pngcodec / jpegcodec) — no external
imaging dependency. PDF remains out of scope.

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
