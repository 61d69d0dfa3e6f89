"""Visualization serializers (provviz: DOT / SVG / PNG / JPEG — the S9
format rows the reference serves via ProvToolbox,
ProvenanceService.java:216-250). PNG/JPEG round-trip through this
engine's own codecs."""
import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
import pytest

from gitprov_ray import jpegcodec, pngcodec, provviz, serializers

PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture()
def tri():
    def row(s, p, o, lit=False):
        return {"graph": "g", "subj": s, "pred": p, "obj": o,
                "obj_is_literal": lit, "obj_dtype": "xsd:string"}

    e1, e2 = "http://x/entity/f1", "http://x/entity/f2"
    act = "http://x/activity/c1"
    ag = "http://x/agent/alice"
    return pd.DataFrame([
        row(e1, RDF_TYPE, PROV + "Entity"),
        row(e2, RDF_TYPE, PROV + "Entity"),
        row(act, RDF_TYPE, PROV + "Activity"),
        row(ag, RDF_TYPE, PROV + "Agent"),
        row(e2, PROV + "wasGeneratedBy", act),
        row(act, PROV + "used", e1),
        row(act, PROV + "wasAssociatedWith", ag),
        row(e2, PROV + "wasDerivedFrom", e1),
        row(e1, PROV + "atLocation", "somewhere", lit=True),  # no edge
    ])


def test_dot_output(tri):
    dot = provviz.to_dot(tri)
    assert dot.startswith("digraph prov {")
    assert dot.count("->") == 4                    # literal makes no edge
    assert 'shape=ellipse' in dot and 'shape=house' in dot \
        and 'shape=box' in dot
    assert 'label="f1"' in dot and 'label="alice"' in dot
    assert 'label="wasDerivedFrom"' in dot
    # deterministic
    assert dot == provviz.to_dot(tri)


def test_svg_well_formed(tri):
    svg = provviz.to_svg(tri)
    root = ET.fromstring(svg)
    assert root.tag.endswith("svg")
    ns = "{http://www.w3.org/2000/svg}"
    assert len(root.findall(f"{ns}line")) == 4
    shapes = (root.findall(f"{ns}rect") + root.findall(f"{ns}ellipse")
              + root.findall(f"{ns}polygon"))
    assert len(shapes) == 4
    texts = [t.text for t in root.iter(f"{ns}text")]
    assert "f1" in texts and "alice" in texts


def test_png_jpeg_roundtrip_own_codecs(tri):
    png = provviz.to_png(tri)
    arr = pngcodec.decode_png(png)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert (arr == 255).all(axis=2).mean() > 0.5   # mostly white canvas
    assert ((arr != 255).any(axis=2)).sum() > 1000  # with real ink
    jpg = provviz.to_jpeg(tri)
    arr2 = jpegcodec.decode_jpeg(jpg)
    assert arr2.shape == arr.shape


def test_serialize_dispatch(tri):
    assert serializers.serialize(tri, "dot").startswith("digraph")
    assert serializers.serialize(tri, "image/svg+xml").startswith("<svg")
    assert serializers.serialize(tri, "image/png")[:4] == b"\x89PNG"
    assert serializers.serialize(tri, "image/jpeg")[:2] == b"\xff\xd8"


def test_pdf_structure(tri):
    """No PDF parser is installed, so validate the invariants a reader
    relies on: header, every xref offset pointing exactly at its object,
    correct stream /Length, and trailer startxref."""
    pdf = provviz.to_pdf(tri)
    assert pdf.startswith(b"%PDF-1.4\n") and pdf.endswith(b"%%EOF\n")
    xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert pdf[xref_at:xref_at + 4] == b"xref"
    lines = pdf[xref_at:].split(b"\n")
    n = int(lines[1].split()[1])
    assert n == 6                     # free head + 5 objects
    for i, entry in enumerate(lines[3:2 + n], start=1):
        off = int(entry.split()[0])
        assert pdf[off:].startswith(f"{i} 0 obj".encode()), i
    # content stream length is exact
    m = pdf.index(b"/Length ")
    length = int(pdf[m + 8:pdf.index(b" ", m + 8)])
    s = pdf.index(b"stream\n", m) + 7
    assert pdf[s + length:s + length + 10] == b"\nendstream"
    body = pdf[s:s + length].decode("latin1")
    assert " re B" in body and " c " in body    # rect + ellipse curves
    assert "(alice)" in body and "(wasDerivedFrom)" in body
    assert serializers.serialize(tri, "application/pdf")[:5] == b"%PDF-"


def test_truncation_annotated(tri):
    big = pd.concat([tri.assign(
        subj=tri.subj + f"/{i}", obj=np.where(
            tri.obj_is_literal, tri.obj, tri.obj + f"/{i}"))
        for i in range(30)], ignore_index=True)
    dot = provviz.to_dot(big, max_nodes=10)
    assert "truncated to 10 nodes" in dot
    assert dot.count("[label=") <= 10 + dot.count("->")
    svg = provviz.to_svg(big, max_nodes=10)
    assert "truncated to 10 nodes" in svg
