"""Output serializers + format registry.

Engine equivalent of the reference's format machinery:
  * S9 multi-format document writer (ProvenanceService.java:197-254) →
    RDF-level writers (N-Triples, N-Quads, Turtle) over triple rows and a
    PROV-N-lite statement serializer honoring the reference's
    category-major statement order (O2, ProvenanceService.java:202-212);
  * S13 Turtle/N-Triples parser (JenaUtils.java:43-54) → a line-oriented
    N-Triples parser back into triple rows;
  * S14 model re-serializer + format map (JenaUtils.java:18-41) →
    FORMATS registry + CSV/TSV/JSON result writers;
  * M11 content-type dispatch; quirk 6 FIXED as documented: unknown formats
    raise up front instead of the reference's null-format crash.

Image/PDF formats (PNG/JPEG/SVG/PDF/DOT, ProvenanceService.java:229-246)
are visualization, not data processing — out of scope per SURVEY.md S9.
"""

from __future__ import annotations

import json

import pandas as pd

from . import idgen

# ---------------------------------------------------------------------------
# term formatting
# ---------------------------------------------------------------------------

_NT_ESC = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
# line-breaking controls beyond \n\r (str.splitlines splits on these too)
_NT_CTRL = {0x0B, 0x0C, 0x1C, 0x1D, 0x1E, 0x85, 0x2028, 0x2029}


def _esc_char(c: str) -> str:
    if c in _NT_ESC:
        return _NT_ESC[c]
    o = ord(c)
    if o < 0x20 or o in _NT_CTRL:
        return "\\u%04x" % o
    return c


def _lit(value: str) -> str:
    return '"' + "".join(_esc_char(c) for c in value) + '"'


def _dtype_uri(dtype: str) -> str:
    from .prov import PREFIXES

    pfx, local = dtype.split(":", 1)
    return PREFIXES[pfx] + local


def _term_obj(row) -> str:
    if row["obj_is_literal"]:
        s = _lit(row["obj"])
        if row["obj_dtype"] and row["obj_dtype"] != "xsd:string":
            s += "^^<" + _dtype_uri(row["obj_dtype"]) + ">"
        return s
    return "<" + row["obj"] + ">"


# ---------------------------------------------------------------------------
# RDF writers (triple rows → text)
# ---------------------------------------------------------------------------

def to_ntriples(triples: pd.DataFrame) -> str:
    lines = [
        f"<{r['subj']}> <{r['pred']}> {_term_obj(r)} ."
        for r in triples.sort_values(["graph", "subj", "pred", "obj"])
                        .to_dict("records")
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def to_nquads(triples: pd.DataFrame) -> str:
    lines = [
        f"<{r['subj']}> <{r['pred']}> {_term_obj(r)} <{idgen.graph_ns(r['graph'])[:-1]}> ."
        for r in triples.sort_values(["graph", "subj", "pred", "obj"])
                        .to_dict("records")
    ]
    return "\n".join(lines) + ("\n" if lines else "")


def to_turtle(triples: pd.DataFrame) -> str:
    """Deterministic Turtle: prefix block + subject-grouped triples."""
    from .prov import PREFIXES

    graphs = sorted(triples["graph"].unique())
    prefixes = dict(PREFIXES)
    for i, g in enumerate(graphs):
        prefixes[f"g{i}" if len(graphs) > 1 else "gitprov"] = idgen.graph_ns(g)
    rev = {v: k for k, v in prefixes.items()}

    def pname(uri: str) -> str:
        for ns, pfx in rev.items():
            if uri.startswith(ns) and "/" not in uri[len(ns):] \
                    and "#" not in uri[len(ns):]:
                return f"{pfx}:{uri[len(ns):]}"
        return f"<{uri}>"

    out = [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]
    out.append("")
    df = triples.sort_values(["graph", "subj", "pred", "obj"])
    for subj, g in df.groupby("subj", sort=True):
        parts = []
        for r in g.to_dict("records"):
            o = _term_obj(r) if r["obj_is_literal"] else pname(r["obj"])
            parts.append(f"    {pname(r['pred'])} {o}")
        out.append(pname(subj) + "\n" + " ;\n".join(parts) + " .")
    return "\n".join(out) + "\n"


def parse_ntriples(text: str) -> list[dict]:
    """Line-oriented N-Triples parser → triple rows (S13 analog).
    Graph is recovered from the gitprov namespace when the subject is in
    one; otherwise ''. Malformed lines are skipped (M15 policy)."""
    import re

    rx = re.compile(
        r'^<([^>]*)>\s+<([^>]*)>\s+(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
        r"(?:\^\^<([^>]*)>)?)\s*\.$")
    _unesc_rx = re.compile(r'\\(?:u([0-9a-fA-F]{4})|(.))')

    def _unescape(s: str) -> str:
        def f(m):
            if m.group(1):
                return chr(int(m.group(1), 16))
            c = m.group(2)
            return {"n": "\n", "r": "\r", "t": "\t"}.get(c, c)
        return _unesc_rx.sub(f, s)

    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = rx.match(line)
        if not m:
            continue
        subj, pred, obj_uri, obj_lit, dtype = m.groups()
        graph = ""
        marker = "https://gitprov.example/graph/"
        if subj.startswith(marker):
            graph = subj[len(marker):].split("#", 1)[0]
        if obj_uri is not None:
            out.append({"subj": subj, "pred": pred, "obj": obj_uri,
                        "obj_is_literal": False, "obj_dtype": "", "graph": graph})
        else:
            lit = _unescape(obj_lit)
            dt = ""
            if dtype:
                from .prov import PREFIXES

                for pfx, ns in PREFIXES.items():
                    if dtype.startswith(ns):
                        dt = f"{pfx}:{dtype[len(ns):]}"
                        break
            out.append({"subj": subj, "pred": pred, "obj": lit,
                        "obj_is_literal": True,
                        "obj_dtype": dt or "xsd:string", "graph": graph})
    return out


# ---------------------------------------------------------------------------
# PROV-N-lite document serializer (statement-level, category-major order O2)
# ---------------------------------------------------------------------------

def _provn_attrs(s: dict) -> str:
    """PROV-N optional-attributes block: ``, [pred="val" %% dtype, ...]``
    (sorted by pred; @uri values as qualified names). Empty attrs → ''."""
    if not s.get("attrs") or s["attrs"] == "{}":
        return ""
    attrs = json.loads(s["attrs"])
    parts = []
    for pred, (val, dtype) in sorted(attrs.items()):
        if dtype == "@uri":
            parts.append(f"{pred}='gitprov:{val}'")
        elif dtype == "xsd:string":
            parts.append(f'{pred}={json.dumps(str(val), ensure_ascii=False)}')
        else:
            parts.append(f'{pred}={json.dumps(str(val), ensure_ascii=False)}'
                         f" %% {dtype}")
    return ", [" + ", ".join(parts) + "]"


def to_provn(statements: list[dict]) -> str:
    """PROV-N text document with full attribute rendering. Statements are
    emitted in the reference's category-major order
    (ProvenanceService.java:202-212) with a deterministic (id, subj, obj)
    order within category — divergence from the reference's insertion
    order within category, documented (triple P/R unaffected; this is a
    text rendering)."""
    rows = sorted(statements, key=lambda s: (
        s["stmt_rank"], s["id"] or "", s["subj"] or "", s["obj"] or ""))
    out = ["document"]
    for s in rows:
        t = s["stmt_type"]
        a = _provn_attrs(s)
        args = {
            "activity": lambda: f"activity(gitprov:{s['id']}, {_t(s)}, -{a})",
            "agent": lambda: f"agent(gitprov:{s['id']}{a})",
            "entity": lambda: f"entity(gitprov:{s['id']}{a})",
            "base_entity": lambda: f"entity(gitprov:{s['id']}{a})",
            "specializationOf": lambda: (
                f"specializationOf(gitprov:{s['subj']}, gitprov:{s['obj']})"),
            "wasAssociatedWith": lambda: (
                f"wasAssociatedWith(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}, -{a})"),
            "wasGeneratedBy": lambda: (
                f"wasGeneratedBy(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}, {_t(s)}{a})"),
            "wasInvalidatedBy": lambda: (
                f"wasInvalidatedBy(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}, {_t(s)}{a})"),
            "used": lambda: (
                f"used(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}, {_t(s)}{a})"),
            "wasInformedBy": lambda: (
                f"wasInformedBy(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}{a})"),
            "wasDerivedFrom": lambda: (
                f"wasDerivedFrom(gitprov:{s['id']}; gitprov:{s['subj']}, "
                f"gitprov:{s['obj']}, gitprov:{s['secondary']}, -, -{a})"),
        }[t]()
        out.append("  " + args)
    out.append("endDocument")
    return "\n".join(out) + "\n"


def _t(s: dict) -> str:
    return s["t"].isoformat() if s.get("t") is not None else "-"


# ---------------------------------------------------------------------------
# result-set writers (S14: CSV / TSV / JSON)
# ---------------------------------------------------------------------------

def result_csv(df: pd.DataFrame) -> str:
    return df.to_csv(index=False)


def result_tsv(df: pd.DataFrame) -> str:
    return df.to_csv(index=False, sep="\t")


def result_json(df: pd.DataFrame) -> str:
    return json.dumps(
        {"head": {"vars": list(df.columns)},
         "results": {"bindings": df.astype(object).where(df.notna(), None)
                                   .to_dict("records")}},
        ensure_ascii=False, sort_keys=True, default=str)


def result_text(df: pd.DataFrame) -> str:
    """``text/plain`` SELECT results: the ASCII table of Jena's
    ``ResultSetFormatter.asText`` (SparqlService.java:60-61) — ``|``-framed
    columns padded to max cell width, ``-`` border lines, ``=`` rule under
    the header; unbound cells render empty."""
    cols = [str(c) for c in df.columns]
    cells = [["" if pd.isna(v) else str(v) for v in row]
             for row in df.itertuples(index=False, name=None)]
    widths = [max([len(c)] + [len(r[i]) for r in cells])
              for i, c in enumerate(cols)]
    if not widths:                         # zero-column frame
        return "||\n"

    def line(row: list[str]) -> str:
        return "| " + " | ".join(v.ljust(w) for v, w in zip(row, widths)) \
            + " |"
    border = "-" * (sum(widths) + 3 * len(widths) + 1)
    rule = "=" * len(border)
    out = [border, line(cols), rule]
    out.extend(line(r) for r in cells)
    out.append(border)
    return "\n".join(out) + "\n"


def result_xml(df: pd.DataFrame) -> str:
    """``application/xml`` SELECT results: the W3C SPARQL Query Results XML
    Format (Jena's ``ResultSetFormatter.asXMLString``,
    SparqlService.java:62-63). Unbound cells omit their <binding>. NOTE the
    reference quirk: content type ``application/sparql-results+xml`` does
    NOT reach this writer — it maps to FMT_RS_JSON
    (SparqlService.java:35-37), mirrored in RESULT_CONTENT_TYPES."""
    from xml.sax.saxutils import escape, quoteattr

    cols = [str(c) for c in df.columns]
    out = ['<?xml version="1.0"?>',
           '<sparql xmlns="http://www.w3.org/2005/sparql-results#">',
           "  <head>"]
    out.extend(f"    <variable name={quoteattr(c)}/>" for c in cols)
    out.append("  </head>")
    out.append("  <results>")
    for row in df.itertuples(index=False, name=None):
        out.append("    <result>")
        for c, v in zip(cols, row):
            if pd.isna(v):
                continue
            sv = escape(str(v))
            kind = "uri" if isinstance(v, str) and (
                v.startswith("http://") or v.startswith("https://")
                or v.startswith("urn:")) else "literal"
            out.append(f"      <binding name={quoteattr(c)}>"
                       f"<{kind}>{sv}</{kind}></binding>")
        out.append("    </result>")
    out.append("  </results>")
    out.append("</sparql>")
    return "\n".join(out) + "\n"


# SELECT result-set writer registry + the reference's content-type switch
# (SparqlService.java:58-82). Quirk pinned from SparqlService.java:35-37:
# `application/sparql-results+xml` maps to ResultsFormat.FMT_RS_JSON — the
# reference serves JSON for that content type, NOT the XML writer (which is
# only reachable as `application/xml`).
RESULT_FORMATS = {
    "csv": result_csv,
    "tsv": result_tsv,
    "json": result_json,
    "text": result_text,
    "xml": result_xml,
}

RESULT_CONTENT_TYPES = {
    "text/plain": "text",
    "application/xml": "xml",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
    "application/json": "json",
    "application/sparql-results+json": "json",
    "application/sparql-results+xml": "json",   # FMT_RS_JSON quirk
}


def serialize_results(df: pd.DataFrame, fmt: str) -> str:
    """SELECT result-set serialization dispatched by short name or the
    reference's content types (incl. the FMT_RS_JSON quirk)."""
    if fmt in RESULT_CONTENT_TYPES:
        fmt = RESULT_CONTENT_TYPES[fmt]
    if fmt not in RESULT_FORMATS:
        raise ValueError(f"unknown result format {fmt!r}")
    return RESULT_FORMATS[fmt](df)


# ---------------------------------------------------------------------------
# format registry + content-type dispatch (M11; quirk 6 fixed: validate)
# ---------------------------------------------------------------------------

FORMATS = {
    "ntriples": to_ntriples,
    "nquads": to_nquads,
    "turtle": to_turtle,
    "trig": lambda df: to_trig(df),
    "rdfxml": lambda df: to_rdfxml(df),
    "jsonld": lambda df: to_jsonld(df),
    "rdfjson": lambda df: to_rdfjson(df),
    "n3": lambda df: to_n3(df),
    "provn": None,      # statement-level: use to_provn
    "provxml": None,    # statement-level: use to_provxml
    # Jena Lang.RDFNULL (JenaUtils.java:31): text/plain serializes to an
    # EMPTY body — the reference returns "" for that content type.
    "rdfnull": lambda df: "",
    "csv": result_csv,
    "tsv": result_tsv,
    "json": result_json,
    # visualization formats (reference ProvenanceService.java:216-250
    # DOT/SVG/PNG/JPEG rows): provviz.py — PNG/JPEG rasterize through
    # this engine's own codecs and return BYTES, not str
    "dot": lambda df: _provviz().to_dot(df),
    "svg": lambda df: _provviz().to_svg(df),
    "png": lambda df: _provviz().to_png(df),
    "jpeg": lambda df: _provviz().to_jpeg(df),
    "pdf": lambda df: _provviz().to_pdf(df),
}


def _provviz():
    from . import provviz

    return provviz

# mirrors the reference's formatToLangs map (JenaUtils.java:18-41) plus the
# document content types of ProvenanceService.java:197-254.
# `application/xml` is PROV-XML (InteropFramework.ProvFormat.XML,
# ProvenanceService.java:223-224) — DISTINCT from application/rdf+xml.
# `application/sparql-results+thrift` (Lang.RDFTHRIFT, JenaUtils.java:25)
# is served as an N-Triples payload: RDF-Thrift's binary Thrift framing is
# out of scope (documented fallback), the triple CONTENT is identical.
CONTENT_TYPES = {
    "application/trig": "trig",
    "application/n-triples": "ntriples",
    "application/n-quads": "nquads",
    "application/x-turtle": "turtle",
    "text/turtle": "turtle",
    "application/rdf+xml": "rdfxml",
    "application/xml": "provxml",
    "application/ld+json": "jsonld",
    "application/rdf+json": "rdfjson",
    "application/sparql-results+thrift": "ntriples",
    "text/n3": "n3",
    "text/rdf+n3": "n3",
    "text/plain": "rdfnull",
    "text/provenance-notation": "provn",
    "text/csv": "csv",
    "text/tab-separated-values": "tsv",
    "application/json": "json",
    "application/sparql-results+json": "json",
    "text/vnd.graphviz": "dot",
    "image/svg+xml": "svg",
    "image/png": "png",
    "image/jpeg": "jpeg",
    "application/pdf": "pdf",
}



def serialize(triples: pd.DataFrame, fmt: str) -> str | bytes:
    """Format-dispatched serialization (str for text formats, bytes for
    the png/jpeg diagram rasters); unknown format → ValueError
    (documented fix of the reference's null-format crash, quirk 6)."""
    if fmt in CONTENT_TYPES:
        fmt = CONTENT_TYPES[fmt]
    if fmt not in FORMATS or FORMATS[fmt] is None:
        raise ValueError(f"unknown or statement-level format: {fmt!r}")
    return FORMATS[fmt](triples)


def to_trig(triples: pd.DataFrame) -> str:
    """TriG: one named-graph block per graph, Turtle-style bodies
    (S9's application/trig, ProvenanceService.java:247-249)."""
    out = []
    for g in sorted(triples["graph"].unique()):
        sub = triples[triples["graph"] == g]
        body = []
        for r in sub.sort_values(["subj", "pred", "obj"]).to_dict("records"):
            body.append(f"  <{r['subj']}> <{r['pred']}> {_term_obj(r)} .")
        out.append(f"<{idgen.graph_ns(g)[:-1]}> {{\n" + "\n".join(body) + "\n}")
    return "\n".join(out) + "\n"


def _ns_split(uri: str) -> tuple[str, str]:
    """Split a URI into (namespace, local) at the last '#' or '/'."""
    for sep in ("#", "/"):
        idx = uri.rfind(sep)
        if idx > 0:
            return uri[: idx + 1], uri[idx + 1:]
    return "", uri


def _ns_prefix_map(triples: pd.DataFrame) -> dict[str, str]:
    """Deterministic prefix per namespace: the known PROV/FOAF/… prefixes,
    gN for graph namespaces, nsN for anything else."""
    from .prov import PREFIXES

    known = {ns: pfx for pfx, ns in PREFIXES.items()}
    out: dict[str, str] = {}
    graphs = sorted(triples["graph"].unique())
    for i, g in enumerate(graphs):
        out[idgen.graph_ns(g)] = f"g{i}"
    counter = 0
    namespaces = set()
    for uri in triples["pred"]:
        namespaces.add(_ns_split(uri)[0])
    for ns in sorted(namespaces):
        if not ns:
            continue
        if ns in known:
            out[ns] = known[ns]
        elif ns not in out:
            out[ns] = f"ns{counter}"
            counter += 1
    return out


def _xml_esc(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # \r is normalized to \n by conforming XML parsers unless char-escaped;
    # in attributes \n and \t are normalized to spaces too
    s = s.replace("\r", "&#13;")
    if attr:
        s = s.replace('"', "&quot;").replace("\n", "&#10;").replace("\t", "&#9;")
    return s


def to_rdfxml(triples: pd.DataFrame) -> str:
    """Deterministic RDF/XML (the reference serves RDF/XML and XML from both
    documents and the store: ProvenanceService.java:222-228,
    JenaUtils.java:24). One rdf:Description per subject, predicates as
    QName elements, resources via rdf:resource, typed literals via
    rdf:datatype."""
    from .prov import PREFIXES

    pfx_of = _ns_prefix_map(triples)
    rdf_ns = PREFIXES["rdf"]
    pfx_of.setdefault(rdf_ns, "rdf")
    decls = "".join(
        f'\n  xmlns:{p}="{_xml_esc(ns, attr=True)}"'
        for ns, p in sorted(pfx_of.items(), key=lambda kv: kv[1]))
    out = [f"<rdf:RDF{decls}>"]
    df = triples.sort_values(["graph", "subj", "pred", "obj"])
    for subj, g in df.groupby("subj", sort=True):
        out.append(f'  <rdf:Description rdf:about="{_xml_esc(subj, attr=True)}">')
        for r in g.to_dict("records"):
            ns, local = _ns_split(r["pred"])
            qn = f"{pfx_of[ns]}:{local}" if ns in pfx_of else local
            if r["obj_is_literal"]:
                dt = ""
                if r["obj_dtype"] and r["obj_dtype"] != "xsd:string":
                    dt = f' rdf:datatype="{_xml_esc(_dtype_uri(r["obj_dtype"]), attr=True)}"'
                out.append(f"    <{qn}{dt}>{_xml_esc(r['obj'])}</{qn}>")
            else:
                out.append(
                    f'    <{qn} rdf:resource="{_xml_esc(r["obj"], attr=True)}"/>')
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def to_rdfjson(triples: pd.DataFrame) -> str:
    """RDF/JSON (the Talis shape JenaUtils' RDF/JSON lang emits):
    {subj: {pred: [{type, value, datatype?}]}}, deterministic order."""
    doc: dict = {}
    df = triples.sort_values(["subj", "pred", "obj"])
    for r in df.to_dict("records"):
        o: dict = {"value": r["obj"],
                   "type": "literal" if r["obj_is_literal"] else "uri"}
        if r["obj_is_literal"] and r["obj_dtype"] \
                and r["obj_dtype"] != "xsd:string":
            o["datatype"] = _dtype_uri(r["obj_dtype"])
        doc.setdefault(r["subj"], {}).setdefault(r["pred"], []).append(o)
    return json.dumps(doc, ensure_ascii=False, sort_keys=True)


def to_jsonld(triples: pd.DataFrame) -> str:
    """Flat JSON-LD: @graph of node objects keyed by @id, full-URI
    predicate terms, typed literals as {"@value", "@type"} (JenaUtils.java's
    JSON-LD lang). Deterministic member order."""
    from .prov import PREFIXES

    rdf_type = PREFIXES["rdf"] + "type"
    nodes: dict[str, dict] = {}
    df = triples.sort_values(["subj", "pred", "obj"])
    for r in df.to_dict("records"):
        node = nodes.setdefault(r["subj"], {"@id": r["subj"]})
        if not r["obj_is_literal"] and r["pred"] == rdf_type:
            node.setdefault("@type", []).append(r["obj"])
            continue
        if r["obj_is_literal"]:
            if r["obj_dtype"] and r["obj_dtype"] != "xsd:string":
                val: object = {"@value": r["obj"],
                               "@type": _dtype_uri(r["obj_dtype"])}
            else:
                val = r["obj"]
        else:
            val = {"@id": r["obj"]}
        node.setdefault(r["pred"], []).append(val)
    graph = [nodes[k] for k in sorted(nodes)]
    return json.dumps({"@graph": graph}, ensure_ascii=False, sort_keys=True)


# N3 is a superset of Turtle; the engine's deterministic Turtle subset is
# valid N3 (JenaUtils' N3 lang).
to_n3 = to_turtle


def parse_turtle(text: str) -> list[dict]:
    """Turtle parser for the engine's own deterministic Turtle subset plus
    simple standard variants (S13: the reference parses TURTLE into its
    store, JenaUtils.java:43-54): @prefix decls, subject blocks with
    ';'-separated predicate-object lines, literals with optional
    ^^datatype (CURIE or <uri>), pname or <uri> terms. One statement per
    line (the writer escapes newlines in literals), malformed lines are
    skipped (M15 policy)."""
    import re

    from .prov import PREFIXES

    prefix_rx = re.compile(r"^@prefix\s+([\w.-]*):\s+<([^>]*)>\s*\.\s*$")
    term_rx = re.compile(
        r"""^(?:
              <(?P<uri>[^>]*)>
            | "(?P<lit>(?:[^"\\]|\\.)*)"
              (?:\^\^(?:<(?P<dturi>[^>]*)>|(?P<dtpn>[\w.-]+:[\w.-]+)))?
            | (?P<pn>[\w.-]*:[^\s;,]*)
            )\s*(?P<rest>.*)$""", re.X)
    unesc_rx = re.compile(r'\\(?:u([0-9a-fA-F]{4})|(.))')

    def unescape(s: str) -> str:
        def f(m):
            if m.group(1):
                return chr(int(m.group(1), 16))
            return {"n": "\n", "r": "\r", "t": "\t"}.get(m.group(2), m.group(2))
        return unesc_rx.sub(f, s)

    prefixes: dict[str, str] = {}

    def expand_pname(pn: str) -> str | None:
        pfx, local = pn.split(":", 1)
        ns = prefixes.get(pfx)
        return ns + local if ns is not None else None

    def dtype_curie(uri: str) -> str:
        for pfx, ns in PREFIXES.items():
            if uri.startswith(ns):
                return f"{pfx}:{uri[len(ns):]}"
        return "xsd:string"

    marker = "https://gitprov.example/graph/"
    out: list[dict] = []
    subject: str | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = prefix_rx.match(line)
        if m:
            prefixes[m.group(1)] = m.group(2)
            continue
        if not raw[:1].isspace():
            # subject line (possibly with inline predicates on one line)
            tm = term_rx.match(line)
            if not tm or tm.group("lit") is not None:
                continue
            subject = tm.group("uri") if tm.group("uri") is not None \
                else expand_pname(tm.group("pn"))
            line = tm.group("rest").strip()
            if not line:
                continue
        if subject is None:
            continue
        # predicate-object line, ends with ';' or '.'
        body = line.rstrip()
        if body.endswith(";") or body.endswith("."):
            body = body[:-1].rstrip()
        pm = term_rx.match(body)
        if not pm or pm.group("lit") is not None:
            continue
        pred = pm.group("uri") if pm.group("uri") is not None \
            else expand_pname(pm.group("pn"))
        om = term_rx.match(pm.group("rest").strip())
        if pred is None or not om:
            continue
        graph = ""
        if subject.startswith(marker):
            graph = subject[len(marker):].split("#", 1)[0]
        if om.group("lit") is not None:
            dt = "xsd:string"
            if om.group("dturi"):
                dt = dtype_curie(om.group("dturi"))
            elif om.group("dtpn"):
                dt = om.group("dtpn")
            out.append({"subj": subject, "pred": pred,
                        "obj": unescape(om.group("lit")),
                        "obj_is_literal": True, "obj_dtype": dt,
                        "graph": graph})
        else:
            obj = om.group("uri") if om.group("uri") is not None \
                else expand_pname(om.group("pn"))
            if obj is None:
                continue
            out.append({"subj": subject, "pred": pred, "obj": obj,
                        "obj_is_literal": False, "obj_dtype": "",
                        "graph": graph})
    return out


def to_prov_json(statements: list[dict]) -> str:
    """PROV-JSON-flavored document (S9's application/json): statements
    grouped by category in the reference's category-major order
    (ProvenanceService.java:202-212), deterministic member order."""
    cats: dict[str, dict] = {}
    for s in sorted(statements, key=lambda s: (
            s["stmt_rank"], s["id"] or "", s["subj"] or "", s["obj"] or "")):
        entry: dict = {}
        if s["subj"] is not None and s["stmt_type"] not in (
                "activity", "agent", "entity", "base_entity"):
            entry["subject"] = f"gitprov:{s['subj']}"
            entry["object"] = f"gitprov:{s['obj']}"
        if s.get("secondary"):
            entry["activity"] = f"gitprov:{s['secondary']}"
        if s.get("t") is not None:
            entry["time"] = s["t"].isoformat()
        if s["attrs"] and s["attrs"] != "{}":
            entry["attrs"] = json.loads(s["attrs"])
        key = s["id"] if s["id"] else f"_:{s['subj']}-{s['obj']}"
        cats.setdefault(s["stmt_type"], {})[f"gitprov:{key}"] = entry
    return json.dumps(cats, ensure_ascii=False, sort_keys=True)


# ---------------------------------------------------------------------------
# PROV-XML document writer (W3C PROV-XML; the reference's application/xml,
# InteropFramework.ProvFormat.XML at ProvenanceService.java:223-224 —
# DISTINCT from RDF/XML, which serves application/rdf+xml)
# ---------------------------------------------------------------------------

# (subject-element, object-element, emits-time) per relation statement type;
# element names follow the PROV-XML schema (prov.xsd)
_PROVXML_REL = {
    "specializationOf": ("prov:specificEntity", "prov:generalEntity", False),
    "wasAssociatedWith": ("prov:activity", "prov:agent", False),
    "wasGeneratedBy": ("prov:entity", "prov:activity", True),
    "wasInvalidatedBy": ("prov:entity", "prov:activity", True),
    "used": ("prov:activity", "prov:entity", True),
    "wasInformedBy": ("prov:informed", "prov:informant", False),
    "wasDerivedFrom": ("prov:generatedEntity", "prov:usedEntity", False),
}
_PROVXML_NODE = {"activity": "prov:activity", "agent": "prov:agent",
                 "entity": "prov:entity", "base_entity": "prov:entity"}


def to_provxml(statements: list[dict]) -> str:
    """PROV-XML document: statements in the reference's category-major
    order O2 (ProvenanceService.java:202-212) with the same deterministic
    within-category order as `to_provn`. Attributes render as typed child
    elements (`<pfx:local xsi:type="...">`); `@uri`-typed citation attrs
    render as `xsd:QName` values, matching PROV-XML's qualified-name
    convention. One `gitprov` XML namespace per distinct graph (`gitprov`,
    `gitprov2`, … in sorted-graph order)."""
    from .prov import PREFIXES

    graphs = sorted({s["graph"] for s in statements})
    gpfx = {g: "gitprov" if i == 0 else f"gitprov{i + 1}"
            for i, g in enumerate(graphs)}

    def q(s: dict, name: str) -> str:
        return f"{gpfx[s['graph']]}:{name}"

    def attr_elems(s: dict, pad: str) -> list[str]:
        if not s.get("attrs") or s["attrs"] == "{}":
            return []
        out = []
        for pred, (val, dtype) in sorted(json.loads(s["attrs"]).items()):
            tag = q(s, pred.split(":", 1)[1]) if pred.startswith("gitprov:") \
                else pred
            if dtype == "@uri":
                out.append(f'{pad}<{tag} xsi:type="xsd:QName">'
                           f"{_xml_esc(q(s, val))}</{tag}>")
            else:
                out.append(f'{pad}<{tag} xsi:type="{dtype}">'
                           f"{_xml_esc(str(val))}</{tag}>")
        return out

    ns = [f'xmlns:{p}="{u}"' for p, u in sorted(PREFIXES.items())]
    ns.append('xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"')
    ns += [f'xmlns:{gpfx[g]}="{_xml_esc(idgen.graph_ns(g), attr=True)}"' for g in graphs]
    lines = ['<?xml version="1.0" encoding="UTF-8"?>',
             "<prov:document " + " ".join(ns) + ">"]
    for s in sorted(statements, key=lambda s: (
            s["stmt_rank"], s["id"] or "", s["subj"] or "", s["obj"] or "")):
        t = s["stmt_type"]
        body: list[str] = []
        if t in _PROVXML_NODE:
            tag = _PROVXML_NODE[t]
            head = f'  <{tag} prov:id="{_xml_esc(q(s, s["id"]), attr=True)}">'
            if t == "activity" and s.get("t") is not None:
                body.append(f"    <prov:startTime>{s['t'].isoformat()}"
                            "</prov:startTime>")
        else:
            subj_el, obj_el, has_time = _PROVXML_REL[t]
            tag = f"prov:{t}"
            idattr = f' prov:id="{_xml_esc(q(s, s["id"]), attr=True)}"' if s["id"] else ""
            head = f"  <{tag}{idattr}>"
            body.append(f'    <{subj_el} prov:ref="'
                        f'{_xml_esc(q(s, s["subj"]), attr=True)}"/>')
            body.append(f'    <{obj_el} prov:ref="'
                        f'{_xml_esc(q(s, s["obj"]), attr=True)}"/>')
            if t == "wasDerivedFrom" and s.get("secondary"):
                body.append(f'    <prov:activity prov:ref="'
                            f'{_xml_esc(q(s, s["secondary"]), attr=True)}"/>')
            if has_time and s.get("t") is not None:
                body.append(f"    <prov:time>{s['t'].isoformat()}"
                            "</prov:time>")
        body += attr_elems(s, "    ")
        lines += [head] + body + [f"  </{tag}>"]
    lines.append("</prov:document>")
    return "\n".join(lines) + "\n"


PARSERS = {
    "ntriples": parse_ntriples,
    "turtle": parse_turtle,
}


def parse(text: str, fmt: str) -> list[dict]:
    """Format-dispatched RDF parsing (S13: JenaUtils.java:43-54 reads
    Turtle into the store; the engine reads its own N-Triples and Turtle)."""
    if fmt in CONTENT_TYPES:
        fmt = CONTENT_TYPES[fmt]
    if fmt not in PARSERS:
        raise ValueError(f"no parser for format {fmt!r}")
    return PARSERS[fmt](text)
