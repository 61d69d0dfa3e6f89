"""Statements → RDF triples: flatten, bucketed exact dedup, in-partition sort.

Dedup design (SURVEY.md §2.5 generalized row): distinct on
(graph, subj, pred, obj) is an all-to-all exchange. Rows are bucketed by a
hash of the triple key and each bucket is deduplicated AND sorted in one
vectorized Arrow pass — a single shuffle yields the north rule's sorted
deduplicated partitions. A per-batch local pre-dedup runs inside the
flatten stage (partial/combiner pattern) so the shuffle moves fewer rows.

Hot-path discipline (measured, sf0.1×30 ≈ 9M triples):
  * bucket ids via vectorized ``pd.util.hash_pandas_object`` (a per-row
    Python sha1 loop cost ~25s of CPU here);
  * dedup+sort via Arrow C++ ``sort_by`` + adjacent-key compare — the
    pandas object-dtype equivalent cost 840 CPU-seconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import prov, schemas

_KEY_COLS = ["graph", "subj", "pred", "obj"]


def flatten_batch(batch: pa.Table) -> pa.Table:
    """STATEMENTS batch → TRIPLES batch with local pre-dedup (combiner).

    Columnar fast path: statements flatten straight into column lists via
    the same ``prov.flatten_into`` the oracle uses; local dedup is a set of
    key tuples (no pandas round-trip)."""
    cols: dict[str, list] = {n: [] for n in prov.TRIPLE_COL_NAMES}
    for s in batch.to_pylist():
        prov.flatten_into(s, cols)
    n = len(cols["subj"])
    if n == 0:
        return pa.Table.from_pylist([], schema=schemas.TRIPLES)
    seen: set = set()
    keep = []
    subj, pred, obj, graph = cols["subj"], cols["pred"], cols["obj"], cols["graph"]
    for i in range(n):
        k = (graph[i], subj[i], pred[i], obj[i])
        if k not in seen:
            seen.add(k)
            keep.append(i)
    if len(keep) != n:
        cols = {name: [vals[i] for i in keep] for name, vals in cols.items()}
    return pa.Table.from_pydict(
        {name: cols[name] for name in prov.TRIPLE_COL_NAMES},
        schema=schemas.TRIPLES)


def add_triple_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Vectorized stable bucket id per triple key (pandas siphash with the
    fixed default key — deterministic across worker processes)."""
    key = None
    for c in _KEY_COLS:
        s = batch.column(c).to_pandas().astype(str)
        key = s if key is None else key + "\x1f" + s
    h = pd.util.hash_pandas_object(key, index=False).to_numpy() % num_buckets
    return batch.append_column("bucket", pa.array(h.astype(np.int64),
                                                  type=pa.int64()))


def _dedup_sort_group(t: pa.Table) -> pa.Table:
    """One bucket → sorted + adjacent-deduped (all Arrow C++ kernels)."""
    if isinstance(t, pd.DataFrame):  # map_groups may hand pandas
        t = pa.Table.from_pandas(t, preserve_index=False).replace_schema_metadata(None)
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    t = t.sort_by([(c, "ascending") for c in _KEY_COLS])
    n = t.num_rows
    if n <= 1:
        return t
    keep = None
    for c in _KEY_COLS:
        col = t.column(c).combine_chunks()
        neq = pc.not_equal(col.slice(1, n - 1), col.slice(0, n - 1))
        keep = neq if keep is None else pc.or_(keep, neq)
    mask = pa.chunked_array([pa.array([True]), keep]).combine_chunks()
    return t.filter(mask)


def dedup_triples(triples_ds, num_buckets: int = 64):
    """Exact distinct on (graph, subj, pred, obj) via stable hash buckets
    (shuffle #4 of the physical plan). Each bucket is ALSO sorted by the
    triple key, so the output is sorted deduplicated partitions (the north
    rule's graph layout) in a single all-to-all — no separate global sort
    shuffle."""
    keyed = triples_ds.map_batches(
        lambda b: add_triple_bucket(b, num_buckets), batch_format="pyarrow"
    )
    return keyed.groupby("bucket").map_groups(
        _dedup_sort_group, batch_format="pyarrow",
    )


def sorted_triples(triples_ds):
    """Optional global total order (small outputs / text serialization)."""
    return triples_ds.sort(["graph", "subj", "pred", "obj"])


def statements_to_triples(statements_ds, num_buckets: int = 64, sort: bool = False):
    """statements → deduplicated triples in sorted partitions; pass
    ``sort=True`` to add a global total-order sort on top (extra shuffle —
    only worth it for small outputs)."""
    ds = statements_ds.map_batches(flatten_batch_vec, batch_format="pyarrow")
    ds = dedup_triples(ds, num_buckets=num_buckets)
    return sorted_triples(ds) if sort else ds


# ---------------------------------------------------------------------------
# vectorized flatten (same output as flatten_batch; tested multiset-equal)
# ---------------------------------------------------------------------------

_GP_PREFIX = "https://gitprov.example/graph/"


def _vec_frames(df: pd.DataFrame) -> list[pd.DataFrame]:
    """Per-stmt_type vectorized flattening into triple frames."""
    import json as _json
    from datetime import datetime as _dt

    from ..prov import _ATTR_PRED, _INFLUENCE, _NODE_CLASS, _TIME_PRED, expand

    out: list[pd.DataFrame] = []
    gp = _GP_PREFIX + df["graph"] + "#"

    def frame(subj, pred, obj, lit, dtype, graph):
        out.append(pd.DataFrame({
            "subj": subj, "pred": pred, "obj": obj,
            "obj_is_literal": lit, "obj_dtype": dtype, "graph": graph}))

    def emit_attr_rows(sub: pd.DataFrame, node: pd.Series, gseries: pd.Series):
        """Row-wise attr expansion (only rows whose attrs != '{}')."""
        mask = sub["attrs"].ne("{}") & sub["attrs"].notna()
        if not mask.any():
            return
        s = sub[mask]
        n = node[mask]
        g = gseries[mask]
        rows = {"subj": [], "pred": [], "obj": [], "obj_is_literal": [],
                "obj_dtype": [], "graph": []}
        cache: dict[str, dict] = {}
        for nd, attrs_json, gr in zip(n, s["attrs"], g):
            attrs = cache.get(attrs_json)
            if attrs is None:
                attrs = _json.loads(attrs_json)
                cache[attrs_json] = attrs
            gpre = _GP_PREFIX + gr + "#"
            for pred, (val, dtype) in sorted(attrs.items()):
                if dtype == "@uri":
                    rows["subj"].append(nd)
                    rows["pred"].append(expand(pred, gr))
                    rows["obj"].append(gpre + str(val))
                    rows["obj_is_literal"].append(False)
                    rows["obj_dtype"].append("")
                else:
                    rows["subj"].append(nd)
                    rows["pred"].append(expand(_ATTR_PRED.get(pred, pred), gr))
                    rows["obj"].append(str(val))
                    rows["obj_is_literal"].append(True)
                    rows["obj_dtype"].append(dtype)
                rows["graph"].append(gr)
        out.append(pd.DataFrame(rows))

    def iso_series(ts: pd.Series) -> pd.Series:
        return ts.map(lambda d: d.isoformat() if isinstance(d, _dt)
                      else pd.Timestamp(d).to_pydatetime().isoformat())

    for st, sub in df.groupby("stmt_type", sort=False):
        g = sub["graph"]
        sgp = _GP_PREFIX + g + "#"
        if st in _NODE_CLASS:
            node = sgp + sub["subj"]
            frame(node, expand("rdf:type", ""), expand(_NODE_CLASS[st], ""),
                  False, "", g)
            if st in _TIME_PRED:
                tmask = sub["t"].notna()
                if tmask.any():
                    frame(node[tmask], expand(_TIME_PRED[st], ""),
                          iso_series(sub["t"][tmask]), True, "xsd:dateTime",
                          g[tmask])
            emit_attr_rows(sub, node, g)
        elif st == "specializationOf":
            frame(sgp + sub["subj"], expand("prov:specializationOf", ""),
                  sgp + sub["obj"], False, "", g)
        elif st in _INFLUENCE:
            direct, qpred, qcls, opred = _INFLUENCE[st]
            subj = sgp + sub["subj"]
            obj = sgp + sub["obj"]
            node = sgp + sub["id"]
            if direct:
                frame(subj, expand(direct, ""), obj, False, "", g)
            frame(subj, expand(qpred, ""), node, False, "", g)
            frame(node, expand("rdf:type", ""), expand(qcls, ""), False, "", g)
            frame(node, expand(opred, ""), obj, False, "", g)
            smask = sub["secondary"].notna()
            if smask.any():
                frame(node[smask], expand("prov:hadActivity", ""),
                      sgp[smask] + sub["secondary"][smask], False, "", g[smask])
            tmask = sub["t"].notna()
            if tmask.any():
                frame(node[tmask], expand("prov:atTime", ""),
                      iso_series(sub["t"][tmask]), True, "xsd:dateTime",
                      g[tmask])
            emit_attr_rows(sub, node, g)
        else:  # pragma: no cover
            raise ValueError(f"unknown stmt_type {st!r}")
    return out


def flatten_batch_vec(batch: pa.Table) -> pa.Table:
    """Vectorized twin of flatten_batch (structural triples by column
    concat; attrs row-wise with a per-distinct-attrs-JSON parse cache),
    with the same local pre-dedup."""
    if batch.num_rows == 0:
        return pa.Table.from_pylist([], schema=schemas.TRIPLES)
    df = batch.to_pandas()
    frames = _vec_frames(df)
    tri = pd.concat(frames, ignore_index=True)
    tri = tri.drop_duplicates(["graph", "subj", "pred", "obj"])
    return pa.Table.from_pandas(tri, schema=schemas.TRIPLES,
                                preserve_index=False).replace_schema_metadata(None)


# ---------------------------------------------------------------------------
# compact-id dedup exchange (shuffle-byte reduction, same final output)
# ---------------------------------------------------------------------------
#
# The dedup all-to-all is the pipeline's dominant byte mover. Full triples
# carry ~90-byte gp-namespace URIs in subj (always), obj (usually) and a
# ~45-byte pred URI per row. The compact exchange ships:
#   graph, s_local (subj minus the graph namespace), pred_code (int8 into a
#   closed CURIE table), obj_kind (0=literal, 1=gp-local, 2=full URI),
#   o_val, obj_dtype
# and expands URIs inside the reduce-side bucket AFTER dedup — ≈60% fewer
# shuffle bytes, identical final rows. Subjects are always gp-namespaced in
# this engine (every minted node lives in its graph's namespace), which is
# the invariant that makes s_local total.
#
# Two further byte reductions on top (round 3, same final rows):
#   * obj_kind=3 — rdf:type objects come from a CLOSED class table
#     (prov:Entity/Activity/Agent + the six qualified-influence classes);
#     instead of a ~40-byte URI per type row, o_val carries a 1-byte code.
#   * the near-constant string columns (graph, obj_dtype) ship
#     DICTIONARY-encoded (int32 codes + a tiny dictionary per block), so
#     the ~40-byte graph URI becomes 4 bytes/row. High-cardinality
#     columns (s_local, o_val) deliberately stay plain: their per-block
#     dictionaries are nearly row-unique (no byte savings) and Ray's
#     sort-based shuffle re-unifies dictionaries per reduce chunk — a
#     measured 7× wall blowup (see _DICT_MODE below). The reduce side
#     decodes once per bucket.

_PRED_CURIES = [
    "rdf:type", "rdfs:label", "prov:type", "prov:role", "prov:label",
    "prov:startedAtTime", "prov:atTime", "prov:specializationOf",
    "prov:wasGeneratedBy", "prov:qualifiedGeneration",
    "prov:wasInvalidatedBy", "prov:qualifiedInvalidation",
    "prov:used", "prov:qualifiedUsage",
    "prov:wasInformedBy", "prov:qualifiedCommunication",
    "prov:wasAssociatedWith", "prov:qualifiedAssociation",
    "prov:wasDerivedFrom", "prov:qualifiedDerivation",
    "prov:activity", "prov:entity", "prov:agent", "prov:hadRole",
    "prov:hadActivity", "prov:hadGeneration", "prov:hadUsage",
    "foaf:homepage", "foaf:mbox", "foaf:img", "foaf:name",
    "gitprov:contributions", "gitprov:additions", "gitprov:changes",
    "gitprov:deletions",
]
_PRED_CODE = {c: i for i, c in enumerate(_PRED_CURIES)}
# full-URI form for the non-graph-dependent preds (gitprov:* need the graph)
_PRED_URI = {}
for _c in _PRED_CURIES:
    if not _c.startswith("gitprov:"):
        _PRED_URI[_PRED_CODE[_c]] = prov.expand(_c, "")
_PRED_LOCAL = {_PRED_CODE[c]: c.split(":", 1)[1]
               for c in _PRED_CURIES if c.startswith("gitprov:")}

_URI_TO_CODE = {u: c for c, u in _PRED_URI.items()}

# closed rdf:type object-class table (obj_kind=3 rows ship the code)
_CLASS_CURIES = [
    "prov:Entity", "prov:Activity", "prov:Agent", "prov:Generation",
    "prov:Invalidation", "prov:Usage", "prov:Communication",
    "prov:Association", "prov:Derivation",
]
_CLASS_URIS = [prov.expand(c, "") for c in _CLASS_CURIES]
_CLASS_URI_TO_CODE = {u: str(i) for i, u in enumerate(_CLASS_URIS)}
_CLASS_LUT = pa.array(_CLASS_URIS, pa.string())

# Which exchange columns ship dictionary-encoded: "low" (default — only
# the near-constant graph/obj_dtype), "all", or "none". Measured at
# sf0.1×10 / 3.0M triples / 32 CPUs (back-to-back, same session):
# low 41 s, none 75 s, all 277 s. Encoding the high-cardinality
# s_local/o_val is catastrophic: their per-block dictionaries are nearly
# row-unique (indices + full dictionary ≥ the plain column, so no byte
# savings) and Ray's sort-based groupby shuffle re-unifies dictionaries
# across every reduce-side chunk — the bucket shuffle alone ballooned to
# 102 s. graph/obj_dtype dictionaries are tiny (≤ #graphs / #dtypes), so
# unification is O(1) and the per-row win (~40-byte graph URI → 4-byte
# code) is real.
import os as _os

_DICT_MODE = _os.environ.get("GITPROV_COMPACT_DICT", "low")
_DICT_COLS = {
    "all": ("graph", "s_local", "o_val", "obj_dtype"),
    "low": ("graph", "obj_dtype"),
    "none": (),
}[_DICT_MODE]

COMPACT_SCHEMA = pa.schema([
    (n, pa.dictionary(pa.int32(), pa.string()) if n in _DICT_COLS else t)
    for n, t in [
        ("graph", pa.string()),
        ("s_local", pa.string()),
        ("pred_code", pa.int8()),
        ("obj_kind", pa.int8()),
        ("o_val", pa.string()),
        ("obj_dtype", pa.string()),
    ]
])

# string-typed twin used while building/deduping inside one task (Arrow
# group_by and join kernels want plain strings; encode only at the block
# boundary where bytes enter the shuffle)
_COMPACT_BUILD_SCHEMA = pa.schema([
    (f.name, pa.string() if pa.types.is_dictionary(f.type) else f.type)
    for f in COMPACT_SCHEMA
])


def _encode_compact(t: pa.Table) -> pa.Table:
    """string build columns → dictionary-encoded exchange columns."""
    for name in _DICT_COLS:
        i = t.schema.get_field_index(name)
        t = t.set_column(i, name,
                         pc.dictionary_encode(t.column(name).combine_chunks()))
    return t


def _decode_compact(t: pa.Table) -> pa.Table:
    """reduce-side: dictionary columns → plain strings (once per bucket)."""
    for name in _DICT_COLS:
        i = t.schema.get_field_index(name)
        col = t.column(name)
        if pa.types.is_dictionary(col.type):
            t = t.set_column(i, name, pc.cast(col, pa.string()))
    return t


def compact_from_triples(batch: pa.Table) -> pa.Table:
    """full TRIPLES rows → compact exchange rows (vectorized)."""
    df = batch.to_pandas()
    gp = _GP_PREFIX + df["graph"] + "#"
    # subjects are always gp-namespaced: strip the per-row prefix
    s_local = pd.Series([s[len(p):] for s, p in zip(df["subj"], gp)],
                        index=df.index)

    pred_code = df["pred"].map(_URI_TO_CODE)
    missing = pred_code.isna()
    if missing.any():
        # gitprov:* preds: URI = gp + local
        loc = pd.Series([s[len(p):] for s, p in
                         zip(df["pred"][missing], gp[missing])],
                        index=df.index[missing])
        pred_code.loc[missing] = loc.map(
            lambda l: _PRED_CODE["gitprov:" + l])
    pred_code = pred_code.astype("int8")

    is_lit = df["obj_is_literal"].to_numpy()
    obj = df["obj"]
    gp_arr = gp.to_numpy()
    o_val = obj.to_numpy(dtype=object).copy()
    kind = np.zeros(len(df), dtype=np.int8)
    for i, (lit, o, p) in enumerate(zip(is_lit, obj, gp_arr)):
        if lit:
            kind[i] = 0
        elif o.startswith(p):
            kind[i] = 1
            o_val[i] = o[len(p):]
        else:
            code = _CLASS_URI_TO_CODE.get(o)
            if code is not None:
                kind[i] = 3
                o_val[i] = code
            else:
                kind[i] = 2
    return _encode_compact(pa.table({
        "graph": pa.array(df["graph"]),
        "s_local": pa.array(s_local),
        "pred_code": pa.array(pred_code, type=pa.int8()),
        "obj_kind": pa.array(kind, type=pa.int8()),
        "o_val": pa.array(o_val, type=pa.string()),
        "obj_dtype": pa.array(df["obj_dtype"]),
    }))


_COMPACT_KEY = ["graph", "s_local", "pred_code", "obj_kind", "o_val"]


def _concat(*parts):
    """Element-wise string concat via the Arrow C++ kernel (the last
    argument of binary_join_element_wise is the separator)."""
    return pc.binary_join_element_wise(*parts, "")


def add_compact_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Stable bucket id per compact triple key. The join is an Arrow C++
    kernel; only ONE materialized string column goes through the (stable,
    fixed-key) pandas siphash — building per-column Python strings for the
    key concat was a measured memory-churn hot spot at high concurrency."""
    def _s(name):
        c = batch.column(name)
        return pc.cast(c, pa.string()) if pa.types.is_dictionary(c.type) else c
    joined = pc.binary_join_element_wise(
        _s("graph"), _s("s_local"), _s("o_val"),
        batch.column("pred_code").cast(pa.string()), "\x1f")
    arr = joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined
    h = pd.util.hash_array(arr.to_numpy(zero_copy_only=False)) % num_buckets
    return batch.append_column("bucket", pa.array(h.astype(np.int64),
                                                  type=pa.int64()))


# pred lookup tables for the Arrow expansion: full URI per code ('' for the
# graph-dependent gitprov codes) + local name per code ('' otherwise)
_PRED_URI_LUT = pa.array(
    [_PRED_URI.get(i, "") for i in range(len(_PRED_CURIES))], pa.string())
_PRED_LOCAL_LUT = pa.array(
    [_PRED_LOCAL.get(i, "") for i in range(len(_PRED_CURIES))], pa.string())
_PRED_IS_LOCAL = pa.array(
    [i in _PRED_LOCAL for i in range(len(_PRED_CURIES))], pa.bool_())


def expand_compact(t: pa.Table) -> pa.Table:
    """compact rows → full TRIPLES rows. Pure Arrow C++ kernels (join /
    take / if_else) — no pandas round trip, no Python string objects (the
    reduce-side expansion runs once per output triple; object churn here
    was the scaling bottleneck)."""
    t = _decode_compact(t)
    graph = t.column("graph")
    gp = _concat(pa.scalar(_GP_PREFIX), graph, pa.scalar("#"))
    subj = _concat(gp, t.column("s_local"))
    codes = t.column("pred_code")
    pred = pc.if_else(pc.take(_PRED_IS_LOCAL, codes),
                      _concat(gp, pc.take(_PRED_LOCAL_LUT, codes)),
                      pc.take(_PRED_URI_LUT, codes))
    kind = t.column("obj_kind")
    o_val = t.column("o_val")
    is3 = pc.equal(kind, 3)
    if pc.any(is3).as_py():
        cls_idx = pc.cast(pc.if_else(is3, o_val, "0"), pa.int8())
        o_val = pc.if_else(is3, pc.take(_CLASS_LUT, cls_idx), o_val)
    obj = pc.if_else(pc.equal(kind, 1), _concat(gp, o_val), o_val)
    return pa.table(
        {"subj": subj, "pred": pred, "obj": obj,
         "obj_is_literal": pc.equal(kind, 0),
         "obj_dtype": t.column("obj_dtype"), "graph": graph},
        schema=schemas.TRIPLES)


def _dedup_expand_sort_group(t: pa.Table) -> pa.Table:
    """One compact bucket → hash-distinct on the compact key (Arrow C++
    group_by, no sort) → expand URIs (Arrow kernels) → ONE in-partition
    sort on the full triple key (same partition content and order as the
    full-width exchange). The earlier shape sorted twice (compact for
    adjacency-dedup, then full) — half the sort work for the same rows."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False).replace_schema_metadata(None)
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    t = _decode_compact(t)
    if t.num_rows > 1:
        t = t.group_by(_COMPACT_KEY + ["obj_dtype"], use_threads=False) \
             .aggregate([])
    full = expand_compact(t)
    return full.sort_by([(c, "ascending") for c in _KEY_COLS])


def dedup_triples_compact(triples_ds, num_buckets: int = 64):
    """Compact-exchange variant of dedup_triples (same output rows)."""
    compact = triples_ds.map_batches(compact_from_triples,
                                     batch_format="pyarrow")
    keyed = compact.map_batches(
        lambda b: add_compact_bucket(b, num_buckets), batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(
        _dedup_expand_sort_group, batch_format="pyarrow")


_LABEL_PAT = r'^\{"prov:label": \["(?P<lab>.*)", "xsd:string"\]\}$'
_ACT_PAT = (r'^\{"foaf:homepage": \["(?P<url>.*)", "xsd:anyURI"\], '
            r'"prov:label": \["(?P<lab>.*)", "xsd:string"\]\}$')
_DERIV_PAT = (r'^\{"gitprov:additions": \[(?P<a>-?\d+), "xsd:int"\], '
              r'"gitprov:changes": \[(?P<c>-?\d+), "xsd:int"\], '
              r'"gitprov:deletions": \[(?P<d>-?\d+), "xsd:int"\], '
              r'"prov:hadGeneration": \["(?P<g>[^"\\\\]*)", "@uri"\], '
              r'"prov:hadUsage": \["(?P<u>[^"\\\\]*)", "@uri"\]\}$')
_ROLE_CONST = '{"prov:role": ["authorship", "xsd:string"]}'


def _json_unescape(arr: pa.Array) -> pa.Array:
    """Undo JSON string escaping on regex-captured values. Vector fast
    path: rows without a backslash are already exact; only rows containing
    one go through json.loads (rare — control chars / quotes in labels)."""
    import json as _json

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    has = pc.not_equal(pc.find_substring(arr, pattern="\\"), -1)
    if not pc.any(has).as_py():
        return arr
    vals = [(_json.loads('"%s"' % v) if "\\" in v else v)
            for v in arr.to_pylist()]
    return pa.array(vals, pa.string())


def _iso_arrow(ts) -> pa.Array:
    """Vectorized Python-isoformat-compatible rendering of timestamp[us]:
    no fractional part when microseconds are zero, 6 digits otherwise
    (byte-identical to datetime.isoformat(), pinned by the twin tests)."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    full = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%S")  # %S carries .ffffff
    us = pc.cast(ts, pa.int64())
    frac = pc.not_equal(pc.subtract(us, pc.multiply(
        pc.divide(us, 1_000_000), 1_000_000)), 0)
    return pc.if_else(frac, full, pc.utf8_slice_codeunits(full, 0, 19))


def flatten_batch_compact(batch: pa.Table) -> pa.Table:
    """STATEMENTS batch → COMPACT triple rows directly (statements already
    carry graph-local ids, so no URI is ever built pre-shuffle). Tested
    equal to flatten_batch after expand_compact.

    Structural rows are pure Arrow kernel work (filter / repeat / strftime
    / hash-distinct) — the statements' id/subj/obj columns pass through
    untouched; only the attrs JSON expansion iterates rows (with a
    per-distinct-attrs parse cache)."""
    import json as _json

    from ..prov import _ATTR_PRED, _INFLUENCE, _NODE_CLASS, _TIME_PRED

    if batch.num_rows == 0:
        return pa.Table.from_pylist([], schema=COMPACT_SCHEMA)
    parts: list[pa.Table] = []

    def tbl(graph, s_local, code, kind, o_val, dtype=""):
        n = len(graph)
        if n == 0:
            return
        parts.append(pa.table({
            "graph": graph,
            "s_local": s_local,
            "pred_code": pa.repeat(pa.scalar(code, pa.int8()), n),
            "obj_kind": pa.repeat(pa.scalar(kind, pa.int8()), n),
            "o_val": pa.repeat(pa.scalar(o_val), n)
                     if isinstance(o_val, str) else o_val,
            "obj_dtype": pa.repeat(pa.scalar(dtype), n),
        }, schema=_COMPACT_BUILD_SCHEMA))

    def attr_rows_loop(att: pa.Table, nd_arr):
        """Generic per-row attrs expansion (agents + any non-template rows)
        with a per-distinct-attrs parse cache."""
        rows = {"graph": [], "s_local": [], "pred_code": [], "obj_kind": [],
                "o_val": [], "obj_dtype": []}
        cache: dict[str, list] = {}
        for nd, attrs_json, gr in zip(nd_arr.to_pylist(),
                                      att.column("attrs").to_pylist(),
                                      att.column("graph").to_pylist()):
            items = cache.get(attrs_json)
            if items is None:
                attrs = _json.loads(attrs_json)
                items = []
                for pred, (val, dtype) in sorted(attrs.items()):
                    if dtype == "@uri":
                        items.append((_PRED_CODE[pred], 1, str(val), ""))
                    else:
                        items.append((_PRED_CODE[_ATTR_PRED.get(pred, pred)],
                                      0, str(val), dtype))
                cache[attrs_json] = items
            for code, kind, val, dtype in items:
                rows["graph"].append(gr)
                rows["s_local"].append(nd)
                rows["pred_code"].append(code)
                rows["obj_kind"].append(kind)
                rows["o_val"].append(val)
                rows["obj_dtype"].append(dtype)
        parts.append(pa.table({
            "graph": pa.array(rows["graph"], pa.string()),
            "s_local": pa.array(rows["s_local"], pa.string()),
            "pred_code": pa.array(rows["pred_code"], pa.int8()),
            "obj_kind": pa.array(rows["obj_kind"], pa.int8()),
            "o_val": pa.array(rows["o_val"], pa.string()),
            "obj_dtype": pa.array(rows["obj_dtype"], pa.string()),
        }, schema=_COMPACT_BUILD_SCHEMA))

    def emit_attr_rows(sub: pa.Table, node, st: str = ""):
        """Attrs expansion: vectorized fast paths for the fixed-template
        statement kinds (regex field extraction via pc.extract_regex — the
        per-row loop was 68% of flatten CPU), generic loop otherwise."""
        mask = pc.and_(pc.not_equal(sub.column("attrs"), "{}"),
                       pc.is_valid(sub.column("attrs")))
        if not pc.any(mask).as_py():
            return
        att = sub.filter(mask)
        nd_arr = node.filter(mask)
        attrs_col = att.column("attrs").combine_chunks()

        if st in ("entity", "base_entity"):
            ex = pc.extract_regex(attrs_col, pattern=_LABEL_PAT)
            hit = pc.is_valid(ex)
            if pc.all(hit).as_py():
                tbl(att.column("graph"), nd_arr,
                    _PRED_CODE["rdfs:label"], 0,
                    _json_unescape(pc.struct_field(ex, "lab")), "xsd:string")
                return
        elif st == "activity":
            ex = pc.extract_regex(attrs_col, pattern=_ACT_PAT)
            hit = pc.is_valid(ex)
            if pc.all(hit).as_py():
                g = att.column("graph")
                tbl(g, nd_arr, _PRED_CODE["foaf:homepage"], 0,
                    _json_unescape(pc.struct_field(ex, "url")), "xsd:anyURI")
                tbl(g, nd_arr, _PRED_CODE["rdfs:label"], 0,
                    _json_unescape(pc.struct_field(ex, "lab")), "xsd:string")
                return
        elif st == "wasAssociatedWith":
            if pc.all(pc.equal(attrs_col, _ROLE_CONST)).as_py():
                tbl(att.column("graph"), nd_arr, _PRED_CODE["prov:role"], 0,
                    "authorship", "xsd:string")
                return
        elif st == "wasDerivedFrom":
            ex = pc.extract_regex(attrs_col, pattern=_DERIV_PAT)
            hit = pc.is_valid(ex)
            if pc.all(hit).as_py():
                g = att.column("graph")
                # json-sorted key order: additions, changes, deletions,
                # hadGeneration, hadUsage (ids are hex/ints: no escapes)
                tbl(g, nd_arr, _PRED_CODE["gitprov:additions"], 0,
                    pc.struct_field(ex, "a"), "xsd:int")
                tbl(g, nd_arr, _PRED_CODE["gitprov:changes"], 0,
                    pc.struct_field(ex, "c"), "xsd:int")
                tbl(g, nd_arr, _PRED_CODE["gitprov:deletions"], 0,
                    pc.struct_field(ex, "d"), "xsd:int")
                tbl(g, nd_arr, _PRED_CODE["prov:hadGeneration"], 1,
                    pc.struct_field(ex, "g"), "")
                tbl(g, nd_arr, _PRED_CODE["prov:hadUsage"], 1,
                    pc.struct_field(ex, "u"), "")
                return
        attr_rows_loop(att, nd_arr)

    TYPE = _PRED_CODE["rdf:type"]
    stypes = pc.unique(batch.column("stmt_type")).to_pylist()
    for st in stypes:
        sub = batch.filter(pc.equal(batch.column("stmt_type"), st))
        g = sub.column("graph")
        if st in _NODE_CLASS:
            node = sub.column("subj")
            tbl(g, node, TYPE, 3,
                _CLASS_URI_TO_CODE[prov.expand(_NODE_CLASS[st], "")])
            if st in _TIME_PRED:
                tsub = sub.filter(pc.is_valid(sub.column("t")))
                if tsub.num_rows:
                    tbl(tsub.column("graph"), tsub.column("subj"),
                        _PRED_CODE[_TIME_PRED[st]], 0,
                        _iso_arrow(tsub.column("t")), "xsd:dateTime")
            emit_attr_rows(sub, node, st)
        elif st == "specializationOf":
            tbl(g, sub.column("subj"), _PRED_CODE["prov:specializationOf"],
                1, sub.column("obj"))
        elif st in _INFLUENCE:
            direct, qpred, qcls, opred = _INFLUENCE[st]
            subj, obj, node = (sub.column("subj"), sub.column("obj"),
                               sub.column("id"))
            if direct:
                tbl(g, subj, _PRED_CODE[direct], 1, obj)
            tbl(g, subj, _PRED_CODE[qpred], 1, node)
            tbl(g, node, TYPE, 3,
                _CLASS_URI_TO_CODE[prov.expand(qcls, "")])
            tbl(g, node, _PRED_CODE[opred], 1, obj)
            ssub = sub.filter(pc.is_valid(sub.column("secondary")))
            if ssub.num_rows:
                tbl(ssub.column("graph"), ssub.column("id"),
                    _PRED_CODE["prov:hadActivity"], 1,
                    ssub.column("secondary"))
            tsub = sub.filter(pc.is_valid(sub.column("t")))
            if tsub.num_rows:
                tbl(tsub.column("graph"), tsub.column("id"),
                    _PRED_CODE["prov:atTime"], 0,
                    _iso_arrow(tsub.column("t")), "xsd:dateTime")
            emit_attr_rows(sub, node, st)
        else:  # pragma: no cover
            raise ValueError(f"unknown stmt_type {st!r}")

    tri = pa.concat_tables(parts)
    # local pre-dedup (combiner): Arrow hash-distinct, no sort
    if tri.num_rows > 1:
        tri = tri.group_by(_COMPACT_KEY + ["obj_dtype"], use_threads=False) \
                 .aggregate([])
        tri = tri.select(_COMPACT_BUILD_SCHEMA.names).cast(_COMPACT_BUILD_SCHEMA)
    return _encode_compact(tri)


def statements_to_triples_compact(statements_ds, num_buckets: int = 64,
                                  sort: bool = False):
    """statements → compact exchange → dedup → expanded sorted partitions.
    Same final rows as statements_to_triples with ~60% fewer shuffle bytes."""
    compact = statements_ds.map_batches(flatten_batch_compact,
                                        batch_format="pyarrow")
    keyed = compact.map_batches(
        lambda b: add_compact_bucket(b, num_buckets), batch_format="pyarrow")
    ds = keyed.groupby("bucket").map_groups(
        _dedup_expand_sort_group, batch_format="pyarrow")
    return sorted_triples(ds) if sort else ds
