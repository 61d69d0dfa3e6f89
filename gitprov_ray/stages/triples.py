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
        t = pa.Table.from_pandas(t, preserve_index=False)
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

    from ..prov import PREFIXES, _ATTR_PRED, _INFLUENCE, _NODE_CLASS, _TIME_PRED, expand

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
                                preserve_index=False)
