"""SPARQL-lite: basic-graph-pattern queries over the triples table.

Engine equivalent of the reference's SPARQL endpoint (SparqlService.java:
16-31, J5): a BGP is a list of (s, p, o) patterns where each term is either
a bound value or a ``?var``. Compilation:

  * each pattern → a vectorized Arrow filter over the triples Dataset
    (bound terms push down; literals match on obj with obj_is_literal);
  * shared variables across patterns → successive hash joins on the
    variable columns (pandas merges over the per-pattern results — fine
    while per-pattern selections are small; the scale path is a bucketed
    Dataset join keyed on the shared variable, same machinery as the
    engine's other shuffles);
  * SELECT projection, DISTINCT, ORDER BY, LIMIT on the final frame;
  * result formatting via serializers.result_{csv,tsv,json} (S14).

Terms may use CURIEs (prov:used, rdf:type, gitprov:x with an explicit
graph) — expanded via prov.expand.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc

from . import prov


def _is_var(t) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _expand_term(t: str, graph: str | None) -> str:
    if ":" in t and not t.startswith(("http://", "https://")):
        pfx = t.split(":", 1)[0]
        if pfx in prov.PREFIXES or (pfx == "gitprov" and graph):
            return prov.expand(t, graph or "")
    return t


def _match_pattern(triples_ds, s, p, o, graph):
    def f(t):
        m = None

        def conj(cond):
            nonlocal m
            m = cond if m is None else pc.and_(m, cond)

        if graph is not None:
            conj(pc.equal(t["graph"], graph))
        if not _is_var(s):
            conj(pc.equal(t["subj"], _expand_term(s, graph)))
        if not _is_var(p):
            conj(pc.equal(t["pred"], _expand_term(p, graph)))
        if not _is_var(o):
            conj(pc.equal(t["obj"], _expand_term(o, graph)))
        return t if m is None else t.filter(m)

    return triples_ds.map_batches(f, batch_format="pyarrow").to_pandas()


def select(triples_ds, patterns: list[tuple], variables: list[str] | None = None,
           graph: str | None = None, distinct: bool = False,
           order_by: list[str] | None = None, limit: int | None = None
           ) -> pd.DataFrame:
    """Run a BGP over a triples Dataset → binding table (one column per
    ``?var`` without the '?')."""
    result: pd.DataFrame | None = None
    for s, p, o in patterns:
        part = _match_pattern(triples_ds, s, p, o, graph)
        cols = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                cols[term[1:]] = part[col].to_numpy()
        frame = pd.DataFrame(cols) if cols else pd.DataFrame(index=range(len(part)))
        if result is None:
            result = frame
        else:
            shared = [c for c in result.columns if c in frame.columns]
            if shared:
                result = result.merge(frame, on=shared, how="inner")
            else:
                result = result.merge(frame, how="cross")
    if result is None:
        result = pd.DataFrame()
    if variables:
        result = result[[v.lstrip("?") for v in variables]]
    if distinct:
        result = result.drop_duplicates()
    if order_by:
        result = result.sort_values([v.lstrip("?") for v in order_by])
    if limit is not None:
        result = result.head(limit)
    return result.reset_index(drop=True)


def ask(triples_ds, patterns, graph=None) -> bool:
    return len(select(triples_ds, patterns, graph=graph, limit=1)) > 0
