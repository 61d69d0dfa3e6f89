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
    ds = statements_ds.map_batches(flatten_batch, batch_format="pyarrow")
    ds = dedup_triples(ds, num_buckets=num_buckets)
    return sorted_triples(ds) if sort else ds
