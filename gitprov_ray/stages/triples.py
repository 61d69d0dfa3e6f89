"""Statements → RDF triples: flatten, bucketed exact dedup, global sort.

Dedup design (SURVEY.md §2.5 generalized row): distinct on
(graph, subj, pred, obj) is an all-to-all exchange. Rather than one
map_groups group per triple (per-group call overhead), rows are bucketed by
a stable hash of the triple key and each bucket is deduped with ONE
vectorized ``drop_duplicates`` — a two-phase exchange whose group count is
``num_buckets``, independent of triple cardinality. A per-batch local
pre-dedup runs inside the flatten stage (partial/combiner pattern) so the
shuffle moves fewer rows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

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


def _bucket_of(df: pd.DataFrame, num_buckets: int) -> np.ndarray:
    joined = (df["graph"] + "\x1f" + df["subj"] + "\x1f" + df["pred"]
              + "\x1f" + df["obj"]).to_numpy(dtype=object)
    out = np.empty(len(joined), dtype=np.int64)
    for i, s in enumerate(joined):
        out[i] = int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") % num_buckets
    return out


def add_triple_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    df = batch.select(_KEY_COLS).to_pandas()
    return batch.append_column("bucket", pa.array(_bucket_of(df, num_buckets),
                                                  type=pa.int64()))


def _dedup_sort_group(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(_KEY_COLS, kind="mergesort")
            .drop_duplicates(_KEY_COLS)
            .drop(columns=["bucket"]))


def dedup_triples(triples_ds, num_buckets: int = 64):
    """Exact distinct on (graph, subj, pred, obj) via stable hash buckets
    (shuffle #4 of the physical plan). Each bucket is ALSO sorted by the
    triple key, so the output is sorted deduplicated partitions (the north
    rule's graph layout) in a single all-to-all — no separate global sort
    shuffle. Bucket ids are content-stable, so reruns produce identical
    partitions (resume-safe)."""
    keyed = triples_ds.map_batches(
        lambda b: add_triple_bucket(b, num_buckets), batch_format="pyarrow"
    )
    deduped = keyed.groupby("bucket").map_groups(
        _dedup_sort_group, batch_format="pandas",
    )
    from ..util import pandas_to_arrow

    return deduped.map_batches(
        lambda df: pandas_to_arrow(df, schemas.TRIPLES),
        batch_format="pandas",
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
