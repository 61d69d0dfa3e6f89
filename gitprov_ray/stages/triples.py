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
    """STATEMENTS batch → TRIPLES batch with local pre-dedup."""
    stmts = batch.to_pylist()
    rows: list[dict] = []
    for s in stmts:
        rows.extend(prov.statement_to_triples(s))
    if not rows:
        return pa.Table.from_pylist([], schema=schemas.TRIPLES)
    df = pd.DataFrame.from_records(rows).drop_duplicates(_KEY_COLS)
    return pa.Table.from_pandas(df, schema=schemas.TRIPLES, preserve_index=False)


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


def dedup_triples(triples_ds, num_buckets: int = 64):
    """Exact distinct on (graph, subj, pred, obj) via stable hash buckets
    (shuffle #4 of the physical plan)."""
    keyed = triples_ds.map_batches(
        lambda b: add_triple_bucket(b, num_buckets), batch_format="pyarrow"
    )
    deduped = keyed.groupby("bucket").map_groups(
        lambda df: df.drop_duplicates(_KEY_COLS).drop(columns=["bucket"]),
        batch_format="pandas",
    )
    from ..util import pandas_to_arrow

    return deduped.map_batches(
        lambda df: pandas_to_arrow(df, schemas.TRIPLES),
        batch_format="pandas",
    )


def sorted_triples(triples_ds):
    """Deterministic final order (north rule: sorted deduped partitions)."""
    return triples_ds.sort(["graph", "subj", "pred", "obj"])


def statements_to_triples(statements_ds, num_buckets: int = 64, sort: bool = True):
    ds = statements_ds.map_batches(flatten_batch, batch_format="pyarrow")
    ds = dedup_triples(ds, num_buckets=num_buckets)
    return sorted_triples(ds) if sort else ds
