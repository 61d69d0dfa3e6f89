"""Vectorized emitter must equal the row-at-a-time reference emitter
byte-for-byte (as a statement multiset), incl. edge-case filenames."""

import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import schemas
from gitprov_ray.stages import emit


def _batch_from(revisions: pa.Table) -> pa.Table:
    return revisions


def _norm(t: pa.Table) -> list[tuple]:
    df = t.to_pandas().astype(str)
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


@pytest.mark.parametrize("n_urls", [6, 12])
def test_emit_vec_parity(n_urls, tiny_corpus):
    from gitprov_ray import synth

    _, revisions, contributors = synth.gen_corpus(n_urls, seed=7 + n_urls)
    agents = emit.agents_index(contributors.to_pylist())
    batch = revisions.combine_chunks()
    ref = emit.EmitStateless(agents)(batch)
    vec = emit.emit_stateless_vec(batch, agents)
    assert _norm(ref) == _norm(vec)


def test_emit_vec_parity_docs_derived():
    import pyarrow.parquet as pq
    from gitprov_ray import synth
    from gitprov_ray.pipelines import flagship

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pylist()
    rows = []
    for d in docs[:200]:
        rows.extend(synth.revisions_rows_from_doc_row(
            d["doc_id"], d["text"] or "", d["lang"], d["source"]))
    batch = pa.Table.from_pylist(rows, schema=schemas.REVISIONS)
    agents = emit.agents_index(flagship.contributors_for_sf("/root/testdata/sf0.001"))
    ref = emit.EmitStateless(agents)(batch)
    vec = emit.emit_stateless_vec(batch, agents)
    assert _norm(ref) == _norm(vec)
