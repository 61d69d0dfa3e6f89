"""Vectorized flatten must equal the per-row flatten (multiset of triples)."""

import pyarrow as pa

from gitprov_ray import synth
from gitprov_ray.stages import emit, triples as T, versions


def _norm(t: pa.Table):
    df = t.to_pandas().astype(str)
    return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))


def test_flatten_vec_parity_all_types():
    _, revisions, contributors = synth.gen_corpus(12, seed=42)
    agents = emit.agents_index(contributors.to_pylist())
    stateless = emit.emit_stateless_vec(revisions.combine_chunks(), agents)
    agent_stmts = emit.emit_agents_table(contributors.to_pylist())
    ver = versions.version_lag_group(
        revisions.select(versions.LAG_COLUMNS).to_pandas())
    from gitprov_ray.util import pandas_to_arrow
    from gitprov_ray import schemas

    stmts = pa.concat_tables([stateless, agent_stmts,
                              pandas_to_arrow(ver, schemas.STATEMENTS)])
    assert _norm(T.flatten_batch(stmts)) == _norm(T.flatten_batch_vec(stmts))
