"""End-to-end golden parity: Ray pipeline vs single-threaded oracle
(SURVEY.md §5.2-2/4): P/R must be 1.0 on the tiny corpus, and the result
must be invariant to input row order."""

import pandas as pd
import pytest


def _engine_triples(pages_table, contributors, num_buckets=8):
    import ray.data as rd
    from gitprov_ray.pipelines import flagship

    ds = flagship.triples_from_pages(
        rd.from_arrow(pages_table), contributors.to_pylist(),
        num_buckets=num_buckets)
    return ds.to_pandas()


def _keys(df: pd.DataFrame):
    return set(zip(df.graph, df.subj, df.pred, df.obj))


def _golden_keys(revisions, contributors):
    from gitprov_ray import oracle

    golden, _ = oracle.build_triples(revisions.to_pylist(),
                                     contributors.to_pylist())
    return {(t["graph"], t["subj"], t["pred"], t["obj"]) for t in golden}


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_exactly(tiny_corpus):
    pages, revisions, contributors = tiny_corpus
    engine = _engine_triples(pages, contributors)
    ek, gk = _keys(engine), _golden_keys(revisions, contributors)
    assert ek == gk  # P = R = 1.0
    # engine output itself is exactly deduplicated
    assert len(engine) == len(ek)


@pytest.mark.usefixtures("ray_session")
def test_order_insensitivity(tiny_corpus):
    """Shuffled input blocks ⇒ identical triple set (SURVEY.md §5.2-4)."""
    import pyarrow as pa

    pages, revisions, contributors = tiny_corpus
    idx = list(range(pages.num_rows))[::-1]
    shuffled = pages.take(pa.array(idx))
    a = _engine_triples(pages, contributors, num_buckets=4)
    b = _engine_triples(shuffled, contributors, num_buckets=8)
    assert _keys(a) == _keys(b)


@pytest.mark.usefixtures("ray_session")
def test_sorted_deterministic_output(tiny_corpus):
    """With sort=True the output is globally totally ordered; the default
    (partition-sorted) output is covered by test_engine_matches_oracle."""
    import ray.data as rd
    from gitprov_ray.pipelines import flagship

    pages, _, contributors = tiny_corpus
    ds = flagship.triples_from_pages(rd.from_arrow(pages),
                                     contributors.to_pylist(),
                                     num_buckets=8, sort=True)
    df = ds.to_pandas()
    key = df[["graph", "subj", "pred", "obj"]].apply(tuple, axis=1)
    assert list(key) == sorted(key)


@pytest.mark.usefixtures("ray_session")
def test_text_extraction_through_pipeline_matches_direct(tiny_corpus):
    """Per-row invariant: pipeline-extracted text == direct extraction, byte
    for byte (input_hint)."""
    import ray.data as rd
    from gitprov_ray import extract
    from gitprov_ray.stages.pages import extract_text_batch

    pages, _, _ = tiny_corpus
    out = (rd.from_arrow(pages)
           .map_batches(extract_text_batch, batch_format="pyarrow")
           .to_pandas())
    direct = {(r["url"], r["warc_ts"]): extract.extract_text(r["html"])
              for r in pages.to_pylist()}
    for _, row in out.iterrows():
        assert row["text"] == direct[(row["url"], row["warc_ts"].to_pydatetime())]


def test_flagship_from_pages_parquet(tiny_corpus, ray_session, tmp_path):
    """The real-crawl entry point (pages parquet of the input_hint shape)
    must equal the in-memory pages path."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from gitprov_ray.pipelines import flagship

    pages, _, contributors = tiny_corpus
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    a = flagship.flagship_from_pages_parquet(
        p, contributors.to_pylist(), num_buckets=4).to_pandas()
    b = flagship.triples_from_pages(
        rd.from_arrow(pages), contributors.to_pylist(),
        num_buckets=4).to_pandas()
    ka = set(zip(a.graph, a.subj, a.pred, a.obj))
    kb = set(zip(b.graph, b.subj, b.pred, b.obj))
    assert ka == kb and len(a) == len(b)


def test_triples_order_insensitive_to_input_permutation(ray_session):
    """SURVEY §5.2 property 4: shuffled input rows ⇒ identical triple set
    (the engine's shuffles must not leak input order into the output)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gitprov_ray import schemas, synth
    from gitprov_ray.pipelines import flagship

    _, revisions, contributors = synth.gen_corpus(10, seed=99)
    rows = revisions.to_pylist()
    rng = np.random.RandomState(5)
    perm = [rows[i] for i in rng.permutation(len(rows))]
    mk = lambda rs: flagship.triples_from_revisions(
        rd.from_arrow(pa.Table.from_pylist(rs, schema=schemas.REVISIONS)),
        contributors.to_pylist(), num_buckets=4, checkpoint=False).to_pandas()
    a, b = mk(rows), mk(perm)
    key = ["graph", "subj", "pred", "obj"]
    assert set(map(tuple, a[key].itertuples(index=False))) == \
        set(map(tuple, b[key].itertuples(index=False)))
    assert len(a) == len(b)
