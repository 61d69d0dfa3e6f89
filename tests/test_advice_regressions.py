"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. the same snapshot_id in two graphs within one batch (forks sharing
   commit shas) must emit BOTH graphs' commit-level statements;
2. a page listing the same resource twice with conflicting statuses keeps
   only the first event's status statements (oracle seen_files semantics),
   deterministically, regardless of shuffle order;
3. the vectorized emit twin renders non-ASCII attrs byte-identically to the
   row twin (ensure_ascii divergence);
4. a self-closing drop tag (<script src="x"/>) must not swallow the rest of
   the page's text;
5. the checkpoint fingerprint detects a same-size middle-of-file edit.
"""

import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import oracle, schemas
from gitprov_ray.stages import emit, versions

T0 = pd.Timestamp("2020-01-01 00:00:00")

CONTRIB = [{"graph": g, "login": "user0", "agent_type": "User",
            "contributions": 3, "email": None,
            "avatar_url": "https://img.example/user0.png", "name": "User Zero"}
           for g in ("a.example", "b.example", "münchen.example")]


def _rev(graph="a.example", page_key="f.txt", snapshot_id="s0", ts=T0,
         status="added", event_seq=0, additions=1, changes=2, deletions=3,
         parents=()):
    return {"graph": graph, "page_key": page_key, "snapshot_id": snapshot_id,
            "ts": ts.to_pydatetime(), "author": "user0",
            "author_name": "User Zero", "label": "msg", "change_status": status,
            "event_seq": event_seq, "additions": additions, "changes": changes,
            "deletions": deletions, "parents": list(parents), "url": f"https://{graph}/p"}


def _graph_contrib(rows):
    graphs = {r["graph"] for r in rows}
    return [c for c in CONTRIB if c["graph"] in graphs]


def _engine_triples_from_rows(rows, contributors):
    import ray.data as rd

    from gitprov_ray.pipelines import flagship

    revs = rd.from_arrow(pa.Table.from_pylist(rows, schema=schemas.REVISIONS))
    tri = flagship.triples_from_revisions(revs, contributors, num_buckets=4,
                                          checkpoint=False)
    df = tri.to_pandas()
    return set(zip(df["graph"], df["subj"], df["pred"], df["obj"]))


def _oracle_triples(rows, contributors):
    gold, _ = oracle.build_triples(rows, contributors)
    return {(t["graph"], t["subj"], t["pred"], t["obj"]) for t in gold}


@pytest.mark.usefixtures("ray_session")
def test_same_sha_two_graphs_emits_both():
    rows = [_rev(graph="a.example", snapshot_id="shared"),
            _rev(graph="b.example", snapshot_id="shared")]
    contrib = _graph_contrib(rows)
    eng = _engine_triples_from_rows(rows, contrib)
    assert eng == _oracle_triples(rows, contrib)
    # both graphs carry their own activity node
    acts = {t for t in eng if t[1].endswith("#commit-shared")
            and t[2].endswith("#type") and t[3].endswith("Activity")}
    assert len(acts) == 2


@pytest.mark.usefixtures("ray_session")
def test_duplicate_resource_conflicting_status_first_wins():
    # same page lists f.txt twice: added (seq 0) then removed (seq 1).
    # oracle keeps the first → wasGeneratedBy only, no wasInvalidatedBy.
    rows = [_rev(status="added", event_seq=0),
            _rev(status="removed", event_seq=1)]
    contrib = _graph_contrib(rows)
    gold = _oracle_triples(rows, contrib)
    eng = _engine_triples_from_rows(rows, contrib)
    assert eng == gold
    assert any("wasGeneratedBy" in t[2] for t in eng)
    assert not any("wasInvalidatedBy" in t[2] for t in eng)

    # reversed input order: event_seq still decides (shuffle determinism)
    eng_rev = _engine_triples_from_rows(list(reversed(rows)), contrib)
    assert eng_rev == gold


def test_duplicate_event_conflicting_counters_deterministic():
    # two 'modified' duplicates with different additions: derivation attrs
    # must come from the lower event_seq row, whatever the input order
    base = [_rev(status="added", snapshot_id="s0", ts=T0),
            _rev(status="modified", snapshot_id="s1",
                 ts=T0 + pd.Timedelta("1h"), event_seq=0, additions=10),
            _rev(status="modified", snapshot_id="s1",
                 ts=T0 + pd.Timedelta("1h"), event_seq=1, additions=99)]
    out_fwd = versions.version_lag_group(
        pd.DataFrame(base)[versions.LAG_COLUMNS])
    out_rev = versions.version_lag_group(
        pd.DataFrame(list(reversed(base)))[versions.LAG_COLUMNS])
    d_fwd = out_fwd[out_fwd["stmt_type"] == "wasDerivedFrom"]["attrs"].tolist()
    d_rev = out_rev[out_rev["stmt_type"] == "wasDerivedFrom"]["attrs"].tolist()
    assert d_fwd == d_rev
    assert len(d_fwd) == 1 and '"gitprov:additions": [10' in d_fwd[0]


def test_emit_vec_non_ascii_graph_byte_identical():
    rows = [_rev(graph="münchen.example")]
    batch = pa.Table.from_pylist(rows, schema=schemas.REVISIONS)
    agents = emit.agents_index(CONTRIB)
    ref = emit.EmitStateless(agents)(batch).to_pandas()
    vec = emit.emit_stateless_vec(batch, agents).to_pandas()
    cols = sorted(ref.columns)
    a = sorted(map(tuple, ref[cols].astype(str).itertuples(index=False)))
    b = sorted(map(tuple, vec[cols].astype(str).itertuples(index=False)))
    assert a == b
    act = ref[ref["stmt_type"] == "activity"]["attrs"].iloc[0]
    assert "münchen" in act and "\\u" not in act


def test_self_closing_drop_tag_keeps_following_text():
    from gitprov_ray.extract import extract_text

    html = '<html><body><p>before</p><script src="x"/><p>after</p></body></html>'
    txt = extract_text(html)
    assert "before" in txt and "after" in txt


def test_fingerprint_detects_middle_edit(tmp_path):
    from gitprov_ray import checkpoint

    p = tmp_path / "documents.parquet"
    blob = bytearray(b"x" * 300_000)
    p.write_bytes(blob)
    fp1 = checkpoint._fingerprint(str(tmp_path), repeat=1)
    blob[150_000] = ord("y")          # same size, middle edit
    p.write_bytes(blob)
    fp2 = checkpoint._fingerprint(str(tmp_path), repeat=1)
    assert fp1 != fp2


def test_json_quote_series_null_matches_row_twin():
    """Round-2 review finding: null labels must render as json.dumps(None)
    ('null'), and mixed null/special batches must not crash the mask."""
    import json

    from gitprov_ray.stages.emit import _json_quote_series

    s = pd.Series(["plain", None, 'has "quote"', None], dtype=object)
    got = _json_quote_series(s)
    exp = s.map(lambda v: json.dumps(v, ensure_ascii=False))
    assert list(got) == list(exp)


@pytest.mark.usefixtures("ray_session")
def test_neardup_clusters_preserves_large_int_ids():
    """Round-2 review finding: ids above 2^53 must survive the left-outer
    label join without a float64 round trip."""
    import ray.data as rd

    from gitprov_ray import linking

    big = 2**53 + 1
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series([big, big + 2, 7], dtype="int64"),
        "text": ["the quick brown fox jumps over the lazy dog again",
                 "the quick brown fox jumps over the lazy dog again",
                 "completely different text with other words entirely here"],
    }))
    cl = linking.neardup_clusters(docs, threshold=0.5).to_pandas()
    got = dict(zip(cl["doc_id"], cl["cluster_id"]))
    assert set(got) == {big, big + 2, 7}          # ids intact bit-for-bit
    assert got[big] == big and got[big + 2] == big
    assert got[7] == 7
    assert cl["cluster_id"].dtype == "int64"


def test_sparql_prefix_names_with_digits():
    """Round-2 review finding: legal SPARQL prefixes like ns1: must parse
    (the engine's own serializers emit g0/ns0 prefixes)."""
    from gitprov_ray import sparql_lite

    plan = sparql_lite.parse_select(
        "PREFIX ns1: <http://x.example/> "
        "SELECT ?a WHERE { ?a ns1:p ?b . }")
    assert plan["patterns"] == [("?a", "http://x.example/p", "?b")]
