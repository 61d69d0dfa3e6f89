"""Emitter unit tests against the single-threaded oracle (SURVEY.md §5.2-1).

Hand-built micro event streams → exact expected statements/triples, one per
§2.9 emitter row, quirks included.
"""

from datetime import datetime

from gitprov_ray import oracle, prov, idgen

G = "site.example"
T0 = datetime(2020, 1, 1, 0, 0, 0)
T1 = datetime(2020, 1, 2, 0, 0, 0)
T2 = datetime(2020, 1, 3, 0, 0, 0)

CONTRIB = [
    {"graph": G, "login": "alice", "agent_type": "User", "contributions": 5,
     "email": "a@x", "avatar_url": "https://img/a.png", "name": "Alice A"},
    {"graph": G, "login": "noname", "agent_type": "User", "contributions": 1,
     "email": None, "avatar_url": "https://img/n.png", "name": None},
]


def rev(**kw):
    base = {"graph": G, "page_key": "f.txt", "snapshot_id": "s0", "ts": T0,
            "author": "alice", "author_name": "Alice A", "label": "m0",
            "change_status": "added", "additions": 1, "changes": 2,
            "deletions": 3, "parents": [], "url": "https://site.example/p/0"}
    base.update(kw)
    return base


def types(stmts):
    return [s["stmt_type"] for s in stmts]


def test_added_emits_generation():
    stmts, _ = oracle.build_statements([rev()], CONTRIB)
    ids = {(s["stmt_type"], s["id"]) for s in stmts}
    assert ("activity", "commit-s0") in ids
    assert ("wasAssociatedWith", "association-s0") in ids
    assert ("entity", "file-f-txt_commit-s0") in ids
    assert ("base_entity", "file-f-txt") in ids
    assert ("wasGeneratedBy", "generation-file-f-txt-s0") in ids
    assert not any(t in types(stmts) for t in ("used", "wasDerivedFrom",
                                               "wasInvalidatedBy"))


def test_removed_emits_invalidation():
    stmts, _ = oracle.build_statements(
        [rev(), rev(snapshot_id="s1", ts=T1, change_status="removed")], CONTRIB)
    ids = {(s["stmt_type"], s["id"]) for s in stmts}
    assert ("wasInvalidatedBy", "invalidation-file-f-txt-s1") in ids


def test_modified_emits_generation_usage_derivation():
    stmts, _ = oracle.build_statements(
        [rev(), rev(snapshot_id="s1", ts=T1, change_status="modified")], CONTRIB)
    by_id = {s["id"]: s for s in stmts if s["id"]}
    assert "generation-file-f-txt-s1" in by_id
    u = by_id["usage-file-f-txt-s1-s0"]
    # usage object = PARENT's specialized entity (ProvenanceService.java:453)
    assert u["obj"] == "file-f-txt_commit-s0"
    d = by_id["derivation-file-f-txt_commit-s1-s0"]
    assert d["subj"] == "file-f-txt_commit-s1"
    assert d["obj"] == "file-f-txt_commit-s0"
    assert d["secondary"] == "commit-s1"
    # quirk 1: dangling citations without filename
    assert '"generation-s1"' in d["attrs"]
    assert '"usage-s1-s0"' in d["attrs"]


def test_parent_is_last_event_of_any_status():
    # added(s0) → removed(s1) → added(s2) → modified(s3): parent of s3 is s2,
    # and the chain includes the removed event (ST1 appends every status)
    stmts, _ = oracle.build_statements(
        [rev(),
         rev(snapshot_id="s1", ts=T1, change_status="removed"),
         rev(snapshot_id="s2", ts=T2, change_status="added"),
         rev(snapshot_id="s3", ts=datetime(2020, 1, 4), change_status="modified")],
        CONTRIB)
    ids = [s["id"] for s in stmts if s["stmt_type"] == "used"]
    assert ids == ["usage-file-f-txt-s3-s2"]


def test_quirk4_modified_without_prior_quarantined():
    stmts, metrics = oracle.build_statements(
        [rev(change_status="modified")], CONTRIB)
    assert metrics["quarantined_no_prior"] == 1
    assert "used" not in types(stmts)
    assert "wasDerivedFrom" not in types(stmts)
    assert "wasGeneratedBy" in types(stmts)  # generation still emitted


def test_st2_fallback_null_author():
    # null login, name doesn't match alice → falls through to the no-name
    # agent (matches by default, ProvenanceService.java:141-153)
    stmts, _ = oracle.build_statements(
        [rev(author=None, author_name="Somebody Else")], CONTRIB)
    assoc = [s for s in stmts if s["stmt_type"] == "wasAssociatedWith"][0]
    assert assoc["obj"] == "noname"


def test_st2_fallback_first_match_wins():
    stmts, _ = oracle.build_statements(
        [rev(author=None, author_name="Alice A")], CONTRIB)
    assoc = [s for s in stmts if s["stmt_type"] == "wasAssociatedWith"][0]
    assert assoc["obj"] == "alice"


def test_informed_by_parents_explode():
    stmts, _ = oracle.build_statements(
        [rev(snapshot_id="s2", parents=["s0", "s1"])], CONTRIB)
    ids = sorted(s["id"] for s in stmts if s["stmt_type"] == "wasInformedBy")
    assert ids == ["information-s0-s2", "information-s1-s2"]


def test_agents_emitted_even_with_zero_commits():
    stmts, _ = oracle.build_statements([rev()], CONTRIB)
    agents = [s for s in stmts if s["stmt_type"] == "agent"]
    assert {a["id"] for a in agents} == {"alice", "noname"}


def test_quirk2_agent_homepage_is_owner_url():
    stmts, _ = oracle.build_statements([rev()], CONTRIB)
    a = [s for s in stmts if s["stmt_type"] == "agent"][0]
    assert idgen.user_url(G) in a["attrs"]


def test_base_entity_dedup_by_label_first_touch():
    stmts, _ = oracle.build_statements(
        [rev(), rev(snapshot_id="s1", ts=T1, change_status="modified")], CONTRIB)
    bases = [s for s in stmts if s["stmt_type"] == "base_entity"]
    assert len(bases) == 1


def test_triples_flattening_shapes():
    tri, _ = oracle.build_triples([rev()], CONTRIB)
    preds = {t["pred"] for t in tri}
    assert prov.PREFIXES["prov"] + "wasGeneratedBy" in preds
    assert prov.PREFIXES["rdf"] + "type" in preds
    gp = idgen.graph_ns(G)
    subjects = {t["subj"] for t in tri}
    assert gp + "commit-s0" in subjects
    # timestamps pinned: ISO-8601, no timezone suffix
    times = [t for t in tri if t["obj_dtype"] == "xsd:dateTime"]
    assert times and all(t["obj"] == "2020-01-01T00:00:00" for t in times)
