"""Agent canonicalization: linking + distributed rewrite."""

import pandas as pd
import pytest


def test_canonical_map_links_near_duplicates(ray_session):
    import ray.data as rd
    from gitprov_ray import linking
    from gitprov_ray.prov import PREFIXES

    rdf_type = PREFIXES["rdf"] + "type"
    agent = PREFIXES["prov"] + "Agent"
    ns = "https://gitprov.example/graph/g#"
    rows = [
        {"subj": ns + "jonathan-smith", "pred": rdf_type, "obj": agent,
         "obj_is_literal": False, "obj_dtype": "", "graph": "g"},
        {"subj": ns + "jonathan-smith1", "pred": rdf_type, "obj": agent,
         "obj_is_literal": False, "obj_dtype": "", "graph": "g"},
        {"subj": ns + "completely-different", "pred": rdf_type, "obj": agent,
         "obj_is_literal": False, "obj_dtype": "", "graph": "g"},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    m = linking.canonical_agent_map(ds, threshold=0.5)
    assert m.get(ns + "jonathan-smith1") == ns + "jonathan-smith"
    assert ns + "completely-different" not in m


def test_rewrite_canonical_rewrites_subj_and_obj(ray_session):
    import ray.data as rd
    from gitprov_ray import linking

    rows = [
        {"subj": "A", "pred": "p", "obj": "B", "obj_is_literal": False,
         "obj_dtype": "", "graph": "g"},
        {"subj": "B", "pred": "p", "obj": "lit", "obj_is_literal": True,
         "obj_dtype": "xsd:string", "graph": "g"},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = linking.rewrite_canonical(ds, {"B": "A"}).to_pandas()
    assert set(out.subj) == {"A"}
    assert list(out[out.obj_is_literal].obj) == ["lit"]  # literals untouched
    assert "A" in set(out[~out.obj_is_literal].obj)
