"""SPARQL 1.1 Update (§3.1) against the engine store: INSERT/DELETE
DATA, DELETE WHERE, the general DELETE/INSERT...WHERE modify form,
CLEAR GRAPH, ';'-sequenced ops, and the store-level read→apply→atomic
replace loop."""

import pandas as pd
import pytest

from gitprov_ray import sparql_lite as S

pytestmark = pytest.mark.usefixtures("ray_session")

PFX = "PREFIX ex: <http://ex.org/> "


def base_triples() -> pd.DataFrame:
    rows = [
        ("g1", "http://ex.org/a", "http://ex.org/knows",
         "http://ex.org/b", False, ""),
        ("g1", "http://ex.org/b", "http://ex.org/knows",
         "http://ex.org/c", False, ""),
        ("g1", "http://ex.org/a", "http://ex.org/name", "Alice",
         True, "xsd:string"),
        ("g2", "http://ex.org/z", "http://ex.org/name", "Zed",
         True, "xsd:string"),
    ]
    return pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj",
                                       "obj_is_literal", "obj_dtype"])


def test_insert_and_delete_data():
    df = base_triples()
    out = S.apply_update(df, PFX + """
        INSERT DATA {
          ex:c ex:name "Cy" .
          ex:c ex:age 7 .
          GRAPH <g2> { ex:z ex:knows ex:a }
        }""", graph="g1")
    assert len(out) == len(df) + 3
    row = out[(out.subj == "http://ex.org/c")
              & (out.pred == "http://ex.org/age")].iloc[0]
    assert row["obj"] == "7" and row["obj_is_literal"]
    assert row["obj_dtype"] == "xsd:integer" and row["graph"] == "g1"
    g2 = out[(out.graph == "g2") & (out.pred == "http://ex.org/knows")]
    assert len(g2) == 1
    # re-inserting the same data is a no-op (set semantics)
    again = S.apply_update(out, PFX + 'INSERT DATA { ex:c ex:name "Cy" }',
                           graph="g1")
    assert len(again) == len(out)

    out2 = S.apply_update(out, PFX + """
        DELETE DATA { ex:c ex:age 7 . GRAPH <g2> { ex:z ex:knows ex:a } }
        """, graph="g1")
    assert len(out2) == len(out) - 2


def test_delete_where_and_modify():
    df = base_triples()
    # DELETE WHERE: pattern is both template and match
    out = S.apply_update(df, PFX + """
        DELETE WHERE { ?s ex:knows ?o }""", graph="g1")
    assert (out.pred != "http://ex.org/knows").all()
    assert len(out) == 2                       # the two name triples

    # general modify: rename predicate via DELETE+INSERT from bindings
    out2 = S.apply_update(df, PFX + """
        DELETE { ?s ex:knows ?o }
        INSERT { ?s ex:linked ?o }
        WHERE  { ?s ex:knows ?o }""", graph="g1")
    linked = out2[out2.pred == "http://ex.org/linked"]
    assert len(linked) == 2
    assert (out2.pred != "http://ex.org/knows").all()
    # instantiated URI objects stay non-literals
    assert not linked["obj_is_literal"].any()

    # INSERT-only modify with a literal template object
    out3 = S.apply_update(df, PFX + """
        INSERT { ?s ex:tag "seen" } WHERE { ?s ex:knows ?o }""",
        graph="g1")
    tags = out3[out3.pred == "http://ex.org/tag"]
    assert sorted(tags.subj) == ["http://ex.org/a", "http://ex.org/b"]
    assert tags["obj_dtype"].eq("xsd:string").all()


def test_clear_and_sequence():
    df = base_triples()
    out = S.apply_update(df, PFX + """
        CLEAR GRAPH <g2> ;
        INSERT DATA { GRAPH <g3> { ex:n ex:name "New" } }""",
        graph="g1")
    assert "g2" not in set(out.graph)
    assert "g3" in set(out.graph)
    with pytest.raises(S.SparqlSyntaxError):
        S.apply_update(df, "FROBNICATE { }")
    with pytest.raises(S.SparqlSyntaxError, match="variables"):
        S.apply_update(df, PFX + "INSERT DATA { ?v ex:p ex:o }")


def test_update_store_roundtrip(tmp_path):
    import ray.data as rd

    from gitprov_ray import store

    root = str(tmp_path / "store")
    store.write_store(rd.from_pandas(base_triples()), root)
    assert sorted(store.list_graphs(root)) == ["g1", "g2"]

    counts = S.update_store(root, PFX + """
        DELETE { ?s ex:knows ?o } INSERT { ?s ex:linked ?o }
        WHERE { ?s ex:knows ?o } ;
        CLEAR GRAPH <g2>""", graph="g1")
    assert counts == {"g1": 3}
    assert sorted(store.list_graphs(root)) == ["g1"]
    back = store.read_store(root, graph="g1").to_pandas()
    assert (back.pred != "http://ex.org/knows").all()
    assert (back.pred == "http://ex.org/linked").sum() == 2


def test_cli_sparql_update(tmp_path):
    import json
    import subprocess
    import sys

    import ray.data as rd

    from gitprov_ray import store

    root = str(tmp_path / "store")
    store.write_store(rd.from_pandas(base_triples()), root)
    out = subprocess.run(
        [sys.executable, "-m", "gitprov_ray", "sparql-update", root,
         PFX + 'INSERT DATA { ex:q ex:name "Q" }', "--graph", "g1",
         "--num-cpus", "2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    counts = json.loads(out.stdout.strip().splitlines()[-1])
    assert counts["g1"] == 4


def test_delete_data_is_term_exact():
    """DELETE DATA of a literal must not remove an IRI-object triple
    sharing the lexical form, nor a typed literal with a different
    datatype (ADVICE r04: the delete key ignored obj_is_literal /
    obj_dtype)."""
    rows = [
        # IRI object and string literal with the SAME lexical form
        ("g1", "http://ex.org/a", "http://ex.org/p",
         "http://ex.org/x", False, ""),
        ("g1", "http://ex.org/a", "http://ex.org/p",
         "http://ex.org/x", True, "xsd:string"),
        # typed literals sharing a lexical form
        ("g1", "http://ex.org/a", "http://ex.org/q", "7",
         True, "xsd:integer"),
        ("g1", "http://ex.org/a", "http://ex.org/q", "7",
         True, "xsd:string"),
    ]
    df = pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj",
                                     "obj_is_literal", "obj_dtype"])
    out = S.apply_update(
        df, PFX + 'DELETE DATA { ex:a ex:p "http://ex.org/x" }',
        graph="g1")
    assert len(out) == 3
    left = out[out.pred == "http://ex.org/p"]
    assert len(left) == 1 and not left.iloc[0]["obj_is_literal"]

    out2 = S.apply_update(df, PFX + "DELETE DATA { ex:a ex:q 7 }",
                          graph="g1")
    assert len(out2) == 3
    left2 = out2[out2.pred == "http://ex.org/q"]
    assert left2.iloc[0]["obj_dtype"] == "xsd:string"

    # INSERT DATA set-semantics are term-exact too: a literal "x" is a
    # NEW triple next to the IRI <x>
    out3 = S.apply_update(
        df.iloc[:1], PFX + 'INSERT DATA { ex:a ex:p "http://ex.org/x" }',
        graph="g1")
    assert len(out3) == 2

    # variable-object deletes still match (bindings are untyped strings:
    # lexical matching is the documented fallback)
    out4 = S.apply_update(df, PFX + """
        DELETE { ex:a ex:q ?v } WHERE { ex:a ex:q ?v }""", graph="g1")
    assert len(out4[out4.pred == "http://ex.org/q"]) == 0
