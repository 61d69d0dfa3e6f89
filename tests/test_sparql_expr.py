"""SPARQL 1.1 §17 expression surface (shared FILTER/BIND grammar),
GROUP_CONCAT/SAMPLE aggregates and §9.1 negated property sets."""

import pandas as pd
import pytest

from gitprov_ray import sparql_lite as S


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    rows = []
    for i, (lang, score, title) in enumerate([
            ("en", 3, "alpha"), ("de", 5, "beta"),
            ("en", 10, "alpha two"), ("fr", 7, "gamma")]):
        rows += [
            {"subj": f"http://d/{i}", "pred": "http://d/lang", "obj": lang},
            {"subj": f"http://d/{i}", "pred": "http://d/score",
             "obj": str(score)},
            {"subj": f"http://d/{i}", "pred": "http://d/title", "obj": title},
        ]
    # one doc with an extra, to exercise BOUND/OPTIONAL and !()
    rows.append({"subj": "http://d/0", "pred": "http://d/note", "obj": "x"})
    tri = pd.DataFrame(rows)
    tri["graph"] = "g"
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    return rd.from_pandas(tri)


Q = "PREFIX ex: <http://d/> "


def test_filter_and_or_not(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?v WHERE { ?d ex:score ?v .
            FILTER (?v > 3 && ?v < 10) } ORDER BY ?d""")
    assert out.v.tolist() == ["5", "7"]
    out = S.select_text(ds, Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l .
            FILTER (?l = "de" || ?l = "fr") } ORDER BY ?d""")
    assert out.l.tolist() == ["de", "fr"]
    out = S.select_text(ds, Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l . FILTER (!(?l = "en")) }
        ORDER BY ?d""")
    assert out.l.tolist() == ["de", "fr"]


def test_filter_in_not_in(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l . FILTER (?l IN ("de", "fr")) }
        ORDER BY ?d""")
    assert out.l.tolist() == ["de", "fr"]
    out = S.select_text(ds, Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l . FILTER (?l NOT IN ("de", "fr")) }
        ORDER BY ?d""")
    assert out.l.tolist() == ["en", "en"]
    out = S.select_text(ds, Q + """
        SELECT ?d ?v WHERE { ?d ex:score ?v . FILTER (?v IN (5, 10)) }
        ORDER BY ?d""")
    assert out.v.tolist() == ["5", "10"]


def test_filter_string_tests(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?t WHERE { ?d ex:title ?t . FILTER STRSTARTS(?t, "alpha") }
        ORDER BY ?d""")
    assert out.t.tolist() == ["alpha", "alpha two"]
    out = S.select_text(ds, Q + """
        SELECT ?t WHERE { ?d ex:title ?t . FILTER STRENDS(?t, "two") }""")
    assert out.t.tolist() == ["alpha two"]
    out = S.select_text(ds, Q + """
        SELECT ?t WHERE { ?d ex:title ?t . FILTER CONTAINS(?t, "amm") }""")
    assert out.t.tolist() == ["gamma"]


def test_filter_arithmetic_and_var_var(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?v WHERE { ?d ex:score ?v . FILTER (?v * 2 >= 14) }
        ORDER BY ?d""")
    assert out.v.tolist() == ["10", "7"]
    # var-var comparison (string codepoint order on untyped bindings)
    out = S.select_text(ds, Q + """
        SELECT ?d WHERE { ?d ex:lang ?l . ?d ex:title ?t .
            FILTER (?l = ?t) }""")
    assert len(out) == 0


def test_filter_bound_over_optional(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d WHERE { ?d ex:lang ?l .
            OPTIONAL { ?d ex:note ?n } FILTER BOUND(?n) }""")
    assert out.d.tolist() == ["http://d/0"]
    out = S.select_text(ds, Q + """
        SELECT ?d WHERE { ?d ex:lang ?l .
            OPTIONAL { ?d ex:note ?n } FILTER (!BOUND(?n)) } ORDER BY ?d""")
    assert len(out) == 3


def test_bind_arithmetic_if_coalesce(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?y WHERE { ?d ex:score ?v .
            BIND (?v * 10 + 1 AS ?y) } ORDER BY ?d""")
    assert out.y.tolist() == [31, 51, 101, 71]
    out = S.select_text(ds, Q + """
        SELECT ?d ?band WHERE { ?d ex:score ?v .
            BIND (IF(?v >= 7, "high", "low") AS ?band) } ORDER BY ?d""")
    assert out.band.tolist() == ["low", "low", "high", "high"]
    out = S.select_text(ds, Q + """
        SELECT ?d ?n2 WHERE { ?d ex:lang ?l .
            OPTIONAL { ?d ex:note ?n }
            BIND (COALESCE(?n, "none") AS ?n2) } ORDER BY ?d""")
    assert out.n2.tolist() == ["x", "none", "none", "none"]


def test_bind_strbefore_strafter_round(ds):
    out = S.select_text(ds, Q + """
        SELECT ?d ?w WHERE { ?d ex:title ?t .
            BIND (STRBEFORE(?t, " ") AS ?w) } ORDER BY ?d""")
    # separator absent → "" per fn:substring-before
    assert out.w.tolist() == ["", "", "alpha", ""]
    out = S.select_text(ds, Q + """
        SELECT ?d ?w WHERE { ?d ex:title ?t .
            BIND (STRAFTER(?t, " ") AS ?w) } ORDER BY ?d""")
    assert out.w.tolist() == ["", "", "two", ""]
    out = S.select_text(ds, Q + """
        SELECT ?d ?r WHERE { ?d ex:score ?v .
            BIND (ROUND(?v / 2) AS ?r) } ORDER BY ?d""")
    assert out.r.tolist() == [2.0, 3.0, 5.0, 4.0]   # half toward +INF


def test_group_concat_and_sample(ds):
    out = S.select_text(ds, Q + """
        SELECT ?l (GROUP_CONCAT(?t; SEPARATOR = "|") AS ?ts)
        WHERE { ?d ex:lang ?l . ?d ex:title ?t }
        GROUP BY ?l ORDER BY ?l""")
    assert out.ts.tolist() == ["beta", "alpha|alpha two", "gamma"]
    out = S.select_text(ds, Q + """
        SELECT ?l (GROUP_CONCAT(?t) AS ?ts)
        WHERE { ?d ex:lang ?l . ?d ex:title ?t } GROUP BY ?l ORDER BY ?l""")
    assert out.ts.tolist() == ["beta", "alpha alpha two", "gamma"]
    out = S.select_text(ds, Q + """
        SELECT ?l (SAMPLE(?t) AS ?one) (COUNT(?t) AS ?n)
        WHERE { ?d ex:lang ?l . ?d ex:title ?t } GROUP BY ?l ORDER BY ?l""")
    assert out.n.tolist() == [1, 2, 1]
    assert out.one.tolist()[0] == "beta"
    # SEPARATOR on any other aggregate is rejected
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select('SELECT (SUM(?v; SEPARATOR=",") AS ?x) '
                       "WHERE { ?d ?p ?v }")


def test_negated_property_set(ds):
    out = S.select_text(ds, Q + """
        SELECT ?p ?o WHERE { <http://d/0> !(ex:lang|ex:score) ?o .
            <http://d/0> ?p ?o } ORDER BY ?o""")
    assert sorted(out.o) == ["alpha", "x"]
    out = S.select_text(ds, Q + """
        SELECT ?o WHERE { <http://d/1> !ex:lang ?o } ORDER BY ?o""")
    assert out.o.tolist() == ["5", "beta"]
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select("SELECT ?o WHERE { ?s !?p ?o }")


def test_negated_property_set_distributed(ds):
    out = S.select_distributed(
        ds, [("?s", ("!", "http://d/lang", "http://d/score",
                     "http://d/note"), "?o")]).to_pandas()
    assert sorted(out.o) == ["alpha", "alpha two", "beta", "gamma"]


@pytest.mark.parametrize("q", [
    Q + """SELECT ?d ?v WHERE { ?d ex:score ?v .
           FILTER (?v > 3 && ?v < 10) } ORDER BY ?d""",
    Q + """SELECT ?d ?s ?band WHERE { ?d ex:lang ?l . ?d ex:title ?s .
           FILTER (?l IN ("en", "de"))
           BIND (IF(STRSTARTS(?s, "alpha"), "a", "b") AS ?band) }
           ORDER BY ?d""",
    Q + """SELECT ?l (COUNT(?d) AS ?n) WHERE { ?d ex:lang ?l }
           GROUP BY ?l ORDER BY ?l""",
    Q + """SELECT ?l (AVG(?v) AS ?m) WHERE { ?d ex:lang ?l .
           ?d ex:score ?v } GROUP BY ?l ORDER BY ?l""",
    Q + """SELECT DISTINCT ?l WHERE { ?d ex:lang ?l } ORDER BY ?l""",
    Q + """SELECT ?d ?l WHERE { ?d ex:lang ?l } ORDER BY ?d LIMIT 2""",
])
def test_text_distributed_matches_driver(ds, q):
    """The string front-end's Dataset scale path returns exactly the
    driver path's answer (same parser, same expression kernels)."""
    drv = S.select_text(ds, q).reset_index(drop=True)
    dst = S.select_text_distributed(ds, q).to_pandas()
    # the distributed frame needs the same final sort applied driver-side
    # only when the plan had no ORDER BY; all these do, so compare as-is
    dst = dst[drv.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        drv.astype(str), dst.astype(str), check_dtype=False)


def test_text_distributed_rejects_unsupported(ds):
    # OPTIONAL routes to select_optional_distributed since round 3 —
    # it must answer like the driver, not raise
    q_opt = Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l .
            OPTIONAL { ?d ex:lang ?l } } ORDER BY ?d LIMIT 3"""
    drv = S.select_text(ds, q_opt)
    dst = S.select_text_distributed(ds, q_opt).to_pandas()
    assert drv.reset_index(drop=True).equals(dst.reset_index(drop=True))
    # VALUES routes distributed since round 3 — parity, not a raise
    q_val = Q + """
        SELECT ?d ?l WHERE { ?d ex:lang ?l .
            VALUES ?l { "en" "de" } } ORDER BY ?d"""
    drv_v = S.select_text(ds, q_val)
    dst_v = S.select_text_distributed(ds, q_val).to_pandas()
    assert drv_v.reset_index(drop=True).equals(
        dst_v.reset_index(drop=True))
    with pytest.raises(S.SparqlSyntaxError):
        S.select_text_distributed(ds, Q + """
            SELECT ?d WHERE { ?d ex:lang ?l . FILTER BOUND(?zzz) }""")


@pytest.fixture(scope="module")
def quad_ds(ray_session):
    import ray.data as rd

    rows = []
    for g, docs in [("g1", [("a", "en"), ("b", "de")]),
                    ("g2", [("a", "fr"), ("c", "en")])]:
        for d, lang in docs:
            rows.append({"graph": g, "subj": f"http://d/{d}",
                         "pred": "http://d/lang", "obj": lang,
                         "obj_is_literal": True, "obj_dtype": "xsd:string"})
    return rd.from_pandas(pd.DataFrame(rows))


def test_graph_clause_bound_name(quad_ds):
    out = S.select_text(quad_ds, Q + """
        SELECT ?d ?l WHERE { GRAPH <g2> { ?d ex:lang ?l } } ORDER BY ?d""")
    assert out.d.tolist() == ["http://d/a", "http://d/c"]
    assert out.l.tolist() == ["fr", "en"]


def test_graph_clause_variable_binds_graph(quad_ds):
    out = S.select_text(quad_ds, Q + """
        SELECT ?g ?d ?l WHERE { GRAPH ?g { ?d ex:lang ?l } }
        ORDER BY ?g ?d""")
    assert out.g.tolist() == ["g1", "g1", "g2", "g2"]
    assert out.l.tolist() == ["en", "de", "fr", "en"]
    # same-graph co-occurrence: both patterns must hold within ONE graph
    out = S.select_text(quad_ds, Q + """
        SELECT ?g WHERE { GRAPH ?g { <http://d/a> ex:lang ?l .
                                     <http://d/b> ex:lang ?m } }""")
    assert out.g.tolist() == ["g1"]


def test_graph_clause_joins_outer_patterns(quad_ds):
    out = S.select_text(quad_ds, Q + """
        SELECT ?g ?d WHERE {
            ?d ex:lang "en" .
            GRAPH ?g { ?d ex:lang ?any } } ORDER BY ?g ?d""")
    # docs that have an "en" triple anywhere, with every graph they
    # appear in: a (en in g1; also in g2), c (en in g2)
    assert list(zip(out.g, out.d)) == [
        ("g1", "http://d/a"), ("g2", "http://d/a"), ("g2", "http://d/c")]


def test_graph_inside_group_rejected():
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select(
            "SELECT ?d WHERE { OPTIONAL { GRAPH ?g { ?d ?p ?o } } }")


def test_filter_regex_still_works(ds):
    out = S.select_text(ds, Q + """
        SELECT ?t WHERE { ?d ex:title ?t . FILTER regex(?t, "^AL", "i") }
        ORDER BY ?t""")
    assert out.t.tolist() == ["alpha", "alpha two"]
