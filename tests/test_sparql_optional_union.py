"""SPARQL OPTIONAL (left-outer binding join, SPARQL 1.1 §5.3) and UNION
(bag-semantics branch concat, §5.4) — driver path, distributed path, and
the query-string front-end. The reference's query surface is full Jena
SPARQL (SparqlService.java:22-31)."""

import pandas as pd
import pytest

NS = "http://t.example/"


def _triples() -> pd.DataFrame:
    """4 docs; all have `source`, only d1/d2 have `lang`, only d1 has
    `title` — exercises unmatched OPTIONAL rows at two depths."""
    rows = []

    def t(s, p, o):
        rows.append({"subj": NS + s, "pred": NS + p, "obj": o,
                     "obj_is_literal": True, "obj_dtype": "xsd:string",
                     "graph": "g"})

    for d, src in [("d1", "a"), ("d2", "b"), ("d3", "a"), ("d4", "c")]:
        t(d, "source", src)
    t("d1", "lang", "en")
    t("d2", "lang", "de")
    t("d1", "title", "hello")
    return pd.DataFrame(rows)


@pytest.fixture()
def tds():
    import ray.data as rd

    return rd.from_pandas(_triples())


def test_parse_optional_and_union():
    from gitprov_ray import sparql_lite

    plan = sparql_lite.parse_select("""
        SELECT ?d ?l WHERE {
            ?d <http://t.example/source> ?s .
            OPTIONAL { ?d <http://t.example/lang> ?l }
            { ?d <http://t.example/lang> "en" } UNION
            { ?d <http://t.example/lang> "de" }
        }""")
    assert plan["optional_groups"] == [[("?d", NS + "lang", "?l")]]
    assert plan["union_branches"] == [[("?d", NS + "lang", "en")],
                                      [("?d", NS + "lang", "de")]]


def test_parse_rejects_nested_group_tokens():
    from gitprov_ray import sparql_lite

    for q in ("SELECT ?d WHERE { OPTIONAL { OPTIONAL { ?d ?p ?o } } }",
              "SELECT ?d WHERE { { ?d ?p ?o } }"):
        with pytest.raises(sparql_lite.SparqlSyntaxError):
            sparql_lite.parse_select(q)


@pytest.mark.usefixtures("ray_session")
def test_select_optional_unmatched_rows_keep_required_bindings(tds):
    from gitprov_ray import sparql_lite

    out = sparql_lite.select_optional(
        tds, [("?d", NS + "source", "?s")], [[("?d", NS + "lang", "?l")]])
    assert len(out) == 4
    by_d = out.set_index("d")
    assert by_d.loc[NS + "d1", "l"] == "en"
    assert by_d.loc[NS + "d2", "l"] == "de"
    assert by_d.loc[NS + "d3", "l"] is None
    assert by_d.loc[NS + "d4", "l"] is None


@pytest.mark.usefixtures("ray_session")
def test_select_optional_two_groups(tds):
    from gitprov_ray import sparql_lite

    out = sparql_lite.select_optional(
        tds, [("?d", NS + "source", "?s")],
        [[("?d", NS + "lang", "?l")], [("?d", NS + "title", "?t")]])
    by_d = out.set_index("d")
    assert by_d.loc[NS + "d1", "t"] == "hello"
    assert by_d.loc[NS + "d2", "t"] is None


@pytest.mark.usefixtures("ray_session")
def test_select_optional_cross_product_raises(tds):
    from gitprov_ray import sparql_lite

    with pytest.raises(sparql_lite.SparqlSyntaxError):
        sparql_lite.select_optional(
            tds, [("?d", NS + "source", "?s")], [[("?x", NS + "lang", "?l")]])


@pytest.mark.usefixtures("ray_session")
def test_select_union_bag_semantics(tds):
    from gitprov_ray import sparql_lite

    # d1 matches both branches (lang en + source a) → appears twice
    out = sparql_lite.select_union(
        tds, [[("?d", NS + "lang", "en")], [("?d", NS + "source", "a")]])
    assert sorted(out["d"]) == sorted(
        [NS + "d1", NS + "d1", NS + "d3"])


@pytest.mark.usefixtures("ray_session")
def test_select_union_aligns_heterogeneous_variables(tds):
    from gitprov_ray import sparql_lite

    out = sparql_lite.select_union(
        tds, [[("?d", NS + "lang", "?l")], [("?d", NS + "title", "?t")]])
    assert set(out.columns) == {"d", "l", "t"}
    title_rows = out[out["t"].notna()]
    assert list(title_rows["l"]) == [None]


@pytest.mark.usefixtures("ray_session")
def test_distributed_optional_matches_driver(tds):
    from gitprov_ray import sparql_lite

    drv = sparql_lite.select_optional(
        tds, [("?d", NS + "source", "?s")], [[("?d", NS + "lang", "?l")]])
    dist = sparql_lite.select_optional_distributed(
        tds, [("?d", NS + "source", "?s")],
        [[("?d", NS + "lang", "?l")]]).to_pandas()
    key = lambda df: df.fillna("∅")[sorted(df.columns)] \
        .sort_values(sorted(df.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(drv), key(dist), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_distributed_union_matches_driver(tds):
    from gitprov_ray import sparql_lite

    branches = [[("?d", NS + "lang", "en")], [("?d", NS + "source", "a")]]
    drv = sparql_lite.select_union(tds, branches)
    dist = sparql_lite.select_union_distributed(tds, branches).to_pandas()
    assert sorted(dist["d"]) == sorted(drv["d"])


@pytest.mark.usefixtures("ray_session")
def test_distributed_union_heterogeneous_matches_driver(tds):
    """Round-4: heterogeneous branches align with null-fill on the
    Dataset path (formerly a raise) — parity with select_union."""
    from gitprov_ray import sparql_lite

    branches = [[("?d", NS + "lang", "?l")], [("?d", NS + "title", "?t")]]
    drv = sparql_lite.select_union(tds, branches)
    dst = sparql_lite.select_union_distributed(tds, branches).to_pandas()
    assert set(dst.columns) == set(drv.columns)
    key = lambda f: f[sorted(f.columns)].fillna("\0") \
        .sort_values(sorted(f.columns)).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(key(drv), key(dst), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_select_text_optional_union_combined(tds):
    from gitprov_ray import sparql_lite

    q = """
        PREFIX ex: <http://t.example/>
        SELECT ?d ?s ?t WHERE {
            { ?d ex:lang "en" } UNION { ?d ex:lang "de" } .
            ?d ex:source ?s .
            OPTIONAL { ?d ex:title ?t }
        } ORDER BY ?d
    """
    out = sparql_lite.select_text(tds, q)
    assert list(out["d"]) == [NS + "d1", NS + "d2"]
    assert list(out["s"]) == ["a", "b"]
    assert list(out["t"]) == ["hello", None]


def test_filter_inside_optional_keeps_rows(ray_session):
    """§6.1: a FILTER inside OPTIONAL restricts the optional MATCH, not
    the solution — rows whose optional part fails the filter stay with
    the variable unbound. (An outer FILTER would drop them.)"""
    import pandas as pd
    import ray.data as rd

    from gitprov_ray import sparql_lite as S

    tri = pd.DataFrame(
        [("g", "http://d/a", "http://d/source", "s0"),
         ("g", "http://d/b", "http://d/source", "s1"),
         ("g", "http://d/a", "http://d/lang", "en"),
         ("g", "http://d/b", "http://d/lang", "fr")],
        columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    ds = rd.from_pandas(tri).repartition(2)
    q = """PREFIX ex: <http://d/>
        SELECT ?d ?l WHERE {
            ?d ex:source ?s .
            OPTIONAL { ?d ex:lang ?l . FILTER (?l != "fr") }
        } ORDER BY ?d"""
    drv = S.select_text(ds, q)
    # doc b's lang fails the filter → row SURVIVES with ?l unbound
    assert drv.l.tolist() == ["en", None]
    dst = S.select_text_distributed(ds, q).to_pandas()
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)
    # contrast: the same filter OUTSIDE the optional drops doc b
    q_outer = """PREFIX ex: <http://d/>
        SELECT ?d ?l WHERE {
            ?d ex:source ?s . OPTIONAL { ?d ex:lang ?l }
            FILTER (?l != "fr")
        } ORDER BY ?d"""
    drv2 = S.select_text(ds, q_outer)
    assert drv2.d.tolist() == ["http://d/a"]
