"""SPARQL aggregates/GROUP BY + ASK/CONSTRUCT/DESCRIBE query forms
(sparql_lite §16 — the reference hands all four forms to Jena,
SparqlService.java:22-31)."""

import pandas as pd
import pytest

from gitprov_ray import sparql_lite as S


@pytest.fixture(scope="module")
def tri_ds(ray_session):
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": f"http://d/{p}",
         "obj": o, "obj_is_literal": True, "obj_dtype": "xsd:string"}
        for i, p, o in [
            (1, "lang", "en"), (1, "source", "s1"),
            (2, "lang", "de"), (2, "source", "s1"),
            (3, "lang", "en"), (3, "source", "s2"),
        ]
    ])
    return rd.from_pandas(tri)


@pytest.fixture(scope="module")
def score_ds(ray_session):
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": "http://d/score",
         "obj": str(v), "obj_is_literal": True, "obj_dtype": "xsd:integer"}
        for i, v in enumerate([3, 5, 10])
    ])
    return rd.from_pandas(tri)


def test_group_by_count(tri_ds):
    out = S.select_text(tri_ds, """
        PREFIX ex: <http://d/>
        SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d ex:source ?s }
        GROUP BY ?s ORDER BY ?s""")
    assert list(out.columns) == ["s", "n"]
    assert out.s.tolist() == ["s1", "s2"] and out.n.tolist() == [2, 1]
    assert str(out.n.dtype) == "int64"


def test_global_aggregates(tri_ds):
    out = S.select_text(tri_ds, """
        PREFIX ex: <http://d/>
        SELECT (COUNT(*) AS ?total) (COUNT(DISTINCT ?s) AS ?ns)
        WHERE { ?d ex:source ?s }""")
    assert out.shape == (1, 2)
    assert out.total.iloc[0] == 3 and out.ns.iloc[0] == 2


def test_sum_avg_min_max(score_ds):
    out = S.select_text(score_ds, """
        PREFIX ex: <http://d/>
        SELECT (SUM(?v) AS ?tot) (AVG(?v) AS ?mean)
               (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
        WHERE { ?d ex:score ?v }""")
    row = out.iloc[0]
    assert row.tot == 18 and row["mean"] == 6.0
    assert row.lo == 3 and row.hi == 10
    assert str(out.tot.dtype) == "int64"     # integral SUM stays integer


def test_projection_outside_group_by_rejected(tri_ds):
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select("""
            PREFIX ex: <http://d/>
            SELECT ?d (COUNT(?s) AS ?n) WHERE { ?d ex:source ?s }
            GROUP BY ?s""")


def test_ask(tri_ds):
    assert S.ask_text(
        tri_ds, 'PREFIX ex: <http://d/> ASK { ?d ex:lang "en" }') is True
    assert S.ask_text(
        tri_ds, 'PREFIX ex: <http://d/> ASK { ?d ex:lang "fr" }') is False
    # FILTER works inside ASK (rewrite shares the SELECT machinery)
    assert S.ask_text(tri_ds, """
        PREFIX ex: <http://d/>
        ASK { ?d ex:lang ?l . FILTER (?l = "de") }""") is True


def test_construct(tri_ds):
    out = S.construct_text(tri_ds, """
        PREFIX ex: <http://d/>
        CONSTRUCT { ?d ex:tongue ?l . ?d ex:kind "doc" }
        WHERE { ?d ex:lang ?l }""")
    assert set(out.columns) == {"subj", "pred", "obj"}
    assert (out.pred == "http://d/tongue").sum() == 3
    assert (out.pred == "http://d/kind").sum() == 3
    assert set(out[out.pred == "http://d/kind"].obj) == {"doc"}
    # deduplicated graph semantics
    assert not out.duplicated().any()


def test_describe_uri_and_var(tri_ds):
    out = S.describe_text(tri_ds, "DESCRIBE <http://d/1>")
    assert len(out) == 2 and set(out.subj) == {"http://d/1"}
    out = S.describe_text(tri_ds, """
        PREFIX ex: <http://d/>
        DESCRIBE ?d WHERE { ?d ex:lang "en" }""")
    assert len(out) == 4 and set(out.subj) == {"http://d/1", "http://d/3"}


def test_query_text_dispatch(tri_ds):
    assert S.query_form("ASK { ?s ?p ?o }") == "ASK"
    assert isinstance(S.query_text(tri_ds, "DESCRIBE <http://d/1>"),
                      pd.DataFrame)
    assert S.query_text(
        tri_ds, 'PREFIX ex: <http://d/> ASK { ?d ex:lang "en" }') is True
    with pytest.raises(S.SparqlSyntaxError):
        S.query_form("DELETE WHERE { ?s ?p ?o }")


def test_new_queries_match_oracle_sql(ray_session):
    """q_sparql_{agg,construct,ask,describe} vs their DuckDB twins at
    sf0.001 (the driver's comparison, exact dtypes)."""
    import duckdb

    from gitprov_ray import queries as Q

    sf_dir_smallest = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir_smallest}/documents.parquet')")
    for name in ("q_sparql_agg", "q_sparql_construct", "q_sparql_ask",
                 "q_sparql_describe", "q_sparql_having",
                 "q_sparql_not_exists"):
        mine = Q.QUERIES[name](sf_dir_smallest)
        ora = con.execute(Q.ORACLE_SQL[name]).fetchdf()
        a = mine[sorted(mine.columns)].sort_values(
            sorted(mine.columns)).reset_index(drop=True)
        b = ora[sorted(ora.columns)].sort_values(
            sorted(ora.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_exact=True)


@pytest.fixture(scope="module")
def chain_ds(ray_session):
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": "http://d/doc1", "pred": "http://d/author",
         "obj": "http://d/p1", "obj_is_literal": False, "obj_dtype": ""},
        {"graph": "g", "subj": "http://d/doc2", "pred": "http://d/author",
         "obj": "http://d/p2", "obj_is_literal": False, "obj_dtype": ""},
        {"graph": "g", "subj": "http://d/p1", "pred": "http://d/name",
         "obj": "alice", "obj_is_literal": True, "obj_dtype": "xsd:string"},
        {"graph": "g", "subj": "http://d/p2", "pred": "http://d/name",
         "obj": "bob", "obj_is_literal": True, "obj_dtype": "xsd:string"},
    ])
    return rd.from_pandas(tri)


def test_sequence_path(chain_ds):
    out = S.select_text(chain_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?n WHERE { ?d ex:author/ex:name ?n } ORDER BY ?n""")
    assert out.n.tolist() == ["alice", "bob"]
    assert list(out.columns) == ["d", "n"]


def test_star_hides_path_internals(chain_ds):
    out = S.select_text(chain_ds, """PREFIX ex: <http://d/>
        SELECT * WHERE { ?d ex:author/ex:name ?n }""")
    assert not any(c.startswith("__pp") for c in out.columns)
    assert set(out.columns) == {"d", "n"}


def test_inverse_path(chain_ds):
    out = S.select_text(chain_ds, """PREFIX ex: <http://d/>
        SELECT ?p WHERE { ?p ^ex:author <http://d/doc1> }""")
    assert out.p.tolist() == ["http://d/p1"]


def test_inverse_inside_sequence(chain_ds):
    # name-of(author-of(?d)) via ^name reversal: ?n ^ex:name ?p ≡ ?p ex:name ?n
    out = S.select_text(chain_ds, """PREFIX ex: <http://d/>
        SELECT ?n WHERE { ?d ex:author ?p . ?n ^ex:name ?p }""")
    assert sorted(out.n) == ["alice", "bob"]


def test_variable_predicate_in_path_rejected():
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select("SELECT * WHERE { ?s ?p/?q ?o }")


@pytest.fixture(scope="module")
def src_ds(ray_session):
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": f"http://d/{p}",
         "obj": o, "obj_is_literal": True, "obj_dtype": "xsd:string"}
        for i, p, o in [(1, "lang", "en"), (1, "source", "s1"),
                        (2, "lang", "de"), (2, "source", "s1"),
                        (3, "lang", "en"), (3, "source", "s2"),
                        (4, "source", "s3")]
    ])
    return rd.from_pandas(tri)


def test_values_single_and_multi(src_ds):
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?s WHERE { ?d ex:source ?s . VALUES ?s { "s1" "s3" } }
        ORDER BY ?d""")
    assert sorted(out.s.unique()) == ["s1", "s3"] and len(out) == 3
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?s ?tag WHERE {
            ?d ex:source ?s .
            VALUES (?s ?tag) { ("s1" "A") ("s2" "B") }
        } ORDER BY ?d""")
    assert out.tag.tolist() == ["A", "A", "B"]


def test_filter_exists_and_not_exists(src_ds):
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d WHERE { ?d ex:source ?s .
                          FILTER NOT EXISTS { ?d ex:lang ?l } }""")
    assert out.d.tolist() == ["http://d/4"]
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d WHERE { ?d ex:source ?s .
                          FILTER EXISTS { ?d ex:lang "en" } } ORDER BY ?d""")
    assert out.d.tolist() == ["http://d/1", "http://d/3"]


def test_minus_vs_not_exists_disjoint(src_ds):
    """MINUS on a disjoint domain removes nothing (§8.3); NOT EXISTS on a
    satisfiable disjoint group removes everything (§8.1)."""
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d WHERE { ?d ex:source ?s . MINUS { ?d ex:lang "en" } }
        ORDER BY ?d""")
    assert out.d.tolist() == ["http://d/2", "http://d/4"]
    keep = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d WHERE { ?d ex:source "s1" . MINUS { ?x ex:lang "en" } }""")
    assert len(keep) == 2
    wiped = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d WHERE { ?d ex:source "s1" .
                          FILTER NOT EXISTS { ?x ex:lang "en" } }""")
    assert len(wiped) == 0


def test_having(src_ds):
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d ex:source ?s }
        GROUP BY ?s HAVING (COUNT(?d) >= 2) ORDER BY ?s""")
    assert out.s.tolist() == ["s1"] and out.n.tolist() == [2]
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?s (COUNT(?d) AS ?n) WHERE { ?d ex:source ?s }
        GROUP BY ?s HAVING (?n = 1) ORDER BY ?s""")
    assert out.s.tolist() == ["s2", "s3"]
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select("SELECT ?s WHERE { ?d ?p ?s } HAVING (?s > 1)")


def test_aggregate_distributed_matches_driver(ray_session):
    """Distributed GROUP BY count (aggregate_distributed) == the
    driver-side q_sparql_agg answer at sf0.001."""
    from gitprov_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    dist = Q.QUERIES["q_sparql_agg_distributed"](sf).to_pandas()
    drv = Q.QUERIES["q_sparql_agg"](sf)
    a = dist.sort_values("s").reset_index(drop=True)
    b = drv.sort_values("s").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_bind_expressions(src_ds):
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?tag ?L WHERE {
            ?d ex:source ?s .
            BIND (CONCAT(UCASE(?s), "-doc") AS ?tag)
            BIND (STRLEN(?s) AS ?L)
        } ORDER BY ?d""")
    assert out.tag.tolist() == ["S1-doc", "S1-doc", "S2-doc", "S3-doc"]
    assert set(out.L) == {2} and str(out.L.dtype) == "int64"
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?x WHERE {
            ?d ex:source ?s .
            BIND (REPLACE(SUBSTR(?s, 1, 1), "s", "src") AS ?x)
            FILTER (?x = "src")
        }""")
    assert len(out) == 4 and set(out.x) == {"src"}
    with pytest.raises(S.SparqlSyntaxError):
        S.select_text(src_ds, """PREFIX ex: <http://d/>
            SELECT ?d WHERE { ?d ex:source ?s .
                              BIND (UCASE(?missing) AS ?x) }""")


def test_bare_group_by_groups_without_aggregates(src_ds):
    """Review fix: GROUP BY with no aggregate in SELECT must still group
    (one row per group), not silently return ungrouped rows."""
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?s WHERE { ?d ex:source ?s } GROUP BY ?s ORDER BY ?s""")
    assert out.s.tolist() == ["s1", "s2", "s3"]
    # and HAVING still applies without any SELECT aggregate
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?s WHERE { ?d ex:source ?s }
        GROUP BY ?s HAVING (COUNT(?d) > 1)""")
    assert out.s.tolist() == ["s1"]
    # ungrouped projection var is rejected
    with pytest.raises(S.SparqlSyntaxError):
        S.parse_select("""SELECT ?d ?s WHERE { ?d ?p ?s } GROUP BY ?s""")


def test_describe_absent_resource_empty_frame(src_ds):
    out = S.describe_text(src_ds, "DESCRIBE <http://d/absent>")
    assert len(out) == 0
    assert list(out.columns) == ["graph", "subj", "pred", "obj"]


def test_bind_rejects_variable_substr_args_and_replaces_backrefs(src_ds):
    with pytest.raises(S.SparqlSyntaxError):
        S.select_text(src_ds, """PREFIX ex: <http://d/>
            SELECT ?x WHERE { ?d ex:source ?s .
                              BIND (SUBSTR(?s, ?d) AS ?x) }""")
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?x WHERE {
            ?d ex:source ?s .
            BIND (REPLACE(?s, "s(\\\\d)", "src$1") AS ?x)
        } ORDER BY ?d""")
    assert out.x.tolist() == ["src1", "src1", "src2", "src3"]


def test_values_compatible_with_unbound_optional_var(src_ds):
    """Review fix (SPARQL §10.2): an OPTIONAL-unbound shared variable is
    compatible with every VALUES row and takes its binding."""
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?d ?l WHERE {
            ?d ex:source ?s .
            OPTIONAL { ?d ex:lang ?l }
            VALUES ?l { "en" }
        } ORDER BY ?d""")
    # docs 1,3 bind l=en and match; doc 2 (l=de) drops; doc 4 (unbound)
    # is compatible and takes l="en"
    assert out.d.tolist() == ["http://d/1", "http://d/3", "http://d/4"]
    assert set(out.l) == {"en"}


def test_construct_distributed_matches_driver(ray_session):
    from gitprov_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    dist = Q.QUERIES["q_sparql_construct_distributed"](sf).to_pandas()
    drv = Q.QUERIES["q_sparql_construct"](sf)
    a = dist.sort_values(["subj", "obj"]).reset_index(drop=True)
    b = drv.sort_values(["subj", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)


def test_aggregate_distributed_avg_min_max(ray_session):
    """Distributed avg/min/max match the driver-side aggregate answers
    (AVG merges (sum, count) partials across buckets)."""
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": "http://d/val",
         "obj": str(v), "obj_is_literal": True, "obj_dtype": "xsd:integer"}
        for i, v in enumerate([3, 5, 10, 2, 8, 9])
    ])
    tri["grp"] = ""
    tri = tri.drop(columns="grp")
    # group key derived from a second predicate
    extra = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": "http://d/band",
         "obj": b, "obj_is_literal": True, "obj_dtype": "xsd:string"}
        for i, b in enumerate(["x", "x", "x", "y", "y", "y"])
    ])
    ds = rd.from_pandas(pd.concat([tri, extra], ignore_index=True))
    pats = [("?d", "http://d/band", "?b"), ("?d", "http://d/val", "?v")]
    for agg, want in (("avg", {"x": 6.0, "y": 19 / 3}),
                      ("min", {"x": 3.0, "y": 2.0}),
                      ("max", {"x": 10.0, "y": 9.0}),
                      ("sum", {"x": 18.0, "y": 19.0})):
        out = S.aggregate_distributed(ds, pats, ["?b"], agg=agg,
                                      arg_var="?v", alias="r") \
            .to_pandas().sort_values("b").reset_index(drop=True)
        got = dict(zip(out.b, out.r))
        assert got.keys() == want.keys() and all(
            abs(got[k] - want[k]) < 1e-12 for k in want), (agg, got)


def test_sub_select(src_ds):
    """Sub-SELECT (§12): inner query evaluates recursively (inheriting
    outer PREFIXes) and its projection joins the outer solutions."""
    q = """PREFIX ex: <http://d/>
        SELECT ?d ?s WHERE {
            ?d ex:source ?s .
            { SELECT ?s (COUNT(?x) AS ?cnt) WHERE { ?x ex:source ?s }
              GROUP BY ?s HAVING (?cnt >= 2) }
        } ORDER BY ?d"""
    out = S.select_text(src_ds, q)
    assert out.d.tolist() == ["http://d/1", "http://d/2"]
    assert set(out.s) == {"s1"}
    # inner projected aggregate is visible to the outer query
    out = S.select_text(src_ds, q.replace("SELECT ?d ?s", "SELECT ?d ?cnt"))
    assert out.cnt.tolist() == [2, 2]
    # sub-SELECT as the only group member
    out = S.select_text(src_ds, """PREFIX ex: <http://d/>
        SELECT ?s WHERE {
            { SELECT DISTINCT ?s WHERE { ?x ex:source ?s } }
        } ORDER BY ?s""")
    assert out.s.tolist() == ["s1", "s2", "s3"]


def test_alternation_path(ray_session):
    """(p1|p2) alternation desugars into the UNION machinery and joins
    the remaining patterns; rejected inside group patterns."""
    import ray.data as rd

    tri = pd.DataFrame([
        {"graph": "g", "subj": f"http://d/{i}", "pred": f"http://d/{p}",
         "obj": o, "obj_is_literal": True, "obj_dtype": "xsd:string"}
        for i, p, o in [(1, "lang", "en"), (1, "source", "s1"),
                        (2, "tongue", "de"), (2, "source", "s1"),
                        (3, "lang", "en"), (3, "source", "s2")]
    ])
    ds = rd.from_pandas(tri)
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?d ?l ?s WHERE {
            ?d (ex:lang|ex:tongue) ?l .
            ?d ex:source ?s .
        } ORDER BY ?d""")
    assert out.l.tolist() == ["en", "de", "en"]
    with pytest.raises(S.SparqlSyntaxError):
        S.select_text(ds, """PREFIX ex: <http://d/>
            SELECT ?d WHERE { ?d ex:source ?s .
                              OPTIONAL { ?d (ex:a|ex:b) ?x } }""")


def test_one_or_more_path(ray_session):
    """?s pred+ ?o: transitive closure of the predicate, joining the
    remaining BGP; grouped/inverse/variable forms raise."""
    import ray.data as rd

    rows = []
    for i in range(1, 4):
        rows.append({"graph": "g", "subj": f"http://d/{i}",
                     "pred": "http://d/next", "obj": f"http://d/{i + 1}",
                     "obj_is_literal": False, "obj_dtype": ""})
    for i in range(1, 5):
        rows.append({"graph": "g", "subj": f"http://d/{i}",
                     "pred": "http://d/name", "obj": f"n{i}",
                     "obj_is_literal": True, "obj_dtype": "xsd:string"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?o WHERE { <http://d/1> ex:next+ ?o } ORDER BY ?o""")
    assert out.o.tolist() == ["http://d/2", "http://d/3", "http://d/4"]
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?o ?n WHERE { <http://d/2> ex:next+ ?o . ?o ex:name ?n }
        ORDER BY ?o""")
    assert out.n.tolist() == ["n3", "n4"]
    assert len(S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?a ?b WHERE { ?a ex:next+ ?b }""")) == 6
    with pytest.raises(S.SparqlSyntaxError):
        S.select_text(ds, """PREFIX ex: <http://d/>
            SELECT ?o WHERE { ?a ?p+ ?o }""")


def test_zero_or_more_and_zero_or_one_paths(ray_session):
    """p* = reflexive (§18.4 ZeroLengthPath) ∪ transitive closure;
    p? = reflexive ∪ direct edges. Bound endpoints reflect to
    themselves; the unbound-unbound form reflects every graph term."""
    import ray.data as rd

    rows = []
    for i in range(1, 4):
        rows.append({"graph": "g", "subj": f"http://d/{i}",
                     "pred": "http://d/next", "obj": f"http://d/{i + 1}",
                     "obj_is_literal": False, "obj_dtype": ""})
    for i in range(1, 5):
        rows.append({"graph": "g", "subj": f"http://d/{i}",
                     "pred": "http://d/name", "obj": f"n{i}",
                     "obj_is_literal": True, "obj_dtype": "xsd:string"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    # zero-or-more with a bound subject: itself + the closure
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?o WHERE { <http://d/1> ex:next* ?o } ORDER BY ?o""")
    assert out.o.tolist() == [f"http://d/{i}" for i in (1, 2, 3, 4)]
    # zero-or-one with a bound subject: itself + direct successors only
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?o WHERE { <http://d/1> ex:next? ?o } ORDER BY ?o""")
    assert out.o.tolist() == ["http://d/1", "http://d/2"]
    # unbound-unbound p*: every graph term reflects (8 terms: d/1-4 +
    # the four name literals) + the 6 closure pairs
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?a ?b WHERE { ?a ex:next* ?b }""")
    assert len(out) == 8 + 6
    # same-variable form keeps only the reflexive rows (no next-cycles)
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?x WHERE { ?x ex:next* ?x }""")
    assert len(out) == 8 and "x" in out.columns
    # p* joins the remaining BGP like any other binding frame
    out = S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT ?o ?n WHERE { <http://d/2> ex:next* ?o . ?o ex:name ?n }
        ORDER BY ?o""")
    assert out.n.tolist() == ["n2", "n3", "n4"]
    # bound-bound: zero-length hit iff the terms are equal
    assert len(S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT WHERE { <http://d/9> ex:next* <http://d/9> }""")) == 1
    assert len(S.select_text(ds, """PREFIX ex: <http://d/>
        SELECT WHERE { <http://d/9> ex:next? <http://d/1> }""")) == 0
