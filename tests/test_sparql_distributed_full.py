"""The generalized distributed SPARQL aggregate path
(sparql_lite._aggregate_binding_ds_full via select_text_distributed):
multi-aggregate GROUP BY, DISTINCT aggregates, HAVING, GROUP_CONCAT /
SAMPLE (pinned deterministic), DESC ORDER BY and bounded OFFSET — each
pinned against the driver path (select_text) on the same Dataset.

The reference hands all of this to Jena (SparqlService.java:22-31);
the engine's scale path must answer exactly like its driver path up to
the documented dtype/order divergences (SUM/AVG float64; GROUP_CONCAT
sorted; SAMPLE codepoint-min)."""

import pandas as pd
import pytest

from gitprov_ray import sparql_lite as S

Q = "PREFIX ex: <http://d/> "


@pytest.fixture(scope="module")
def rich_ds(ray_session):
    """Docs with source, lang and numeric score triples — spread over
    several blocks so partial combines and the bucket shuffle are real."""
    import ray.data as rd

    rows = []
    for i in range(60):
        d = f"http://d/doc{i:02d}"
        rows.append(("g", d, "http://d/source", f"s{i % 4}"))
        rows.append(("g", d, "http://d/lang", ["en", "de", "fr"][i % 3]))
        rows.append(("g", d, "http://d/score", str((i * 7) % 23)))
    tri = pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    return rd.from_pandas(tri).repartition(5)


def _both(ds, q):
    drv = S.select_text(ds, q)
    dst = S.select_text_distributed(ds, q).to_pandas()
    return drv, dst


def test_multi_aggregate_group_by(rich_ds):
    q = Q + """
        SELECT ?s (COUNT(*) AS ?n) (SUM(?v) AS ?tot) (AVG(?v) AS ?mean)
               (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
        WHERE { ?d ex:source ?s . ?d ex:score ?v } GROUP BY ?s ORDER BY ?s
    """
    drv, dst = _both(rich_ds, q)
    assert list(dst.columns) == ["s", "n", "tot", "mean", "lo", "hi"]
    # documented divergence: distributed SUM is float64, driver int64
    drv["tot"] = drv["tot"].astype("float64")
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_count_distinct_and_having(rich_ds):
    q = Q + """
        SELECT ?s (COUNT(DISTINCT ?l) AS ?nl) WHERE {
            ?d ex:source ?s . ?d ex:lang ?l
        } GROUP BY ?s HAVING (COUNT(DISTINCT ?l) >= 3) ORDER BY ?s
    """
    drv, dst = _both(rich_ds, q)
    assert len(drv) > 0                  # the fixture has 3 langs/source
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_having_on_alias(rich_ds):
    q = Q + """
        SELECT ?l (COUNT(?d) AS ?n) WHERE { ?d ex:lang ?l }
        GROUP BY ?l HAVING (?n > 19) ORDER BY ?l
    """
    drv, dst = _both(rich_ds, q)
    assert len(drv) == 3                 # 20 docs per lang
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_group_concat_sorted(rich_ds):
    q = Q + """
        SELECT ?l (GROUP_CONCAT(DISTINCT ?s; SEPARATOR=",") AS ?srcs)
        WHERE { ?d ex:source ?s . ?d ex:lang ?l } GROUP BY ?l ORDER BY ?l
    """
    drv, dst = _both(rich_ds, q)
    # distributed GROUP_CONCAT pins codepoint order; sort the driver's
    drv["srcs"] = drv["srcs"].map(lambda v: ",".join(sorted(v.split(","))))
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_sample_is_codepoint_min(rich_ds):
    q = Q + """
        SELECT ?s (SAMPLE(?d) AS ?one) WHERE { ?d ex:source ?s }
        GROUP BY ?s ORDER BY ?s
    """
    dst = S.select_text_distributed(rich_ds, q).to_pandas()
    # doc ids are zero-padded so codepoint min == numeric min
    assert dst["one"].tolist() == [f"http://d/doc{i:02d}" for i in range(4)]


def test_global_aggregate_distributed(rich_ds):
    q = Q + "SELECT (COUNT(*) AS ?n) (MAX(?v) AS ?hi) WHERE { ?d ex:score ?v }"
    drv, dst = _both(rich_ds, q)
    assert dst.shape == (1, 2)
    assert int(dst.n.iloc[0]) == int(drv.n.iloc[0]) == 60
    assert float(dst.hi.iloc[0]) == float(drv.hi.iloc[0])


def test_min_max_string_fallback(ray_session):
    """Non-numeric values: the driver falls back to codepoint order —
    the distributed merge must make the same all-numeric decision from
    its partial counters."""
    import ray.data as rd

    tri = pd.DataFrame(
        [("g", f"http://d/{i}", "http://d/tag", t)
         for i, t in enumerate(["beta", "alpha", "9", "10"])],
        columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    ds = rd.from_pandas(tri).repartition(2)
    q = Q + "SELECT (MIN(?t) AS ?lo) (MAX(?t) AS ?hi) WHERE { ?d ex:tag ?t }"
    drv = S.select_text(ds, q)
    dst = S.select_text_distributed(ds, q).to_pandas()
    assert drv.lo.iloc[0] == dst.lo.iloc[0] == "10"   # string order
    assert drv.hi.iloc[0] == dst.hi.iloc[0] == "beta"


def test_bare_group_by(rich_ds):
    q = Q + "SELECT ?l WHERE { ?d ex:lang ?l } GROUP BY ?l ORDER BY ?l"
    drv, dst = _both(rich_ds, q)
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_order_by_desc_limit(rich_ds):
    q = Q + """
        SELECT ?s (COUNT(*) AS ?n) WHERE { ?d ex:source ?s }
        GROUP BY ?s ORDER BY DESC(?s) LIMIT 2
    """
    drv, dst = _both(rich_ds, q)
    assert dst.s.tolist() == ["s3", "s2"]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_offset_with_limit(rich_ds):
    q = Q + """
        SELECT DISTINCT ?d WHERE { ?d ex:lang "en" }
        ORDER BY ?d LIMIT 5 OFFSET 3
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 5
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_offset_without_limit_distributed(rich_ds):
    """OFFSET with no LIMIT now runs distributed (split_at_indices skip
    — round 5): full parity with the driver path, no driver-side
    materialization of the unbounded tail."""
    q = (Q + "SELECT ?d WHERE { ?d ex:lang ?l } ORDER BY ?d OFFSET 53")
    drv = S.select_text(rich_ds, q)
    dst = S.select_text_distributed(rich_ds, q).to_pandas()
    pd.testing.assert_frame_equal(drv.reset_index(drop=True),
                                  dst.reset_index(drop=True))
    assert len(dst) == 7


def test_optional_string_routes_distributed(rich_ds):
    """OPTIONAL in the string front-end now runs on the Dataset path
    (select_optional_distributed): docs keep their row when the optional
    score is absent. Fixture: every doc has a score, so drop a pattern
    that only some docs match via a filtered optional-side var."""
    q = Q + """
        SELECT ?d ?s ?l WHERE {
            ?d ex:source ?s .
            OPTIONAL { ?d ex:lang ?l }
        } ORDER BY ?d LIMIT 10
    """
    drv, dst = _both(rich_ds, q)
    assert list(dst.columns) == ["d", "s", "l"]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_optional_unmatched_rows_survive(ray_session):
    """Rows without the optional triple come back with None, matching
    the driver path exactly."""
    import ray.data as rd

    tri = pd.DataFrame(
        [("g", "http://d/a", "http://d/source", "s0"),
         ("g", "http://d/b", "http://d/source", "s1"),
         ("g", "http://d/a", "http://d/lang", "en")],
        columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    ds = rd.from_pandas(tri).repartition(2)
    q = Q + """
        SELECT ?d ?l WHERE {
            ?d ex:source ?s . OPTIONAL { ?d ex:lang ?l }
        } ORDER BY ?d
    """
    drv = S.select_text(ds, q)
    dst = S.select_text_distributed(ds, q).to_pandas()
    assert dst.l.tolist() == ["en", None]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_union_string_routes_distributed(rich_ds):
    q = Q + """
        SELECT ?d WHERE {
            { ?d ex:lang "en" } UNION { ?d ex:lang "de" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 40                # 20 en + 20 de
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_union_with_aggregate_distributed(rich_ds):
    """Bag semantics through the aggregate: both branches match the same
    rows, so every doc counts twice."""
    q = Q + """
        SELECT ?l (COUNT(*) AS ?n) WHERE {
            { ?d ex:lang ?l } UNION { ?d ex:lang ?l }
        } GROUP BY ?l ORDER BY ?l
    """
    drv, dst = _both(rich_ds, q)
    assert dst.n.tolist() == [40, 40, 40]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_union_heterogeneous_branches_distributed_parity(rich_ds):
    # branches binding DIFFERENT variable sets: absent vars unbound (§5.4)
    q = Q + """
        SELECT ?d ?x WHERE {
            { ?d ex:lang "en" } UNION { ?d ex:score ?x }
        }
    """
    drv, dst = _both(rich_ds, q)
    assert set(dst.columns) == {"d", "x"}
    assert dst["x"].isna().sum() == 20          # 20 en docs, x unbound
    key = lambda f: f.fillna("\0").sort_values(["d", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(drv), key(dst), check_dtype=False)


def test_union_mixed_with_patterns_distributed_parity(rich_ds):
    q = Q + """
        SELECT ?d ?s WHERE {
            ?d ex:source ?s .
            { ?d ex:lang "en" } UNION { ?d ex:lang "de" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 40                       # 20 en + 20 de docs
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_union_with_optional_distributed_parity(rich_ds):
    q = Q + """
        SELECT ?d ?v WHERE {
            { ?d ex:lang "en" } UNION { ?d ex:lang "de" }
            OPTIONAL { ?d ex:score ?v }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 40
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_cross_product_bgp_distributed_parity(rich_ds):
    # disconnected BGP: legal SPARQL — guarded small-side broadcast
    q = Q + """
        SELECT ?a ?b WHERE {
            ?a ex:lang "fr" .
            ?b ex:source "s0" .
        } ORDER BY ?a ?b
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 20 * 15                  # 20 fr docs × 15 s0 docs
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_values_distributed_parity(rich_ds):
    q = Q + """
        SELECT ?d ?l WHERE {
            ?d ex:lang ?l . VALUES ?l { "en" "fr" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert set(dst.l) == {"en", "fr"} and len(dst) == 40
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_values_unbound_compatibility_distributed(ray_session):
    """§10.2: a solution with the shared var UNBOUND (from OPTIONAL) is
    compatible with every VALUES row — parity with the driver."""
    import ray.data as rd

    tri = pd.DataFrame(
        [("g", "http://d/a", "http://d/source", "s0"),
         ("g", "http://d/b", "http://d/source", "s1"),
         ("g", "http://d/a", "http://d/lang", "en")],
        columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = True
    tri["obj_dtype"] = "xsd:string"
    ds = rd.from_pandas(tri).repartition(2)
    q = Q + """
        SELECT ?d ?l WHERE {
            ?d ex:source ?s . OPTIONAL { ?d ex:lang ?l }
            VALUES ?l { "en" "de" }
        } ORDER BY ?d ?l
    """
    drv = S.select_text(ds, q)
    dst = S.select_text_distributed(ds, q).to_pandas() \
        .sort_values(["d", "l"]).reset_index(drop=True)
    # doc b (unbound l) matched BOTH values rows; doc a only "en"
    assert dst.l.tolist() == ["en", "de", "en"]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst, check_dtype=False)


def test_exists_distributed_parity(rich_ds):
    q = Q + """
        SELECT ?d ?s WHERE {
            ?d ex:source ?s . FILTER EXISTS { ?d ex:lang "en" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 20
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_not_exists_distributed_parity(rich_ds):
    q = Q + """
        SELECT ?d WHERE {
            ?d ex:source "s0" . FILTER NOT EXISTS { ?d ex:lang "en" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    assert 0 < len(dst) < 15
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_minus_distributed_parity_and_disjoint_noop(rich_ds):
    q = Q + """
        SELECT ?d WHERE {
            ?d ex:source "s1" . MINUS { ?d ex:lang "de" }
        } ORDER BY ?d
    """
    drv, dst = _both(rich_ds, q)
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)
    # §8.3 divergence: MINUS with no shared var removes nothing,
    # NOT EXISTS with the same inner group removes everything
    q_disjoint = Q + """
        SELECT ?d WHERE { ?d ex:source "s1" . MINUS { ?x ex:lang "de" } }
    """
    drv2, dst2 = _both(rich_ds, q_disjoint)
    assert len(dst2) == len(drv2) == 15
    q_ne = Q + """
        SELECT ?d WHERE {
            ?d ex:source "s1" . FILTER NOT EXISTS { ?x ex:lang "de" }
        }
    """
    drv3, dst3 = _both(rich_ds, q_ne)
    assert len(dst3) == len(drv3) == 0


@pytest.fixture(scope="module")
def quad_ds2(ray_session):
    import ray.data as rd

    rows = []
    for g, docs in [("g1", [("a", "en"), ("b", "de")]),
                    ("g2", [("a", "fr"), ("c", "en")])]:
        for d, lang in docs:
            rows.append({"graph": g, "subj": f"http://d/{d}",
                         "pred": "http://d/lang", "obj": lang,
                         "obj_is_literal": True, "obj_dtype": "xsd:string"})
    return rd.from_pandas(pd.DataFrame(rows)).repartition(2)


def test_graph_bound_name_distributed(quad_ds2):
    q = Q + "SELECT ?d ?l WHERE { GRAPH <g2> { ?d ex:lang ?l } } ORDER BY ?d"
    drv, dst = _both(quad_ds2, q)
    assert dst.d.tolist() == ["http://d/a", "http://d/c"]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_graph_variable_distributed(quad_ds2):
    q = Q + """
        SELECT ?g ?d ?l WHERE { GRAPH ?g { ?d ex:lang ?l } }
        ORDER BY ?g ?d"""
    drv, dst = _both(quad_ds2, q)
    assert dst.g.tolist() == ["g1", "g1", "g2", "g2"]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)
    # same-graph co-occurrence enforced through the bucketed join
    q2 = Q + """
        SELECT ?g WHERE { GRAPH ?g { <http://d/a> ex:lang ?l .
                                     <http://d/b> ex:lang ?m } }"""
    drv2, dst2 = _both(quad_ds2, q2)
    assert dst2.g.tolist() == ["g1"]
    pd.testing.assert_frame_equal(
        drv2.reset_index(drop=True), dst2.reset_index(drop=True),
        check_dtype=False)


def test_graph_joins_outer_patterns_distributed(quad_ds2):
    q = Q + """
        SELECT ?g ?d WHERE {
            ?d ex:lang "en" .
            GRAPH ?g { ?d ex:lang ?any } } ORDER BY ?g ?d"""
    drv, dst = _both(quad_ds2, q)
    assert list(zip(dst.g, dst.d)) == [
        ("g1", "http://d/a"), ("g2", "http://d/a"), ("g2", "http://d/c")]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_graph_with_aggregate_distributed(quad_ds2):
    q = Q + """
        SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?d ex:lang ?l } }
        GROUP BY ?g ORDER BY ?g"""
    drv, dst = _both(quad_ds2, q)
    assert dst.n.tolist() == [2, 2]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


@pytest.fixture(scope="module")
def chain_ds(ray_session):
    """A 6-node parent chain plus a side edge — closure fodder."""
    import ray.data as rd

    rows = [("g", f"http://d/n{i}", "http://d/parent", f"http://d/n{i+1}")
            for i in range(5)]
    rows.append(("g", "http://d/n0", "http://d/label", "root"))
    tri = pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = tri["pred"].eq("http://d/label")
    tri["obj_dtype"] = "xsd:string"
    return rd.from_pandas(tri).repartition(3)


def test_closure_plus_distributed(chain_ds):
    q = Q + """
        SELECT ?a WHERE { ?x ex:label "root" . ?x ex:parent+ ?a }
        ORDER BY ?a
    """
    drv, dst = _both(chain_ds, q)
    assert dst.a.tolist() == [f"http://d/n{i}" for i in range(1, 6)]
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_closure_star_and_opt_distributed(chain_ds):
    for op, lo in (("*", 0), ("?", 0)):
        q = Q + f"""
            SELECT ?a WHERE {{ ?x ex:label "root" . ?x ex:parent{op} ?a }}
            ORDER BY ?a
        """
        drv, dst = _both(chain_ds, q)
        pd.testing.assert_frame_equal(
            drv.reset_index(drop=True), dst.reset_index(drop=True),
            check_dtype=False)
    # ? gives self + one hop; * gives self + all reachable
    q_opt = Q + 'SELECT ?a WHERE { <http://d/n0> ex:parent? ?a } ORDER BY ?a'
    _, dst_opt = _both(chain_ds, q_opt)
    assert dst_opt.a.tolist() == ["http://d/n0", "http://d/n1"]


def test_sequence_path_distributed_drops_hidden(chain_ds):
    q = Q + """
        SELECT * WHERE { ?x ex:parent / ex:parent ?gp } ORDER BY ?x
    """
    drv, dst = _both(chain_ds, q)
    assert sorted(dst.columns) == ["gp", "x"]      # no __pp leak
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_subselect_distributed(rich_ds):
    q = Q + """
        SELECT ?d ?s WHERE {
            ?d ex:source ?s .
            { SELECT ?s WHERE { ?x ex:source ?s . ?x ex:lang "en" }
              GROUP BY ?s HAVING (COUNT(*) > 4) }
        } ORDER BY ?d LIMIT 8
    """
    drv, dst = _both(rich_ds, q)
    assert len(dst) == 8
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dst.reset_index(drop=True),
        check_dtype=False)


def test_construct_text_distributed_parity(rich_ds):
    q = Q + """
        CONSTRUCT { ?d ex:tongue ?l . ?d ex:from ?s }
        WHERE { ?d ex:lang ?l . ?d ex:source ?s . FILTER (?l != "fr") }
    """
    drv = S.construct_text(rich_ds, q)
    dst = S.construct_text_distributed(rich_ds, q).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        drv.sort_values(key).reset_index(drop=True),
        dst.sort_values(key).reset_index(drop=True), check_dtype=False)


def test_construct_text_distributed_with_optional(rich_ds):
    """The distributed string CONSTRUCT rides the full distributed WHERE
    machinery — OPTIONAL included (unbound template rows drop, §16.2)."""
    q = Q + """
        CONSTRUCT { ?d ex:tongue ?l }
        WHERE { ?d ex:source "s0" . OPTIONAL { ?d ex:lang ?l } }
    """
    drv = S.construct_text(rich_ds, q)
    dst = S.construct_text_distributed(rich_ds, q).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        drv.sort_values(key).reset_index(drop=True),
        dst.sort_values(key).reset_index(drop=True), check_dtype=False)


def test_ask_text_distributed(rich_ds):
    assert S.ask_text_distributed(
        rich_ds, Q + 'ASK { ?d ex:lang "en" }') is True
    assert S.ask_text_distributed(
        rich_ds, Q + 'ASK { ?d ex:lang "zz" }') is False
    # parity with the driver form on a FILTERed pattern
    q = Q + 'ASK { ?d ex:score ?v . FILTER (?v > "90") }'
    assert S.ask_text_distributed(rich_ds, q) == S.ask_text(rich_ds, q)


def test_describe_text_distributed_parity(rich_ds):
    """Both DESCRIBE forms answer identically to the driver twin."""
    q_var = Q + 'DESCRIBE ?d WHERE { ?d ex:lang "fr" . ?d ex:source "s1" }'
    drv = S.describe_text(rich_ds, q_var)
    dst = S.describe_text_distributed(rich_ds, q_var).to_pandas()
    key = ["graph", "subj", "pred", "obj"]
    assert len(drv) > 0
    pd.testing.assert_frame_equal(
        drv.sort_values(key).reset_index(drop=True),
        dst[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)
    q_uri = Q + "DESCRIBE <http://d/doc03>"
    drv2 = S.describe_text(rich_ds, q_uri)
    dst2 = S.describe_text_distributed(rich_ds, q_uri).to_pandas()
    assert len(dst2) == 3                 # source + lang + score triples
    pd.testing.assert_frame_equal(
        drv2.sort_values(key).reset_index(drop=True),
        dst2[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)


def test_kg_sparql_activity_stats_end_to_end(ray_session):
    """The flagship KG feeds the distributed SPARQL front-end directly:
    20 graphs, every count positive, and the per-graph totals agree
    with a driver-path evaluation of the same query."""
    from gitprov_ray import queries

    out = queries.QUERIES["kg_sparql_activity_stats"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(out) == 20
    assert (out.n_used > 0).all()
    assert out.g.is_monotonic_increasing


def test_order_by_expression_both_paths(rich_ds):
    """ORDER BY over a §17 expression (round 5): ASC/DESC(expr) and a
    bare function term sort via hidden key columns; numeric arithmetic
    keys order numerically even though bindings are strings."""
    q = Q + """
        SELECT ?d ?v WHERE { ?d ex:score ?v }
        ORDER BY DESC(?v + 0) ?d LIMIT 10
    """
    drv = S.select_text(rich_ds, q)
    dst = S.select_text_distributed(rich_ds, q).to_pandas()
    assert list(drv.columns) == ["d", "v"]
    # numeric ordering: the top value is the max score (22), not the
    # lexically-largest string ("9...")
    assert int(drv["v"].iloc[0]) == 22
    pd.testing.assert_frame_equal(drv.reset_index(drop=True),
                                  dst.reset_index(drop=True))
    # bare expression term (STRLEN) with var tiebreak
    q2 = Q + """
        SELECT ?d ?s WHERE { ?d ex:source ?s }
        ORDER BY STRLEN(?s) ?s ?d LIMIT 12
    """
    drv2 = S.select_text(rich_ds, q2)
    dst2 = S.select_text_distributed(rich_ds, q2).to_pandas()
    pd.testing.assert_frame_equal(drv2.reset_index(drop=True),
                                  dst2.reset_index(drop=True))
    assert "__ord0" not in dst2.columns


def test_numeric_typed_literal_comparison(rich_ds):
    """§17 operator dispatch: when both comparison sides are entirely
    numeric lexical forms, compare numerically — ?v > "9" must match
    scores 10..22, not strings lexically above "9"."""
    q = Q + 'SELECT ?d ?v WHERE { ?d ex:score ?v . FILTER (?v > "9") }'
    drv = S.select_text(rich_ds, q)
    vals = sorted(int(v) for v in drv["v"].unique())
    assert vals and min(vals) >= 10            # lexical compare would
    assert 10 in vals and 17 in vals           # drop 10..19
    dst = S.select_text_distributed(rich_ds, q).to_pandas()
    assert sorted(dst["v"].astype(int).unique().tolist()) == vals


@pytest.fixture(scope="module")
def hop_chain_ds(ray_session):
    """A 7-node directed chain a0 -> a1 -> ... -> a6 for quantified
    paths."""
    import ray.data as rd

    rows = [("g", f"http://d/a{i}", "http://d/next",
             f"http://d/a{i+1}") for i in range(6)]
    tri = pd.DataFrame(rows, columns=["graph", "subj", "pred", "obj"])
    tri["obj_is_literal"] = False
    tri["obj_dtype"] = ""
    return rd.from_pandas(tri).repartition(3)


def test_path_quantifiers_both_paths(hop_chain_ds):
    """p{n,m} / p{n} / p{n,} / p{,m} (Jena ARQ quantifiers — the
    reference delegates SPARQL to Jena) on driver AND Dataset paths."""
    def pairs(df):
        return sorted(zip(df["s"], df["o"]))

    def both(q):
        drv = S.select_text(hop_chain_ds, q)
        dst = S.select_text_distributed(hop_chain_ds, q).to_pandas()
        assert pairs(drv) == pairs(dst)
        return pairs(drv)

    base = Q.replace("http://d/", "http://d/")
    q = Q + "SELECT ?s ?o WHERE { ?s ex:next{2,3} ?o }"
    got = both(q)
    expect = sorted(
        [(f"http://d/a{i}", f"http://d/a{i+k}")
         for k in (2, 3) for i in range(0, 7 - k)])
    assert got == expect

    # exact count p{2}
    got2 = both(Q + "SELECT ?s ?o WHERE { ?s ex:next{2} ?o }")
    assert got2 == sorted([(f"http://d/a{i}", f"http://d/a{i+2}")
                           for i in range(5)])

    # open upper bound p{3,} == paths of length >= 3
    got3 = both(Q + "SELECT ?s ?o WHERE { ?s ex:next{3,} ?o }")
    assert got3 == sorted([(f"http://d/a{i}", f"http://d/a{j}")
                           for i in range(7) for j in range(i + 3, 7)])

    # p{,2} includes the zero-length component (every term -> itself)
    q4 = Q + "SELECT ?o WHERE { <http://d/a2> ex:next{,2} ?o }"
    drv4 = S.select_text(hop_chain_ds, q4)
    dst4 = S.select_text_distributed(hop_chain_ds, q4).to_pandas()
    want = {"http://d/a2", "http://d/a3", "http://d/a4"}
    assert set(drv4["o"]) == want and set(dst4["o"]) == want

    # degenerate and invalid quantifiers
    got5 = both(Q + "SELECT ?s ?o WHERE { ?s ex:next{1,1} ?o }")
    assert got5 == sorted([(f"http://d/a{i}", f"http://d/a{i+1}")
                           for i in range(6)])
    with pytest.raises(S.SparqlSyntaxError, match="max < min"):
        S.select_text(hop_chain_ds,
                      Q + "SELECT ?s ?o WHERE { ?s ex:next{3,2} ?o }")
