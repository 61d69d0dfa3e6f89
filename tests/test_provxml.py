"""PROV-XML document writer (the reference's `application/xml` document
format, InteropFramework.ProvFormat.XML at ProvenanceService.java:223-224 —
distinct from RDF/XML) + the text/plain RDFNULL and rdf-thrift fallback
content-type dispatches (JenaUtils.java:25,31)."""

import xml.etree.ElementTree as ET

import pandas as pd
import pytest

PROV = "http://www.w3.org/ns/prov#"


@pytest.fixture(scope="module")
def stmts(tiny_corpus):
    from gitprov_ray import oracle

    _, revisions, contributors = tiny_corpus
    stmts, _ = oracle.build_statements(revisions.to_pylist(),
                                       contributors.to_pylist())
    return stmts


def test_provxml_wellformed_and_complete(stmts):
    from gitprov_ray import serializers

    xml = serializers.to_provxml(stmts)
    root = ET.fromstring(xml)
    assert root.tag == f"{{{PROV}}}document"
    # every statement renders exactly one element
    assert len(list(root)) == len(stmts)
    # determinism
    assert xml == serializers.to_provxml(stmts)


def test_provxml_category_major_order(stmts):
    from gitprov_ray import serializers

    xml = serializers.to_provxml(stmts)
    first_act = xml.index("<prov:activity prov:id=")
    first_agent = xml.index("<prov:agent prov:id=")
    first_assoc = xml.index("<prov:wasAssociatedWith")
    assert first_act < first_agent < first_assoc


def test_provxml_relation_refs_and_time(stmts):
    from gitprov_ray import serializers

    gen = [s for s in stmts if s["stmt_type"] == "wasGeneratedBy"][0]
    xml = serializers.to_provxml([gen])
    root = ET.fromstring(xml)
    el = root.find(f"{{{PROV}}}wasGeneratedBy")
    ent = el.find(f"{{{PROV}}}entity")
    act = el.find(f"{{{PROV}}}activity")
    assert ent.get(f"{{{PROV}}}ref").endswith(gen["subj"])
    assert act.get(f"{{{PROV}}}ref").endswith(gen["obj"])
    assert el.find(f"{{{PROV}}}time").text == gen["t"].isoformat()


def test_provxml_derivation_cites_activity_and_qnames(stmts):
    from gitprov_ray import serializers

    der = [s for s in stmts if s["stmt_type"] == "wasDerivedFrom"][0]
    xml = serializers.to_provxml([der])
    root = ET.fromstring(xml)
    el = root.find(f"{{{PROV}}}wasDerivedFrom")
    assert el.find(f"{{{PROV}}}generatedEntity") is not None
    assert el.find(f"{{{PROV}}}usedEntity") is not None
    assert el.find(f"{{{PROV}}}activity") is not None
    # @uri citation attrs render as xsd:QName-typed elements
    assert 'xsi:type="xsd:QName"' in xml


def test_provxml_multi_graph_namespaces(stmts):
    from gitprov_ray import serializers

    graphs = sorted({s["graph"] for s in stmts})
    assert len(graphs) > 1
    xml = serializers.to_provxml(stmts)
    assert 'xmlns:gitprov="' in xml and 'xmlns:gitprov2="' in xml
    ET.fromstring(xml)  # all prefixes declared


def test_content_type_dispatch_provxml_vs_rdfxml():
    from gitprov_ray import serializers

    # application/xml is statement-level PROV-XML → triple-level serialize
    # raises (like provn); application/rdf+xml stays triple-level RDF/XML
    df = pd.DataFrame({"graph": ["g"], "subj": ["http://x/s"],
                       "pred": ["http://x/p"], "obj": ["o"],
                       "obj_is_literal": [True], "obj_dtype": ["xsd:string"]})
    with pytest.raises(ValueError):
        serializers.serialize(df, "application/xml")
    assert serializers.serialize(df, "application/rdf+xml").startswith("<rdf:RDF")


def test_text_plain_is_empty_body():
    from gitprov_ray import serializers

    df = pd.DataFrame({"graph": ["g"], "subj": ["http://x/s"],
                       "pred": ["http://x/p"], "obj": ["o"],
                       "obj_is_literal": [True], "obj_dtype": ["xsd:string"]})
    assert serializers.serialize(df, "text/plain") == ""


def test_rdf_thrift_falls_back_to_ntriples():
    from gitprov_ray import serializers

    df = pd.DataFrame({"graph": ["g"], "subj": ["http://x/s"],
                       "pred": ["http://x/p"], "obj": ["o"],
                       "obj_is_literal": [True], "obj_dtype": ["xsd:string"]})
    assert serializers.serialize(df, "application/sparql-results+thrift") \
        == serializers.serialize(df, "application/n-triples")
