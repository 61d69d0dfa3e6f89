"""Id-grammar unit tests — one per SURVEY.md §2.9 emitter row, quirks included."""

from gitprov_ray import idgen


def test_base_entity_name_escape_class():
    # Java regex [/\\. ] → '-' (ProvenanceService.java:538-540)
    assert idgen.base_entity_name("src/main.py") == "file-src-main-py"
    assert idgen.base_entity_name("a\\b.c") == "file-a-b-c"
    assert idgen.base_entity_name("read me.txt") == "file-read-me-txt"
    assert idgen.base_entity_name("README") == "file-README"


def test_specialized_entity_name():
    assert (idgen.specialized_entity_name("src/main.py", "abc")
            == "file-src-main-py_commit-abc")


def test_id_collision_preserved():
    # distinct filenames may normalize to the same id — reference behavior
    assert idgen.base_entity_name("a.b") == idgen.base_entity_name("a b")


def test_agent_id_space_to_dash():
    assert idgen.agent_id("mona lisa") == "mona-lisa"


def test_ncname_escape_illegal_chars():
    e = idgen.escape_ncname("weird:name?x=1")
    assert ":" not in e and "?" not in e and "=" not in e
    # deterministic
    assert e == idgen.escape_ncname("weird:name?x=1")


def test_ncname_leading_digit():
    assert not idgen.escape_ncname("1abc")[0].isdigit()


def test_ncname_non_ascii_passthrough():
    assert idgen.escape_ncname("héllo.txt") == "héllo.txt"


def test_quirk1_dangling_derivation_citations():
    # derivation cites generation-{sha} / usage-{sha}-{parent} WITHOUT the
    # filename — deliberately != generation_id/usage_id (quirk 1)
    assert idgen.derivation_cited_generation_id("s1") == "generation-s1"
    assert idgen.derivation_cited_usage_id("s1", "s0") == "usage-s1-s0"
    assert idgen.generation_id("f.txt", "s1") == "generation-file-f-txt-s1"
    assert idgen.usage_id("f.txt", "s1", "s0") == "usage-file-f-txt-s1-s0"


def test_all_relation_id_grammars():
    assert idgen.activity_id("s") == "commit-s"
    assert idgen.association_id("s") == "association-s"
    assert idgen.invalidation_id("f g", "s") == "invalidation-file-f-g-s"
    assert idgen.derivation_id("f", "s1", "s0") == "derivation-file-f_commit-s1-s0"
    assert idgen.communication_id("p", "s") == "information-p-s"
