"""DOM-pruning extractor tests: pinned rules, byte-stability, marker parsing."""

from gitprov_ray import extract, synth


def test_pruning_drops_script_style_nav_footer():
    html = (b"<html><head><script>var x=1;</script><style>.a{}</style></head>"
            b"<body><nav>menu</nav><p>keep me</p><footer>foot</footer></body></html>")
    assert extract.extract_text(html) == "keep me"


def test_whitespace_collapse_and_lines():
    html = b"<body><p>a   b\n c</p><div>d</div></body>"
    assert extract.extract_text(html) == "a b c\nd"


def test_empty_and_boilerplate_only():
    assert extract.extract_text(b"") == ""
    assert extract.extract_text(
        b"<html><head><script>x</script></head><body><nav>n</nav>"
        b"<footer>f</footer></body></html>") == ""


def test_byte_stability_repeated():
    pages, _, _ = synth.gen_corpus(6)
    for h in pages.column("html").to_pylist():
        assert extract.extract_text(h) == extract.extract_text(h)


def test_non_utf8_bytes_pinned_replacement():
    assert extract.extract_text(b"<p>ok \xff\xfe</p>") == "ok ��"


def test_marker_roundtrip_through_renderer():
    snap = {
        "label": "msg & <tag>",
        "author": "mona lisa",
        "author_name": "Mona Lisa",
        "resources": [
            {"name": "docs/read me.txt", "status": "added",
             "additions": 3, "changes": 1, "deletions": 0},
            {"name": "a\\b.c", "status": "modified",
             "additions": 1, "changes": 2, "deletions": 3},
        ],
        "parents": ["aa" * 20, "bb" * 20],
    }
    html = synth.render_html(snap, ["w%d" % i for i in range(10)])
    p = extract.parse_page(html)
    assert p["label"] == "msg & <tag>"
    assert p["author"] == "mona lisa"
    assert p["author_name"] == "Mona Lisa"
    assert p["resources"] == snap["resources"]
    assert p["parents"] == snap["parents"]


def test_null_author_roundtrip():
    snap = {"label": "x", "author": None, "author_name": "User Zero",
            "resources": [], "parents": []}
    p = extract.parse_page(synth.render_html(snap, ["a"]))
    assert p["author"] is None
    assert p["author_name"] == "User Zero"
