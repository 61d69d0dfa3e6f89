"""PDF text extraction: writer/extractor roundtrips, escape and
encoding handling, page-tree walk, stream-extent robustness."""

import numpy as np
import pandas as pd
import pytest

from gitprov_ray import pdfextract as X


def test_singlepage_roundtrip_with_escapes():
    t = "hello (world) \\ back\n\nsecond paragraph.\ntabs\tstay"
    b = X.encode_pdf_text([t])
    assert X.is_pdf(b)
    assert X.extract_pdf_text(b) == t


def test_multipage_roundtrip_and_probe():
    pages = ["page one line a\nline b", "page two", "third\npage"]
    b = X.encode_pdf_text(pages)
    assert X.extract_pdf_text(b) == "\n".join(pages)
    p = X.probe_pdf(b)
    assert p["pages"] == 3 and not p["encrypted"]
    assert p["width"] == 612.0 and p["height"] == 792.0
    assert p["version"] == "1.4"


def test_utf16_bom_strings_uncompressed_and_compressed():
    t = "café — emoji \U0001F600 end"
    assert X.extract_pdf_text(X.encode_pdf_text([t], compress=False)) == t
    assert X.extract_pdf_text(X.encode_pdf_text([t])) == t


def test_hex_strings_and_tj_array():
    raw = (b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n"
           b"BT <48656C6C6F> Tj [( wor) -120 (ld)] TJ ET\nendstream\n"
           b"endobj\n%%EOF")
    assert X.extract_pdf_text(raw) == "Hello world"


def test_quote_ops_start_new_lines():
    raw = (b"%PDF-1.4\n1 0 obj\n<< >>\nstream\n"
           b"BT (a) Tj (b) ' (c) \" ET\nendstream\nendobj\n%%EOF")
    assert X.extract_pdf_text(raw) == "a\nb\nc"


def test_stream_extent_survives_endstream_bytes_in_data():
    """Compressed payloads can contain 'endstream'/'endobj' byte runs;
    the /Length field must win over byte scanning."""
    rng = np.random.RandomState(0)
    # craft texts until one compresses to bytes containing 'end' marks
    for n in range(200):
        t = " ".join(rng.choice(list("abcdefgh endstream endobj"), 400))
        b = X.encode_pdf_text([t])
        assert X.extract_pdf_text(b) == t


def test_provviz_pdf_extracts_labels():
    from gitprov_ray import provviz

    tri = pd.DataFrame({
        "subj": ["urn:a"], "pred": ["http://www.w3.org/ns/prov#used"],
        "obj": ["urn:b"], "obj_is_literal": [False],
        "obj_dtype": [""], "graph": ["g"]})
    txt = X.extract_pdf_text(provviz.to_pdf(tri))
    assert "used" in txt and "a" in txt


def test_encrypted_raises_and_garbage_rejected():
    b = X.encode_pdf_text(["x"]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError):
        X.extract_pdf_text(b)
    with pytest.raises(ValueError):
        X.extract_pdf_text(b"not a pdf")
    assert not X.is_pdf(b"%PDX-1.4")


def test_empty_and_blank_lines():
    assert X.extract_pdf_text(X.encode_pdf_text([""])) == ""
    t = "a\n\n\nb"
    assert X.extract_pdf_text(X.encode_pdf_text([t])) == t
