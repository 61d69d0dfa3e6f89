"""WARC/WET ingestion (ISO 28500): record framing, gzip members, HTTP
envelope stripping, and end-to-end WARC -> KG parity with the parquet
pages path."""

import gzip

import pandas as pd
import pyarrow as pa
import pytest

from gitprov_ray import sources

pytestmark = pytest.mark.usefixtures("ray_session")


def _pages_rows():
    import ray.data as rd

    from gitprov_ray.stages.pages import render_pages_from_documents_batch

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").head(30)
    t = render_pages_from_documents_batch(pa.Table.from_pandas(docs))
    return t.to_pylist()


def test_warc_roundtrip_records():
    rows = _pages_rows()
    raw = sources.write_warc_fixture(rows)
    recs = list(sources._warc_records(raw))
    assert len(recs) == len(rows)
    assert all(f["warc-type"] == "response" for f, _ in recs)
    pages = sources._warc_to_pages(raw).to_pylist()
    assert [p["url"] for p in pages] == [r["url"] for r in rows]
    assert [p["html"] for p in pages] == [r["html"] for r in rows]
    # timestamps parse to microsecond timestamps (second precision kept)
    assert pages[0]["warc_ts"] == pd.Timestamp(rows[0]["warc_ts"]).floor("s")


def test_wet_conversion_records():
    rows = [{"url": "https://x.example/a", "warc_ts": None,
             "text": "hello wet world", "html": b""}]
    raw = sources.write_warc_fixture(rows, wet=True)
    pages = sources._warc_to_pages(raw).to_pylist()
    assert pages[0]["text"] == "hello wet world"
    assert pages[0]["html"] == b""


def test_warc_gzip_and_malformed_tail():
    rows = _pages_rows()[:5]
    raw = sources.write_warc_fixture(rows, gz=True)
    assert raw[:2] == b"\x1f\x8b"
    decoded = sources._warc_to_pages(gzip.decompress(raw))
    assert decoded.num_rows == 5
    # truncated record quarantines the tail, keeps the prefix
    plain = sources.write_warc_fixture(rows)
    cut = plain[: len(plain) - 40]
    kept = sources._warc_to_pages(cut).num_rows
    assert 0 < kept < 5 or kept == 4


def test_warc_to_kg_matches_parquet_path(tmp_path):
    from gitprov_ray.pipelines import flagship

    rows = _pages_rows()
    # second-precision timestamps so the WARC date roundtrip is lossless
    for r in rows:
        r["warc_ts"] = pd.Timestamp(r["warc_ts"]).floor("s")
    warc_path = str(tmp_path / "crawl.warc.gz")
    with open(warc_path, "wb") as f:
        f.write(sources.write_warc_fixture(rows, gz=True))
    pq_path = str(tmp_path / "pages.parquet")
    t = pa.Table.from_pylist(rows, schema=__import__(
        "gitprov_ray.schemas", fromlist=["PAGES"]).PAGES)
    import pyarrow.parquet as pq

    pq.write_table(t, pq_path)

    contribs = flagship.contributors_for_sf("/root/testdata/sf0.001")
    via_warc = (flagship.flagship_from_pages_parquet(warc_path, contribs,
                                                     num_buckets=8)
                .to_pandas())
    via_pq = (flagship.flagship_from_pages_parquet(pq_path, contribs,
                                                   num_buckets=8)
              .to_pandas())
    key = ["graph", "subj", "pred", "obj"]
    a = via_warc[key].sort_values(key).reset_index(drop=True)
    b = via_pq[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_xml_dump_to_kg_matches_parquet_path(tmp_path):
    """Wikipedia-dump-shaped XML pages → KG == parquet pages → KG (the
    same parity contract as the WARC path)."""
    from xml.sax.saxutils import escape

    from gitprov_ray.pipelines import flagship

    rows = _pages_rows()[:20]
    for r in rows:
        r["warc_ts"] = pd.Timestamp(r["warc_ts"]).floor("s")
    lines = ["<dump>"]
    for r in rows:
        lines += ["<page>",
                  f"<url>{escape(r['url'])}</url>",
                  f"<warc_ts>{pd.Timestamp(r['warc_ts']).isoformat()}Z"
                  "</warc_ts>",
                  f"<html>{escape(r['html'].decode('utf-8'))}</html>",
                  "</page>"]
    lines.append("</dump>")
    xml_path = str(tmp_path / "pages.xml")
    with open(xml_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    pq_path = str(tmp_path / "pages.parquet")
    t = pa.Table.from_pylist(rows, schema=__import__(
        "gitprov_ray.schemas", fromlist=["PAGES"]).PAGES)
    import pyarrow.parquet as pq

    pq.write_table(t, pq_path)

    contribs = flagship.contributors_for_sf("/root/testdata/sf0.001")
    via_xml = (flagship.flagship_from_pages_parquet(xml_path, contribs,
                                                    num_buckets=8)
               .to_pandas())
    via_pq = (flagship.flagship_from_pages_parquet(pq_path, contribs,
                                                   num_buckets=8)
              .to_pandas())
    key = ["graph", "subj", "pred", "obj"]
    a = via_xml[key].sort_values(key).reset_index(drop=True)
    b = via_pq[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
