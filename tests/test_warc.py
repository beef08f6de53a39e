"""WARC ingestion (curator_spark/warc.py): record framing, gzip
members, embedded-HTTP peeling, corrupt-archive quarantine, the
HTML→text extractor, and the end-to-end documents-shape scan."""

from __future__ import annotations

import gzip

import pytest

from curator_spark.warc import (html_to_text, parse_warc_bytes, read_warc,
                                warc_errors, warc_to_documents)


def rec(wtype: str, block: bytes, uri: str | None = None,
        rid: str = "<urn:uuid:1>", extra: dict | None = None) -> bytes:
    hdrs = [b"WARC/1.0",
            f"WARC-Type: {wtype}".encode(),
            f"WARC-Record-ID: {rid}".encode(),
            b"WARC-Date: 2026-01-01T00:00:00Z",
            f"Content-Length: {len(block)}".encode()]
    if uri:
        hdrs.append(f"WARC-Target-URI: {uri}".encode())
    for k, v in (extra or {}).items():
        hdrs.append(f"{k}: {v}".encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + block + b"\r\n\r\n"


def http_response(body: bytes, status: int = 200,
                  ctype: str = "text/html; charset=utf-8") -> bytes:
    return (f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


HTML = (b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><h1>Hello &amp; Welcome</h1><p>First para.</p>"
        b"<p>Second\npara.</p></body></html>")


def archive_bytes() -> bytes:
    return (rec("warcinfo", b"software: test\r\n")
            + rec("request", b"GET / HTTP/1.1\r\n\r\n",
                  uri="http://example.com/")
            + rec("response", http_response(HTML),
                  uri="http://example.com/", rid="<urn:uuid:2>")
            + rec("response", http_response(b"{}", ctype="application/json"),
                  uri="http://example.com/api", rid="<urn:uuid:3>")
            + rec("response", http_response(b"gone", status=404),
                  uri="http://example.com/x", rid="<urn:uuid:4>"))


# ---------------------------------------------------------------- unit

def test_parse_plain_archive_all_records():
    recs = list(parse_warc_bytes(archive_bytes(), archive="a.warc"))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response"]
    assert all(r["warc_error"] is None for r in recs)
    html = recs[2]
    assert html["http_status"] == 200
    assert "text/html" in html["content_type"]
    assert html["payload"] == HTML  # HTTP headers peeled off
    assert recs[4]["http_status"] == 404


def test_parse_gzip_members():
    # warc.gz = one gzip member per record, concatenated
    gz = b"".join(gzip.compress(r) for r in
                  [rec("warcinfo", b"x"),
                   rec("response", http_response(HTML), uri="http://e.com/")])
    recs = list(parse_warc_bytes(gz))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["payload"] == HTML


def test_truncated_block_quarantines_but_keeps_prior_records():
    good = rec("response", http_response(HTML), uri="http://e.com/")
    bad = good[:len(good) - 40]  # cut mid-block
    recs = list(parse_warc_bytes(good + bad, archive="b.warc"))
    assert recs[0]["warc_error"] is None
    assert recs[1]["warc_error"] is not None
    assert "truncated" in recs[1]["warc_error"]
    assert len(recs) == 2  # scan stops at the corruption


def test_bad_magic_is_an_error_row():
    recs = list(parse_warc_bytes(b"NOT A WARC"))
    assert len(recs) == 1 and "bad magic" in recs[0]["warc_error"]


def test_html_to_text_deterministic_extraction():
    t = html_to_text(HTML.decode())
    assert "var x=1" not in t           # script dropped
    assert "Hello & Welcome" in t       # entity unescaped
    assert "First para." in t and "Second para." in t
    # block tags became line structure
    assert t.index("Hello") < t.index("First para.")
    assert html_to_text(HTML.decode()) == t  # pure function


# --------------------------------------------------------------- spark

@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "crawl-0.warc").write_bytes(archive_bytes())
    gz = b"".join(gzip.compress(r) for r in
                  [rec("response", http_response(b"<p>doc two</p>"),
                       uri="https://other.org/p", rid="<urn:uuid:9>")])
    (d / "crawl-1.warc.gz").write_bytes(gz)
    (d / "crawl-2.warc").write_bytes(b"GARBAGE")
    return str(d)


def test_read_warc_distributed(spark, warc_dir):
    recs = read_warc(spark, warc_dir).toPandas()
    assert len(recs) == 5 + 1 + 1  # archive0 + archive1 + 1 error row
    assert set(recs["warc_type"].dropna()) == {
        "warcinfo", "request", "response"}


def test_warc_to_documents_shape_and_filtering(spark, warc_dir):
    docs = warc_to_documents(spark, warc_dir).toPandas()
    # only the two 200-HTML responses survive
    assert len(docs) == 2
    assert list(docs.columns) == ["doc_id", "text", "lang", "source",
                                  "n_chars"]
    by_src = docs.set_index("source")
    assert "Hello & Welcome" in by_src.loc["example.com", "text"]
    assert by_src.loc["other.org", "text"] == "doc two"
    assert (docs["n_chars"] == docs["text"].str.len()).all()
    assert docs["doc_id"].between(0, 1 << 62).all()
    assert docs["doc_id"].is_unique
    # deterministic ids: a second scan produces the same ids
    again = warc_to_documents(spark, warc_dir).toPandas()
    assert sorted(again["doc_id"]) == sorted(docs["doc_id"])


def test_warc_errors_channel(spark, warc_dir):
    errs = warc_errors(spark, warc_dir).toPandas()
    assert len(errs) == 1
    assert errs["archive"].iloc[0].endswith("crawl-2.warc")
    assert "bad magic" in errs["warc_error"].iloc[0]


def test_warc_documents_feed_downstream_operators(spark, warc_dir):
    """The scan output is a drop-in documents table: the quality-signal
    operator runs over it unchanged."""
    from curator_spark import queries
    docs = warc_to_documents(spark, warc_dir)
    docs.createOrReplaceTempView("warc_docs")
    out = (docs.selectExpr("doc_id", "length(text) as n")
           .filter("n > 0").count())
    assert out == 2


def test_charset_honored_in_extraction(spark, tmp_path):
    """A latin-1 page with a declared charset decodes correctly; the
    same bytes under the default utf-8 would mojibake/replace."""
    body = "<p>café ünd søl</p>".encode("latin-1")
    raw = rec("response",
              http_response(body, ctype="text/html; charset=ISO-8859-1"),
              uri="http://l1.com/")
    d = tmp_path / "cs"
    d.mkdir()
    (d / "a.warc").write_bytes(raw)
    docs = warc_to_documents(spark, str(d)).toPandas()
    assert docs["text"].iloc[0] == "café ünd søl"
