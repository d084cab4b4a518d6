"""WARC ingestion: parser, gzip members, error capture, and the full
WARC → pages → validate_corpus chain. WARCs are built in the test with an
independent writer (plain byte assembly per ISO 28500 + stdlib gzip)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from fairtracks_validator_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    warc_to_pages,
)


def make_record(url: str, ts: str, html: bytes, warc_type: str = "response",
                status: int = 200) -> bytes:
    http = (f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n"
            .encode() + html)
    body = http if warc_type == "response" else html
    hdr = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


HTML1 = b"<html><body><h1>Title</h1><p>Hello world page one</p></body></html>"
HTML2 = b"<html><body><p>the cat sat on the mat and it was good</p></body></html>"


def _two_record_warc() -> bytes:
    return (
        make_record("https://a.example.com/1", "2024-01-01T00:00:00Z", HTML1)
        + make_record("https://b.example.com/2", "2024-01-02T12:30:00Z", HTML2)
        + make_record("https://skip.example.com", "2024-01-03T00:00:00Z",
                      b"req", warc_type="request")
    )


def test_iter_warc_records_plain_and_gzip():
    plain = _two_record_warc()
    rows = list(iter_warc_records("f.warc", plain))
    assert [r["url"] for r in rows] == [
        "https://a.example.com/1", "https://b.example.com/2"]
    assert rows[0]["html"] == HTML1 and rows[0]["http_status"] == 200
    assert rows[1]["warc_ts"] == "2024-01-02T12:30:00Z"

    # per-record gzip members (the Common-Crawl layout)
    gz = b"".join(
        gzip.compress(make_record(f"https://g{i}.example.com",
                                  "2024-02-01T00:00:00Z", HTML1))
        for i in range(3)
    )
    rows_gz = list(iter_warc_records("f.warc.gz", gz))
    assert [r["url"] for r in rows_gz] == [
        f"https://g{i}.example.com" for i in range(3)]
    assert all(r["html"] == HTML1 for r in rows_gz)


def test_iter_warc_malformed_captured():
    rows = list(iter_warc_records("bad.warc", b"this is not a warc"))
    assert len(rows) == 1 and rows[0]["url"] is None
    assert "WARC/" in rows[0]["error"]
    # a good record followed by garbage: the good record still parses
    mixed = make_record("https://ok.example.com", "2024-01-01T00:00:00Z",
                        HTML1) + b"WARC/1.0\r\nbroken"
    rows2 = list(iter_warc_records("mixed.warc", mixed))
    assert rows2[0]["url"] == "https://ok.example.com"
    assert rows2[-1]["error"] is not None


def test_read_warc_spark_surface(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(_two_record_warc())
    (d / "b.warc.gz").write_bytes(gzip.compress(make_record(
        "https://c.example.com/3", "2024-03-01T00:00:00Z", HTML2)))
    out = read_warc(spark, str(d)).orderBy("url").collect()
    assert [r["url"] for r in out] == [
        "https://a.example.com/1", "https://b.example.com/2",
        "https://c.example.com/3"]
    assert bytes(out[0]["html"]) == HTML1
    assert all(r["error"] is None for r in out)


def test_warc_to_pages_end_to_end(spark, tmp_path):
    """The full ingest chain: WARC -> pages shape -> schema validation."""
    from fairtracks_validator_spark.plans.schema_compile import compile_schema
    from fairtracks_validator_spark.runner import validate_corpus

    d = tmp_path / "warcs2"
    d.mkdir()
    (d / "a.warc").write_bytes(_two_record_warc())
    pages = warc_to_pages(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://a.example.com/1", "https://b.example.com/2"}
    # extract_text produced readable text; langid sees English stopwords
    assert "Hello world" in rows["https://a.example.com/1"]["text"]
    assert rows["https://b.example.com/2"]["lang"] == "en"
    assert rows["https://a.example.com/1"]["warc_ts"] is not None

    plan = compile_schema({
        "$id": "pages/warc", "required": ["url", "text"],
        "primary_key": ["url"],
        "properties": {"url": {"format": "uri"},
                       "lang": {"enum": ["en", "de", "es", "fr", "und"]}},
    })
    df = pages.withColumn("source", F.col("url")).withColumn(
        "ord", F.xxhash64("url"))
    res = validate_corpus({"pages/warc": (plan, df)})
    assert res.violations.count() == 0
    assert res.verdicts.count() == 2


def test_warc_lf_headers_and_http_content_type():
    """code-review r4: LF-terminated HTTP headers split at the EARLIEST
    boundary even when the body contains CRLFCRLF, and content_type carries
    the page's HTTP media type, not the WARC envelope constant."""
    body = b"<html>line1\r\n\r\nline2</html>"  # CRLFCRLF inside the body
    http = b"HTTP/1.1 200 OK\nContent-Type: text/html; charset=utf-8\n\n" + body
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://lf.example.com\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    rows = list(iter_warc_records("lf.warc", hdr + http + b"\r\n\r\n"))
    assert len(rows) == 1
    assert rows[0]["html"] == body
    assert rows[0]["content_type"] == "text/html; charset=utf-8"
    assert rows[0]["http_status"] == 200


def test_warc_truncated_and_negative_length_are_errors():
    good = make_record("https://ok.example.com", "2024-01-01T00:00:00Z", HTML1)
    # truncated final record: cut the last record short
    cut = good + make_record("https://cut.example.com",
                             "2024-01-01T00:00:00Z", HTML1)[:-40]
    rows = list(iter_warc_records("t.warc", cut))
    assert rows[0]["url"] == "https://ok.example.com"
    assert rows[-1]["error"] is not None and "truncated" in rows[-1]["error"]
    # negative Content-Length: error row, parse does not walk backwards
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://n.example.com\r\n"
           b"Content-Length: -5\r\n\r\nxxxx\r\n\r\n")
    rows2 = list(iter_warc_records("n.warc", bad))
    assert len(rows2) == 1 and "Content-Length" in rows2[0]["error"]


def test_warc_to_pages_skips_non_html(spark, tmp_path):
    """Non-html payloads (images) are excluded before extract_text."""
    jpeg_http = (b"HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n"
                 b"\xff\xd8fakejpegbytes")
    hdr = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://img.example.com/x.jpg\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(jpeg_http)}\r\n\r\n"
    ).encode()
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "m.warc").write_bytes(
        make_record("https://a.example.com/1", "2024-01-01T00:00:00Z", HTML1)
        + hdr + jpeg_http + b"\r\n\r\n"
    )
    urls = {r["url"] for r in warc_to_pages(spark, str(d)).collect()}
    assert urls == {"https://a.example.com/1"}
