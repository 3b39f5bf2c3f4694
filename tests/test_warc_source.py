"""WARC source adapter: raw Common-Crawl-style archives -> pages schema
-> the same extraction pipeline, no staging ETL."""

import gzip
import os

import pytest

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from nreadability_spark.spark.session import get_spark
    s = get_spark("warc-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _record(wtype: bytes, uri: bytes, body: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (b"WARC/1.0\r\nWARC-Type: " + wtype +
            b"\r\nWARC-Target-URI: " + uri +
            b"\r\nWARC-Date: 2024-06-01T08:30:00Z\r\nContent-Length: " +
            str(len(http)).encode() + b"\r\n\r\n")
    return head + http + b"\r\n\r\n"


ARTICLE = (b"<html><head><title>WARC Article</title></head><body>"
           b"<div class='content'>" +
           b"<p>" + b"A long readable paragraph with plenty of words, "
           b"commas, and sentences to score. " * 8 + b"</p>" * 4 +
           b"</div></body></html>")


def _write_warc(path: str, compress: bool) -> None:
    data = (_record(b"response", b"https://warc.example/a", ARTICLE) +
            _record(b"request", b"https://warc.example/a", b"GET /a") +
            _record(b"warcinfo", b"", b"software: test") +
            _record(b"response", b"https://warc.example/b",
                    b"<html><body><p>short</p></body></html>"))
    with open(path, "wb") as f:
        f.write(gzip.compress(data) if compress else data)


@pytest.mark.parametrize("compress", [False, True])
def test_warc_to_pages_schema(spark, tmp_path_factory, compress):
    from nreadability_spark.spark.sources import read_pages_warc
    d = str(tmp_path_factory.mktemp("warc"))
    _write_warc(os.path.join(d, "seg-00000.warc"), compress)
    pages = read_pages_warc(spark, d)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in pages.collect()}
    # only response records survive; request/warcinfo dropped
    assert set(rows) == {"https://warc.example/a", "https://warc.example/b"}
    a = rows["https://warc.example/a"]
    # HTTP envelope stripped: payload starts at the html, timestamp parsed
    assert bytes(a["html"]).startswith(b"<html><head><title>WARC Article")
    assert a["warc_ts"] is not None and a["warc_ts"].year == 2024


def test_warc_feeds_extraction_end_to_end(spark, tmp_path_factory):
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.sources import read_pages_warc
    d = str(tmp_path_factory.mktemp("warc_e2e"))
    _write_warc(os.path.join(d, "seg-00000.warc"), compress=False)
    out = {r["url"]: r
           for r in run_extraction(spark, read_pages_warc(spark, d))
           .collect()}
    a = out["https://warc.example/a"]
    assert a["extracted"] and a["error"] is None
    assert a["title"] == "WARC Article"
    assert "long readable paragraph" in a["content_text"]


def test_warc_parser_fuzz_no_crash():
    """The record parser must never crash on arbitrary bytes, and every
    yielded record must have a non-empty uri (hypothesis fuzz)."""
    from hypothesis import given, settings, strategies as st
    from nreadability_spark.spark.sources import _parse_warc_records

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def run(data):
        for uri, date, html in _parse_warc_records(data):
            assert uri
            assert isinstance(html, bytes)
    run()


def test_warc_parser_malformed_records_no_hang_no_crash():
    """Regression: a negative Content-Length must not loop forever, a
    garbage length must not crash, and a truncated gzip stream must
    degrade to best-effort scanning instead of raising."""
    from nreadability_spark.spark.sources import _parse_warc_records

    neg = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.example/\r\n"
           b"Content-Length: -999\r\n\r\nHTTP/1.1 200 OK\r\n\r\nbody")
    out = list(_parse_warc_records(neg))           # must terminate
    assert all(uri for uri, _d, _h in out)

    garbage = neg.replace(b"-999", b"not-a-number")
    list(_parse_warc_records(garbage))             # must not raise

    assert list(_parse_warc_records(b"\x1f\x8b")) == []
    assert list(_parse_warc_records(b"\x1f\x8b\x08truncated")) == []


def test_warc_date_variants_yield_null_not_error(spark, tmp_path_factory):
    """A missing WARC-Date or a WARC 1.1 fractional-seconds date must
    produce a null/parsed timestamp, never an ANSI DateTimeException
    that kills the ingest job."""
    from nreadability_spark.spark.sources import read_pages_warc
    d = str(tmp_path_factory.mktemp("warc_dates"))
    http = b"HTTP/1.1 200 OK\r\n\r\n<html><p>x</p></html>"

    def rec(headers: bytes) -> bytes:
        head = (b"WARC/1.0\r\nWARC-Type: response\r\n" + headers +
                b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n")
        return head + http + b"\r\n\r\n"

    data = (rec(b"WARC-Target-URI: https://nodate.example/\r\n") +
            rec(b"WARC-Target-URI: https://frac.example/\r\n"
                b"WARC-Date: 2024-06-01T08:30:00.123Z\r\n"))
    with open(os.path.join(d, "seg.warc"), "wb") as f:
        f.write(data)
    rows = {r["url"]: r for r in read_pages_warc(spark, d).collect()}
    assert rows["https://nodate.example/"]["warc_ts"] is None
    frac = rows["https://frac.example/"]["warc_ts"]
    assert frac is not None and frac.microsecond == 123000
