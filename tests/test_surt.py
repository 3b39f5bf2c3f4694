"""SURT canonicalization kernel + the WARC/CDX index surface."""

import pytest

from nreadability_spark.readability.surt import canonicalize, surt_key


@pytest.mark.parametrize("url,want", [
    ("https://www.Example.org:443/A/B/../C/?b=2&a=1#frag",
     "org,example)/a/c?a=1&b=2"),
    ("http://example.org", "org,example)/"),
    ("http://example.org/", "org,example)/"),
    ("http://sub.example.org/x/", "org,example,sub)/x"),
    ("http://example.org:8080/x", "org,example:8080)/x"),
    ("http://user:pw@example.org/x", "org,example)/x"),
    # unreserved escapes decode; reserved ones keep UPPERCASE hex
    ("http://example.org/%7Euser/%2Fesc", "org,example)/~user/%2Fesc"),
    ("http://10.1.2.3/x", "10.1.2.3)/x"),          # IPs stay in order
    ("http://example.org/a/./b/../c", "org,example)/a/c"),
    ("HTTP://EXAMPLE.ORG/Q?", "org,example)/q"),    # empty query drops
    ("http://example.org:80/x", "org,example)/x"),  # default port drops
    ("not a url at all", ")not a url at all"),
    ("", ")"),
])
def test_surt_key(url, want):
    assert surt_key(url) == want


def test_same_resource_same_key():
    """Equivalent spellings of one resource must collide."""
    variants = [
        "http://www.example.org/a/b?x=1&y=2",
        "https://example.org:443/a/b/?y=2&x=1",
        "http://Example.ORG/a/%62?x=1&y=2",   # %62 = 'b' (unreserved)
        "http://example.org/a/c/../b?y=2&x=1",
    ]
    keys = {surt_key(u) for u in variants}
    assert keys == {"org,example)/a/b?x=1&y=2"}


def test_subdomains_sort_adjacent():
    ks = sorted(surt_key(u) for u in [
        "http://a.example.org/", "http://example.org/zz",
        "http://b.example.org/", "http://example.com/",
        "http://examplf.org/"])
    # every example.org key (incl. subdomains) is contiguous
    org_keys = [k for k in ks if k.startswith("org,example")]
    lo = ks.index(org_keys[0])
    assert ks[lo:lo + len(org_keys)] == org_keys


def test_canonicalize_never_raises_fuzz():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=128))
    def run(url):
        host, path, query = canonicalize(url)
        assert isinstance(surt_key(url), str)
    run()


def test_warc_indexed_records_locate_members():
    """Per-record-gzip archives: each record's (offset, length) must
    point exactly at its own gzip member, independently decodable."""
    import gzip
    from nreadability_spark.spark.sources import (_iter_warc_records_indexed,
                                                  _parse_warc_records)
    from tests.test_warc_source import _record
    members = [gzip.compress(_record(b"response",
                                     b"https://i.example/%d" % i,
                                     b"<p>doc %d</p>" % i))
               for i in range(4)]
    blob = b"".join(members)
    rows = list(_iter_warc_records_indexed(blob))
    assert [r[2] for r in rows] == ["https://i.example/%d" % i
                                    for i in range(4)]
    off = 0
    for (offset, length, uri, _date, html), member in zip(rows, members):
        assert offset == off and length == len(member)
        # the slice alone decodes to the same record (the CDX contract)
        sliced = list(_parse_warc_records(blob[offset:offset + length]))
        assert sliced == [(uri, _date, html)]
        off += length
    # whole-file-gzip and raw layouts fall back to one whole-file row
    whole = gzip.compress(b"".join(
        _record(b"response", b"https://w.example/%d" % i, b"x")
        for i in range(2)))
    rows2 = list(_iter_warc_records_indexed(whole))
    assert [(r[0], r[1]) for r in rows2] == [(0, len(whole))] * 2
    raw = _record(b"response", b"https://r.example/", b"y")
    rows3 = list(_iter_warc_records_indexed(raw))
    assert rows3[0][0] == 0 and rows3[0][1] == len(raw)
