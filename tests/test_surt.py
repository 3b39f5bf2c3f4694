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


def test_warc_index_write_serving_layout(tmp_path_factory):
    """The materialized index must be globally ordered by
    (surt, warc_epoch) across range-partitioned shards — the binary-
    search serving layout — via ONE RangePartitioning exchange."""
    import os

    import pytest
    pytest.importorskip("pyspark")
    from nreadability_spark.spark.pages import synthesize_warc_dir
    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.sources import (warc_index,
                                                  warc_index_write)
    spark = get_spark("surt-tests", master="local[4]",
                      shuffle_partitions=8)
    try:
        warc_dir = synthesize_warc_dir("/root/testdata/sf0.001")
        out = str(tmp_path_factory.mktemp("cdx_out"))
        warc_index_write(spark, warc_dir, out, n_shards=4)
        import glob
        shards = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        assert 1 < len(shards) <= 4
        # global order: within each shard sorted; shard ranges disjoint
        # and increasing in file order is NOT guaranteed by filename, so
        # assert via min/max ranges being non-overlapping overall
        import pyarrow.parquet as pq
        ranges = []
        total = 0
        for s in shards:
            t = pq.read_table(s, columns=["surt", "warc_epoch"])
            keys = list(zip(t["surt"].to_pylist(),
                            t["warc_epoch"].to_pylist()))
            norm = [(k, -1 if e is None else e) for k, e in keys]
            assert norm == sorted(norm), s  # sorted within shard
            if norm:
                ranges.append((norm[0], norm[-1]))
            total += len(keys)
        ranges.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # disjoint shard ranges = global order
        assert total == warc_index(spark, warc_dir).count()
        # plan shape: rangepartitioning exchange feeds the sort
        plan = (warc_index(spark, warc_dir)
                .repartitionByRange(4, "surt", "warc_epoch")
                ._jdf.queryExecution().executedPlan().toString())
        assert "rangepartitioning" in plan.lower()
    finally:
        spark.stop()


def test_compact_job_rewrites_small_files(tmp_path_factory):
    """jobs/compact.py: a many-tiny-files dataset compacts to the
    target count with byte-exact content (row count + additive content
    hash verified by the job itself)."""
    import os
    import sys

    import pytest
    pytest.importorskip("pyspark")
    sys.path.insert(0, "/root/repo/jobs")
    from compact import compact, dataset_stats
    from nreadability_spark.spark.session import get_spark
    spark = get_spark("compact-tests", master="local[4]",
                      shuffle_partitions=8)
    try:
        src = str(tmp_path_factory.mktemp("frag")) + "/data.parquet"
        (spark.range(0, 20000)
         .selectExpr("id", "md5(cast(id as string)) as payload")
         .repartition(64).write.parquet(src))
        assert dataset_stats(spark, src)["files"] == 64
        dst = str(tmp_path_factory.mktemp("compacted")) + "/data.parquet"
        report = compact(spark, src, dst, target_mb=1)
        assert report["content_match"] is True
        assert report["rows"] == 20000
        assert report["after"]["files"] < 64
        assert report["after"]["files"] == report["target_files"]
        # clustered variant: range-partitioned by key, content intact
        dst2 = str(tmp_path_factory.mktemp("clustered")) + "/data.parquet"
        report2 = compact(spark, src, dst2, target_mb=1,
                          cluster_by="id")
        assert report2["content_match"] is True
    finally:
        spark.stop()


def test_warc_lookup_pushes_key_to_scan(tmp_path_factory):
    """The lookup must reach the shards as a pushed parquet filter (so
    min/max stats skip non-matching shards/row groups), find the record
    under ANY equivalent url spelling, and return captures newest
    first."""
    import os

    import pytest
    pytest.importorskip("pyspark")
    from nreadability_spark.spark.pages import synthesize_warc_dir
    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.sources import (warc_index_write,
                                                  warc_lookup)
    spark = get_spark("surt-lookup-tests", master="local[4]",
                      shuffle_partitions=8)
    try:
        warc_dir = synthesize_warc_dir("/root/testdata/sf0.001")
        out = str(tmp_path_factory.mktemp("cdx_serve"))
        warc_index_write(spark, warc_dir, out, n_shards=4)
        df = warc_lookup(spark, out,
                         "https://host7.example.org/articles/7")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(surt), EqualTo(surt," in plan
        rows = df.collect()
        assert len(rows) == 1
        assert rows[0]["url"] == "https://host7.example.org/articles/7"
        assert rows[0]["length"] > 0
        # equivalent spelling, same record (SURT canonicalization)
        alt = warc_lookup(
            spark, out,
            "HTTP://www.host7.example.org:80/articles/x/../7").collect()
        assert [r["url"] for r in alt] == [rows[0]["url"]]
        # miss -> empty, not error
        assert warc_lookup(spark, out,
                           "https://nohost.example/zzz").count() == 0
    finally:
        spark.stop()


def test_percent_decode_before_lowercase():
    """'%41' (A) and 'A' are the same resource: both must canonicalize
    to 'a' — decoding happens before case folding."""
    assert surt_key("http://example.org/%41") == "org,example)/a"
    assert surt_key("http://example.org/A") == "org,example)/a"
    assert surt_key("http://example.org/%7a%41?K=%42") \
        == "org,example)/za?k=b"
    # kept (reserved) escapes still uppercase their hex
    assert surt_key("http://example.org/%2f%2F") == "org,example)/%2F%2F"


def test_query_slash_after_host():
    """A '/' inside a query attached directly to the host must not be
    mistaken for the path."""
    assert surt_key("http://example.com?a=1/b") == "com,example)/?a=1/b"
    assert surt_key("http://example.com?a=1/b&c=2") \
        == "com,example)/?a=1/b&c=2"
    # and with a path present, first '?' still starts the query
    assert surt_key("http://example.com/p?x=/q/r") \
        == "com,example)/p?x=/q/r"
