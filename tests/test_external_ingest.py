"""Production-shape ingestion seams (VERDICT r5 task 5): parsing and
gating over CALLER-SUPPLIED payload tables — fetched sitemap blobs ->
parse_sitemaps, fetched robots blobs -> robots_verdicts — plus the
per-host payload-directory readers and the build_corpus wiring that
consumes an external sitemap/robots directory."""

import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from nreadability_spark.spark.session import get_spark
    s = get_spark("external-ingest-tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


def test_parse_sitemaps_external_table(spark):
    """parse_sitemaps takes any (host, xml) table; tolerant of missing
    fields and junk between blocks."""
    from nreadability_spark.spark.ops import parse_sitemaps
    xml_a = ("<?xml version=\"1.0\"?><urlset>"
             "<url><loc>https://a.example.org/p/1</loc>"
             "<lastmod>2026-02-03</lastmod>"
             "<priority>0.7</priority></url>"
             "GARBAGE-BETWEEN-BLOCKS"
             "<url><loc>https://a.example.org/p/2</loc></url>"
             "</urlset>")
    xml_b = "<urlset>not actually closed<url><loc>https://b.example.org/</loc>"
    smaps = spark.createDataFrame(
        [("a.example.org", xml_a), ("b.example.org", xml_b)],
        "host string, xml string")
    rows = {(r["host"], r["loc"]): r
            for r in parse_sitemaps(smaps).collect()}
    # host b's lone <url> block never closes -> no row (block regex
    # requires </url>); host a yields both blocks
    assert set(rows) == {("a.example.org", "https://a.example.org/p/1"),
                         ("a.example.org", "https://a.example.org/p/2")}
    full = rows[("a.example.org", "https://a.example.org/p/1")]
    assert full["lastmod"] == "2026-02-03"
    assert full["priority_milli"] == 700
    bare = rows[("a.example.org", "https://a.example.org/p/2")]
    assert bare["lastmod"] == ""
    assert bare["priority_milli"] is None


def test_sitemap_dir_roundtrip(spark, tmp_path):
    """read_sitemap_dir: <host>.xml files on disk -> (host, xml) ->
    parse_sitemaps, matching the in-memory parse exactly."""
    from nreadability_spark.spark.ops import parse_sitemaps
    from nreadability_spark.spark.sources import read_sitemap_dir
    d = tmp_path / "sitemaps"
    d.mkdir()
    for host, n in [("x.example.org", 3), ("y.example.org", 1)]:
        blocks = "".join(
            f"<url><loc>https://{host}/doc/{i}</loc>"
            f"<priority>0.{i}</priority></url>" for i in range(n))
        (d / f"{host}.xml").write_text(
            f"<?xml version=\"1.0\"?><urlset>{blocks}</urlset>")
    out = parse_sitemaps(read_sitemap_dir(spark, str(d))).collect()
    assert {(r["host"], r["loc"], r["priority_milli"]) for r in out} == {
        ("x.example.org", "https://x.example.org/doc/0", 0),
        ("x.example.org", "https://x.example.org/doc/1", 100),
        ("x.example.org", "https://x.example.org/doc/2", 200),
        ("y.example.org", "https://y.example.org/doc/0", 0)}


def test_robots_verdicts_external_tables(spark):
    """robots_verdicts over caller-supplied pages+robots: passthrough
    columns survive, query strings reach the matcher, unknown hosts
    and null payloads get the REP default."""
    from nreadability_spark.spark.sources import robots_verdicts
    pages = spark.createDataFrame(
        [(1, "https://a.example.org/private/x", "k1"),
         (2, "https://a.example.org/ok", "k2"),
         (3, "https://a.example.org/search?q=1", "k3"),
         (4, "https://unknown.example.org/whatever", "k4"),
         (5, "not a url at all", "k5")],
        "id long, url string, extra string")
    robots = spark.createDataFrame(
        [("a.example.org",
          "User-agent: *\nDisallow: /private/\nDisallow: /search?*\n"
          "Crawl-delay: 2\n")],
        "host string, robots_txt string")
    out = {r["id"]: r for r in
           robots_verdicts(pages, robots, agent="anybot").collect()}
    assert len(out) == 5
    assert out[1]["allowed"] is False
    assert out[2]["allowed"] is True
    assert out[3]["allowed"] is False          # query is part of the path
    assert out[4]["allowed"] is True           # no robots row -> allow
    assert out[4]["delay_ms"] is None
    assert out[5]["allowed"] is True           # unparseable host -> allow
    assert out[1]["delay_ms"] == 2000
    assert out[1]["extra"] == "k1"             # passthrough column intact
    cols = robots_verdicts(pages, robots).columns
    assert cols == ["id", "url", "extra", "allowed", "delay_ms"]


def test_robots_check_is_thin_wrapper(spark):
    """The driver query and the production seam agree row-for-row on
    the synthesized corpus (the refactor changed no verdict)."""
    from pyspark.sql import functions as F
    from nreadability_spark.spark.sources import (robots_check,
                                                  robots_verdicts,
                                                  synthesize_robots)
    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")).select("doc_id")
    pages = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("https://host"),
                 (F.col("doc_id") % 97).cast("string"),
                 F.lit(".example.org/articles/"),
                 F.col("doc_id").cast("string")).alias("url"))
    via_seam = {r["doc_id"]: (r["allowed"], r["delay_ms"]) for r in
                robots_verdicts(pages, synthesize_robots(spark)).collect()}
    via_query = {r["doc_id"]: (r["allowed"], r["delay_ms"]) for r in
                 robots_check(spark, SF_DIR).collect()}
    assert via_seam == via_query


def test_read_robots_dir_gates_build(spark, tmp_path):
    """read_robots_dir payloads drive robots_verdicts end-to-end."""
    from nreadability_spark.spark.sources import (read_robots_dir,
                                                  robots_verdicts)
    d = tmp_path / "robots"
    d.mkdir()
    (d / "a.example.org.txt").write_text(
        "User-agent: *\nDisallow: /no\n")
    (d / "b.example.org.txt").write_text("Disallow: /orphan\n")
    robots = read_robots_dir(spark, str(d))
    got = {r["host"]: r["robots_txt"] for r in robots.collect()}
    assert set(got) == {"a.example.org", "b.example.org"}
    assert "Disallow: /no" in got["a.example.org"]
    pages = spark.createDataFrame(
        [("https://a.example.org/no/1",), ("https://a.example.org/yes",),
         ("https://b.example.org/orphan",)], "url string")
    out = {r["url"]: r["allowed"]
           for r in robots_verdicts(pages, robots).collect()}
    assert out["https://a.example.org/no/1"] is False
    assert out["https://a.example.org/yes"] is True
    # orphan rules (no user-agent line) start an implicit '*' group? No:
    # RFC 9309 ignores rules before any user-agent line -> allowed
    assert out["https://b.example.org/orphan"] is True


def test_build_corpus_external_dirs(spark, tmp_path):
    """build_corpus ingests an external sitemap+robots directory: the
    frontier side output is written and the robots gate filters pages,
    all from files on disk."""
    from build_corpus import build_corpus
    from nreadability_spark.spark.pages import synthesize_pages
    from nreadability_spark.spark.sources import (read_robots_dir,
                                                  read_sitemap_dir)

    smap_dir = tmp_path / "sitemaps"
    smap_dir.mkdir()
    (smap_dir / "seed.example.org.xml").write_text(
        "<?xml version=\"1.0\"?><urlset>"
        "<url><loc>https://seed.example.org/a</loc></url>"
        "<url><loc>https://seed.example.org/b</loc></url></urlset>")

    rob_dir = tmp_path / "robots"
    rob_dir.mkdir()
    # synthesize_pages urls are host<h>.example.org/articles/<doc_id>;
    # block one specific host entirely
    (rob_dir / "host7.example.org.txt").write_text(
        "User-agent: *\nDisallow: /\n")

    pages = synthesize_pages(spark, SF_DIR)
    out = str(tmp_path / "corpus_out")
    s = build_corpus(spark, pages, out,
                     robots=read_robots_dir(spark, str(rob_dir)),
                     sitemaps=read_sitemap_dir(spark, str(smap_dir)))
    assert s["frontier_urls"] == 2
    frontier = spark.read.parquet(
        os.path.join(out, "frontier.parquet")).collect()
    assert {r["loc"] for r in frontier} == {
        "https://seed.example.org/a", "https://seed.example.org/b"}
    # every host7 page was gated out, nothing else was
    n_host7 = pages.where("url like 'https://host7.example.org/%'").count()
    assert n_host7 > 0
    assert s["robots_allowed"] == s["pages"] - n_host7
