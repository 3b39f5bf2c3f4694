"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship extraction pipeline over a pages table synthesized
               deterministically from sf0.001 ``documents``.
``queries``  — every implemented operator (SURVEY.md §2 + training-data
               ops); callables take (spark, sf_dir).
``oracle_sql`` — one DuckDB oracle per query (every key in queries()):
               the SQL ops run
               directly against the parquet tables; the kernel queries
               (opaque readability UDF) read parquet materialized from the
               deterministic pure-Python kernel at sf0.01 by
               scripts/gen_oracles.py — regenerate after kernel changes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _extract_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability extraction over the synthesized pages table (stable,
    deterministic output columns; content hashed to keep rows compact)."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages)
    # string nulls coalesced to '' so both engines hash identical values
    return out.select(
        "url", "extracted",
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("next_page_url"), F.lit(""))
        .alias("next_page_url"),
        F.coalesce(F.col("content_text"), F.lit("")).alias("content_text"),
        F.md5(F.coalesce(F.col("content"), F.lit(""))).alias("content_md5"),
        F.length(F.coalesce(F.col("content"), F.lit("")))
        .cast("long").alias("content_len"),
        (F.col("error").isNotNull()).alias("failed"),
    )


def _extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level extraction metrics rollup (parse failures, lengths)."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages)
    return out.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("extracted").cast("long")).alias("extracted"),
        F.sum((F.col("error").isNotNull()).cast("long"))
        .alias("parse_failures"),
        F.sum(F.length(F.coalesce(F.col("content_text"), F.lit(""))))
        .cast("long").alias("total_text_chars"),
        F.max("html_bytes").cast("long").alias("max_doc_bytes"),
    )


def _extract_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serde-narrow extraction (output='fingerprint'): ships md5/len
    instead of the content blobs — the dedup/audit consumer shape."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages, output="fingerprint")
    return out.select(
        "url", "extracted",
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        "content_md5", "content_len",
        F.coalesce(F.col("next_page_url"), F.lit(""))
        .alias("next_page_url"),
        (F.col("error").isNotNull()).alias("failed"),
        "html_bytes")


def _extract_with_transformers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Extraction with the reference's UDF extension hooks active
    (ImageSourceTransformer / AnchorHrefTransformer,
    ReadabilityTranscoder.cs:1716-1729): img srcs rewritten through a
    CDN indirection with origsrc recorded, anchor hrefs kept with
    orighref recorded — run dataset-level through the same mapInArrow
    contract (output='hooked')."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages, output="hooked")
    return out.select(
        "url", "extracted",
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.md5(F.coalesce(F.col("content"), F.lit(""))).alias("content_md5"),
        F.length(F.coalesce(F.col("content"), F.lit("")))
        .cast("long").alias("content_len"),
        (F.col("error").isNotNull()).alias("failed"))


def _extract_next_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-page-link detection results (D1/D2 operators) per url."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages)
    return out.where(F.col("next_page_url").isNotNull()) \
        .select("url", "next_page_url")


def _extract_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph edges: per page, distinct anchor targets resolved with
    the kernel's ResolveElementUrl parity, with occurrence counts — the
    crawl-frontier / host-graph input."""
    from nreadability_spark.spark.job import extract_links
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    return extract_links(spark, pages)


def _stitch_multipage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-page chain discovery (iterative next-page join) + per-chain
    stitching with the same kernel (W1 at dataset scale)."""
    from nreadability_spark.spark.pages import synthesize_chained_pages
    from nreadability_spark.spark.stitch import stitch_multipage
    pages = synthesize_chained_pages(spark, sf_dir)
    out = stitch_multipage(spark, pages)
    return out.select(
        "root_url", "extracted",
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.col("n_pages").cast("long").alias("n_pages"),
        F.md5(F.coalesce(F.col("content"), F.lit(""))).alias("content_md5"))


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode + vectorized feature extraction (stub codec)."""
    from nreadability_spark.spark.multimodal import (extract_features,
                                                     synthesize_media)
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    # feature_q is a scalar string (not array<int>): the driver's pandas
    # canonicalizer can't sort unhashable list cells
    return feats.select(
        "media_id",
        F.coalesce(F.col("kind"), F.lit("")).alias("kind"),
        "ok", "payload_bytes",
        F.coalesce(
            F.expr("concat_ws(',', transform(feature, "
                   "x -> cast(cast(floor(x * 10000) as int) as string)))"),
            F.lit("")).alias("feature_q"))


def _warc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style URL index over the deterministic WARC segments: SURT
    key + UTC capture epoch + the (file, offset, length) triple
    addressing each record's own gzip member."""
    from nreadability_spark.spark.pages import synthesize_warc_dir
    from nreadability_spark.spark.sources import warc_index
    return warc_index(spark, synthesize_warc_dir(sf_dir))


def _robots_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-politeness gate: every corpus url judged against its
    host's deterministic robots.txt (RFC 9309 longest-match semantics,
    wildcard+anchor rules, specific-agent groups, malformed files,
    missing files -> allow) via the pure kernel in Arrow batches."""
    from nreadability_spark.spark.sources import robots_check
    return robots_check(spark, sf_dir)


def _pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF text extraction (the north rule's 'PDF/layout parse' scope
    item): a deterministic real-PDF corpus — three show-operator styles,
    three damage classes (header stub / truncated xref / corrupt stream
    length) — decoded distributed by the pure-Python content-stream
    extractor behind the multimodal codec seam."""
    from nreadability_spark.spark.multimodal import (extract_pdf,
                                                     synthesize_pdfs)
    return extract_pdf(synthesize_pdfs(spark, sf_dir))


def _warc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-crawl ingest: deterministic per-record-gzip WARC segments
    (production Common-Crawl layout, with request/warcinfo records,
    a garbage Content-Length and a missing WARC-Date woven in) read
    distributed via binaryFile + the streaming member-at-a-time parser.
    warc_ts is emitted as a UTC epoch so the value hash is independent
    of either engine's session timezone."""
    from nreadability_spark.spark.pages import synthesize_warc_dir
    from nreadability_spark.spark.sources import read_pages_warc
    warc_dir = synthesize_warc_dir(sf_dir)
    pages = read_pages_warc(spark, warc_dir)
    return pages.select(
        "url",
        F.unix_timestamp("warc_ts").cast("long").alias("warc_epoch"),
        F.md5("html").alias("html_md5"),
        F.length("html").cast("long").alias("html_len"))


def _media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (one-to-many binary explode)."""
    from nreadability_spark.spark.multimodal import (sample_frames,
                                                     synthesize_media)
    media = synthesize_media(spark, sf_dir)
    return sample_frames(media).select(
        "media_id", F.col("frame_no").cast("long").alias("frame_no"),
        F.md5("frame").alias("frame_md5"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _extract_articles(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nreadability_spark.spark.ops import SQL_OPS
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "extract_articles": _extract_articles,
        "extract_fingerprints": _extract_fingerprints,
        "extract_metrics": _extract_metrics,
        "extract_next_pages": _extract_next_pages,
        "extract_with_transformers": _extract_with_transformers,
        "extract_links": _extract_links,
        "stitch_multipage": _stitch_multipage,
        "pdf_extract": _pdf_extract,
        "warc_pages": _warc_pages,
        "robots_check": _robots_check,
        "media_features": _media_features,
        "media_frames": _media_frames,
        # rotated INTO the window for r6 (never driver-checked before)
        "warc_index": _warc_index,
    }
    for name, (fn, _sql) in SQL_OPS.items():
        out[name] = fn
    return out


def _kernel_oracles() -> dict[str, str]:
    """DuckDB oracles for the non-SQL (kernel) queries: the deterministic
    pure-Python kernel's output over the same synthesized sf0.01 inputs,
    materialized to parquet by scripts/gen_oracles.py (regenerate after any
    kernel change). The driver's correctness pass runs at sf=0.01."""
    d = os.path.join(_REPO, "oracles", "sf0.01")
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"kernel oracle parquet dir missing: {d} — the kernel-query "
            "oracles are pinned to the driver's sf0.01 correctness pass "
            "(queries compute over whatever sf_dir is passed, but these "
            "static SQL strings cannot); run scripts/gen_oracles.py to "
            "materialize them")
    full = os.path.join(d, "extract_full.parquet")
    hooked = os.path.join(d, "extract_hooked.parquet")
    links = os.path.join(d, "extract_links.parquet")
    stitch = os.path.join(d, "stitch_multipage.parquet")
    feats = os.path.join(d, "media_features.parquet")
    frames = os.path.join(d, "media_frames.parquet")
    warc = os.path.join(d, "warc_pages.parquet")
    pdfx = os.path.join(d, "pdf_extract.parquet")
    robots = os.path.join(d, "robots_check.parquet")
    return {
        "extract_articles": f"""
            select url, extracted, title, next_page_url, content_text,
                   content_md5, content_len, failed
            from read_parquet('{full}')""",
        "extract_fingerprints": f"""
            select url, extracted, title, content_md5, content_len,
                   next_page_url, failed, html_bytes
            from read_parquet('{full}')""",
        "extract_metrics": f"""
            select count(*) as docs,
                   cast(sum(cast(extracted as bigint)) as bigint)
                     as extracted,
                   cast(sum(cast(failed as bigint)) as bigint)
                     as parse_failures,
                   cast(sum(text_chars) as bigint) as total_text_chars,
                   cast(max(html_bytes) as bigint) as max_doc_bytes
            from read_parquet('{full}')""",
        "extract_next_pages": f"""
            select url, next_page_url from read_parquet('{full}')
            where next_page_url != ''""",
        "extract_with_transformers": f"""
            select url, extracted, title, content_md5, content_len, failed
            from read_parquet('{hooked}')""",
        "extract_links": f"""
            select url, link_url, cast(n as bigint) as n
            from read_parquet('{links}')""",
        "stitch_multipage": f"""
            select root_url, extracted, title, n_pages, content_md5
            from read_parquet('{stitch}')""",
        "media_features": f"""
            select media_id, kind, ok, payload_bytes, feature_q
            from read_parquet('{feats}')""",
        "media_frames": f"""
            select media_id, frame_no, frame_md5
            from read_parquet('{frames}')""",
        "warc_pages": f"""
            select url, warc_epoch, html_md5, html_len
            from read_parquet('{warc}')""",
        "pdf_extract": f"""
            select doc_id, ok, n_pages, text_md5, text_len
            from read_parquet('{pdfx}')""",
        "robots_check": f"""
            select doc_id, url, allowed, delay_ms
            from read_parquet('{robots}')""",
        "warc_index": f"""
            select surt, url, warc_epoch, "file", "offset", "length",
                   html_md5
            from read_parquet('{os.path.join(d, "warc_index.parquet")}')""",
    }


def oracle_sql() -> dict[str, str]:
    from nreadability_spark.spark.ops import SQL_OPS
    out = {name: sql for name, (_fn, sql) in SQL_OPS.items()}
    out.update(_kernel_oracles())
    return out
