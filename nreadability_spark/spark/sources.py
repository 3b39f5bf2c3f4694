"""Input/output adapters: Iceberg tables with parquet fallback.

The production source per BASELINE.json input_hint is an Iceberg table of
pages. This sandbox has no Iceberg runtime jars, so adapters probe for the
catalog and fall back to parquet paths with identical schemas — the only
difference on a real cluster is the session's catalog config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _is_table_ref(ref: str) -> bool:
    return "/" not in ref and not ref.endswith(".parquet")


def read_pages(spark: SparkSession, ref: str) -> DataFrame:
    """``ref`` is an Iceberg table name (catalog.db.table) or a parquet
    path. Column pruning/pushdown applies identically to both."""
    if _is_table_ref(ref):
        try:
            return spark.read.format("iceberg").load(ref)
        except Exception:
            return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_append(df: DataFrame, ref: str) -> None:
    """Idempotent append to an Iceberg table or parquet path."""
    if _is_table_ref(ref):
        try:
            df.writeTo(ref).append()
            return
        except Exception:
            df.write.mode("append").saveAsTable(ref)
            return
    df.write.mode("append").parquet(ref)

# --- WARC (Common Crawl's native format) ----------------------------------------
#
# Minimal WARC/1.0 reader for response records: enough to point the
# engine at raw crawl archives without a staging ETL. Parsing is a pure
# function over bytes (unit-tested directly); distribution is one task
# per WARC file via the binaryFile source — the standard Common-Crawl
# processing grain (segment files are ~1 GB, tens of thousands of files
# per crawl, so file-level parallelism saturates any cluster without
# record-level splits). Whole-file gzip is handled transparently;
# production CC files are per-record-gzip concatenated, which gzip's
# multi-member decoder also accepts.

import gzip as _gzip


def _parse_warc_records(data: bytes):
    """Yield (target_uri, warc_date, html_bytes) for each WARC/1.0
    ``response`` record. The HTTP envelope (status line + headers) is
    stripped so the payload is the raw html body. Never raises on
    malformed input (corrupt archives yield fewer records, not failed
    tasks): truncated/invalid gzip falls back to scanning the raw
    bytes, a negative or garbage Content-Length is clamped to 0, and
    the cursor strictly advances so no header shape can loop forever."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gzip.decompress(data)
        except Exception:
            pass  # truncated/corrupt gzip: scan whatever bytes we have
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"WARC/", i)
        if j == -1:
            break
        head_end = data.find(b"\r\n\r\n", j)
        if head_end == -1:
            break
        headers = {}
        for line in data[j:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = max(int(headers.get(b"content-length", b"0")), 0)
        except ValueError:
            length = 0
        body = data[head_end + 4:head_end + 4 + length]
        i = max(head_end + 4 + length, j + 5)  # always move past 'WARC/'
        if headers.get(b"warc-type") != b"response":
            continue
        uri = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", errors="replace")
        date = headers.get(b"warc-date", b"").decode("ascii",
                                                     errors="replace")
        # payload is an HTTP response: drop its status line + headers
        http_end = body.find(b"\r\n\r\n")
        html = body[http_end + 4:] if http_end != -1 else body
        if uri:
            yield uri, date, html


def read_pages_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read WARC files into the pages schema (url, warc_ts, html, text,
    lang). One Arrow batch pass per file row; the scan parallelizes
    across files (binaryFile), which is the right grain for ~1 GB
    Common-Crawl segments."""
    from pyspark.sql import functions as F

    def explode_warcs(batches):
        import pandas as pd
        for pdf in batches:
            rows = {"url": [], "warc_date": [], "html": []}
            for blob in pdf["content"]:
                for uri, date, html in _parse_warc_records(bytes(blob)):
                    rows["url"].append(uri)
                    rows["warc_date"].append(date)
                    rows["html"].append(html)
            yield pd.DataFrame(rows)

    raw = spark.read.format("binaryFile").load(path_glob).select("content")
    pages = raw.mapInPandas(explode_warcs,
                            "url string, warc_date string, html binary")
    # try_cast, not to_timestamp: under Spark 4's default ANSI mode a
    # missing or non-conforming WARC-Date (WARC 1.1 allows fractional
    # seconds) must become null, not kill the ingest job on one record
    return pages.select(
        "url",
        F.expr("try_cast(replace(warc_date, 'Z', '') as timestamp)")
        .alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("").alias("lang"))
