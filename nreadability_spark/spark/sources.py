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
# record-level splits).
#
# Memory envelope per task: binaryFile's compressed content row
# (~1 GB for a CC segment) + O(largest single record + one scan chunk)
# decompressed — NOT the whole ~4-5 GB decompressed segment. Gzip is
# decoded member-at-a-time through zlib.decompressobj with a bounded
# output window, which matches production CC files' per-record-gzip
# layout (one member per record) and still handles whole-file gzip
# without materializing the full plaintext.

import zlib as _zlib

_WARC_CHUNK = 1 << 20  # decompressed scan-window growth per pull


def _iter_warc_chunks(data: bytes, chunk: int = _WARC_CHUNK):
    """Yield decompressed chunks of ``data``. Multi-member gzip is
    decoded member-at-a-time; each ``decompress`` call is capped at
    ``chunk`` output bytes so peak memory never depends on the
    compression ratio. Corrupt/truncated members yield whatever bytes
    decoded cleanly, then stop — never raises."""
    if data[:2] != b"\x1f\x8b":
        for i in range(0, len(data), chunk):
            yield data[i:i + chunk]
        return
    mv = memoryview(data)
    pos, n = 0, len(data)
    while pos < n and bytes(mv[pos:pos + 2]) == b"\x1f\x8b":
        d = _zlib.decompressobj(31)
        tail = mv[pos:]
        try:
            while True:
                out = d.decompress(tail, chunk)
                if out:
                    yield out
                if d.eof:
                    break
                tail = d.unconsumed_tail
                if not tail:
                    break  # member truncated at EOF
        except _zlib.error:
            return  # corrupt member: keep what was already yielded
        if d.eof and d.unused_data:
            pos = n - len(d.unused_data)  # next gzip member
        else:
            return


def _parse_warc_stream(chunks):
    """Incremental WARC/1.0 record parser over an iterator of
    decompressed byte chunks. Buffers at most one record (plus one scan
    chunk) at a time. Never raises on malformed input (corrupt archives
    yield fewer records, not failed tasks): a missing or garbage
    Content-Length resynchronizes on the ``\\r\\n\\r\\nWARC/`` record
    delimiter instead of scanning raw body bytes (so a page ABOUT the
    WARC format can't fabricate records with attacker-controlled
    target-URIs), and the cursor strictly advances so no header shape
    can loop forever."""
    buf = bytearray()
    it = iter(chunks)
    eof = False

    def pull() -> bool:
        nonlocal eof
        if eof:
            return False
        try:
            buf.extend(next(it))
            return True
        except StopIteration:
            eof = True
            return False

    def find_pulling(needle: bytes, start: int) -> int:
        """Find ``needle`` at/after ``start``, pulling chunks as needed;
        -1 at stream end. Resumes each scan near the buffer tail so a
        long record costs O(record), not O(record^2)."""
        lo = start
        while True:
            j = buf.find(needle, lo)
            if j != -1:
                return j
            lo = max(start, len(buf) - len(needle) + 1)
            if not pull():
                return -1

    while True:
        j = find_pulling(b"WARC/", 0)
        if j == -1:
            return
        del buf[:j]  # drop inter-record garbage; record header at 0
        head_end = find_pulling(b"\r\n\r\n", 0)
        if head_end == -1:
            return
        headers = {}
        for line in bytes(buf[:head_end]).split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        body_start = head_end + 4
        try:
            length = int(headers[b"content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError):
            length = None
        if length is not None:
            while len(buf) < body_start + length and pull():
                pass
            body = bytes(buf[body_start:body_start + length])
            consumed = min(body_start + length, len(buf))
        else:
            # unusable Content-Length: resync on the record delimiter
            k = find_pulling(b"\r\n\r\nWARC/", head_end)
            if k == -1:
                body = bytes(buf[body_start:])
                consumed = len(buf)
            else:
                body = bytes(buf[body_start:k])
                consumed = k + 4
        del buf[:max(consumed, 5)]  # strict progress past 'WARC/'
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


def _parse_warc_records(data: bytes):
    """Yield (target_uri, warc_date, html_bytes) for each WARC/1.0
    ``response`` record in ``data`` (gzip-transparent; see
    ``_parse_warc_stream`` for the malformed-input contract and
    ``_iter_warc_chunks`` for the bounded-memory decode)."""
    yield from _parse_warc_stream(_iter_warc_chunks(data))


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
    # seconds) must become null, not kill the ingest job on one record.
    # The trailing 'Z' is passed through to the cast — WARC-Date is
    # always UTC per spec, and try_cast interprets the designator as
    # the UTC offset, so the stored instant is correct on any cluster
    # regardless of spark.sql.session.timeZone (stripping the 'Z' would
    # silently reinterpret every timestamp in local time).
    return pages.select(
        "url",
        F.expr("try_cast(warc_date as timestamp)").alias("warc_ts"),
        "html",
        F.lit("").alias("text"),
        F.lit("").alias("lang"))
