"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship extraction pipeline over a pages table synthesized
               deterministically from sf0.001 ``documents``.
``queries``  — every implemented operator (SURVEY.md §2 + training-data
               ops); callables take (spark, sf_dir).
``oracle_sql`` — DuckDB SQL for each SQL-expressible query. Extraction
               queries (opaque readability UDF) get the rows-only check.
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
    return out.select(
        "url", "extracted", "title", "next_page_url", "content_text",
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


def _extract_next_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-page-link detection results (D1/D2 operators) per url."""
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark.pages import synthesize_pages
    pages = synthesize_pages(spark, sf_dir, include_fixtures=False)
    out = run_extraction(spark, pages)
    return out.where(F.col("next_page_url").isNotNull()) \
        .select("url", "next_page_url")


def _stitch_multipage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-page chain discovery (iterative next-page join) + per-chain
    stitching with the same kernel (W1 at dataset scale)."""
    from nreadability_spark.spark.pages import synthesize_chained_pages
    from nreadability_spark.spark.stitch import stitch_multipage
    pages = synthesize_chained_pages(spark, sf_dir)
    out = stitch_multipage(spark, pages)
    return out.select(
        "root_url", "extracted", "title", "n_pages",
        F.md5(F.coalesce(F.col("content"), F.lit(""))).alias("content_md5"))


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media decode + vectorized feature extraction (stub codec)."""
    from nreadability_spark.spark.multimodal import (extract_features,
                                                     synthesize_media)
    media = synthesize_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "media_id", "kind", "ok", "payload_bytes",
        F.expr("transform(feature, x -> cast(floor(x * 10000) as int))")
        .alias("feature_q"))


def _media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (one-to-many binary explode)."""
    from nreadability_spark.spark.multimodal import (sample_frames,
                                                     synthesize_media)
    media = synthesize_media(spark, sf_dir)
    return sample_frames(media).select(
        "media_id", "frame_no", F.md5("frame").alias("frame_md5"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _extract_articles(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nreadability_spark.spark.ops import SQL_OPS
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "extract_articles": _extract_articles,
        "extract_metrics": _extract_metrics,
        "extract_next_pages": _extract_next_pages,
        "stitch_multipage": _stitch_multipage,
        "media_features": _media_features,
        "media_frames": _media_frames,
    }
    for name, (fn, _sql) in SQL_OPS.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    from nreadability_spark.spark.ops import SQL_OPS
    return {name: sql for name, (_fn, sql) in SQL_OPS.items()}
