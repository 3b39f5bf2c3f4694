"""spark-submit maintenance job: compact a parquet dataset's small files.

Long-running ingest (streaming sinks, per-batch appends, run_id
partitions) accretes files far below the efficient scan size; at
100 TB the resulting open/seek overhead and tiny row groups dominate
read cost. This job rewrites a dataset to approximately
``--target-mb``-sized files, preserving content exactly (row-count and
content-hash verified before the swap is reported) and optionally
clustering by a key column so downstream equi-scans prune row groups.

    python jobs/compact.py --input /sink/pages --output /sink/pages_v2 \
        --target-mb 256 [--cluster-by url]

Idempotent: writes to --output (never in place); the caller swaps
directories/table locations after the printed verification.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def dataset_stats(spark, path: str) -> dict:
    """(files, bytes, rows) of a parquet dataset — the before/after
    evidence; file listing runs driver-side on the input catalog, the
    row count and content hash distributed."""
    files = []
    for dirpath, _dirs, names in os.walk(path):
        files.extend(os.path.join(dirpath, n) for n in names
                     if n.endswith(".parquet"))
    total = sum(os.path.getsize(f) for f in files)
    return {"files": len(files), "bytes": total}


def content_hash(spark, path: str) -> tuple[int, int]:
    """(row_count, order-insensitive content hash): xor-free additive
    hash of per-row xxhash64 over all columns — cheap, distributed, and
    layout-independent, so before/after must match exactly."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(path)
    row = df.agg(
        F.count("*").alias("n"),
        # decimal(38,0) sum: additive over any row order/layout and
        # immune to ANSI bigint overflow at any dataset size
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
              .cast("decimal(38,0)")).alias("h")
    ).collect()[0]
    return row["n"], row["h"]


def compact(spark, in_path: str, out_path: str, target_mb: int = 256,
            cluster_by: str | None = None) -> dict:
    from pyspark.sql import functions as F
    before = dataset_stats(spark, in_path)
    n_files = max(1, round(before["bytes"] / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if cluster_by:
        out = (df.repartitionByRange(n_files, cluster_by)
               .sortWithinPartitions(cluster_by))
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_path)
    n0, h0 = content_hash(spark, in_path)
    n1, h1 = content_hash(spark, out_path)
    after = dataset_stats(spark, out_path)
    return {"before": before, "after": after,
            "target_files": n_files,
            "rows": n1, "content_match": bool(n0 == n1 and h0 == h1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-mb", type=int, default=256)
    ap.add_argument("--cluster-by", default=None)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    from nreadability_spark.spark.session import get_spark
    spark = get_spark("nreadability-compact", master=args.master)
    try:
        print(json.dumps(compact(spark, args.input, args.output,
                                 args.target_mb, args.cluster_by)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
