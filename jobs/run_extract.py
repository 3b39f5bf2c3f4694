"""spark-submit entry point for the extraction job.

Cluster:
    spark-submit --py-files nreadability_spark.zip jobs/run_extract.py \
        --input iceberg_catalog.web.pages --output /warehouse/extracted \
        --run-id 2026-08-16-a --partitions 8192

Local smoke:
    python jobs/run_extract.py --input /root/testdata/sf0.001 \
        --synthesize --output /tmp/extract_out --run-id demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages Iceberg table / parquet path, or an sf dir "
                         "with --synthesize")
    ap.add_argument("--output", required=True, help="output directory/table")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="reliable-checkpoint dir for iterative ops "
                         "(sets spark.nreadability.checkpointDir)")
    ap.add_argument("--warc", action="store_true",
                    help="treat --input as a directory/glob of WARC files\n"
                         "(Common Crawl segment layout)")
    ap.add_argument("--synthesize", action="store_true",
                    help="treat --input as a testdata sf dir and synthesize "
                         "the pages table from its documents")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.job import run_job
    from nreadability_spark.spark.sources import read_pages

    extra = {}
    if args.checkpoint_dir:
        extra["spark.nreadability.checkpointDir"] = args.checkpoint_dir
    spark = get_spark("nreadability-extract", master=args.master,
                      extra_conf=extra or None)
    try:
        if args.synthesize:
            from nreadability_spark.spark.pages import synthesize_pages
            pages = synthesize_pages(spark, args.input)
        elif args.warc:
            from nreadability_spark.spark.sources import read_pages_warc
            pages = read_pages_warc(spark, args.input)
        else:
            pages = read_pages(spark, args.input)
        summary = run_job(
            spark, pages, args.output,
            run_id=args.run_id or uuid.uuid4().hex[:12],
            num_partitions=args.partitions,
            resume=not args.no_resume)
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
