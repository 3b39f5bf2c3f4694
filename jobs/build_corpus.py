"""spark-submit entry point for the full training-corpus build.

Chains the engine end-to-end the way a pretraining data pipeline does:

    pages -> readability extraction -> documents staging (+ language ID)
          -> near-dup dedup (MinHash LSH -> connected components ->
             representatives) -> Gopher-style quality filter ->
             deterministic stratified sampling -> sequence packing

Every stage after extraction is one of the oracle-checked operators in
``nreadability_spark.spark.ops``, reused unchanged: the ops' contract is
"a directory containing documents.parquet", so the job simply stages the
extracted corpus in that shape and points the operators at it. Output is
the packed corpus plus a one-line JSON funnel summary (doc counts after
every stage — the numbers a data-pipeline dashboard tracks).

Cluster:
    spark-submit --py-files nreadability_spark.zip jobs/build_corpus.py \
        --input iceberg_catalog.web.pages --output /warehouse/corpus_v1

Local smoke:
    python jobs/build_corpus.py --input /root/testdata/sf0.001 \
        --synthesize --output /tmp/corpus_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_corpus(spark, pages, out_dir: str, robots=None,
                 sitemaps=None) -> dict:
    """Run the full funnel; returns the stage-count summary dict.

    Staged layout under ``out_dir``:
      raw/documents.parquet     extracted text, lang='' (pre language-ID)
      corpus/documents.parquet  + detected lang (the ops' working corpus)
      final/documents.parquet   after dedup ∩ quality ∩ sample
      packed.parquet            (stream, doc_id, n_tokens, bin, bin_offset)
    """
    from pyspark.sql import functions as F
    from nreadability_spark.spark.job import run_extraction
    from nreadability_spark.spark import ops

    summary: dict = {"pages": pages.count()}

    # -1. crawl discovery: parse fetched sitemap blobs into the frontier
    # seed table (next cycle's fetch list) — a side output, not a gate
    # on this cycle's pages
    if sitemaps is not None:
        from nreadability_spark.spark.ops import parse_sitemaps
        frontier = parse_sitemaps(sitemaps)
        frontier.write.mode("overwrite").parquet(
            os.path.join(out_dir, "frontier.parquet"))
        summary["frontier_urls"] = spark.read.parquet(
            os.path.join(out_dir, "frontier.parquet")).count()

    # 0. crawl politeness: gate urls through per-host robots.txt BEFORE
    # any extraction work is spent on them (REP default: hosts without
    # a robots row pass)
    if robots is not None:
        from nreadability_spark.spark.sources import robots_filter
        pages = robots_filter(pages, robots)
        summary["robots_allowed"] = pages.count()

    # 1. extraction (the engine's hot path: pruned scan -> mapInArrow)
    extracted = run_extraction(spark, pages)
    ok = extracted.where(
        F.col("extracted") & F.col("error").isNull()
        & (F.length(F.coalesce(F.col("content_text"), F.lit(""))) > 0))

    # 2. stage as the ops' documents shape. doc_id = abs(xxhash64(url)):
    # stable per run, which is all the downstream ops need (a production
    # pipeline would carry url as the key; 64-bit collisions at 1e12 docs
    # affect ~1e-7 of pairs and only merge their dedup identity).
    raw_dir = os.path.join(out_dir, "raw")
    (ok.select(
        F.abs(F.xxhash64("url")).alias("doc_id"),
        F.col("content_text").alias("text"),
        F.lit("").alias("lang"),
        F.lit("extracted").alias("source"),
        F.length("content_text").cast("long").alias("n_chars"))
     .write.mode("overwrite")
     .parquet(os.path.join(raw_dir, "documents.parquet")))
    summary["extracted"] = spark.read.parquet(
        os.path.join(raw_dir, "documents.parquet")).count()

    # 3. language ID -> the working corpus the quality/sampling ops see
    lang = ops.lang_id(spark, raw_dir).select("doc_id", "detected_lang")
    corpus_dir = os.path.join(out_dir, "corpus")
    (spark.read.parquet(os.path.join(raw_dir, "documents.parquet"))
     .drop("lang")
     .join(lang, "doc_id")
     .withColumnRenamed("detected_lang", "lang")
     .select("doc_id", "text", "lang", "source", "n_chars")
     .write.mode("overwrite")
     .parquet(os.path.join(corpus_dir, "documents.parquet")))

    # 4. the funnel: near-dup representatives ∩ quality ∩ sample.
    # Each leg is an oracle-checked operator reading corpus_dir; the
    # composition is three left-semi joins (the training_mix shape).
    # demo_dups=False: dedup the extracted corpus AS-IS — the driver
    # demos inject synthetic near/exact dups, which a production funnel
    # must not (after_dedup would count clusters of fabricated variants,
    # and an injected doc_id could collide with a real one at scale).
    reps = ops.dedup_keep_representatives(spark, corpus_dir,
                                          demo_dups=False) \
        .select("doc_id")
    quality = ops.gopher_quality(spark, corpus_dir) \
        .where("passes").select("doc_id")
    sampled = ops.stratified_sample(spark, corpus_dir).select("doc_id")

    corpus = spark.read.parquet(
        os.path.join(corpus_dir, "documents.parquet"))
    final = (corpus
             .join(reps, "doc_id", "left_semi")
             .join(quality, "doc_id", "left_semi")
             .join(sampled, "doc_id", "left_semi"))
    final_dir = os.path.join(out_dir, "final")
    final.write.mode("overwrite").parquet(
        os.path.join(final_dir, "documents.parquet"))

    summary["after_dedup"] = reps.count()
    summary["after_quality"] = quality.count()
    summary["after_sample"] = sampled.count()
    summary["final_docs"] = spark.read.parquet(
        os.path.join(final_dir, "documents.parquet")).count()

    # 5. pack the surviving corpus into fixed-budget training sequences
    packed = ops.pack_sequences(spark, final_dir)
    packed_path = os.path.join(out_dir, "packed.parquet")
    packed.write.mode("overwrite").parquet(packed_path)
    stats = spark.read.parquet(packed_path).agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("stream", "bin").alias("bins")).collect()[0]
    summary["packed_docs"] = stats["docs"]
    summary["packed_tokens"] = int(stats["tokens"] or 0)
    summary["packed_bins"] = stats["bins"]
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="pages Iceberg table / parquet path, or an sf dir "
                         "with --synthesize")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--warc", action="store_true",
                    help="treat --input as a directory/glob of WARC files\n"
                         "(Common Crawl segment layout)")
    ap.add_argument("--synthesize", action="store_true",
                    help="treat --input as a testdata sf dir and synthesize "
                         "the pages table from its documents")
    ap.add_argument("--robots", default=None,
                    help="robots table (Iceberg/parquet, host+robots_txt) "
                         "OR a directory of <host>.txt fetch payloads "
                         "to gate urls through; 'synthesize' uses the "
                         "deterministic per-host corpus robots")
    ap.add_argument("--sitemaps", default=None,
                    help="directory of <host>.xml sitemap fetch payloads "
                         "(or a host+xml table) to parse into the "
                         "frontier seed table (frontier.parquet)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="reliable-checkpoint dir for the iterative dedup "
                         "ops (sets spark.nreadability.checkpointDir)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.sources import read_pages

    extra = {}
    if args.checkpoint_dir:
        extra["spark.nreadability.checkpointDir"] = args.checkpoint_dir
    spark = get_spark("nreadability-build-corpus", master=args.master,
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
        robots = None
        if args.robots == "synthesize":
            from nreadability_spark.spark.sources import synthesize_robots
            robots = synthesize_robots(spark)
        elif args.robots and os.path.isdir(args.robots):
            from nreadability_spark.spark.sources import read_robots_dir
            robots = read_robots_dir(spark, args.robots)
        elif args.robots:
            robots = read_pages(spark, args.robots)
        sitemaps = None
        if args.sitemaps and os.path.isdir(args.sitemaps):
            from nreadability_spark.spark.sources import read_sitemap_dir
            sitemaps = read_sitemap_dir(spark, args.sitemaps)
        elif args.sitemaps:
            sitemaps = read_pages(spark, args.sitemaps)
        print(json.dumps(build_corpus(spark, pages, args.output,
                                      robots=robots, sitemaps=sitemaps)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
