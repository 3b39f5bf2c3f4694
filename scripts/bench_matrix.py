"""Interleaved config-matrix scaling experiment for the extraction stage.

Measures the extraction job at two parallelism levels under several
session/plan configurations, interleaving (config, level) cells across
cycles so host noise hits all cells equally. Prints one JSON line per
cell and a summary with per-config 8->32 efficiency.

Usage:
  python scripts/bench_matrix.py [--levels 8,32] [--cycles 2]
      [--configs base,shm,b512,shm_b512,noex,narrow]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CONFIGS: dict[str, dict] = {
    # session-level knobs (passed to get_spark)
    "base": {},
    "shm": {"extra_conf": {"spark.local.dir": "/dev/shm/spark-bench"}},
    "b512": {"arrow_batch_rows": 512},
    "shm_b512": {"arrow_batch_rows": 512,
                 "extra_conf": {"spark.local.dir": "/dev/shm/spark-bench"}},
    # plan-level variants (handled in measure_once)
    "noex": {"extra_conf": {"spark.local.dir": "/dev/shm/spark-bench"},
             "_skip_exchange": True},
    "narrow": {"extra_conf": {"spark.local.dir": "/dev/shm/spark-bench"},
               "_narrow_output": True},
}


def measure_once(cores: int, cfg_name: str, pages_path: str) -> tuple:
    from pyspark.sql import functions as F
    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.job import run_extraction

    cfg = dict(CONFIGS[cfg_name])
    skip_exchange = cfg.pop("_skip_exchange", False)
    narrow = cfg.pop("_narrow_output", False)
    spark = get_spark(f"matrix-{cfg_name}-{cores}",
                      master=f"local[{cores}]", **cfg)
    try:
        pages = spark.read.parquet(pages_path)
        n = pages.count()
        t0 = time.perf_counter()
        out = run_extraction(
            spark, pages, num_partitions=0 if skip_exchange else cores * 4,
            output=("fingerprint" if narrow else "full"))
        row = out.agg(F.count("*").alias("docs")).collect()[0]
        dt = time.perf_counter() - t0
        assert row["docs"] == n
        return n, dt
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=16)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--configs", default="base,shm,b512,shm_b512,noex,narrow")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    configs = args.configs.split(",")

    import bench
    from nreadability_spark.spark.session import get_spark
    bench.REPLICATE = args.replicate
    spark = get_spark("matrix-prep", master=f"local[{max(levels)}]")
    try:
        pages_path = bench.materialize_pages(spark, args.sf, args.replicate)
    finally:
        spark.stop()

    samples: dict[tuple, list] = {(c, lv): [] for c in configs
                                  for lv in levels}
    for cycle in range(args.cycles):
        for cfg in configs:
            for lv in levels:
                n, dt = measure_once(lv, cfg, pages_path)
                samples[(cfg, lv)].append(dt)
                print(json.dumps({"cycle": cycle, "config": cfg,
                                  "cores": lv, "docs": n,
                                  "wall_sec": round(dt, 2),
                                  "docs_per_sec": round(n / dt, 1)}),
                      flush=True)

    summary = {}
    for cfg in configs:
        best = {lv: min(samples[(cfg, lv)]) for lv in levels}
        eff = {}
        for lo, hi in zip(levels, levels[1:]):
            eff[f"{lo}->{hi}"] = round(
                (best[lo] / best[hi]) / (hi / lo), 3)
        summary[cfg] = {"best_wall": {lv: round(best[lv], 2)
                                      for lv in levels},
                        "efficiency": eff}
    print(json.dumps({"summary": summary}, indent=None), flush=True)


if __name__ == "__main__":
    main()
