"""Two-parallelism scaling proof (north rule: efficiency >= 0.8 from N to
4N executors). In this sandbox the same job runs at several local[N]
levels on identical input; a pure-Python multiprocessing control measures
the box's own scaling ceiling (memory bandwidth / frequency), which a
multi-executor cluster would not share.

Usage: python scripts/bench_scaling.py
Appends a session record to BENCH/sessions.jsonl and prints one JSON line (BENCH/BASELINE.md is hand-curated from those records).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _burn(n: int) -> float:
    t0 = time.perf_counter()
    s = 0
    text = "the quick, brown fox. jumps over, the lazy dog! " * 50
    for i in range(n):
        s += len(text.split()) + text.count(",") + hash(text[i % 100:])
    return time.perf_counter() - t0


def hardware_control(levels: list[int], n: int = 20000) -> dict[int, float]:
    """Docs-per-sec-like rate for a pure-Python string workload at each
    process count — Spark-free scaling ceiling of this box."""
    rates = {}
    for k in levels:
        with mp.Pool(k) as pool:
            t0 = time.perf_counter()
            pool.map(_burn, [n] * k)
            wall = time.perf_counter() - t0
        rates[k] = k * n / wall
    return rates


def measure_once(cores: int, pages_path: str,
                 runs: int = max(1, int(os.environ.get("BENCH_RUNS",
                                                       "2")))) -> tuple:
    """Best of ``runs`` timed passes AFTER one untimed warm-up pass.

    The warm-up matters for the scaling ratio: a cold pass pays Python
    worker fork + kernel import once per core, a fixed ~1 s cost that eats
    ~10% of a 32-core wall but ~3% of an 8-core wall — an artifact that
    deflates measured N->4N efficiency and that a long-running 100 TB job
    amortizes to zero. The measured pipeline is the production layout:
    pre-salted corpus scan -> mapInArrow (no exchange)."""
    from pyspark.sql import functions as F
    from nreadability_spark.spark.session import get_spark
    from nreadability_spark.spark.job import run_extraction

    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]")
    try:
        pages = spark.read.parquet(pages_path)
        n = pages.count()
        best = None
        for i in range(runs + 1):
            t0 = time.perf_counter()
            out = run_extraction(spark, pages, num_partitions=0)
            row = out.agg(F.count("*").alias("docs")).collect()[0]
            dt = time.perf_counter() - t0
            assert row["docs"] == n
            if i == 0:
                continue  # warm-up pass: workers forked, kernel imported
            if best is None or dt < best:
                best = dt
        return n, best
    finally:
        spark.stop()


def measure(cores: int, pages_path: str, cycles_results: list) -> dict:
    """Fold interleaved cycle samples into a best-per-level figure."""
    n = cycles_results[0][0]
    best = min(dt for _n, dt in cycles_results)
    return {"cpus": cores, "docs": n, "wall_sec": round(best, 2),
            "docs_per_sec": round(n / best, 1),
            "samples": [round(dt, 2) for _n, dt in cycles_results]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=int(
        os.environ.get("BENCH_REPLICATE", "8")))  # = the driver's corpus
    ap.add_argument("--levels", default="2,8,32")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import bench
    from nreadability_spark.spark.session import get_spark
    bench.REPLICATE = args.replicate
    spark = get_spark("scaling-prep", master=f"local[{max(levels)}]")
    try:
        pages_path = bench.materialize_pages(spark, args.sf, args.replicate)
    finally:
        spark.stop()

    # interleave levels across cycles: the box's background noise (CPU
    # steal, thermal state) then hits all levels roughly equally instead
    # of biasing whichever level ran during a slow window
    cycles = int(os.environ.get("BENCH_CYCLES", "2"))
    samples: dict[int, list] = {c: [] for c in levels}
    for _ in range(cycles):
        for c in levels:
            samples[c].append(measure_once(c, pages_path))
    results = {c: measure(c, pages_path, samples[c]) for c in levels}
    control = hardware_control(levels)

    pairs = []
    for lo, hi in zip(levels, levels[1:]):
        factor = hi / lo
        eff = (results[hi]["docs_per_sec"]
               / results[lo]["docs_per_sec"]) / factor
        ceiling = (control[hi] / control[lo]) / factor
        pairs.append({"from": lo, "to": hi, "factor": factor,
                      "efficiency": round(eff, 3),
                      "hw_ceiling": round(ceiling, 3),
                      "efficiency_vs_ceiling": round(eff / ceiling, 3)})

    out = {"levels": results, "pairs": pairs,
           "control_rates": {k: round(v) for k, v in control.items()},
           "sf": args.sf, "replicate": args.replicate}
    print(json.dumps(out))

    # append the session record; BENCH/BASELINE.md is hand-curated from
    # these records (this script must not clobber it)
    os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(_REPO, "BENCH", "sessions.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
