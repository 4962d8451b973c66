"""Scaling-efficiency evidence for the north rule: the same extraction
job at two parallelism levels (sandbox stand-in for N vs 4N executors).

Usage: python tools/scaling_run.py [low] [high] [copies]

Protocol (per level): fresh SparkSession at local[p] → warmup pass over
a 5%% slice (spawns/AoT-warms the Python workers — cold-start excluded,
as it would be on a long-running cluster) → timed full extraction job
(scan → skew repartition → mapInPandas parse+extract → parquet write),
best of ``RUNS`` runs. Efficiency = (T_low × low) / (T_high × high).
Appends a summary row to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 4


def measure(cpus: int, staged: str, tmp: str) -> dict:
    from pyspark.sql import functions as F

    from html_parser_spark.operators.extract import extract_pages
    from html_parser_spark.plans.pipeline import configure, skew_isolate

    spark = configure(cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        pages = spark.read.parquet(staged)
        stats = pages.agg(F.count("*").alias("n"),
                          F.sum(F.length("html")).alias("b")).collect()[0]
        # warmup: a 1-in-4 slice through the full UDF path (spawns the
        # python workers and warms the interpreter/page cache)
        warm = pages.filter(F.crc32(F.col("url")) % 4 == 0)
        extract_pages(skew_isolate(warm, cpus * 2), with_spans=False) \
            .write.mode("overwrite").format("noop").save()
        walls = []
        for i in range(RUNS):
            out = f"{tmp}/out_{cpus}_{i}"
            t0 = time.monotonic()
            extract_pages(skew_isolate(pages, cpus * 2),
                          with_spans=False) \
                .write.mode("overwrite").parquet(out)
            walls.append(time.monotonic() - t0)
            shutil.rmtree(out, ignore_errors=True)
        wall = min(walls)
        return {"cpus": cpus, "wall_s": round(wall, 2),
                "all_runs_s": [round(w, 2) for w in walls],
                "docs": stats["n"], "mb": round(stats["b"] / 1e6, 1),
                "docs_per_sec": round(stats["n"] / wall, 1),
                "mb_per_sec": round(stats["b"] / 1e6 / wall, 2)}
    finally:
        spark.stop()


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    tmp = tempfile.mkdtemp(prefix="hps_scale_")
    try:
        # stage once with a throwaway session
        from html_parser_spark.plans.pipeline import configure
        from html_parser_spark.sources.pages import pages_df
        s = configure(cpus=high)
        s.sparkContext.setLogLevel("ERROR")
        # stage as many files as the widest session has cores ×2 so the
        # scan stage is never file-bound (Iceberg table maintenance would
        # keep files right-sized the same way)
        pages_df(s, sf_dir, copies=copies).repartition(high * 2) \
            .write.parquet(f"{tmp}/pages")
        s.stop()

        r_low = measure(low, f"{tmp}/pages", tmp)
        r_high = measure(high, f"{tmp}/pages", tmp)
        eff = (r_low["wall_s"] * low) / (r_high["wall_s"] * high)
        result = {"low": r_low, "high": r_high,
                  "efficiency": round(eff, 3), "sf_dir": sf_dir,
                  "copies": copies}
        print(json.dumps(result))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
