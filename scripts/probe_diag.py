"""Diagnose the parse-probe scaling inversion: run the probe standalone
at a given parallelism level (fresh JVM, warm /tmp cache) and print
per-rep wall seconds + pages/s.

Usage: taskset -c 0-N-1 python scripts/probe_diag.py <cpus> [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = bench._spark(cpus)
    from pyspark.sql import functions as F

    from acrawler_spark.functions.udfs import make_parse_page_udf

    d = os.path.join("/tmp", "acrawler_probe_cache_sf0.1")
    c = spark.read.parquet(d)
    n = c.count()
    udf = make_parse_page_udf(True, [r"site\d+\.test"])
    print(f"cpus={cpus} n={n} partitions={c.rdd.getNumPartitions()}", flush=True)
    for i in range(reps):
        t = time.monotonic()
        c.select(
            udf(F.col("html"), F.col("encoding"), F.col("url")).alias("p")
        ).select(F.sum(F.length("p.text"))).first()
        dt = time.monotonic() - t
        print(f"rep{i}: {dt:.2f}s  {n / dt:.0f} pages/s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
