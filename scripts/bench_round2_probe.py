"""Component isolation for the bench's big round (round 2: 921,600 URLs).

Times each layer of the pages stage separately at one parallelism level:

  scan   — corpus scan + JVM projection (decompress html, length only)
  join   — scan + broadcast fetch-join against the round-2 selected set
  parse  — join + Arrow parse UDF (the python kernel)
  write  — parse + parquet write of the staged pages delta (full stage)

Usage: python scripts/bench_round2_probe.py <cpus> [layers...]
Layers default to all four. Prints one JSON line with seconds per layer
plus busy-CPU seconds per layer (box-wide /proc/stat delta).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_HOSTS, FANOUT = 32, 8


def _busy_jiffies() -> int:
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[1]) + int(p[3])


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        p = f.readline().split()
    return int(p[8])


def depth_of(i: int) -> int:
    d = 0
    while i >= N_HOSTS:
        i = (i - 1) // FANOUT
        d += 1
    return d


def host_of(i: int) -> int:
    while i >= N_HOSTS:
        i = (i - 1) // FANOUT
    return i


def main() -> int:
    cpus = int(sys.argv[1])
    layers = sys.argv[2:] or ["scan", "join", "parse", "write"]

    import bench
    from pyspark.sql import functions as F

    from acrawler_spark.functions.udfs import make_parse_page_udf

    # A/B knob: PROBE_EXTRA_CONF="spark.speculation=false,k=v" overlays the
    # session conf so single components can be isolated (speculation,
    # broadcast thresholds, batch sizes) without touching engine defaults
    extra = dict(
        kv.split("=", 1)
        for kv in os.environ.get("PROBE_EXTRA_CONF", "").split(",")
        if "=" in kv
    )
    if extra:
        orig = bench._spark

        def _patched(c):
            from acrawler_spark.session import get_spark

            return get_spark(
                app_name=f"probe_{c}", master=f"local[{c}]",
                shuffle_partitions=c,
                extra_conf={
                    "spark.driver.memory": os.environ.get("ACRAWLER_DRIVER_MEM", "24g"),
                    "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
                    **extra,
                },
            )

        bench._spark = _patched
    spark = bench._spark(cpus)
    mult = int(os.environ.get("SPARK_GRAFT_CORPUS_MULT", "256"))
    key = f"{os.path.basename(SF_DIR.rstrip('/'))}_h{N_HOSTS}_f{FANOUT}_m{mult}_b64"
    corpus_dir = os.path.join(tempfile.gettempdir(), f"acrawler_corpus_cache_{key}")
    if not os.path.exists(os.path.join(corpus_dir, "_DONE")):
        print(json.dumps({"err": f"corpus cache missing: {corpus_dir}"}))
        return 1
    corpus = spark.read.parquet(corpus_dir)
    n_pages = corpus.count()  # also warms the footer/schema

    # round-2 selected set: exactly the bench's depth-5 page ids
    sel_ids = [i for i in range(n_pages) if depth_of(i) == 5]
    rows = [
        (
            f"http://site{host_of(i)}.test/p/{i}",
            f"http://site{host_of(i)}.test/p/{i}",
            f"{i:040x}",
            "GET",
            f"site{host_of(i)}.test",
            0,
            5,
        )
        for i in sel_ids
    ]
    schema = (
        "url string, url_canon string, fingerprint string, method string, "
        "host string, priority int, depth int"
    )
    selected = (
        spark.createDataFrame(rows, schema)
        .withColumn("rank", F.monotonically_increasing_id().cast("long"))
        .persist()
    )
    n_sel = selected.count()

    right = (
        corpus.withColumnRenamed("url", "c_url")
        .withColumnRenamed("bucket", "c_bucket")
    )
    cond = (
        (F.col("url_canon") == F.col("c_url"))
        & (F.col("method") == "GET")
        & (F.col("c_bucket") == F.pmod(F.xxhash64("url_canon"), F.lit(64)))
    )
    # PROBE_NO_BROADCAST=1: drop the hint and let AQE plan from runtime
    # stats — isolates the driver-serial broadcast hash-relation build
    if os.environ.get("PROBE_NO_BROADCAST") == "1":
        joined = right.join(selected, cond, "inner")
    else:
        joined = right.join(F.broadcast(selected), cond, "inner")
    udf = make_parse_page_udf(True, [r"site\d+\.test"])
    parsed = joined.select(
        "url", "url_canon", "rank", "host", "depth",
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("bytes"),
        udf(F.col("html"), F.col("encoding"), F.col("url_canon")).alias("p"),
    ).select("*", F.col("p.text").alias("text"), F.col("p.links").alias("links")).drop("p")

    plans = {
        "scan": lambda: corpus.select(F.sum(F.length("html"))).first(),
        "join": lambda: joined.select(F.sum(F.length("html"))).first(),
        "parse": lambda: parsed.select(F.sum(F.length("text"))).first(),
    }

    block = os.environ.get("PROBE_PARQUET_BLOCK")
    if block:
        spark.conf.set("parquet.block.size", block)

    out = {
        "cpus": cpus, "n_pages": n_pages, "n_selected": n_sel,
        "parquet_block": block, "runs": [],
    }
    for name in layers:
        gc0 = bench._jvm_gc_ms(spark)
        if name == "write":
            d = tempfile.mkdtemp(prefix="acrawler_probe_write_")
            b0, s0, t0 = _busy_jiffies(), _steal_jiffies(), time.monotonic()
            w = parsed.write.mode("overwrite")
            if block:
                w = w.option("parquet.block.size", block)
            w.parquet(os.path.join(d, "pages"))
            secs = time.monotonic() - t0
            b1, s1 = _busy_jiffies(), _steal_jiffies()
            out_mb = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _dd, fs in os.walk(d) for f in fs
            ) / 1e6
            shutil.rmtree(d, ignore_errors=True)
        else:
            out_mb = None
            b0, s0, t0 = _busy_jiffies(), _steal_jiffies(), time.monotonic()
            plans[name]()
            secs = time.monotonic() - t0
            b1, s1 = _busy_jiffies(), _steal_jiffies()
        out["runs"].append({
            "layer": name,
            "secs": round(secs, 2),
            "cpu_busy_s": round((b1 - b0) / 100.0, 1),
            "steal_s": round((s1 - s0) / 100.0, 1),
            "gc_ms": bench._jvm_gc_ms(spark) - gc0,
            "out_mb": round(out_mb, 1) if out_mb else None,
            "urls_per_sec": round(n_sel / secs, 1),
        })
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
