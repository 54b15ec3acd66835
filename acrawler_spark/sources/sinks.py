"""Sinks: item appenders and the file-download sink.

Reference parity:
* ItemCollector (handlers.py:236-250) — the engine's ``items`` append table
  (store.write_delta("items", ...)), grouped by family.
* ItemToRedis LPUSH (handlers.py:160-197) / ItemToMongo upsert
  (handlers.py:200-233) — append vs MERGE-style last-wins write; the
  connector itself is environment-specific, the semantics are here.
* FileRequest + file_save_callback (http.py:482-543) — stream body to
  storage, skip-if-exists: here a binary parquet sink with an anti-join
  against the existing-output manifest (no per-file stat calls — the
  manifest IS the listing, which is what object stores want at 10^10 keys).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_last_wins(existing: DataFrame | None, incoming: DataFrame, key: str, version: str) -> DataFrame:
    """MERGE-style upsert (ItemToMongo handlers.py:223-230): one row per
    key, highest ``version`` wins; incoming beats existing on ties."""
    inc = incoming.withColumn("_src", F.lit(1))
    if existing is None:
        unioned = inc
    else:
        unioned = existing.withColumn("_src", F.lit(0)).unionByName(inc)
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(version).desc(), F.col("_src").desc())
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


class FileSink:
    """Binary payload sink with skip-if-exists semantics (http.py:536-543).

    Layout: ``root/data/batch=N/`` parquet of (fingerprint, url, payload)
    plus ``root/manifest/batch=N/`` of fingerprints. ``write_new`` anti-joins
    the incoming batch against the manifest so already-downloaded payloads
    are skipped — the distributed equivalent of FileRequest's
    ``os.path.exists`` check."""

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifest"), exist_ok=True)

    def _batches(self, sub: str) -> list[str]:
        d = os.path.join(self.root, sub)
        return sorted(os.path.join(d, b) for b in os.listdir(d))

    def manifest(self) -> DataFrame | None:
        paths = self._batches("manifest")
        return self.spark.read.parquet(*paths) if paths else None

    def write_new(self, batch_id: int, df: DataFrame) -> None:
        """df: (fingerprint, url, payload binary). Writes only rows whose
        fingerprint is not yet in the manifest."""
        man = self.manifest()
        fresh = df.dropDuplicates(["fingerprint"])
        if man is not None:
            fresh = fresh.join(man.select("fingerprint"), "fingerprint", "left_anti")
        fresh.write.mode("overwrite").parquet(
            os.path.join(self.root, "data", f"batch={batch_id}")
        )
        self.spark.read.parquet(
            os.path.join(self.root, "data", f"batch={batch_id}")
        ).select("fingerprint").write.mode("overwrite").parquet(
            os.path.join(self.root, "manifest", f"batch={batch_id}")
        )

    def data(self) -> DataFrame | None:
        paths = self._batches("data")
        return self.spark.read.parquet(*paths) if paths else None
