"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The 100 TB training-pipeline pattern: media payloads ride as ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the bytes cross
the JVM->Python boundary once per batch and the pipeline stays columnar.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is stubbed two ways (clearly marked):
  * ``decode_stub="fake"`` — a deterministic fake decoder (byte-stats
    features) so the Spark-side plumbing (schema, batching, partitioning)
    is real and testable end-to-end;
  * ``decode_stub="raise"`` — NotImplementedError at the exact seam where
    a real codec plugs in.

Everything around the seam — schema, batch shape, partition sizing — is
production-real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum string, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "feat_mean double, feat_std double, n_frames int, feature array<float>"
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload", kind: str = "image") -> DataFrame:
    """Typed metadata over an opaque binary column — all JVM built-ins
    (no decode needed): size, checksum, declared kind. Width/height/rate
    stay NULL until the decode stage fills them."""
    return df.select(
        "*",
        F.lit(kind).alias("kind"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("checksum"),
    )


def make_decode_features(decode_stub: str = "fake", n_features: int = 8):
    """Returns a mapInPandas function (binary payload -> features).

    Batch shape contract: each Arrow batch arrives as a pandas DataFrame
    with columns (media_id, kind, payload); output rows match
    FEATURE_SCHEMA. A real implementation replaces ``_decode`` only.
    """

    def _decode(payload: bytes, kind: str) -> np.ndarray:
        if decode_stub == "raise":
            # the seam where PIL/ffmpeg/torchaudio plugs in
            raise NotImplementedError(
                f"no {kind} codec in this environment; install one and "
                f"replace operators.multimodal._decode"
            )
        # deterministic fake decode: fixed-size byte-histogram features.
        # Chunk means accumulate in float64 (exact integer sums) so the
        # derived feat_mean/feat_std are SQL-reproducible to 6 decimals
        # (the media_features driver query's DuckDB oracle recomputes
        # them); the stored feature vector is float32 like a real encoder.
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return np.zeros(n_features, dtype=np.float64)
        chunks = np.array_split(arr.astype(np.float64), n_features)
        return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float64)

    def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feat_mean": [float(f.mean()) for f in feats],
                    "feat_std": [float(f.std()) for f in feats],
                    "n_frames": [int(f.shape[0]) for f in feats],
                    "feature": [f.astype(np.float32).tolist() for f in feats],
                }
            )

    return decode_features


def decode_features_df(df: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """df: (media_id, kind, payload binary) -> FEATURE_SCHEMA rows.

    Scale notes: repartition upstream so a partition's payload bytes fit
    executor memory (spark.sql.files.maxPartitionBytes for file scans);
    Arrow batch size bounds Python-side peak memory."""
    fn = make_decode_features(decode_stub)
    return df.select("media_id", "kind", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing demo on opaque payloads: split a payload
    into fixed-size pseudo-frames JVM-side and keep every n-th — the
    explode/posexplode shape a real video sampler produces."""
    n_frame_bytes = 1024
    frames = F.expr(
        f"transform(sequence(0, int(length({payload_col}) / {n_frame_bytes})), "
        f"i -> substring({payload_col}, i * {n_frame_bytes} + 1, {n_frame_bytes}))"
    )
    return (
        df.select("media_id", F.posexplode(frames).alias("frame_idx", "frame"))
        .filter((F.col("frame_idx") % every_n) == 0)
        .filter(F.length("frame") > 0)
    )
