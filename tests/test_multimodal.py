"""Multimodal plumbing: binary payload columns, metadata, stubbed decode."""

import pytest
from pyspark.sql import functions as F

from acrawler_spark.operators.multimodal import (
    attach_media_metadata,
    decode_features_df,
    frame_sample,
)


def _media_df(spark, n=6):
    rows = [(i, "image", bytes(range(256)) * (i + 1)) for i in range(n)]
    return spark.createDataFrame(rows, "media_id long, kind string, payload binary")


def test_metadata_is_jvm_side(spark):
    df = attach_media_metadata(_media_df(spark), kind="image")
    row = df.filter(F.col("media_id") == 1).first()
    assert row.n_bytes == 512
    assert len(row.checksum) == 32
    # no Python stage in the plan: pure projection over the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_fake_decode_features(spark):
    out = decode_features_df(_media_df(spark), decode_stub="fake")
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == set(range(6))
    r = rows[0]
    assert r.n_bytes == 256 and r.n_frames == 8
    assert len(r.feature) == 8
    assert r.feat_mean == pytest.approx(127.5, abs=0.5)
    # deterministic
    again = {x.media_id: x for x in decode_features_df(_media_df(spark)).collect()}
    assert again[0].feature == r.feature


def test_raise_stub_marks_codec_seam(spark):
    out = decode_features_df(_media_df(spark, 1), decode_stub="raise")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()


def test_frame_sample(spark):
    df = _media_df(spark, 2)  # media 1 has 512 bytes -> frames of 1024 -> 1 frame
    out = frame_sample(df, every_n=2)
    got = out.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in got)
    idx = [r.frame_idx for r in out.collect()]
    assert all(i % 2 == 0 for i in idx)
