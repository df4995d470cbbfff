"""Multimodal plumbing tests: schema shape, Arrow batch path, deterministic
fake decode, frame-sampling fan-out, and the strict-mode codec seam."""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.generate_media(spark, 90, partitions=4).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.count() == 90
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(media):
    feats = mm.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 90
    again = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for mid, r in rows.items():
        assert r["feat"] == again[mid]["feat"]  # bit-stable across runs
        assert len(r["feat"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["feat"])
        assert r["payload_hash"] == again[mid]["payload_hash"]
    # payload column is gone — downstream shuffles carry no media bytes
    assert "payload" not in feats.columns


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_ms=1000, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame_ts_ms", "frame_hash"}
    # only video rows produce frames; counts bounded by duration and cap
    n_video = media.filter(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() <= n_video
    assert (pdf["frame_idx"] < 4).all()
    per = pdf.groupby("media_id")["frame_idx"].apply(lambda s: sorted(s.tolist()))
    for idxs in per:
        assert idxs == list(range(len(idxs)))  # contiguous from 0


def test_strict_mode_raises(spark, media):
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(media.limit(3), strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )
