"""Multimodal plumbing: binary columns through mapInPandas with stubbed
codecs — schema contracts, batch shapes, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trde703_openfoodfacts_etl_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize_stub,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=64).cache()


def test_media_schema_and_pruning(media):
    assert media.count() == 64
    # metadata-only query must not deserialize payload (column pruning)
    plan = media.select("media_id", "kind").filter(F.col("kind") == "image")._jdf.queryExecution().executedPlan().toString()
    meta = media.groupBy("kind").count().collect()
    assert {r["kind"] for r in meta} == {"image", "audio", "video"}


def test_decode_features_contract(media):
    feats = decode_features(media).collect()
    assert len(feats) == 64
    for r in feats:
        assert len(r["feat"]) == 16
    # deterministic: same input → same features
    again = decode_features(media).collect()
    assert {r["media_id"]: r["feat"] for r in feats} == {r["media_id"]: r["feat"] for r in again}


def test_frame_sample(media):
    frames = frame_sample(media, every_ms=5000)
    rows = frames.collect()
    assert all(r["frame_ms"] % 5000 == 0 for r in rows)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.select("media_id").distinct().count() == n_videos


def test_resize_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        resize_stub(media, 64, 64)
