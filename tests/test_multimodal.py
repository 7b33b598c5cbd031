from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyorchdb_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample_plan,
    synth_media,
)


def test_media_schema_and_determinism(spark):
    a = synth_media(spark, 32, num_partitions=2)
    b = synth_media(spark, 32, num_partitions=5)
    assert a.schema == b.schema
    assert a.exceptAll(b).isEmpty()
    assert {r["kind"] for r in a.select("kind").distinct().collect()} <= {"image", "audio", "video"}


def test_decode_stub_raises_without_fake(spark):
    media = synth_media(spark, 4)
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        decode_media(media, fake=False).collect()


def test_fake_decode_plumbing(spark):
    media = synth_media(spark, 32, num_partitions=3)
    feats = decode_media(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] > 0
    # deterministic across partitionings
    again = decode_media(synth_media(spark, 32, num_partitions=7), fake=True)
    assert feats.exceptAll(again).isEmpty()


def test_payload_pruned_when_untouched(spark):
    """Metadata-only query must not read the payload column (column pruning)."""
    media = synth_media(spark, 16)
    plan = media.select("media_id", "kind").queryExecution if False else None
    explained = media.select("media_id", "kind")._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained


def test_frame_sample_plan(spark):
    media = synth_media(spark, 64)
    plan = frame_sample_plan(media, every_ms=10_000)
    joined = plan.join(media.select("media_id", F.col("meta.duration_ms").alias("d")), "media_id")
    bad = joined.filter((F.col("frame_ms") < 0) | (F.col("frame_ms") > F.col("d")))
    assert bad.isEmpty()
    assert plan.count() > 0
