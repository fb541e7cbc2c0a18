"""Multimodal plumbing behavior beyond oracle parity: the gated real-
decode stub and the batch fan-out contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from network_ids_using_pyspark_spark.operators.multimodal import (
    documents_as_media,
    extract_image_features,
    sample_frames,
)
from network_ids_using_pyspark_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_real_decode_stub_raises(spark):
    media = documents_as_media(load_table(spark, SF_DIR, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        extract_image_features(media, fake_decode=False).collect()


def test_frame_fanout_is_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = documents_as_media(docs)
    frames = sample_frames(media, n_frames=4)
    assert frames.count() == docs.count() * 4
    per_media = frames.groupBy("media_id").agg(F.countDistinct("frame_idx").alias("k"))
    assert per_media.filter(F.col("k") != 4).count() == 0


def test_audio_and_resize_real_decode_stubs_raise(spark):
    from network_ids_using_pyspark_spark.operators.multimodal import (
        extract_audio_features,
        resize_images,
    )

    media = documents_as_media(load_table(spark, SF_DIR, "documents")).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|librosa"):
        extract_audio_features(media, fake_decode=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|pillow"):
        resize_images(media, fake_decode=False).collect()
