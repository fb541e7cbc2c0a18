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


def test_phash_deterministic_and_finds_exact_dups(spark):
    """pHash contract: stable across runs/partitionings, and an
    injected byte-identical payload pair appears in the near-dup output
    at Hamming 0."""
    from network_ids_using_pyspark_spark.operators.dedup import simhash_near_dup_pairs
    from network_ids_using_pyspark_spark.operators.multimodal import perceptual_hash

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    media = documents_as_media(docs)
    # clone media 0 under a fresh id → guaranteed Hamming-0 pair
    clone = media.filter(F.col("media_id") == 0).select(
        (F.col("media_id") + 1_000_000).alias("media_id"),
        "media_type",
        "content",
    )
    m = media.unionByName(clone)

    h1 = {r["media_id"]: r["phash"] for r in perceptual_hash(m).collect()}
    h2 = {
        r["media_id"]: r["phash"]
        for r in perceptual_hash(m.repartition(7)).collect()
    }
    assert h1 == h2  # partitioning-independent
    assert h1[0] == h1[1_000_000]

    pairs = simhash_near_dup_pairs(
        perceptual_hash(m), bits=16, bands=4, max_hamming=2,
        id_col="media_id", sig_col="phash",
    )
    hit = pairs.filter((F.col("doc_a") == 0) & (F.col("doc_b") == 1_000_000))
    assert hit.count() == 1
    assert hit.first()["hamming"] == 0
