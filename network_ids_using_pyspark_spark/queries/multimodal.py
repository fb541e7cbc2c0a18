"""Multimodal-column queries.

The fake decode kernel is a pure function of the payload bytes, so even
the Python-side ``mapInPandas`` path gets a full DuckDB oracle (the
fixture text is ASCII — verified — so char ops equal byte ops in SQL).
"""

from __future__ import annotations

from ..operators.multimodal import (
    documents_as_media,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_frames,
)
from ..sources.tables import load_table
from . import register


@register(
    "media_image_features",
    """
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) % 64 + 1 AS INTEGER) AS width,
           CAST((length(text) // 64) % 64 + 1 AS INTEGER) AS height,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_media_image_features(spark, sf_dir):
    """Binary-column feature extraction through Arrow-batched
    mapInPandas — schema/batch-shape/partitioning of a real decoder,
    deterministic fake kernel (SURVEY.md §7.1 phase 7 / task spec)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_image_features(media, fake_decode=True)


@register(
    "media_audio_features",
    """
    SELECT doc_id AS media_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) AS BIGINT) AS n_samples,
           CAST(length(text) * 1000 // 16000 AS BIGINT) AS duration_ms,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_media_audio_features(spark, sf_dir):
    """Audio-column feature extraction (8-bit-mono fake kernel) through
    the same mapInPandas plumbing as images — completes the
    image/audio/video multimodal triple."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return extract_audio_features(media, sample_rate=16000, fake_decode=True)


@register(
    "media_resize_thumbs",
    """
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text) AS n,
             greatest(length(text) // 256, 1) AS stride
      FROM documents
    ),
    th AS (
      SELECT media_id,
             string_agg(substring(text, CAST(1 + i * stride AS INTEGER), 1),
                        '' ORDER BY i) AS thumb
      FROM m, range(256) t(i)
      WHERE 1 + i * stride <= n
      GROUP BY media_id
    )
    SELECT m.media_id,
           CAST(least(m.n % 64 + 1, 16) AS INTEGER) AS out_width,
           CAST(least((m.n // 64) % 64 + 1, 16) AS INTEGER) AS out_height,
           md5(th.thumb) AS thumb_md5
    FROM m JOIN th ON m.media_id = th.media_id
    """,
)
def q_media_resize_thumbs(spark, sf_dir):
    """Resize/thumbnail op: stride-subsample each payload to ≤256 bytes
    inside mapInPandas (the downsample access pattern of a real resize);
    the oracle rebuilds the identical subsample with string_agg."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return resize_images(media, target=16, fake_decode=True)


@register(
    "media_frame_samples",
    """
    WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
    frames AS (
      SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
             md5(substring(text, f * greatest(n // 4, 1) + 1, greatest(n // 4, 1))) AS frame_md5
      FROM m, UNNEST([0, 1, 2, 3]) AS t(f)
    )
    SELECT media_id, frame_idx, frame_md5 FROM frames
    """,
)
def q_media_frame_samples(spark, sf_dir):
    """Video-style 1→4 frame fan-out per payload inside mapInPandas
    (the UDTF shape); frames are deterministic payload slices."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=4)


def _phash_near_dup_sql(bits: int = 16, bands: int = 4, max_hamming: int = 2) -> str:
    """The fake dHash kernel is pure integer math over the payload bytes
    (operators/multimodal.py:260-270: 17 segment byte-sums, bit i =
    sums[i] > sums[i+1]), so it IS SQL-expressible (VERDICT r2 ask #6) —
    the fixture text is ASCII, so ascii(char) equals the utf-8 byte."""
    rows = bits // bands
    segs = bits + 1
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, text, length(text) AS n,
             greatest(length(text) // {segs}, 1) AS seg
      FROM documents
    ),
    chars AS (
      SELECT media_id, text, seg, unnest(range(1, n + 1)) AS k FROM m
    ),
    segsums AS (
      SELECT media_id, CAST((k - 1) // seg AS INTEGER) AS i,
             SUM(ascii(substring(text, CAST(k AS INTEGER), 1))) AS s
      FROM chars
      WHERE (k - 1) // seg < {segs}
      GROUP BY 1, 2
    ),
    ph AS (
      SELECT a.media_id,
             CAST(COALESCE(SUM(CASE WHEN a.s > COALESCE(b.s, 0)
                                    THEN CAST(1 AS BIGINT) << a.i
                                    ELSE 0 END), 0) AS BIGINT) AS phash
      FROM segsums a
      LEFT JOIN segsums b ON a.media_id = b.media_id AND b.i = a.i + 1
      WHERE a.i < {bits}
      GROUP BY a.media_id
    ),
    allph AS (
      SELECT m.media_id, COALESCE(ph.phash, 0) AS phash
      FROM m LEFT JOIN ph ON m.media_id = ph.media_id
    ),
    bnd AS (
      SELECT media_id, phash, CAST(b AS INTEGER) AS band_idx,
             (phash // (1 << (CAST(b AS INTEGER) * {rows}))) % {1 << rows} AS band_val
      FROM allph, range({bands}) t(b)
    ),
    pairs AS (
      SELECT DISTINCT a.media_id AS doc_a, b.media_id AS doc_b,
                      a.phash AS sig_a, b.phash AS sig_b
      FROM bnd a JOIN bnd b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.media_id < b.media_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@register("media_phash_near_dup", _phash_near_dup_sql())
def q_media_phash_near_dup(spark, sf_dir):
    """Multimodal × dedup composition: perceptual dHash per payload
    (Arrow-batched mapInPandas) fed straight into the SimHash banded
    near-dup machinery (band equi-join + exact Hamming verify ≤ 2).
    The pattern that dedups image/video corpora at 100 TB — candidate
    generation bucket-local, all-pairs never materialized.  Banding
    guarantees covered in tests/test_multimodal.py; the integer fake
    kernel carries a full DuckDB oracle.

    Scale note (r9 100× adjudication): this CERTIFICATION query pins
    ``bits=16`` so the oracle stays a plain integer ``bit_count(xor)``
    — a 65 536-signature space that SATURATES by pigeonhole around
    ~10⁵ docs, making near-dup output quadratic by construction beyond
    that (measured: OOM at 10 M docs).  The production setting is the
    operator's ``bits=64``: measured at the same 100× point, 5.2 s →
    7.7 s (α=0.085) emitting the 1.0 M true replica pairs.  Use 64-bit
    fingerprints at scale; the 16-bit pin exists to be oracle-exact."""
    from ..operators.dedup import simhash_near_dup_pairs
    from ..operators.multimodal import documents_as_media, perceptual_hash

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    ph = perceptual_hash(media, bits=16)
    return simhash_near_dup_pairs(
        ph, bits=16, bands=4, max_hamming=2, id_col="media_id", sig_col="phash"
    ).orderBy("doc_a", "doc_b")
