"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (the LLM-data-pipeline pattern).

The Spark-side plumbing is real and tested: explicit schemas,
Arrow-batched ``mapInPandas`` (never row-at-a-time UDFs), partition-
preserving transforms.  The decode kernel is one of

* a **deterministic fake** (`fake_decode=True`, default) — features
  derived only from the payload bytes (length, md5), which makes even
  this Python-side path oracle-checkable — or
* the **real path** (`fake_decode=False`): PIL when importable (every
  format, C speed), with a dependency-free fallback for the two
  formats stdlib can decode — baseline PNG (``functions/pngcodec.py``)
  and RIFF WAV (the ``wave`` module).  Payloads in other formats
  without PIL raise ``NotImplementedError`` — honest, env-limited.
  The resize/grayscale/fingerprint math always runs on OUR kernels
  over the decoded pixels, so outputs don't depend on which backend
  decoded them.

At 100 TB: media payloads dominate row size, so the operators take an
``id_cols`` projection and never shuffle payloads — decode happens in
the scan stage's partitions (mapInPandas pipelines with the scan), and
only the small feature output is exchanged afterwards.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import pngcodec

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def _decode_image(content: bytes) -> tuple[int, int, int, bytes]:
    """Real decode → (width, height, channels, flat 8-bit pixels).

    Baseline PNG decodes via the stdlib codec even without PIL, so the
    real path works in this container; PIL (when installed) handles
    everything else."""
    if pngcodec.is_png(content):
        return pngcodec.decode_png(content)
    if _HAVE_PIL:
        import io

        im = Image.open(io.BytesIO(content))
        if im.mode not in ("L", "LA", "RGB", "RGBA"):
            im = im.convert("RGB")
        return im.width, im.height, len(im.getbands()), im.tobytes()
    raise NotImplementedError(
        "real decode of non-PNG payloads requires pillow, which is not "
        "installed in this environment; PNG decodes via the stdlib "
        "codec, or use fake_decode=True"
    )

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat each document's utf-8 bytes as an opaque media
    payload — gives the multimodal plumbing a deterministic fixture
    (and therefore an oracle) without real image files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


def extract_image_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched image feature extraction over a binary column.

    ``fake_decode`` derives (width, height) deterministically from the
    payload size and fingerprints the bytes — exercising the exact
    batch shape / schema / partitioning a real decoder would use.  With
    ``fake_decode=False`` dimensions come from an actual decode
    (``_decode_image``: stdlib PNG codec, PIL for other formats).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            n_bytes = content.map(len).astype("int64")
            if fake_decode:
                width = (n_bytes % 64 + 1).astype("int32")
                height = (n_bytes // 64 % 64 + 1).astype("int32")
            else:
                dims = content.map(lambda b: _decode_image(b)[:2])
                width = dims.map(lambda d: d[0]).astype("int32")
                height = dims.map(lambda d: d[1]).astype("int32")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "width": width,
                    "height": height,
                    "content_md5": content.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(_batches, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def extract_audio_features(
    media: DataFrame, sample_rate: int = 16000, fake_decode: bool = True
) -> DataFrame:
    """Audio feature extraction over a binary column (same Arrow-batched
    mapInPandas plumbing as the image path).  Fake kernel treats the
    payload as 8-bit mono PCM at ``sample_rate`` Hz — sample count and
    duration are pure integer functions of the byte length, so the query
    is oracle-checkable.  ``fake_decode=False`` parses RIFF WAV headers
    via the stdlib ``wave`` module (sample count and rate from the
    container itself; ``sample_rate`` is ignored); non-WAV payloads
    would need librosa/soundfile and raise."""

    def _wav_stats(b: bytes) -> tuple[int, int]:
        import io
        import wave

        if b[:4] != b"RIFF":
            raise NotImplementedError(
                "real audio decode of non-WAV payloads requires "
                "librosa/soundfile, not installed in this environment; "
                "use fake_decode=True"
            )
        with wave.open(io.BytesIO(b)) as w:
            n = w.getnframes()
            return n, n * 1000 // w.getframerate()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["content"].map(len).astype("int64")
            if fake_decode:
                n_samples = n_bytes  # 8-bit mono: 1 byte = 1 sample
                duration = (n_bytes * 1000 // sample_rate).astype("int64")
            else:
                stats = pdf["content"].map(_wav_stats)
                n_samples = stats.map(lambda s: s[0]).astype("int64")
                duration = stats.map(lambda s: s[1]).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "n_samples": n_samples,
                    "duration_ms": duration,
                    "content_md5": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return media.mapInPandas(_batches, schema=AUDIO_FEATURES_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def resize_images(media: DataFrame, target: int = 16, fake_decode: bool = True) -> DataFrame:
    """Thumbnail/resize over a binary column.  Fake kernel: stride-
    subsample the payload down to ``target²`` bytes (the downsampling
    access pattern of a real nearest-neighbor resize, minus the codec)
    and fingerprint the result; output dims clamp the fake decode dims
    to ``target``.  Real kernel (``fake_decode=False``): decode via
    ``_decode_image``, then OUR nearest-neighbor resample
    (``pngcodec.resize_nearest``) to ``target×target`` — the resize
    math is codec-independent, so the thumb fingerprint is stable
    whichever backend decoded the pixels."""
    px = target * target

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "out_width": [], "out_height": [], "thumb_md5": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                out["media_id"].append(mid)
                if fake_decode:
                    n = len(content)
                    stride = max(n // px, 1)
                    thumb = content[::stride][:px]
                    out["out_width"].append(min(n % 64 + 1, target))
                    out["out_height"].append(min(n // 64 % 64 + 1, target))
                else:
                    w, h, ch, pixels = _decode_image(content)
                    thumb = pngcodec.resize_nearest(
                        pixels, w, h, ch, target, target
                    )
                    out["out_width"].append(target)
                    out["out_height"].append(target)
                out["thumb_md5"].append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "out_width": pd.Series(out["out_width"], dtype="int32"),
                    "out_height": pd.Series(out["out_height"], dtype="int32"),
                    "thumb_md5": pd.Series(out["thumb_md5"], dtype="object"),
                }
            )

    return media.mapInPandas(_batches, schema=THUMB_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: emit ``n_frames`` evenly-spaced
    "frames" per payload (1→N row fan-out inside mapInPandas — the
    UDTF-like shape a real decoder needs).  Fake kernel: frame f is the
    md5 of the payload's f-th slice; a real one would seek+decode."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "frame_md5": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = max(len(content), 1)
                step = max(n // n_frames, 1)
                for f in range(n_frames):
                    sl = content[f * step : (f + 1) * step]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(f)
                    rows["frame_md5"].append(hashlib.md5(sl).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(rows["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "frame_md5": pd.Series(rows["frame_md5"], dtype="object"),
                }
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hash(
    media: DataFrame, bits: int = 16, fake_decode: bool = True
) -> DataFrame:
    """dHash-style perceptual fingerprint over the (fake-decoded) pixel
    stream: the payload is cut into ``bits``+1 equal segments and bit i
    records whether segment i outweighs segment i+1 — the gradient-sign
    construction real dHash applies to resized pixel rows.  Arrow-batched
    ``mapInPandas``.  ``fake_decode=False`` is classic 1-row dHash over
    real pixels: decode (``_decode_image``), grayscale, nearest-neighbor
    resize to ``(bits+1)×1``, bit i = (col i > col i+1).

    Near-identical payloads differ in few bits, so the output feeds the
    SimHash banding machinery (``operators/dedup.py``) unchanged —
    multimodal dedup composes with the text-dedup family rather than
    duplicating it."""

    def _batches(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in it:

            def ph(b: bytes) -> int:
                if fake_decode:
                    n = len(b)
                    if n == 0:
                        return 0
                    seg = max(1, n // (bits + 1))
                    sums = [sum(b[i * seg:(i + 1) * seg]) for i in range(bits + 1)]
                else:
                    w, h, ch, pixels = _decode_image(b)
                    gray = pngcodec.to_grayscale(pixels, ch)
                    sums = pngcodec.resize_nearest(
                        gray, w, h, 1, bits + 1, 1
                    )
                v = 0
                for i in range(bits):
                    if sums[i] > sums[i + 1]:
                        v |= 1 << i
                return v

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "phash": pdf["content"].map(ph).astype("int64"),
                }
            )

    return media.mapInPandas(_batches, schema=PHASH_SCHEMA)
