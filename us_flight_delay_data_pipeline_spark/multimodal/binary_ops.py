"""Multimodal (image/audio/video) column plumbing for the [EXT]
training-data pipeline.

Media is carried as an opaque ``binary`` column plus typed metadata —
the same envelope discipline as the bronze layer (SURVEY.md §1:
``BinaryType`` body + metadata). All Spark-side mechanics are real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` partition flow,
deterministic sizing/fingerprinting. The codec kernels themselves
(JPEG decode, resampling, frame extraction) are STUBBED — the
image/audio libraries are not in this container — behind
``_require_codec()`` which raises ``NotImplementedError``, with a
deterministic fake (``fake_decode=True``) so the distributed plumbing
is exercisable end-to-end.

Why ``mapInPandas`` and not a scalar UDF: media blobs are large and
variable-size; mapInPandas streams Arrow record batches through the
Python worker once per partition (no per-row serialization), lets one
batch emit a different number of rows (frame sampling), and keeps
peak memory bounded by batch size instead of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

__all__ = [
    "MEDIA_SCHEMA", "attach_media_metadata", "decode_image_batch",
    "extract_image_features", "resize_image_batch",
    "sample_video_frames",
]

# Typed metadata contract for an opaque media column.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), True),
    StructField("content", BinaryType(), True),     # opaque payload
    StructField("n_bytes", LongType(), True),
    StructField("sha_hex", StringType(), True),
])

_DECODED_IMAGE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_channels", IntegerType(), True),
])

_FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("feature", ArrayType(FloatType()), True),
])

_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("frame", BinaryType(), True),
])


def _require_codec(name: str) -> None:
    raise NotImplementedError(
        f"media codec {name!r} is stubbed: the image/audio libraries are "
        "not available in this environment. Pass fake_decode=True to "
        "exercise the Spark plumbing with a deterministic fake.")


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Native-expression metadata: size + sha2 fingerprint of the blob.
    No Python — this is the cheap pre-filter stage (dedup media by
    hash before any decode)."""
    return df.withColumns({
        "n_bytes": F.length(F.col(content_col)).cast("long"),
        "sha_hex": F.sha2(F.col(content_col), 256),
    })


def decode_image_batch(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """image binary → (width, height, channels) via mapInPandas.

    Real implementation would call PIL/libjpeg per blob inside the
    iterator; the fake derives deterministic dimensions from the blob
    bytes so tests can assert the full distributed path."""
    def gen(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd
        for pdf in batches:
            if not fake_decode:
                _require_codec("image-decode")
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                # deterministic fake: dims derived from payload length
                "width": (pdf["content"].str.len() % 640 + 1).astype("int32"),
                "height": (pdf["content"].str.len() % 480 + 1).astype("int32"),
                "n_channels": 3,
            })
            out["n_channels"] = out["n_channels"].astype("int32")
            yield out

    return df.select("media_id", "content").mapInPandas(gen, _DECODED_IMAGE_SCHEMA)


def extract_image_features(df: DataFrame, dim: int = 8,
                           fake_decode: bool = False,
                           normalize: bool = True) -> DataFrame:
    """image binary → float feature vector (the embed stage).

    The fake computes a deterministic byte-histogram projection — a
    stand-in with the same schema/batch shape as a real vision
    encoder. ``normalize=False`` keeps the raw histogram COUNTS —
    exact integers (float32 represents ints < 2^24 exactly), which is
    what makes the media_image_features_exact oracle twin possible:
    the normalized vector divides by the byte total (float rounding),
    the counts do not."""
    def gen(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd
        for pdf in batches:
            if not fake_decode:
                _require_codec("image-feature")
            feats = []
            for blob in pdf["content"]:
                arr = np.frombuffer(blob or b"", dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                if normalize:
                    hist = hist / total if total else hist
                feats.append(hist.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.select("media_id", "content").mapInPandas(gen, _FEATURE_SCHEMA)


_RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("content", BinaryType(), True),
])


def resize_image_batch(df: DataFrame, target_w: int = 8, target_h: int = 4,
                       src_width: int = 16,
                       fake_decode: bool = False) -> DataFrame:
    """image binary → resized image binary (the resample stage between
    decode and feature extraction).

    Real implementation resamples decoded pixel buffers; the fake
    treats the payload as a ``src_width``-wide byte raster (full rows
    only) and nearest-neighbor-gathers it to (target_w, target_h):
    out[r][c] = raster[r*h//target_h][c*src_width//target_w] — pure
    integer index math, so an SQL oracle can reproduce the output
    bytes exactly on ASCII payloads. Payloads shorter than one row
    resize to empty content (NULL-safe)."""
    def gen(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd
        for pdf in batches:
            if not fake_decode:
                _require_codec("image-resize")
            outs = []
            for blob in pdf["content"]:
                blob = blob or b""
                h = len(blob) // src_width
                if h == 0:
                    outs.append(b"")
                    continue
                outs.append(bytes(
                    blob[(r * h // target_h) * src_width
                         + (c * src_width // target_w)]
                    for r in range(target_h) for c in range(target_w)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": pd.array([target_w] * len(pdf), dtype="int32"),
                "height": pd.array([target_h] * len(pdf), dtype="int32"),
                "content": outs,
            })

    return df.select("media_id", "content").mapInPandas(gen, _RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 2,
                        fake_decode: bool = False) -> DataFrame:
    """video binary → multiple frame rows (1→N fan-out — the case that
    *requires* mapInPandas over a scalar UDF).

    The fake splits the payload into fixed-size chunks as 'frames'."""
    def gen(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd
        for pdf in batches:
            if not fake_decode:
                _require_codec("video-frames")
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = blob or b""
                chunks = [blob[i:i + 16] for i in range(0, len(blob), 16)]
                for j, c in enumerate(chunks[::every_n]):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(c)
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame": frames})

    return df.select("media_id", "content").mapInPandas(gen, _FRAME_SCHEMA)
