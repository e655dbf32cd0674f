"""Multimodal-column queries under the driver's oracle gate.

The testdata has no real media, so a deterministic synthetic media
table is derived from ``documents``: ``content`` is the UTF-8 encoding
of ``repeat(md5(text), 1 + doc_id % 5)`` — ASCII by construction, so
byte offsets and character offsets coincide and DuckDB (which has no
BLOB substring) can mirror Spark's byte-level chunking exactly. The
point is not the fake payload; it is that the *Spark-side mechanics*
the multimodal module ships (BinaryType envelope + typed metadata,
native-expression fingerprinting, mapInPandas Arrow fan-out) run under
the same differential harness as every relational operator.

``media_image_features`` is rows-only (no oracle): the byte-histogram
fake stands in for a vision encoder, and float-array outputs are not
hash-stable across engines anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from . import register

_KINDS = ("image", "audio", "video")

_MEDIA_CTE = """
    media AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                             ELSE 'video' END AS kind,
             repeat(md5(text), 1 + (doc_id % 5)::INT) AS payload
      FROM documents
    )
"""


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media envelope (media_id, kind, content)."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]),
                        (F.col("doc_id") % 3 + 1).cast("int"))
    payload = F.repeat(F.md5(F.col("text").cast("binary")),
                       (F.col("doc_id") % 5 + 1).cast("int"))
    return d.select(F.col("doc_id").alias("media_id"),
                    kind.alias("kind"),
                    F.encode(payload, "UTF-8").alias("content"))


@register(
    "media_metadata",
    f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, kind,
           octet_length(encode(payload)) AS n_bytes,
           sha256(payload) AS sha_hex
    FROM media
    """,
    doc="Opaque-binary media envelope + native-expression metadata "
        "(byte size, sha2-256 fingerprint) — the cheap pre-decode "
        "stage: at 100 TB media dedup happens on sha_hex BEFORE any "
        "codec runs. No Python anywhere in this plan.",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import attach_media_metadata
    return attach_media_metadata(_media_table(spark, sf_dir)) \
        .select("media_id", "kind", "n_bytes", "sha_hex")


@register(
    "media_frame_fanout",
    f"""
    WITH {_MEDIA_CTE},
    vids AS (
      SELECT media_id, payload,
             octet_length(encode(payload)) AS n FROM media
      WHERE kind = 'video'
    ),
    frames AS (
      SELECT v.media_id, g.j::INT AS frame_idx,
             substring(v.payload, 1 + 32 * g.j::INT, 16) AS frame_s
      FROM vids v,
           LATERAL (SELECT unnest(range(0, ((v.n + 15) // 16 + 1) // 2)) AS j) g
    )
    SELECT media_id, frame_idx,
           length(frame_s)::BIGINT AS frame_bytes,
           md5(frame_s) AS frame_md5
    FROM frames
    """,
    doc="Video frame sampling as a 1-to-N mapInPandas fan-out (one "
        "Arrow batch in, a different number of rows out — the shape a "
        "scalar UDF cannot express). Fake codec chunks the payload "
        "into 16-byte 'frames', keeping every 2nd; the oracle mirrors "
        "the byte math on the ASCII payload. Frames are projected to "
        "(bytes, md5) for engine-portable value hashing.",
)
def media_frame_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import sample_video_frames
    vids = _media_table(spark, sf_dir).filter(F.col("kind") == "video")
    frames = sample_video_frames(vids, every_n=2, fake_decode=True)
    return frames.select(
        "media_id",
        "frame_idx",
        F.length("frame").cast("bigint").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


@register(
    "media_image_features",
    None,
    doc="image binary → float feature vector via mapInPandas "
        "(deterministic byte-histogram fake standing in for a vision "
        "encoder; real codec is stubbed behind NotImplementedError). "
        "Rows-only check; the vector is quantized to ppm integers and "
        "serialized (driver canonicalizer cannot hash list cells).",
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.core import arr_str
    from ..multimodal.binary_ops import extract_image_features
    imgs = _media_table(spark, sf_dir).filter(F.col("kind") == "image")
    feats = extract_image_features(imgs, dim=8, fake_decode=True)
    q = F.transform("feature", lambda x: F.floor(
        x.cast("double") * 1000000.0 + 0.5).cast("bigint"))
    return feats.select("media_id", arr_str(q).alias("feature"))


_HIST_DIM = 8


@register(
    "media_image_features_exact",
    f"""
    WITH {_MEDIA_CTE},
    imgs AS (
      SELECT media_id, payload FROM media WHERE kind = 'image'
    ),
    chars AS (
      SELECT i.media_id,
             ascii(substring(i.payload, g.j::INT + 1, 1))
               % {_HIST_DIM} AS b
      FROM imgs i,
           LATERAL (SELECT unnest(range(0,
                      octet_length(encode(i.payload)))) AS j) g
    )
    SELECT media_id,
           {', '.join(f"SUM(CASE WHEN b = {i} THEN 1 ELSE 0 END)::BIGINT"
                      f" AS h{i}" for i in range(_HIST_DIM))}
    FROM chars GROUP BY media_id
    """,
    doc="Full-oracle EXACT twin of media_image_features (VERDICT r6 "
        "task #6): the same mapInPandas vision-encoder stand-in, run "
        "with normalize=False so the byte-histogram COUNTS come back "
        "— exact integers (float32 holds ints < 2^24 exactly; "
        "payloads are bounded), so the whole Arrow round-trip "
        "(binary column in, fixed-dim vector out, batch shape, "
        "schema) is pinned by a bit-exact value hash instead of a "
        "rows-only check. The normalized float vector stays rows-"
        "only in media_image_features; this twin checks everything "
        "up to the one engine-local division.",
)
def media_image_features_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import extract_image_features
    imgs = _media_table(spark, sf_dir).filter(F.col("kind") == "image")
    feats = extract_image_features(imgs, dim=_HIST_DIM, fake_decode=True,
                                   normalize=False)
    cols = [F.element_at("feature", i + 1).cast("bigint").alias(f"h{i}")
            for i in range(_HIST_DIM)]
    return feats.select("media_id", *cols)


_RSZ_W, _RSZ_H, _RSZ_SRC_W = 8, 4, 16


@register(
    "media_resize",
    f"""
    WITH {_MEDIA_CTE},
    resized AS (
      SELECT media_id,
             CASE WHEN octet_length(encode(payload)) // {_RSZ_SRC_W} = 0
                  THEN ''
                  ELSE array_to_string(
                    [substring(payload,
                       ((i // {_RSZ_W})
                         * (octet_length(encode(payload)) // {_RSZ_SRC_W})
                         // {_RSZ_H}) * {_RSZ_SRC_W}
                       + (i % {_RSZ_W}) * ({_RSZ_SRC_W} // {_RSZ_W}) + 1, 1)
                     for i in range(0, {_RSZ_W * _RSZ_H})], '')
             END AS rs
      FROM media WHERE kind = 'image'
    )
    SELECT media_id, CAST({_RSZ_W} AS INT) AS width,
           CAST({_RSZ_H} AS INT) AS height,
           octet_length(encode(rs))::BIGINT AS n_bytes,
           md5(rs) AS out_md5
    FROM resized
    """,
    doc="Image resize as an Arrow-batched mapInPandas resample stage "
        "(decode -> RESIZE -> featurize): the fake treats the payload "
        "as a 16-byte-wide raster and nearest-neighbor-gathers it to "
        "8x4 — pure integer index math, so the oracle reproduces the "
        "output BYTES exactly on the ASCII payload and the md5 value-"
        "hash pins the whole resample path (real codec stubbed behind "
        "NotImplementedError like every media kernel). Per-row map, "
        "no shuffle; output is fixed 32 bytes per image regardless of "
        "input size — the memory contract a 100 TB media pipeline "
        "relies on.",
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import resize_image_batch
    imgs = _media_table(spark, sf_dir).filter(F.col("kind") == "image")
    rs = resize_image_batch(imgs, target_w=_RSZ_W, target_h=_RSZ_H,
                            src_width=_RSZ_SRC_W, fake_decode=True)
    return rs.select("media_id", "width", "height",
                     F.length("content").cast("bigint").alias("n_bytes"),
                     F.md5("content").alias("out_md5"))


_AUDIO_WIN, _AUDIO_STRIDE = 32, 16


@register(
    "media_audio_windows",
    f"""
    WITH {_MEDIA_CTE},
    auds AS (
      SELECT media_id, payload,
             octet_length(encode(payload)) AS n FROM media
      WHERE kind = 'audio'
    ),
    wins AS (
      SELECT a.media_id, g.j::INT AS window_idx,
             substring(a.payload, 1 + {_AUDIO_STRIDE} * g.j::INT,
                       {_AUDIO_WIN}) AS w
      FROM auds a,
           LATERAL (SELECT unnest(range(0,
                      greatest(1, ceil((a.n - {_AUDIO_WIN})
                               / {_AUDIO_STRIDE}.0)::BIGINT + 1))) AS j) g
    )
    SELECT media_id, window_idx,
           length(w)::BIGINT AS window_bytes, md5(w) AS window_md5
    FROM wins WHERE length(w) > 0
    """,
    doc="Audio windowing over the opaque binary column: overlapping "
        f"{_AUDIO_WIN}-byte windows at stride {_AUDIO_STRIDE} (the "
        "byte-level twin of doc_chunks — STFT-style framing before "
        "any codec). Pure native expressions: sequence + explode + "
        "binary substring, no Python; windows project to (bytes, md5) "
        "for portable hashing. The ASCII payload keeps byte and char "
        "offsets aligned so DuckDB can mirror the slicing.",
)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    auds = (_media_table(spark, sf_dir)
            .filter(F.col("kind") == "audio")
            .withColumn("n", F.length("content")))
    n_wins = F.greatest(
        F.lit(1),
        F.ceil((F.col("n") - F.lit(_AUDIO_WIN))
               / F.lit(float(_AUDIO_STRIDE))).cast("bigint") + 1)
    wins = auds.select(
        "media_id", "content",
        F.explode(F.sequence(F.lit(0), (n_wins - 1).cast("int")))
         .alias("window_idx"))
    w = F.col("content").substr(
        F.col("window_idx") * _AUDIO_STRIDE + 1, F.lit(_AUDIO_WIN))
    return (wins.select("media_id", "window_idx",
                        F.length(w).cast("bigint").alias("window_bytes"),
                        F.md5(w).alias("window_md5"))
                .filter(F.col("window_bytes") > 0))


_PHASH_HAM_MAX = 6


@register(
    "media_phash_dedup",
    f"""
    WITH {_MEDIA_CTE},
    imgs AS (
      SELECT media_id, payload FROM media WHERE kind = 'image'
    ),
    bits AS (
      SELECT media_id,
             list_transform(range(1, 65), i ->
               ascii(substring(payload, ((i - 1) % length(payload))::INT + 1,
                               1))) AS bv
      FROM imgs
    ),
    hashed AS (
      SELECT media_id,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(list_slice(bv, 1, 32),
                 x -> CASE WHEN x * 64 > list_sum(bv) THEN 1::BIGINT
                           ELSE 0::BIGINT END)),
               (a, b) -> a * 2 + b) AS h1,
             list_reduce(list_prepend(0::BIGINT,
               list_transform(list_slice(bv, 33, 64),
                 x -> CASE WHEN x * 64 > list_sum(bv) THEN 1::BIGINT
                           ELSE 0::BIGINT END)),
               (a, b) -> a * 2 + b) AS h2
      FROM bits
    ),
    banded AS (
      SELECT media_id, h1, h2, b.band_idx,
             CASE WHEN b.band_idx < 4
                  THEN (h1 >> (8 * b.band_idx::INT)) & 255
                  ELSE (h2 >> (8 * (b.band_idx::INT - 4))) & 255
             END AS band_val
      FROM hashed, (SELECT unnest(range(0, 8)) AS band_idx) b
    ),
    cand AS (
      SELECT DISTINCT x.media_id AS a, y.media_id AS b,
             x.h1 AS xh1, x.h2 AS xh2, y.h1 AS yh1, y.h2 AS yh2
      FROM banded x JOIN banded y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val
       AND x.media_id < y.media_id
    )
    SELECT (bit_count(xor(xh1, yh1)) + bit_count(xor(xh2, yh2)))::INT
             AS hamming,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN bit_count(xor(xh1, yh1))
                              + bit_count(xor(xh2, yh2))
                              <= {_PHASH_HAM_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs
    FROM cand GROUP BY 1
    """,
    doc="Perceptual-hash near-dup detection over the image corpus — "
        "the multimodal sibling of simhash_dup_pairs: a 64-bit "
        "average-hash per image (bit i = byte i above the 64-byte "
        "mean, folded into two 32-bit bigints by integer Horner — no "
        "floats, engine-exact), banded into 8x8-bit LSH buckets so "
        "candidate generation is an equi-join (hamming <= {t} "
        "guarantees one identical band by pigeonhole over 8 bands — "
        "exact recall, never all-pairs), then scored with "
        "bit_count(xor). Output is the candidate hamming histogram "
        "with the <= {t} dup count per bucket — the threshold-tuning "
        "diagnostic (this corpus has no near-dup images, so the dup "
        "column is verifiably zero while the candidate pipeline "
        "still exercises end to end). On the synthetic corpus the "
        "'pixels' are the fake-codec payload bytes; with a real "
        "codec the same hash+join runs on decoded pixel batches from "
        "the mapInPandas path (multimodal/binary_ops.py) — the join "
        "side is codec-agnostic. At 100 TB the shuffle carries "
        "(16-byte hash, 8-bit band) pairs, never pixels."
        .format(t=_PHASH_HAM_MAX),
)
def media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = (_media_table(spark, sf_dir)
            .filter(F.col("kind") == "image")
            .select("media_id",
                    F.decode("content", "UTF-8").alias("p")))
    # expr keeps the variable-position substring JVM-native (the
    # DataFrame substring() only takes literal positions)
    bits = imgs.withColumn(
        "bv",
        F.expr("transform(sequence(1, 64), i -> "
               "ascii(substr(p, CAST(((i - 1) % length(p)) AS INT) + 1, 1)))"))
    horner = ("aggregate(transform(slice(bv, {s}, 32), "
              "x -> CASE WHEN x * 64 > aggregate(bv, 0L, (a, b) -> a + b) "
              "THEN 1L ELSE 0L END), 0L, (a, b) -> a * 2 + b)")
    hashed = bits.select(
        "media_id",
        F.expr(horner.format(s=1)).alias("h1"),
        F.expr(horner.format(s=33)).alias("h2"))
    banded = hashed.select(
        "media_id", "h1", "h2",
        F.posexplode(F.array(
            *[F.shiftright("h1", 8 * i).bitwiseAND(F.lit(255))
              for i in range(4)],
            *[F.shiftright("h2", 8 * i).bitwiseAND(F.lit(255))
              for i in range(4)])).alias("band_idx", "band_val"))
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (x.join(y, (F.col("x.band_idx") == F.col("y.band_idx"))
                   & (F.col("x.band_val") == F.col("y.band_val"))
                   & (F.col("x.media_id") < F.col("y.media_id")))
             .select(F.col("x.media_id").alias("a"),
                     F.col("y.media_id").alias("b"),
                     F.col("x.h1").alias("xh1"), F.col("x.h2").alias("xh2"),
                     F.col("y.h1").alias("yh1"), F.col("y.h2").alias("yh2"))
             .distinct())
    ham = (F.bit_count(F.col("xh1").bitwiseXOR(F.col("yh1")))
           + F.bit_count(F.col("xh2").bitwiseXOR(F.col("yh2"))))
    return (cand.select(ham.cast("int").alias("hamming"))
                .groupBy("hamming")
                .agg(F.count("*").alias("n_pairs"),
                     F.sum(F.when(F.col("hamming") <= _PHASH_HAM_MAX, 1)
                            .otherwise(0)).cast("bigint")
                      .alias("n_dup_pairs")))
