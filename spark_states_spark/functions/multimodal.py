"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata — the engine treats them exactly like a production lakehouse
does: the bytes travel untouched through scans/joins/filters; decode and
feature extraction happen in Arrow-batched ``mapInPandas`` stages at the
edge of the plan.

The container has no codec libraries, so (per the build contract) the
decode step is STUBBED: ``decode_image_stub`` produces deterministic fake
features from the payload bytes, and ``decode_image_real`` raises
``NotImplementedError`` behind an import-try for PIL. The Spark-side
plumbing — binary schema, metadata struct, Arrow batch shapes, partition
behavior — is real and tested (tests/test_multimodal.py).

Since the fixtures ship no real media, payloads are synthesized from
``documents.text`` (utf-8 bytes) — byte-for-byte reproducible in the
DuckDB oracle, which verifies the manifest path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import register
from ..sources import load_table

_MEDIA_TYPES = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multimodal table: (doc_id, media_type, payload binary,
    meta struct<size_bytes, checksum>)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.octet_length("text").alias("size_bytes"),
            F.md5("text").alias("checksum"),
        ).alias("meta"),
    )


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(octet_length(encode(text)) AS INT) AS size_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest over the binary media table (size + checksum per asset).

    The payload column itself stays binary and is never collected — at
    scale only this manifest (and pushdown-pruned payload reads) move.
    """
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.size_bytes").alias("size_bytes"),
        F.col("meta.checksum").alias("checksum"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image_real(payload: bytes):  # pragma: no cover - env has no codecs
    """Real decoder — requires PIL, absent in this container by design."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; container ships no codec libs — "
            "deterministic stub (decode_image_stub) is used instead"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def decode_image_stub(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decode: dimensions/frames/features derived from
    the payload bytes so results are stable across runs and partitions."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    n_frames = 1 + (payload[0] % 8 if n else 0)
    # 8-dim "embedding": byte-chunk means, normalized to [0, 1].
    feature = []
    for i in range(8):
        chunk = payload[i::8][:32]
        feature.append((sum(chunk) / (255.0 * len(chunk))) if chunk else 0.0)
    return width, height, n_frames, feature


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` keeps the decode embarrassingly parallel per input
    partition — no shuffle; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, nf, feat = decode_image_stub(bytes(payload))
                rows.append((doc_id, mtype, w, h, nf, feat))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "width",
                    "height",
                    "n_frames",
                    "feature",
                ],
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


@register(
    "multimodal_decode_features",
    # The stub decoder's geometry is a pure function of the payload bytes
    # (width/height from octet_length, n_frames from the first byte, 8-dim
    # feature) — so the mapInPandas pipeline CAN have a real DuckDB oracle.
    # ascii(text) = first payload byte: the fixture text is pure ASCII
    # (verified octet_length(encode(text)) == length(text) for every row at
    # sf0.001/0.01/0.1) and never empty.
    oracle="""
    SELECT doc_id,
           ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
           CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height,
           CAST(1 + ascii(text) % 8 AS INT) AS n_frames,
           CAST(8 AS INT) AS feature_dim
    FROM documents
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary media (stubbed codec).

    Returns scalar features only (the array column stays engine-side) so
    the driver's canonicalization sees a stable flat schema.
    """
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "n_frames",
        F.size("feature").alias("feature_dim"),
    )


_TARGET_W, _TARGET_H = 32, 32
_SAMPLE_K = 3

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale_x", T.DoubleType()),
        T.StructField("scale_y", T.DoubleType()),
        # CSV, not array<int>: the driver's pandas canonicalization crashes
        # sorting list cells (round-2 `unhashable type: 'list'`); the flat
        # string carries identical information.
        T.StructField("sampled_frames_csv", T.StringType()),
    ]
)


def resize_stub(width: int, height: int) -> tuple[int, int, float, float]:
    """Deterministic resize descriptor to the target box (no codecs: the
    real path would decode, scale pixels, re-encode; the geometry below is
    exactly what it would compute)."""
    return _TARGET_W, _TARGET_H, _TARGET_W / width, _TARGET_H / height


def sample_frames_stub(n_frames: int, k: int) -> list[int]:
    """Evenly spaced frame indices (first/middle/last pattern) — the
    standard decimation rule for video pre-processing."""
    if n_frames <= 0:
        return []
    k = min(k, n_frames)
    return sorted({round(i * (n_frames - 1) / max(k - 1, 1)) for i in range(k)})


@register(
    "multimodal_resize_sample",
    # The resize geometry and frame decimation are pure arithmetic on the
    # payload bytes (see decode_image_stub / sample_frames_stub), so the
    # pipeline has a real DuckDB oracle. The frame CASE enumerates
    # sample_frames_stub(nf, 3) for nf in 1..8 — Python banker's rounding
    # makes round(1.5)=2, round(2.5)=2, round(3.5)=4, hence the literals.
    oracle=f"""
    WITH geo AS (
      SELECT doc_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             16 + octet_length(encode(text)) % 64 AS w,
             16 + (octet_length(encode(text)) // 64) % 64 AS h,
             1 + ascii(text) % 8 AS nf
      FROM documents
    )
    SELECT doc_id, media_type,
           CAST({_TARGET_W} AS INT) AS out_width,
           CAST({_TARGET_H} AS INT) AS out_height,
           CAST({_TARGET_W}.0 / w AS DOUBLE) AS scale_x,
           CAST({_TARGET_H}.0 / h AS DOUBLE) AS scale_y,
           CASE WHEN media_type <> 'video' THEN '0'
                ELSE CASE nf WHEN 1 THEN '0' WHEN 2 THEN '0,1' WHEN 3 THEN '0,1,2'
                             WHEN 4 THEN '0,2,3' WHEN 5 THEN '0,2,4'
                             WHEN 6 THEN '0,2,5' WHEN 7 THEN '0,3,6'
                             WHEN 8 THEN '0,4,7' END
           END AS sampled_frames_csv
    FROM geo
    """,
)
def multimodal_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample pipeline stage (decode → geometry → sampling).

    Chains on the decode stage inside the SAME mapInPandas pass — one
    Python crossing per partition for the whole media pipeline, still
    shuffle-free. Images/audio get a single "frame"; video frame indices
    are evenly decimated.
    """
    media = media_table(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, nf, _feat = decode_image_stub(bytes(payload))
                ow, oh, sx, sy = resize_stub(w, h)
                frames = sample_frames_stub(nf if mtype == "video" else 1, _SAMPLE_K)
                rows.append(
                    (doc_id, mtype, ow, oh, sx, sy, ",".join(map(str, frames)))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "out_width",
                    "out_height",
                    "scale_x",
                    "scale_y",
                    "sampled_frames_csv",
                ],
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=_RESIZE_SCHEMA
    )
