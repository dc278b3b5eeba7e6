"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design contract (training-data pipeline at 100 TB):
  * payloads are ``binary`` columns; metadata is a typed struct column —
    never parse payloads JVM-side, never stringify binaries;
  * every media transform is an Arrow-batched ``mapInPandas`` whose
    batch memory is bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch (payloads are wide — same discipline as the
    `content` column in the dedup pipeline);
  * transforms that multiply rows (frame sampling) are generator UDFs
    yielding multiple output rows per input — Spark handles the
    fan-out, partitioning stays by media_id.

Codec reality in this sandbox: real image/audio libs (PIL, ffmpeg) are
NOT installed.  The *structure* here is real — schemas, UDF signatures,
batch iteration, row fan-out — while byte-level decoding targets SMF
("synthetic media format"), a deterministic fake codec defined below.
``decode_real_image`` shows where a real decoder plugs in and raises
NotImplementedError until PIL is present (import-gated).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), False),
    ]), False),
])

_MAGIC = b"SMF1"


# --- SMF: deterministic fake codec (header + raw payload) ----------------

def smf_encode_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return _MAGIC + b"I" + struct.pack("<II", width, height) + pixels


def smf_encode_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2 ** 15), 2 ** 15, size=n_samples, dtype=np.int16).tobytes()
    return _MAGIC + b"A" + struct.pack("<II", sample_rate, n_samples) + samples


def smf_encode_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=width * height * n_frames, dtype=np.uint8).tobytes()
    return _MAGIC + b"V" + struct.pack("<III", width, height, n_frames) + frames


def _smf_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    assert payload[:5] == _MAGIC + b"I", "not an SMF image"
    w, h = struct.unpack_from("<II", payload, 5)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=13)
    return w, h, px.reshape(h, w)


def _smf_video(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    assert payload[:5] == _MAGIC + b"V", "not an SMF video"
    w, h, n = struct.unpack_from("<III", payload, 5)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * n, offset=17)
    return w, h, n, px.reshape(n, h, w)


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (n rows, mixed kinds)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 16 + (i % 5) * 8, 16 + (i % 3) * 8
            rows.append((i, kind, smf_encode_image(w, h, seed + i),
                         (w, h, None, None, "smf1")))
        elif kind == "audio":
            sr, ns = 8000, 4000 + (i % 7) * 500
            rows.append((i, kind, smf_encode_audio(sr, ns, seed + i),
                         (None, None, sr, ns * 1000 // sr, "smf1")))
        else:
            w, h, nf = 16, 16, 4 + (i % 4)
            rows.append((i, kind, smf_encode_video(w, h, nf, seed + i),
                         (w, h, None, nf * 40, "smf1")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- transforms ----------------------------------------------------------

DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mean_px", T.DoubleType(), False),
    T.StructField("pixels", T.BinaryType(), False),
])


def decode_images(media: DataFrame) -> DataFrame:
    """image rows -> decoded pixel buffers + stats (Arrow batches)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "mean_px": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = _smf_image(bytes(payload))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_px"].append(float(px.mean()))
                out["pixels"].append(px.tobytes())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=DECODED_IMAGE_SCHEMA)
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on decoded SMF images (real numpy
    resampling of the fake pixels)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "mean_px": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = _smf_image(bytes(payload))
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                rs = px[np.ix_(yi, xi)]
                out["media_id"].append(mid)
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["mean_px"].append(float(rs.mean()))
                out["pixels"].append(rs.tobytes())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=DECODED_IMAGE_SCHEMA)
    )


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """video rows -> one output row per sampled frame (row fan-out
    inside the Arrow UDF; partitioning stays by media_id)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, n, frames = _smf_video(bytes(payload))
                for idx in range(0, n, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(frames[idx].tobytes())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=FRAME_SCHEMA)
    )


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), False),
])


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Payload -> fixed-dim feature vector (byte-histogram projection —
    a real, deterministic computation standing in for a learned
    embedding; output feeds the ANN operators unchanged)."""
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "kind": [], "feature": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b % dim, minlength=dim).astype("float64")
                norm = np.linalg.norm(hist)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["feature"].append((hist / (norm or 1.0)).astype("float32").tolist())
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def decode_real_image(media: DataFrame) -> DataFrame:
    """REAL image decoding (reference hasher.py:35, classifier.py:
    394-410): PNG/JPEG/... payloads -> grayscale pixel buffers, same
    output contract as the SMF ``decode_images`` so every downstream
    transform (resize, features, hashing) is decoder-agnostic.

    Import-gated on the driver: raises immediately with a clear message
    when Pillow is absent (it is not installed in this sandbox, so this
    path is exercised only by its import-skipped test); when present,
    the decode runs Arrow-batched on executors like every other media
    transform.  A payload PIL cannot parse yields a FAULT row
    (width = -1) rather than failing the task — the errors-are-never-
    silent rule."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding requires Pillow; this environment has no "
            "image codecs — use decode_images (SMF) for the plumbing path"
        ) from e

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import PIL.Image as Image

        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "mean_px": [], "pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    img = Image.open(io.BytesIO(bytes(payload))).convert("L")
                    px = np.asarray(img, dtype=np.uint8)
                    out["width"].append(int(px.shape[1]))
                    out["height"].append(int(px.shape[0]))
                    out["mean_px"].append(float(px.mean()) if px.size else 0.0)
                    out["pixels"].append(px.tobytes())
                except Exception:
                    out["width"].append(-1)   # FAULT row, never silent
                    out["height"].append(-1)
                    out["mean_px"].append(-1.0)
                    out["pixels"].append(b"")
                out["media_id"].append(mid)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(gen, schema=DECODED_IMAGE_SCHEMA)
    )
