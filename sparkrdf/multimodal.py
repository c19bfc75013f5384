"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample stages.

The Spark-side plumbing is real and tested — schemas, partitioning, UDF
signatures, Arrow batch shapes. The CODEC step is pluggable: the real
decoders (Pillow / libsndfile / pyav) are not installed in this sandbox, so
the default codec is a deterministic fake that parses our own tiny header
format; swap in a real codec per modality via the ``codec`` argument and
nothing else changes. This mirrors how a production pipeline isolates the
C-library dependency inside one vectorized stage.

Fake container formats (deterministic, self-describing):
- image: ``b"IMG1" + width(u32 LE) + height(u32 LE) + channels(u8) + pixels``
- audio: ``b"AUD1" + sample_rate(u32 LE) + n_samples(u32 LE) + samples(i16 LE)``
- video: ``b"VID1" + n_frames(u32 LE) + [frame_len(u32 LE) + image-bytes]*``

At 100 TB: binary payloads dominate row size, so every stage uses
``mapInPandas`` (streamed Arrow batches — bounded memory per task,
no row-at-a-time Python), keeps the payload column OUT of shuffles
(features are extracted before any groupBy/join), and repartitions by a
size-balanced key when payload skew is expected.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id string, width int, height int, channels int, format string, ok boolean"
)
IMAGE_FEATURE_SCHEMA = (
    "doc_id string, width int, height int, channels int, "
    "mean_luma double, std_luma double, phash string, ok boolean"
)
AUDIO_FEATURE_SCHEMA = (
    "doc_id string, sample_rate int, n_samples int, duration_s double, "
    "rms double, zero_crossings bigint, ok boolean"
)
FRAME_SCHEMA = "doc_id string, frame_idx int, frame binary, ok boolean"


def _ship(df: DataFrame) -> DataFrame:
    """Executors unpickle these mapInPandas stages by importing
    sparkrdf.multimodal — ship the package zip first (no-op when the app
    was launched with --py-files or the zip is already added). Without
    this, any driver not launched from the repo directory fails with
    ModuleNotFoundError on the executors."""
    from sparkrdf.session import ensure_pyfiles

    ensure_pyfiles(df.sparkSession)
    return df


# ---------------------------------------------------------------------------
# deterministic fake codecs (replace with Pillow/soundfile/pyav in prod)
# ---------------------------------------------------------------------------


def decode_image_fake(raw: bytes):
    """bytes → (height, width, channels) uint8 ndarray — fake IMG1 codec.

    A real deployment passes ``codec=PIL_decode`` instead; the plumbing
    (batching, schema, null handling) is identical.
    """
    if raw is None or len(raw) < 13 or raw[:4] != b"IMG1":
        raise ValueError("not an IMG1 payload")
    w, h = struct.unpack("<II", raw[4:12])
    c = raw[12]
    need = w * h * c
    px = np.frombuffer(raw[13 : 13 + need], dtype=np.uint8)
    if px.size != need:
        raise ValueError("truncated IMG1 payload")
    return px.reshape(h, w, c)


def encode_image_fake(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return b"IMG1" + struct.pack("<II", w, h) + bytes([c]) + arr.tobytes()


def decode_audio_fake(raw: bytes):
    """bytes → (sample_rate, int16 ndarray) — fake AUD1 codec."""
    if raw is None or len(raw) < 12 or raw[:4] != b"AUD1":
        raise ValueError("not an AUD1 payload")
    sr, n = struct.unpack("<II", raw[4:12])
    samples = np.frombuffer(raw[12 : 12 + 2 * n], dtype=np.int16)
    if samples.size != n:
        raise ValueError("truncated AUD1 payload")
    return sr, samples


def decode_video_fake(raw: bytes):
    """bytes → list of frame byte-strings — fake VID1 codec."""
    if raw is None or len(raw) < 8 or raw[:4] != b"VID1":
        raise ValueError("not a VID1 payload")
    (n_frames,) = struct.unpack("<I", raw[4:8])
    frames, off = [], 8
    for _ in range(n_frames):
        (flen,) = struct.unpack("<I", raw[off : off + 4])
        off += 4
        frames.append(raw[off : off + flen])
        off += flen
    return frames


def decode_image_pillow(raw: bytes):
    """bytes → (h, w, c) uint8 ndarray via Pillow — the real-format codec
    (PNG/JPEG/WebP/...). Import is inside the function so the module loads
    in codec-less environments; each executor pays the import once."""
    import io

    from PIL import Image  # raises ImportError where Pillow isn't installed

    if raw is None:
        raise ValueError("null payload")
    arr = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"), dtype=np.uint8)
    return arr


def encode_image_pillow(arr: np.ndarray, fmt: str = "PNG") -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format=fmt)
    return buf.getvalue()


IMAGE_CODECS = {
    "fake": (decode_image_fake, encode_image_fake),
    "pillow": (decode_image_pillow, encode_image_pillow),
}


def get_image_codec(name: str):
    """(decode, encode) pair by name — 'fake' (IMG1 container, always
    available) or 'pillow' (real PNG/JPEG, requires Pillow on executors)."""
    if name not in IMAGE_CODECS:
        raise ValueError(f"unknown image codec {name!r} (have {sorted(IMAGE_CODECS)})")
    return IMAGE_CODECS[name]


def phash_hex(luma: np.ndarray) -> str:
    """8x8 average-hash fingerprint (classic pHash-lite) of a 2-D luma
    array: downsample by block means, threshold at the mean, hex-pack.
    Shared by the Spark stage and the test goldens so the expected value is
    computable from raw pixels without any codec."""
    h, w = luma.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    blocks = np.array(
        [
            luma[ys[i] : max(ys[i + 1], ys[i] + 1),
                 xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(8)
            for j in range(8)
        ]
    )
    bits = (blocks > blocks.mean()).astype(np.uint8)
    return "".join(
        format(int("".join(map(str, bits[k : k + 8])), 2), "02x")
        for k in range(0, 64, 8)
    )


# ---------------------------------------------------------------------------
# Spark stages (mapInPandas — streamed Arrow batches)
# ---------------------------------------------------------------------------


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    codec: Callable = decode_image_fake,
) -> DataFrame:
    """binary image column → per-image feature rows (decode isolated in one
    Arrow-batched stage; undecodable rows survive with ok=false, never
    failing the job — at 100 TB some corruption is certain)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                rid, raw = rec[id_col], rec[bin_col]
                try:
                    arr = codec(raw)
                    luma = arr.mean(axis=2) if arr.ndim == 3 else arr
                    phash = phash_hex(luma)
                    out.append(
                        (rid, int(arr.shape[1]), int(arr.shape[0]),
                         int(arr.shape[2] if arr.ndim == 3 else 1),
                         float(luma.mean()), float(luma.std()), phash, True)
                    )
                except Exception:
                    out.append((rid, None, None, None, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "channels",
                         "mean_luma", "std_luma", "phash", "ok"],
            )

    return _ship(df).select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        run, IMAGE_FEATURE_SCHEMA
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    codec: Callable = decode_image_fake,
    encoder: Callable = encode_image_fake,
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to the same container format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                rid, raw = rec[id_col], rec[bin_col]
                try:
                    arr = codec(raw)
                    h, w = arr.shape[:2]
                    yi = (np.arange(height) * (h / height)).astype(int).clip(0, h - 1)
                    xi = (np.arange(width) * (w / width)).astype(int).clip(0, w - 1)
                    res = arr[yi][:, xi]
                    out.append((rid, encoder(np.ascontiguousarray(res)), True))
                except Exception:
                    out.append((rid, None, False))
            yield pd.DataFrame(out, columns=["doc_id", "payload", "ok"])

    return _ship(df).select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        run, "doc_id string, payload binary, ok boolean"
    )


def audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    codec: Callable = decode_audio_fake,
) -> DataFrame:
    """binary audio → (duration, RMS, zero-crossing count)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                rid, raw = rec[id_col], rec[bin_col]
                try:
                    sr, s = codec(raw)
                    f = s.astype(np.float64)
                    rms = float(np.sqrt((f * f).mean())) if s.size else 0.0
                    zc = int(((s[:-1] < 0) != (s[1:] < 0)).sum()) if s.size > 1 else 0
                    out.append((rid, int(sr), int(s.size), s.size / sr, rms, zc, True))
                except Exception:
                    out.append((rid, None, None, None, None, None, False))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "sample_rate", "n_samples", "duration_s",
                         "rms", "zero_crossings", "ok"],
            )

    return _ship(df).select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "doc_id",
    bin_col: str = "payload",
    codec: Callable = decode_video_fake,
) -> DataFrame:
    """Video → one output row per sampled frame (frame_idx % every_n == 0).

    A 1→many flatMap: emitted rows carry the frame bytes so downstream
    image stages (image_features / resize_images) apply unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                rid, raw = rec[id_col], rec[bin_col]
                try:
                    for i, frame in enumerate(codec(raw)):
                        if i % every_n == 0:
                            out.append((rid, i, frame, True))
                except Exception:
                    out.append((rid, None, None, False))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame", "ok"])

    return _ship(df).select(F.col(id_col).alias(id_col), F.col(bin_col)).mapInPandas(
        run, FRAME_SCHEMA
    )


def synthesize_media(spark, n: int, kind: str = "image", partitions: int = 8) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks: (doc_id, payload).

    Payloads derive only from the row id, so any stage is reproducible."""
    from sparkrdf.session import ensure_pyfiles

    ensure_pyfiles(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                i = int(rec["id"])
                rng = np.random.default_rng(i)
                if kind == "image":
                    w, h, c = 16 + i % 17, 16 + (i * 7) % 13, 3
                    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
                    payload = encode_image_fake(arr)
                elif kind == "audio":
                    sr, ns = 8000, 1000 + (i % 500)
                    samples = (
                        (np.sin(np.arange(ns) * (220 + i % 200) / sr * 2 * np.pi) * 8000)
                        .astype(np.int16)
                    )
                    payload = b"AUD1" + struct.pack("<II", sr, ns) + samples.tobytes()
                else:  # video
                    frames = []
                    for f_i in range(3 + i % 4):
                        arr = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
                        fb = encode_image_fake(arr)
                        frames.append(struct.pack("<I", len(fb)) + fb)
                    payload = b"VID1" + struct.pack("<I", len(frames)) + b"".join(frames)
                out.append((f"{kind}{i}", payload))
            yield pd.DataFrame(out, columns=["doc_id", "payload"])

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, "doc_id string, payload binary")
    )
