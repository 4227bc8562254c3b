"""Multimodal column processing (SURVEY.md §2b ext): images / audio /
video as opaque `binary` payload columns with typed metadata, processed by
Arrow-batched `mapInPandas` operators.

Container decoding (JPEG/PNG/WAV/MP4) requires codec libraries that are NOT
in this environment — that step is stubbed behind NotImplementedError, with
a deterministic RAW container format standing in so every downstream stage
(feature extraction, resize, frame sampling) is REAL, runs on real numpy
arrays, and is tested end-to-end. The Spark-side plumbing — schemas, batch
iteration, output shapes, partition sizing — is exactly what a production
deployment keeps; only `_decode_*` swaps to PIL/soundfile/pyav.

RAW container layouts (little-endian u32 header fields after a 4-byte magic):
  RAWI: magic 'RAWI' | width | height | channels | payload (w*h*c bytes)
  RAWA: magic 'RAWA' | sample_rate | n_samples | payload (int16 samples)
  RAWV: magic 'RAWV' | width | height | n_frames | payload (n*w*h bytes, gray)

Scale notes (100 TB of media):
  * Binary payloads dominate row size — keep
    `spark.sql.files.maxPartitionBytes` at its default 128 MB so a task
    holds only a few hundred images, and NEVER collect payload columns.
  * Each operator prunes to (id, payload) before the Python exchange, so
    Arrow transfers exactly the bytes the stage needs; metadata-only
    stages (n_bytes, checksum) stay JVM-side entirely.
  * Frame sampling EXPLODES row count; it repartitions afterward so
    downstream stages aren't skewed by per-video frame counts.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC_I, _MAGIC_A, _MAGIC_V = b"RAWI", b"RAWA", b"RAWV"


# ----------------------------------------------------------------------
# Container encode/decode (the stubbed codec boundary)
# ----------------------------------------------------------------------

def encode_rawi(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return _MAGIC_I + struct.pack("<III", w, h, c) + arr.astype(np.uint8).tobytes()


def encode_rawa(samples: np.ndarray, sample_rate: int) -> bytes:
    return (
        _MAGIC_A
        + struct.pack("<II", sample_rate, len(samples))
        + samples.astype("<i2").tobytes()
    )


def encode_rawv(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return _MAGIC_V + struct.pack("<III", w, h, n) + frames.astype(np.uint8).tobytes()


def _decode_image(b: bytes) -> np.ndarray:
    """payload → HxWxC uint8. Real containers AUTO-ENABLE behind an
    import probe (the Avro-gate pattern, tests/test_sources.py): when
    Pillow is installed in the executors' environment, JPEG/PNG/WebP
    payloads decode through it with zero code changes; without it the
    RAW path still works and other containers fail with the actionable
    message. The probe runs per decode call but import caches make it a
    dict hit after the first."""
    if b[:4] == _MAGIC_I:
        w, h, c = struct.unpack("<III", b[4:16])
        return np.frombuffer(b, np.uint8, count=w * h * c, offset=16).reshape(h, w, c)
    try:
        from PIL import Image  # codec gate: present in prod images
    except ImportError:
        raise NotImplementedError(
            "non-RAW image container (JPEG/PNG/...) — requires Pillow, "
            "not available in this environment; pip install Pillow on "
            "the executors and this branch activates itself"
        ) from None
    import io

    img = Image.open(io.BytesIO(b))
    if img.mode not in ("L", "RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    return arr[:, :, None] if arr.ndim == 2 else arr


def _decode_audio(b: bytes) -> tuple[np.ndarray, int]:
    if b[:4] == _MAGIC_A:
        rate, n = struct.unpack("<II", b[4:12])
        return np.frombuffer(b, "<i2", count=n, offset=12), rate
    try:
        import soundfile as sf  # codec gate (same pattern as Pillow)
    except ImportError:
        raise NotImplementedError(
            "non-RAW audio container — requires soundfile; pip install "
            "soundfile on the executors and this branch activates itself"
        ) from None
    import io

    samples, rate = sf.read(io.BytesIO(b), dtype="int16", always_2d=False)
    if samples.ndim == 2:  # downmix to mono like the RAW contract
        samples = samples.mean(axis=1).astype(np.int16)
    return samples, int(rate)


def _decode_video(b: bytes) -> np.ndarray:
    if b[:4] == _MAGIC_V:
        w, h, n = struct.unpack("<III", b[4:16])
        return np.frombuffer(b, np.uint8, count=n * h * w, offset=16).reshape(n, h, w)
    try:
        import av  # codec gate (same pattern as Pillow)
    except ImportError:
        raise NotImplementedError(
            "non-RAW video container — requires pyav; pip install av on "
            "the executors and this branch activates itself"
        ) from None
    import io

    frames = []
    with av.open(io.BytesIO(b)) as container:
        for frame in container.decode(video=0):
            frames.append(np.asarray(frame.to_image().convert("L"), np.uint8))
    return np.stack(frames)


# ----------------------------------------------------------------------
# Operators
# ----------------------------------------------------------------------

def payload_stats(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Metadata-only integrity pass — stays entirely JVM-side (no decode,
    no Python): size + checksum per payload."""
    return df.select(
        F.col(id_col),
        F.octet_length(data_col).cast("bigint").alias("n_bytes"),
        F.md5(F.col(data_col)).alias("payload_md5"),
    )


def image_features(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Decode + per-image features: dims, channel mean/std, brightness.
    `n_bytes` (raw payload size) rides along so a downstream integrity
    check can compare the container size against the decoded shape without
    re-reading the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                b = bytes(b)
                a = _decode_image(b).astype(np.float64)
                out.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(b),
                        "width": a.shape[1],
                        "height": a.shape[0],
                        "channels": a.shape[2],
                        "mean_px": round(float(a.mean()), 4),
                        "std_px": round(float(a.std()), 4),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, data_col).mapInPandas(
        run,
        schema="media_id long, n_bytes long, width int, height int, channels int, "
        "mean_px double, std_px double",
    )


def resize_images(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to RAWI (real resampling logic —
    the interpolation a training pipeline applies before batching)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                a = _decode_image(bytes(b))
                h, w, _ = a.shape
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                ids.append(mid)
                payloads.append(encode_rawi(a[yi, xi]))
            yield pd.DataFrame({"media_id": ids, "data": payloads})

    return df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, data binary"
    )


def audio_features(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                samples, rate = _decode_audio(bytes(b))
                x = samples.astype(np.float64)
                out.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "duration_ms": int(len(x) * 1000 / rate),
                        "rms": round(float(np.sqrt(np.mean(x * x))), 4),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, sample_rate int, duration_ms long, rms double"
    )


def sample_frames(
    df: DataFrame, every_n: int = 2, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Video → one row per sampled frame (frame re-encoded as 1-channel
    RAWI). Repartitions the exploded output so per-video frame counts don't
    skew downstream stages."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                v = _decode_video(bytes(b))
                for i in range(0, v.shape[0], every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(encode_rawi(v[i][:, :, None]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "data": frames})

    out = df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, frame_idx int, data binary"
    )
    return out.repartition("media_id", "frame_idx")
