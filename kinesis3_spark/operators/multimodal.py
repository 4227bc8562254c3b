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


def image_ahash(
    df: DataFrame, id_col: str = "media_id", data_col: str = "data"
) -> DataFrame:
    """Perceptual average-hash (aHash) per image, as 4 × 16-bit Hamming
    bands — the DCT-free tier of the pHash family every image pretraining
    corpus runs before (expensive) embedding dedup.

    Definition (integer-exact, so a SQL oracle can re-derive it): collapse
    channels by sum, partition the H×W plane into an 8×8 grid with floor
    boundaries (row group rg covers rows [floor(rg*H/8), floor((rg+1)*H/8)),
    same for columns), then
        bit[rg,cg] = 1  iff  cell_sum * (H*W) > total_sum * cell_npx
    — i.e. cell mean > global pixel mean, compared via cross-multiplied
    int64s so NO float division can diverge between engines (sums are
    ≤ 255·3·HW, far inside int64). Empty groups (H<8 or W<8) hash to 0.
    The 64 bits pack as bands[b] = Σ_cg bit[2b,cg]<<cg + bit[2b+1,cg]<<(cg+8)
    for b in 0..3 — 16-bit band values keep every downstream integer small
    (no signed-int64 bit-63 edge) and make banded candidate generation
    LOSSLESS for Hamming radius ≤ 3: two hashes ≤ 3 bits apart must agree
    on ≥ 1 of the 4 bands (pigeonhole), so an equi-join on (band, value)
    finds exactly the true near-dup set, not an approximation of it.

    One Arrow pass over (id, payload); the 8×8 cell loop is 64 bounded
    slices per image. At 100 TB the payload never leaves the executors —
    output is 1 row × ~40 bytes per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands_out = [], []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                ids.append(mid)
                bands_out.append(_ahash_bands_of(bytes(b)))
            yield pd.DataFrame({"media_id": ids, "bands": bands_out})

    return df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, bands array<int>"
    )


def _ahash_bands_of(payload: bytes) -> list[int]:
    """The aHash kernel of image_ahash as a pure function (shared with
    frame_ahash): RAWI/codec payload → 4 × 16-bit band values."""
    a = _decode_image(payload).astype(np.int64).sum(axis=2)
    h, w = a.shape
    rb = (np.arange(9) * h) // 8
    cb = (np.arange(9) * w) // 8
    ts, tp = int(a.sum()), h * w
    bands = [0, 0, 0, 0]
    for rg in range(8):
        r0, r1 = int(rb[rg]), int(rb[rg + 1])
        if r0 == r1:
            continue
        for cg in range(8):
            c0, c1 = int(cb[cg]), int(cb[cg + 1])
            if c0 == c1:
                continue
            cs = int(a[r0:r1, c0:c1].sum())
            if cs * tp > ts * (r1 - r0) * (c1 - c0):
                bands[rg // 2] += 1 << (cg + 8 * (rg % 2))
    return bands


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    data_col: str = "data",
    n_windows: int = 65,
) -> DataFrame:
    """Chromaprint-style banded audio fingerprint per clip — the
    spectral-free integer tier (energy-delta sign bits): decode RAWA,
    partition the sample stream into `n_windows` equal windows with
    floor boundaries (window k covers samples [floor(k*n/W),
    floor((k+1)*n/W)) — the image_ahash grid trick on the time axis),
    take per-window energy E[k] = Σ sample², and emit one bit per
    adjacent-window delta: bit[k] = 1 iff E[k+1] > E[k]. 65 windows →
    64 bits, packed as 8 bands × 8 bits (bands[b] = Σ_j bit[8b+j]<<j).

    Integer-exact end to end (energies are int64 sums of int16²; bits
    are pure comparisons), so a SQL oracle can re-derive it. 8 bands
    make banded candidate generation LOSSLESS for Hamming radius ≤ 7
    (pigeonhole) under banded_hamming_pairs. Real chromaprint replaces
    the energy windows with chroma-filtered spectral frames — that swap
    lives entirely inside this function; the banded-join consumer is
    unchanged. One Arrow pass; output is 1 row × ~70 bytes per clip.

    Overflow bound: per-window energy ≤ n_window_samples × 2³⁰ — safe
    to ~2³³ samples per window (≈ 10 days of 48 kHz audio per WINDOW)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands_out = [], []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                samples, _rate = _decode_audio(bytes(b))
                n = len(samples)
                wb = (np.arange(n_windows + 1) * n) // n_windows
                cs = np.concatenate(
                    [[0], np.cumsum(samples.astype(np.int64) ** 2)]
                )
                e = cs[wb[1:]] - cs[wb[:-1]]
                bits = (e[1:] > e[:-1]).astype(np.int64)
                bands = [
                    int(sum(int(bits[8 * g + j]) << j for j in range(8)))
                    for g in range((n_windows - 1) // 8)
                ]
                ids.append(mid)
                bands_out.append(bands)
            yield pd.DataFrame({"media_id": ids, "bands": bands_out})

    return df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, bands array<int>"
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    max_hamming: int,
    n_bands: int,
    flip_superbands: int | None = None,
) -> DataFrame:
    """(media_id_a < media_id_b, hamming) for every pair within
    `max_hamming` bits under an `n_bands`-band Hamming-space encoding
    (`bands` array column) — the banded machinery of ahash_neardup_pairs
    generalized over band count (VERDICT r13 agenda #3): image aHash
    uses 4 × 16-bit bands (radius ≤ 3), the audio fingerprint 8 × 8-bit
    bands (radius ≤ 7).

    Plan shape (the MinHash-LSH discipline applied to Hamming space):
      1. IDENTICAL hashes pair by a plain equi-join on the band array —
         the overwhelmingly common exact-re-upload case never enters the
         banded join, so its cost is the true output size, not a blowup.
      2. DISTINCT hashes: explode n_bands (band, value) keys per hash →
         equi-join on (band, value) → distinct candidate hash pairs →
         exact Hamming via zip_with/bit_count (JVM built-ins) → join ids
         back. For max_hamming < n_bands this is EXACT (pigeonhole: two
         hashes ≤ max_hamming bits apart must agree on ≥ 1 band), so the
         brute-force all-pairs oracle and this banded plan provably
         agree.
    Never an all-pairs comparison; candidate volume per band bucket is
    |bucket|² over a 2^(64/n_bands) key space per band — at larger radii
    raise the band count, the same knob LSH tunes. The plan references
    `hashes` six times (two banded legs, two id joins, two identical-hash
    legs): pass a persisted/materialized relation or each reference
    re-derives the hashes from source (queries/multimodalq._phash_for
    does this).

    `flip_superbands=g` switches candidate generation to the two-level
    pigeonhole (OPTIMIZATION_r14: narrow band values bucket too
    coarsely — the 8-bit audio bands put 5k fingerprints into 256
    buckets per band, 1.2M candidate pairs at sf0.1): adjacent bands
    group into g superbands of 64/g bits; a pair within `max_hamming`
    bits has SOME superband within floor(max_hamming/g) ≤ 1 bit
    (pigeonhole), and a ≤1-bit superband match is caught by equi-joining
    one side's exact superband values against the other side's value
    XOR {0, each single bit} — still exact, still lossless, but keyed
    over the full 2^(64/g) superband space, so buckets shatter. Key
    rows per hash grow g·(64/g + 2)-fold; candidate volume drops by the
    bucket-shatter factor (measured 12.5x on the audio tier). Requires
    max_hamming < 2·g (the ≤1-bit guarantee) and g | n_bands."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"{n_bands}-band encoding is lossless only for Hamming radius "
            f"<= {n_bands - 1}; raise the band count for larger radii"
        )
    dist = hashes.select("bands").distinct()
    ham = F.aggregate(
        F.zip_with(
            F.col("ba"), F.col("bb"), lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    if flip_superbands:
        g = flip_superbands
        if n_bands % g or max_hamming >= 2 * g:
            raise ValueError(
                "flip_superbands must divide n_bands and satisfy "
                "max_hamming < 2 * flip_superbands (the <=1-bit-per-"
                "superband pigeonhole)"
            )
        m = n_bands // g          # bands per superband
        w = 64 // n_bands         # bits per band
        # Band-width contract (ADVICE r14): packing assumes every band
        # value fits in w = 64/n_bands bits — a wider value would overlap
        # the adjacent band's lanes in the packed superband, and a 1-bit
        # band difference would no longer be a 1-bit flip of v (silently
        # dropped pairs). Current callers (8x8-bit audio, 4x16-bit image)
        # satisfy it by construction; this guard turns a future caller's
        # violation into a loud failure instead of missing duplicates.
        # Cost: w-bit range checks on the distinct-hash relation only.
        band_in_range = F.forall(
            "bands", lambda b: (b >= 0) & (b < F.lit(1 << w))
        )
        band_guard = F.assert_true(
            band_in_range,
            F.lit(
                f"flip_superbands={g} requires band values < 2^{w} "
                f"(= 64/n_bands bits); got a wider band — pack with more "
                f"bands or disable the flip path"
            ),
        )
        # assert_true yields NULL when the predicate holds, so this filter
        # keeps every valid row; `| lit(True)` would let BooleanSimplification
        # fold the assert away entirely.
        dist = dist.where(band_guard.isNull())
        sb_vals = F.array(
            *[
                sum(
                    (
                        F.element_at("bands", sb * m + j + 1).cast("long")
                        * F.lit(1 << (w * j))
                        for j in range(1, m)
                    ),
                    start=F.element_at("bands", sb * m + 1).cast("long"),
                )
                for sb in range(g)
            ]
        )
        plain = dist.select(
            "bands", F.posexplode(sb_vals).alias("sb", "v")
        )
        flips = F.array(F.lit(0), *[F.lit(1 << i) for i in range(w * m)])
        flipped = plain.select(
            "bands",
            "sb",
            F.explode(flips).alias("flip"),
            F.col("v"),
        ).select(
            "bands", "sb", F.col("v").bitwiseXOR(F.col("flip")).alias("v")
        )
        x, y = plain.alias("x"), flipped.alias("y")
        raw = x.join(
            y,
            (F.col("x.sb") == F.col("y.sb"))
            & (F.col("x.v") == F.col("y.v"))
            & (F.col("x.bands") < F.col("y.bands")),
        )
    else:
        keyed = dist.select(
            "bands", F.posexplode("bands").alias("band", "bv")
        )
        x, y = keyed.alias("x"), keyed.alias("y")
        raw = x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.bands") < F.col("y.bands")),
        )
    cand = (
        raw.select(F.col("x.bands").alias("ba"), F.col("y.bands").alias("bb"))
        .distinct()
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
    )
    ha = hashes.select(F.col("bands").alias("ba"), F.col("media_id").alias("ia"))
    hb = hashes.select(F.col("bands").alias("bb"), F.col("media_id").alias("ib"))
    cross = cand.join(ha, "ba").join(hb, "bb").select(
        F.least("ia", "ib").alias("media_id_a"),
        F.greatest("ia", "ib").alias("media_id_b"),
        "hamming",
    )
    same = (
        hashes.alias("p")
        .join(
            hashes.alias("q"),
            (F.col("p.bands") == F.col("q.bands"))
            & (F.col("p.media_id") < F.col("q.media_id")),
        )
        .select(
            F.col("p.media_id").alias("media_id_a"),
            F.col("q.media_id").alias("media_id_b"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(same)


def ahash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image-aHash near-dup pairs: banded_hamming_pairs under the 4 ×
    16-bit band encoding of image_ahash (lossless for radius ≤ 3)."""
    return banded_hamming_pairs(hashes, max_hamming, n_bands=4)


def banded_hamming_matches(
    probe: DataFrame, history: DataFrame, max_hamming: int, n_bands: int
) -> DataFrame:
    """Distinct probe `media_id`s whose hash lies within `max_hamming`
    bits of AT LEAST ONE history hash — the cross-relation (probe vs
    static history) form of banded_hamming_pairs, the primitive behind
    ingest-time admission gates (round 14): admit a new item iff this
    returns no row for it.

    Same two-leg shape, same losslessness: identical hashes match by a
    plain left-semi equi-join on the band array (the dominant exact
    re-upload case never enters the banded join); distinct hashes meet
    only inside a (band, value) bucket, exact Hamming via
    zip_with/bit_count over DISTINCT (probe-hash, history-hash) pairs,
    matched hash values semi-joined back to probe ids. Pigeonhole makes
    the candidate generation exact for max_hamming < n_bands regardless
    of which relation each hash came from. History appears as values
    only — ids are never needed — so pass its distinct-hash projection
    once (persisted) and every micro-batch pays |batch| + |buckets hit|,
    never |batch| × |history|."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"{n_bands}-band encoding is lossless only for Hamming radius "
            f"<= {n_bands - 1}; raise the band count for larger radii"
        )
    hdist = history.select("bands").distinct()
    exact = probe.join(hdist, "bands", "left_semi").select("media_id")
    pk = (
        probe.select("bands").distinct()
        .select("bands", F.posexplode("bands").alias("band", "bv"))
    )
    hk = hdist.select(
        F.col("bands").alias("hbands"),
        F.posexplode("bands").alias("band", "bv"),
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("bands"), F.col("hbands"),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    near_hashes = (
        pk.join(
            hk,
            (pk["band"] == hk["band"])
            & (pk["bv"] == hk["bv"])
            & (pk["bands"] != hk["hbands"]),
        )
        .select(pk["bands"], hk["hbands"])
        .distinct()
        .where(ham <= max_hamming)
        .select("bands")
        .distinct()
    )
    near = probe.join(near_hashes, "bands", "left_semi").select("media_id")
    return exact.unionByName(near).distinct()


def frame_ahash(
    frames: DataFrame,
    id_col: str = "media_id",
    idx_col: str = "frame_idx",
    data_col: str = "data",
) -> DataFrame:
    """(media_id, frame_idx, bands): the image aHash applied per sampled
    frame — sample_frames output feeds straight in. One Arrow pass; the
    frame payload never leaves the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, bands_out = [], [], []
            for mid, idx, b in zip(pdf[id_col], pdf[idx_col], pdf[data_col]):
                ids.append(mid)
                idxs.append(idx)
                bands_out.append(_ahash_bands_of(bytes(b)))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "bands": bands_out}
            )

    return frames.select(id_col, idx_col, data_col).mapInPandas(
        run, schema="media_id long, frame_idx int, bands array<int>"
    )


def video_neardup_pairs(
    frame_hashes: DataFrame,
    max_hamming: int = 3,
    min_frac: tuple[int, int] = (1, 2),
    frac_of: str = "min",
    min_aligned: int = 1,
) -> DataFrame:
    """Video near-dup pairs from per-frame aHashes: two videos pair when
    the SAME-INDEX frame matches (Hamming ≤ max_hamming) for at least
    min_frac = (num, den) of the smaller video's sampled frames —
    n_match · den ≥ min(n_a, n_b) · num, integer cross-multiplied so the
    threshold is SQL-re-derivable. Aligning on frame_idx is the
    re-encode/re-upload dedup shape (same cut, same sampling grid);
    detecting time-shifted clips is the harder shingle-alignment problem
    and out of scope for this tier.

    Plan (the banded_hamming_pairs discipline, keyed by frame index so
    candidates never cross frames): identical frame hashes pair by a
    plain (frame_idx, bands) equi-join; distinct hashes meet only inside
    a (frame_idx, band, value) bucket, exact Hamming on DISTINCT
    (frame_idx, hash-pair) rows, ids joined back. Frame matches union
    DISTINCT (a video pair whose frame matches via both legs counts that
    frame once), roll up per video pair, and the per-video frame counts
    join in for the threshold. Never all-pairs across videos or frames;
    per-bucket candidate volume is the LSH knob (raise bands for larger
    radii)."""
    if max_hamming >= 4:
        raise ValueError(
            "4-band aHash encoding is lossless only for Hamming radius <= 3"
        )
    if frac_of not in ("min", "max"):
        raise ValueError("frac_of must be 'min' or 'max'")
    # frac_of='min' is the containment form (a short clip fully inside a
    # longer one passes); 'max' is the strict re-encode form — BOTH sides
    # must match nearly everywhere, which is the right gate when short
    # clips would otherwise pair promiscuously (a 1-frame video passes
    # the 'min' half-threshold with a single frame hit). min_aligned
    # floors the absolute evidence either way.
    num, den = min_frac
    fh = frame_hashes.select("media_id", "frame_idx", "bands")
    fdist = fh.select("frame_idx", "bands").distinct()
    keyed = fdist.select(
        "frame_idx", "bands", F.posexplode("bands").alias("band", "bv")
    )
    x, y = keyed.alias("x"), keyed.alias("y")
    ham = F.aggregate(
        F.zip_with(
            F.col("ba"), F.col("bb"), lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    near = (
        x.join(
            y,
            (F.col("x.frame_idx") == F.col("y.frame_idx"))
            & (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.bands") < F.col("y.bands")),
        )
        .select(
            F.col("x.frame_idx").alias("fi"),
            F.col("x.bands").alias("ba"),
            F.col("y.bands").alias("bb"),
        )
        .distinct()
        .withColumn("__h", ham)
        .where(F.col("__h") <= max_hamming)
    )
    fa = fh.select(
        F.col("frame_idx").alias("fi"),
        F.col("bands").alias("ba"),
        F.col("media_id").alias("ia"),
    )
    fb = fh.select(
        F.col("frame_idx").alias("fi"),
        F.col("bands").alias("bb"),
        F.col("media_id").alias("ib"),
    )
    near_frames = (
        near.join(fa, ["fi", "ba"])
        .join(fb, ["fi", "bb"])
        .where(F.col("ia") != F.col("ib"))
        .select("fi", "ia", "ib")
    )
    same_frames = (
        fh.alias("p")
        .join(
            fh.alias("q"),
            (F.col("p.frame_idx") == F.col("q.frame_idx"))
            & (F.col("p.bands") == F.col("q.bands"))
            & (F.col("p.media_id") != F.col("q.media_id")),
        )
        .select(
            F.col("p.frame_idx").alias("fi"),
            F.col("p.media_id").alias("ia"),
            F.col("q.media_id").alias("ib"),
        )
    )
    matched = (
        near_frames.unionByName(same_frames)
        .select(
            "fi",
            F.least("ia", "ib").alias("media_id_a"),
            F.greatest("ia", "ib").alias("media_id_b"),
        )
        .distinct()
    )
    counts = fh.groupBy("media_id").agg(F.count("*").cast("long").alias("nf"))
    pairs = matched.groupBy("media_id_a", "media_id_b").agg(
        F.count("*").cast("long").alias("n_match")
    )
    ca = counts.select(
        F.col("media_id").alias("media_id_a"), F.col("nf").alias("n_a")
    )
    cb = counts.select(
        F.col("media_id").alias("media_id_b"), F.col("nf").alias("n_b")
    )
    ref = F.least("n_a", "n_b") if frac_of == "min" else F.greatest("n_a", "n_b")
    return (
        pairs.join(ca, "media_id_a")
        .join(cb, "media_id_b")
        .where(
            (F.col("n_match") * den >= ref * num)
            & (F.col("n_match") >= min_aligned)
        )
        .select("media_id_a", "media_id_b", "n_match", "n_a", "n_b")
    )


def audio_subfingerprints(
    df: DataFrame,
    frame: int = 256,
    bits: int = 16,
    id_col: str = "media_id",
    data_col: str = "data",
) -> DataFrame:
    """(media_id, k, sv): the TIME-LOCAL tier of the audio fingerprint —
    fixed `frame`-sample windows (absolute, not clip-relative, so the
    same content produces the same values wherever it sits in the clip),
    energy-delta sign bits, and at each window position k the `bits`
    consecutive bits packed into sub-fingerprint sv. A clip shifted by
    EXACTLY m frames reproduces the other clip's sub-fingerprints at
    k+m — what audio_offset_match_pairs exploits; the whole-clip
    audio_fingerprint above cannot see shifted content because its
    window grid stretches with clip length.

    Integer-exact (int64 energy sums, pure comparisons); one Arrow pass;
    output ≤ n_samples/frame rows × ~20 bytes per clip. `bits` is the
    selectivity knob: the downstream join buckets on sv, so per-bucket
    candidate volume scales with corpus_subfingerprints / 2^bits —
    raise it (and/or add a coarse energy quantile to the key) for
    billion-clip corpora, exactly the LSH band/row trade."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ks, svs = [], [], []
            for mid, b in zip(pdf[id_col], pdf[data_col]):
                samples, _rate = _decode_audio(bytes(b))
                n = len(samples) // frame
                if n < 2:
                    continue
                s = samples[: n * frame].astype(np.int64)
                e = (s * s).reshape(n, frame).sum(axis=1)
                dbits = (e[1:] > e[:-1]).astype(np.int64)  # n-1 bits
                for k in range(len(dbits) - bits + 1):
                    sv = 0
                    for j in range(bits):
                        sv |= int(dbits[k + j]) << j
                    ids.append(mid)
                    ks.append(k)
                    svs.append(sv)
            yield pd.DataFrame({"media_id": ids, "k": ks, "sv": svs})

    return df.select(id_col, data_col).mapInPandas(
        run, schema="media_id long, k int, sv long"
    )


def audio_offset_match_pairs(
    sub: DataFrame, min_matches: int = 4
) -> DataFrame:
    """Offset-invariant audio near-dup pairs from sub-fingerprint
    sequences — the Shazam/chromaprint alignment shape: two clips match
    when ≥ `min_matches` sub-fingerprints agree AT A CONSISTENT TIME
    OFFSET (join on sub-fingerprint value, histogram the per-pair k
    deltas, keep the best-supported delta). Catches trims, padding, and
    concatenation — the duplicate classes the frame-aligned and
    whole-clip tiers both miss.

    Plan: one equi-join on sv (bucket-bounded by the sub-fingerprint
    key space — the audio_subfingerprints `bits` knob), a map-side-
    combinable (a, b, delta) count rollup, and an argmax window over
    each pair's bounded delta histogram. Never all-pairs; never a
    global sort."""
    from pyspark.sql.window import Window

    a = sub.select(
        F.col("media_id").alias("ia"), F.col("k").alias("ka"), "sv"
    )
    b = sub.select(
        F.col("media_id").alias("ib"), F.col("k").alias("kb"), "sv"
    )
    hits = (
        a.join(b, "sv")
        .where(F.col("ia") < F.col("ib"))
        .groupBy(
            "ia", "ib", (F.col("ka") - F.col("kb")).alias("delta")
        )
        .agg(F.count("*").cast("long").alias("n_aligned"))
    )
    # scale-ok: partitioned by (ia, ib); each pair's delta histogram is
    # bounded by the two clips' sub-fingerprint counts
    w = Window.partitionBy("ia", "ib").orderBy(
        F.col("n_aligned").desc(), F.col("delta")
    )
    return (
        hits.withColumn("__r", F.row_number().over(w))
        .where((F.col("__r") == 1) & (F.col("n_aligned") >= min_matches))
        .select(
            F.col("ia").alias("media_id_a"),
            F.col("ib").alias("media_id_b"),
            "delta",
            "n_aligned",
        )
    )


def video_offset_match_pairs(
    frame_hashes: DataFrame,
    min_matches: int = 3,
    max_hash_docs: int | None = None,
) -> DataFrame:
    """Offset-invariant video near-dup pairs — the delta-histogram shape
    of audio_offset_match_pairs on the frame-hash table: two videos
    match when ≥ `min_matches` frames carry IDENTICAL aHashes at a
    consistent frame-index offset (trims, prepended intros, clips
    embedded in longer reels — the classes the frame-ALIGNED
    video_neardup_pairs misses because it requires equal indices).

    Join buckets on the exact 64-bit hash (the dominant same-cut
    re-upload case); a tolerance tier would swap the key for the
    (band, value) buckets of banded_hamming_pairs and verify — the same
    upgrade path, deliberately not paid here. One equi-join, one
    map-side-combinable (pair, delta) rollup, one argmax window over
    each pair's bounded delta histogram."""
    if max_hash_docs is not None:
        # stop-hash exclusion: frame hashes shared by more than
        # `max_hash_docs` distinct videos (uniform/padding frames — the
        # corpus-wide heavy hitters) are dropped from BOTH join sides;
        # without it those buckets go corpus-quadratic, the same
        # heavy-gram pruning ExactSubstr and the postings tier apply.
        rare = (
            frame_hashes.groupBy("bands")
            .agg(F.count_distinct("media_id").alias("__nd"))
            .where(F.col("__nd") <= max_hash_docs)
            .select("bands")
        )
        frame_hashes = frame_hashes.join(rare, "bands", "left_semi")
    a = frame_hashes.select(
        F.col("media_id").alias("ia"), F.col("frame_idx").alias("ka"), "bands"
    )
    b = frame_hashes.select(
        F.col("media_id").alias("ib"), F.col("frame_idx").alias("kb"), "bands"
    )
    hits = (
        a.join(b, "bands")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib", (F.col("ka") - F.col("kb")).alias("delta"))
        .agg(F.count("*").cast("long").alias("n_aligned"))
    )
    from pyspark.sql.window import Window

    # scale-ok: partitioned by (ia, ib); each pair's delta histogram is
    # bounded by the two videos' sampled frame counts
    w = Window.partitionBy("ia", "ib").orderBy(
        F.col("n_aligned").desc(), F.col("delta")
    )
    return (
        hits.withColumn("__r", F.row_number().over(w))
        .where((F.col("__r") == 1) & (F.col("n_aligned") >= min_matches))
        .select(
            F.col("ia").alias("media_id_a"),
            F.col("ib").alias("media_id_b"),
            "delta",
            "n_aligned",
        )
    )


def video_neardup_matches(
    probe: DataFrame,
    history: DataFrame,
    max_hamming: int = 3,
    min_frac: tuple[int, int] = (1, 2),
    frac_of: str = "min",
    min_aligned: int = 1,
) -> DataFrame:
    """Distinct probe `media_id`s whose video is a frame-aligned near-dup
    of AT LEAST ONE history video — the cross-relation form of
    video_neardup_pairs (the admission-gate primitive, like
    banded_hamming_matches for single images): a probe matches a history
    video when their same-index frames agree within `max_hamming` for
    ≥ min_frac of the smaller side's frame count.

    Same bucketed discipline: identical frame hashes meet by a
    (frame_idx, bands) equi-join, distinct ones only inside a
    (frame_idx, band, value) bucket with exact Hamming on DISTINCT hash
    pairs; per-(probe, history-video) aligned-frame counts roll up
    map-side and the integer cross-multiplied threshold decides. History
    frame hashes are values + ids (ids needed for the per-video frame
    counts) — still ~50 bytes/frame, materialized once."""
    if max_hamming >= 4:
        raise ValueError(
            "4-band aHash encoding is lossless only for Hamming radius <= 3"
        )
    if frac_of not in ("min", "max"):
        raise ValueError("frac_of must be 'min' or 'max'")
    num, den = min_frac
    p = probe.select("media_id", "frame_idx", "bands")
    h = history.select("media_id", "frame_idx", "bands")
    ham = F.aggregate(
        F.zip_with(
            F.col("pb"), F.col("hb"), lambda a, b: F.bit_count(a.bitwiseXOR(b))
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("int")
    pk = p.select("frame_idx", "bands").distinct().select(
        "frame_idx", F.col("bands").alias("pb"),
        F.posexplode("bands").alias("band", "bv"),
    )
    hk = h.select("frame_idx", "bands").distinct().select(
        "frame_idx", F.col("bands").alias("hb"),
        F.posexplode("bands").alias("band", "bv"),
    )
    near = (
        pk.join(
            hk.withColumnRenamed("frame_idx", "fi2"),
            (F.col("frame_idx") == F.col("fi2"))
            & (pk["band"] == hk["band"])
            & (pk["bv"] == hk["bv"])
            & (F.col("pb") != F.col("hb")),
        )
        .select("frame_idx", "pb", "hb")
        .distinct()
        .where(ham <= max_hamming)
    )
    pa = p.select(
        "frame_idx", F.col("bands").alias("pb"), F.col("media_id").alias("ip")
    )
    hb_ = h.select(
        "frame_idx", F.col("bands").alias("hb"), F.col("media_id").alias("ih")
    )
    near_frames = near.join(pa, ["frame_idx", "pb"]).join(
        hb_, ["frame_idx", "hb"]
    ).select("frame_idx", "ip", "ih")
    same_frames = (
        pa.withColumnRenamed("pb", "bands")
        .join(hb_.withColumnRenamed("hb", "bands"), ["frame_idx", "bands"])
        .select("frame_idx", "ip", "ih")
    )
    matched = near_frames.unionByName(same_frames).distinct()
    np_ = p.groupBy("media_id").agg(F.count("*").cast("long").alias("n_p"))
    nh = h.groupBy("media_id").agg(F.count("*").cast("long").alias("n_h"))
    counts = matched.groupBy("ip", "ih").agg(
        F.count("*").cast("long").alias("n_match")
    )
    ref = F.least("n_p", "n_h") if frac_of == "min" else F.greatest("n_p", "n_h")
    return (
        counts.join(np_.withColumnRenamed("media_id", "ip"), "ip")
        .join(nh.withColumnRenamed("media_id", "ih"), "ih")
        .where(
            (F.col("n_match") * den >= ref * num)
            & (F.col("n_match") >= min_aligned)
        )
        .select(F.col("ip").alias("media_id"))
        .distinct()
    )
