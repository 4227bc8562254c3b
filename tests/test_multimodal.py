"""Multimodal operator tests: RAW container round-trips through the real
numpy stages (features, resize, frame sampling, audio), and the codec stub
boundary raises cleanly for real container formats."""

from __future__ import annotations

import numpy as np
import pytest

from kinesis3_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rng = np.random.RandomState(3)
    rows = []
    for i in range(4):
        img = rng.randint(0, 256, size=(12 + i, 10, 3), dtype=np.uint8)
        rows.append((i, bytearray(M.encode_rawi(img))))
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_image_features(spark, media):
    out = {r.media_id: r for r in M.image_features(media).collect()}
    assert len(out) == 4
    assert out[0].width == 10 and out[0].height == 12 and out[0].channels == 3
    assert 0 <= out[0].mean_px <= 255


def test_resize_roundtrip(spark, media):
    resized = M.resize_images(media, out_w=4, out_h=4)
    feats = M.image_features(resized).collect()
    assert all(r.width == 4 and r.height == 4 and r.channels == 3 for r in feats)


def test_frame_sampling(spark):
    frames = np.arange(5 * 6 * 4, dtype=np.uint8).reshape(5, 6, 4)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_rawv(frames)))], "media_id long, data binary"
    )
    out = M.sample_frames(df, every_n=2).collect()
    assert sorted(r.frame_idx for r in out) == [0, 2, 4]
    # sampled frames decode back to the original planes
    f0 = next(r for r in out if r.frame_idx == 2)
    assert M._decode_image(bytes(f0.data))[:, :, 0].tolist() == frames[2].tolist()


def test_audio_features(spark):
    rate = 8000
    t = np.arange(rate)  # 1 second
    samples = (1000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    df = spark.createDataFrame(
        [(7, bytearray(M.encode_rawa(samples, rate)))], "media_id long, data binary"
    )
    r = M.audio_features(df).collect()[0]
    assert r.sample_rate == rate and r.duration_ms == 1000
    assert abs(r.rms - 1000 / np.sqrt(2)) < 5


def test_real_codec_gate_both_branches():
    """The codec boundary AUTO-ENABLES behind an import probe (the Avro
    gate pattern): with Pillow/soundfile installed, real containers
    decode with no code change; without them, the declared
    NotImplementedError names the exact package to install. Both
    branches are pinned — whichever the environment takes."""
    try:
        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            M._decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    else:
        import io

        buf = io.BytesIO()
        Image.fromarray(np.full((4, 6, 3), 77, np.uint8)).save(buf, "PNG")
        arr = M._decode_image(buf.getvalue())
        assert arr.shape == (4, 6, 3) and int(arr[0, 0, 0]) == 77
    try:
        import soundfile as sf
    except ImportError:
        with pytest.raises(NotImplementedError, match="soundfile"):
            M._decode_audio(b"RIFF wav bytes")
    else:
        import io

        buf = io.BytesIO()
        sf.write(buf, np.zeros(100, np.int16), 8000, format="WAV")
        samples, rate = M._decode_audio(buf.getvalue())
        assert rate == 8000 and len(samples) == 100
    try:
        import av  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="pyav"):
            M._decode_video(b"\x00\x00\x00 ftypmp4 bytes")


# --------------------------------------------------------------------------
# Perceptual-hash dedup (round 13)
# --------------------------------------------------------------------------


def _img_df(spark, arrays):
    rows = [(i, bytearray(M.encode_rawi(a))) for i, a in enumerate(arrays)]
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_ahash_planted_neardup_pair_found(spark):
    """Two near-identical images (a handful of perturbed pixels) must land
    within Hamming radius 3 and pair; an unrelated image must not."""
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(32, 32, 1), dtype=np.uint8)
    near = base.copy()
    near[0, 0, 0] ^= 0x01  # tiny perturbation: block means barely move
    other = rng.randint(0, 256, size=(32, 32, 1), dtype=np.uint8)
    pairs = M.ahash_neardup_pairs(
        M.image_ahash(_img_df(spark, [base, near, other]))
    ).collect()
    got = {(r.media_id_a, r.media_id_b): r.hamming for r in pairs}
    assert (0, 1) in got and got[(0, 1)] <= 3
    assert all(2 not in k for k in got)


def test_ahash_identical_images_pair_at_zero_without_banded_join(spark):
    """Exact re-uploads pair via the identical-hash equi-join (hamming 0)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(16, 16, 1), dtype=np.uint8)
    pairs = M.ahash_neardup_pairs(
        M.image_ahash(_img_df(spark, [img, img.copy(), img.copy()]))
    ).collect()
    got = {(r.media_id_a, r.media_id_b): r.hamming for r in pairs}
    assert got == {(0, 1): 0, (0, 2): 0, (1, 2): 0}


def test_ahash_banded_join_matches_bruteforce_at_radius3(spark):
    """Pigeonhole losslessness: over a corpus of random images plus planted
    perturbations, the banded plan emits exactly the pairs a brute-force
    Hamming scan over the hashes finds at radius <= 3."""
    rng = np.random.RandomState(23)
    arrays = [rng.randint(0, 256, size=(24, 24, 1), dtype=np.uint8) for _ in range(12)]
    for i in range(4):  # plant perturbed twins of the first four
        tw = arrays[i].copy()
        tw[i, i, 0] = (int(tw[i, i, 0]) + 3) % 256
        arrays.append(tw)
    hashes = M.image_ahash(_img_df(spark, arrays))
    rows = {r.media_id: r.bands for r in hashes.collect()}
    brute = set()
    for a in rows:
        for b in rows:
            if a < b:
                ham = sum(bin(x ^ y).count("1") for x, y in zip(rows[a], rows[b]))
                if ham <= 3:
                    brute.add((a, b, ham))
    got = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in M.ahash_neardup_pairs(hashes).collect()
    }
    assert got == brute and len(brute) >= 4


def test_ahash_bits_integer_exact_contract(spark):
    """The hash must be reproducible from pure integer arithmetic on the
    pixel grid (the property the SQL oracle relies on): recompute one
    image's bands with an independent loop and compare."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(13, 16, 1), dtype=np.uint8)
    [row] = M.image_ahash(_img_df(spark, [img])).collect()
    a = img.astype(np.int64).sum(axis=2)
    h, w = a.shape
    ts, tp = int(a.sum()), h * w
    want = [0, 0, 0, 0]
    for rg in range(8):
        r0, r1 = rg * h // 8, (rg + 1) * h // 8
        for cg in range(8):
            c0, c1 = cg * w // 8, (cg + 1) * w // 8
            if r1 > r0 and c1 > c0:
                cs = int(a[r0:r1, c0:c1].sum())
                if cs * tp > ts * (r1 - r0) * (c1 - c0):
                    want[rg // 2] += 1 << (cg + 8 * (rg % 2))
    assert list(row.bands) == want


def _aud_df(spark, sample_arrays, rate=8000):
    rows = [
        (i, bytearray(M.encode_rawa(np.asarray(a, np.int16), rate)))
        for i, a in enumerate(sample_arrays)
    ]
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_audio_fingerprint_planted_perturbed_twin(spark):
    """A clip and a lightly perturbed twin (a few samples nudged — a
    couple of window energies change) must land within Hamming radius 7
    and pair; an unrelated clip must not."""
    rng = np.random.RandomState(11)
    base = rng.randint(-3000, 3000, size=650).astype(np.int16)
    twin = base.copy()
    twin[5:8] += 40        # perturb two-ish windows' energies
    twin[300:303] -= 40
    other = rng.randint(-3000, 3000, size=650).astype(np.int16)
    fps = M.audio_fingerprint(_aud_df(spark, [base, twin, other])).persist()
    pairs = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in M.banded_hamming_pairs(fps, max_hamming=7, n_bands=8).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 7
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_audio_fingerprint_banded_join_matches_bruteforce(spark):
    """The 8-band candidate join is LOSSLESS at radius <= 7: compare
    against brute-force all-pairs Hamming on a batch of random clips."""
    rng = np.random.RandomState(13)
    clips = [
        rng.randint(-500, 500, size=rng.randint(64, 400)).astype(np.int16)
        for _ in range(24)
    ]
    # plant twins so the expected set is non-trivial
    clips.append(clips[0].copy())
    t = clips[3].copy(); t[10:12] += 25
    clips.append(t)
    fps = M.audio_fingerprint(_aud_df(spark, clips)).persist()
    rows = fps.collect()
    def ham(x, y):
        return sum(bin(a ^ b).count("1") for a, b in zip(x.bands, y.bands))
    brute = {
        (x.media_id, y.media_id): ham(x, y)
        for x in rows for y in rows
        if x.media_id < y.media_id and ham(x, y) <= 7
    }
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in M.banded_hamming_pairs(fps, max_hamming=7, n_bands=8).collect()
    }
    assert got == brute and len(brute) >= 2


def test_audio_fingerprint_integer_exact_contract(spark):
    """The fingerprint must be reproducible from pure integer arithmetic
    over the sample windows (the property the SQL oracle relies on),
    including the empty-clip edge (all-zero bands)."""
    rng = np.random.RandomState(17)
    samples = rng.randint(-2000, 2000, size=337).astype(np.int16)
    [row, empty] = (
        M.audio_fingerprint(_aud_df(spark, [samples, np.zeros(0, np.int16)]))
        .orderBy("media_id")
        .collect()
    )
    n = len(samples)
    wb = [(k * n) // 65 for k in range(66)]
    e = [
        sum(int(v) ** 2 for v in samples[wb[k]:wb[k + 1]]) for k in range(65)
    ]
    bits = [1 if e[k + 1] > e[k] else 0 for k in range(64)]
    want = [
        sum(bits[8 * g + j] << j for j in range(8)) for g in range(8)
    ]
    assert list(row.bands) == want
    assert list(empty.bands) == [0] * 8


def test_banded_hamming_pairs_radius_guard():
    """Pigeonhole losslessness requires max_hamming < n_bands."""
    with pytest.raises(ValueError):
        M.banded_hamming_pairs(None, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError):
        M.ahash_neardup_pairs(None, max_hamming=4)


def _hash_df(spark, rows):
    # rows: (media_id, [b0, b1, b2, b3]) 16-bit band values
    return spark.createDataFrame(
        [(i, b) for i, b in rows], "media_id long, bands array<int>"
    )


def test_banded_hamming_matches_both_legs_and_admit(spark):
    """The admission primitive: identical hash matches via the exact
    equi-join leg, a radius-3 neighbor via the banded leg, an
    out-of-radius hash matches nothing (admitted)."""
    hist = _hash_df(spark, [(100, [7, 0, 0, 0]), (101, [0, 0, 255, 9])])
    probe = _hash_df(
        spark,
        [
            (1, [7, 0, 0, 0]),        # identical to 100 -> exact leg
            (2, [7, 1, 2, 0]),        # hamming 2 from 100 -> banded leg
            (3, [255, 255, 255, 255]),  # far from everything -> admitted
            (4, [0, 0, 255, 8]),      # hamming 1 from 101 -> banded leg
        ],
    )
    got = sorted(
        r["media_id"]
        for r in M.banded_hamming_matches(
            probe, hist, max_hamming=3, n_bands=4
        ).collect()
    )
    assert got == [1, 2, 4]


def test_banded_hamming_matches_radius_guard():
    with pytest.raises(ValueError):
        M.banded_hamming_matches(None, None, max_hamming=4, n_bands=4)


def _frame_hash_df(spark, rows):
    # rows: (media_id, frame_idx, [b0..b3])
    return spark.createDataFrame(
        rows, "media_id long, frame_idx int, bands array<int>"
    )


def test_video_neardup_planted_pair_and_threshold(spark):
    """Videos 1/2: 4 frames each — 2 identical, 1 within radius 3, 1 far
    -> 3/4 matching frames, passes the half threshold. Video 3 matches
    video 1 on only 1 of 4 frames -> below threshold. Video 4 shares NO
    frame index content."""
    rows = [
        (1, 0, [7, 0, 0, 0]), (1, 2, [0, 9, 0, 0]),
        (1, 4, [1, 2, 3, 4]), (1, 6, [255, 255, 0, 0]),
        (2, 0, [7, 0, 0, 0]), (2, 2, [0, 9, 0, 0]),      # identical legs
        (2, 4, [1, 2, 3, 5]), (2, 6, [0, 0, 255, 255]),  # ham 1; far
        (3, 0, [7, 0, 0, 0]), (3, 2, [21845, 21845, 21845, 21845]),
        (3, 4, [43690, 43690, 43690, 43690]), (3, 6, [4369, 4369, 4369, 4369]),
        (4, 0, [64, 64, 64, 64]), (4, 2, [32, 32, 32, 32]),
    ]
    out = {
        (r["media_id_a"], r["media_id_b"]): (r["n_match"], r["n_a"], r["n_b"])
        for r in M.video_neardup_pairs(
            _frame_hash_df(spark, rows), max_hamming=3
        ).collect()
    }
    assert out == {(1, 2): (3, 4, 4)}


def test_video_neardup_same_index_alignment(spark):
    """A matching hash at a DIFFERENT frame index must not count — the
    operator dedups same-cut re-encodes, not shifted clips."""
    rows = [
        (1, 0, [7, 0, 0, 0]), (1, 2, [0, 9, 0, 0]),
        (2, 2, [7, 0, 0, 0]), (2, 4, [0, 9, 0, 0]),  # shifted by one slot
    ]
    assert (
        M.video_neardup_pairs(_frame_hash_df(spark, rows), max_hamming=3).count()
        == 0
    )


def test_video_neardup_min_frac_smaller_video(spark):
    """Threshold is against the SMALLER video's frame count: a 2-frame
    clip fully contained in a 6-frame video's sampled grid pairs."""
    rows = [(1, i, [i, 0, 0, 0]) for i in (0, 2, 4, 6, 8, 10)] + [
        (2, 0, [0, 0, 0, 0]), (2, 2, [2, 0, 0, 0]),
    ]
    out = M.video_neardup_pairs(
        _frame_hash_df(spark, rows), max_hamming=3
    ).collect()
    assert len(out) == 1 and out[0]["n_match"] == 2


def test_video_neardup_radius_guard():
    with pytest.raises(ValueError):
        M.video_neardup_pairs(None, max_hamming=4)


def test_frame_ahash_matches_image_ahash_per_frame(spark):
    """frame_ahash over sampled RAWV frames == image_ahash over the same
    frames re-encoded standalone (the shared kernel), end-to-end through
    real decode; a re-encoded twin with one perturbed frame pairs."""
    rng = np.random.RandomState(3)
    f0 = rng.randint(0, 256, size=(3, 16, 16)).astype(np.uint8)
    twin = f0.copy()
    twin[1] = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)  # 1 of 3
    vids = spark.createDataFrame(
        [(1, M.encode_rawv(f0)), (2, M.encode_rawv(twin))],
        "media_id long, data binary",
    )
    fh = M.frame_ahash(M.sample_frames(vids, every_n=1))
    # kernel equivalence on one frame
    one = spark.createDataFrame(
        [(99, M.encode_rawi(f0[2][:, :, None]))], "media_id long, data binary"
    )
    [img_row] = M.image_ahash(one).collect()
    [frame_row] = fh.where("media_id = 1 AND frame_idx = 2").collect()
    assert list(img_row.bands) == list(frame_row.bands)
    # twin pairs: 2 of 3 frames identical -> passes the half threshold
    out = M.video_neardup_pairs(fh, max_hamming=3).collect()
    assert len(out) == 1
    assert (out[0]["media_id_a"], out[0]["media_id_b"]) == (1, 2)
    assert out[0]["n_match"] >= 2


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_video_neardup_query_oracle_parity(spark, sf):
    """Full driver-style parity for the PENDING video dedup query
    (registration deferred to r15 by the round-14 window cap): the Spark
    operator chain must hash-match the brute-force DuckDB re-derivation
    at both small SFs."""
    import duckdb

    from kinesis3_spark.queries.multimodalq import (
        _VIDEO_PAIRS_ORACLE,
        video_neardup_dedup_q,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = video_neardup_dedup_q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.sql(_VIDEO_PAIRS_ORACLE).df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    sa = sorted(map(tuple, s[cols].astype(str).values.tolist()))
    da = sorted(map(tuple, d[cols].astype(str).values.tolist()))
    assert sa == da
    assert len(s) > 0  # the planted near-dup corpus must produce pairs


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_stream_audio_admission_oracle_parity(spark, sf):
    """Driver-style parity for the PENDING streaming audio admission
    query (r15 registration): the foreachBatch gate's ledger must
    hash-match the brute-force DuckDB re-derivation. The sf0.01 corpus
    plants fingerprint twins across the history boundary, so the reject
    path is exercised there (asserted); sf0.001 happens to admit all."""
    import duckdb

    from kinesis3_spark.queries.multimodalq import (
        _STREAM_AFP_ORACLE,
        stream_audio_fingerprint_admission,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = stream_audio_fingerprint_admission(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.sql(_STREAM_AFP_ORACLE).df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    assert sorted(map(tuple, s[cols].astype(str).values.tolist())) == sorted(
        map(tuple, d[cols].astype(str).values.tolist())
    )
    if sf == "sf0.01":
        assert int(s["n_admitted"].sum()) < int(s["n_seen"].sum())


def test_audio_offset_match_planted_shift(spark):
    """A clip and a copy shifted by an exact number of frames must pair
    at exactly that delta; an unrelated clip must not pair. Frame 32 so
    short test clips still carry enough sub-fingerprints."""
    rng = np.random.RandomState(13)
    base = rng.randint(-2000, 2000, size=32 * 40).astype(np.int16)
    shift = 5  # frames
    shifted = np.concatenate(
        [rng.randint(-2000, 2000, size=32 * shift).astype(np.int16), base]
    )
    other = rng.randint(-2000, 2000, size=32 * 40).astype(np.int16)
    df = _aud_df(spark, [base, shifted, other])
    sub = M.audio_subfingerprints(df, frame=32, bits=16)
    out = M.audio_offset_match_pairs(sub, min_matches=8).collect()
    got = {(r.media_id_a, r.media_id_b): (r.delta, r.n_aligned) for r in out}
    assert (0, 1) in got
    d, n = got[(0, 1)]
    assert d == -shift and n >= 8  # base's k aligns to shifted's k+5
    assert all(2 not in pair for pair in got)


def test_audio_offset_match_trim_and_concat(spark):
    """The duplicate classes the aligned tiers miss: a TRIMMED copy
    (prefix removed) and a CONCATENATION (clip embedded in a longer
    stream) both pair with the original at the embedding offset."""
    rng = np.random.RandomState(29)
    base = rng.randint(-2000, 2000, size=32 * 60).astype(np.int16)
    trimmed = base[32 * 10 :]
    embedded = np.concatenate(
        [
            rng.randint(-2000, 2000, size=32 * 7).astype(np.int16),
            base,
            rng.randint(-2000, 2000, size=32 * 9).astype(np.int16),
        ]
    )
    df = _aud_df(spark, [base, trimmed, embedded])
    sub = M.audio_subfingerprints(df, frame=32, bits=16)
    got = {
        (r.media_id_a, r.media_id_b): r.delta
        for r in M.audio_offset_match_pairs(sub, min_matches=8).collect()
    }
    assert got.get((0, 1)) == 10   # base k=10 aligns with trimmed k=0
    assert got.get((0, 2)) == -7   # base k=0 aligns with embedded k=7


def test_audio_subfingerprints_shift_reproduces_values(spark):
    """The absolute-frame contract: an m-frame shift reproduces the
    base clip's sub-fingerprint VALUES at k+m (interior positions,
    where the 16-bit packing window sits fully inside shared content)."""
    rng = np.random.RandomState(31)
    base = rng.randint(-2000, 2000, size=32 * 30).astype(np.int16)
    m = 3
    shifted = np.concatenate(
        [rng.randint(-2000, 2000, size=32 * m).astype(np.int16), base]
    )
    sub = {
        (r.media_id, r.k): r.sv
        for r in M.audio_subfingerprints(
            _aud_df(spark, [base, shifted]), frame=32, bits=16
        ).collect()
    }
    agree = sum(
        1
        for (mid, k), sv in sub.items()
        if mid == 0 and sub.get((1, k + m)) == sv
    )
    n_base = sum(1 for (mid, _k) in sub if mid == 0)
    # every interior base position must reproduce (boundary windows can
    # differ where the delta chain crosses the splice)
    assert agree >= n_base - 2 and n_base > 10


def test_video_offset_match_trim_and_embed(spark):
    """A trimmed cut and an embedded copy pair with the original at the
    recoverable frame offset; the frame-ALIGNED pair join misses both.
    Distinct random frames make hash collisions across unrelated
    positions implausible."""
    rng = np.random.RandomState(37)
    base = rng.randint(0, 256, size=(12, 16, 16)).astype(np.uint8)
    trimmed = base[4:]  # first 4 frames cut
    embedded = np.concatenate(
        [rng.randint(0, 256, size=(3, 16, 16)).astype(np.uint8), base]
    )
    other = rng.randint(0, 256, size=(12, 16, 16)).astype(np.uint8)
    vids = spark.createDataFrame(
        [
            (1, M.encode_rawv(base)),
            (2, M.encode_rawv(trimmed)),
            (3, M.encode_rawv(embedded)),
            (4, M.encode_rawv(other)),
        ],
        "media_id long, data binary",
    )
    fh = M.frame_ahash(M.sample_frames(vids, every_n=1))
    got = {
        (r.media_id_a, r.media_id_b): (r.delta, r.n_aligned)
        for r in M.video_offset_match_pairs(fh, min_matches=3).collect()
    }
    assert got[(1, 2)][0] == 4    # base frame k matches trimmed frame k-4
    assert got[(1, 3)][0] == -3   # base frame k matches embedded frame k+3
    assert all(4 not in pair for pair in got)
    # the frame-aligned tier misses the trim (no same-index identical run
    # of >= half the frames)
    aligned = {
        (r.media_id_a, r.media_id_b)
        for r in M.video_neardup_pairs(fh, max_hamming=3).collect()
    }
    assert (1, 2) not in aligned


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_audio_offset_align_query_oracle_parity(spark, sf):
    """Driver-style parity for the PENDING offset-alignment query (r15
    registration): the sv-bucketed Spark plan must hash-match the
    brute-force DuckDB sub-fingerprint re-derivation, with a non-empty
    pair set (the corpus' planted near-dup texts align)."""
    import duckdb

    from kinesis3_spark.queries.multimodalq import (
        _AUDIO_OFFSET_ORACLE,
        dedup_audio_offset_align_q,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = dedup_audio_offset_align_q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.sql(_AUDIO_OFFSET_ORACLE).df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    assert sorted(map(tuple, s[cols].astype(str).values.tolist())) == sorted(
        map(tuple, d[cols].astype(str).values.tolist())
    )
    assert len(s) > 0


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_video_offset_align_query_oracle_parity(spark, sf):
    """Driver-style parity for the PENDING video offset-alignment query
    (r15 registration), including the stop-hash frequency filter on both
    engines."""
    import duckdb

    from kinesis3_spark.queries.multimodalq import (
        _VIDEO_OFFSET_ORACLE,
        dedup_video_offset_align_q,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = dedup_video_offset_align_q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.sql(_VIDEO_OFFSET_ORACLE).df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    assert sorted(map(tuple, s[cols].astype(str).values.tolist())) == sorted(
        map(tuple, d[cols].astype(str).values.tolist())
    )
    assert len(s) > 0


def test_video_neardup_matches_cross_relation(spark):
    """Admission primitive: probe 1 identical to a history video, probe 2
    near (1 of its 2 frames within radius on the matching index, the
    other identical), probe 3 matches only 1 of 4 frames (below half),
    probe 4 unrelated."""
    hist = _frame_hash_df(
        spark,
        [
            (100, 0, [7, 0, 0, 0]), (100, 2, [0, 9, 0, 0]),
            (101, 0, [255, 255, 0, 0]), (101, 2, [0, 0, 255, 255]),
            (101, 4, [1, 1, 1, 1]), (101, 6, [2, 2, 2, 2]),
        ],
    )
    probe = _frame_hash_df(
        spark,
        [
            (1, 0, [7, 0, 0, 0]), (1, 2, [0, 9, 0, 0]),          # identical
            (2, 0, [7, 1, 0, 0]), (2, 2, [0, 9, 0, 0]),          # ham 1 + exact
            (3, 0, [255, 255, 0, 0]), (3, 2, [21845, 21845, 21845, 21845]),
            (3, 4, [43690, 43690, 43690, 43690]), (3, 6, [4369, 4369, 4369, 4369]),
            (4, 0, [64, 64, 64, 64]),
        ],
    )
    got = sorted(
        r["media_id"]
        for r in M.video_neardup_matches(probe, hist).collect()
    )
    assert got == [1, 2]


def test_video_neardup_matches_radius_guard():
    with pytest.raises(ValueError):
        M.video_neardup_matches(None, None, max_hamming=4)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_stream_video_admission_oracle_parity(spark, sf):
    """Driver-style parity for the PENDING streaming video admission
    query (r15 registration) — completes the gate matrix (image, audio,
    video)."""
    import duckdb

    from kinesis3_spark.queries.multimodalq import (
        _STREAM_VPH_ORACLE,
        stream_video_phash_admission,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = stream_video_phash_admission(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    d = con.sql(_STREAM_VPH_ORACLE).df()
    assert len(s) == len(d)
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    assert sorted(map(tuple, s[cols].astype(str).values.tolist())) == sorted(
        map(tuple, d[cols].astype(str).values.tolist())
    )
