"""Multimodal tests: schema shape, Arrow batch path, REAL PNG/WAV/Y4M
decode (stdlib codecs), per-frame sampling from actual stream frames, and
the strict-mode seam for unknown (compressed) containers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.functions import codecs
from hypertrace_ingester_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.generate_media(spark, 90, partitions=4).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.count() == 90
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_png_roundtrip_exact():
    for i in (0, 3, 6, 9):  # covers RGB / gray / RGBA channel cycle
        img = mm.media_image(i)
        decoded = codecs.decode_png(codecs.encode_png(img))
        assert decoded.shape == img.shape
        assert (decoded == img).all()  # PNG is lossless


def test_wav_roundtrip():
    samples, duration_ms = mm.media_audio(1)
    wav = codecs.decode_wav(codecs.encode_wav(samples, mm.AUDIO_RATE))
    assert wav["sample_rate"] == mm.AUDIO_RATE
    assert wav["duration_ms"] == duration_ms
    assert wav["n_samples"] == len(samples)
    # 16-bit quantization error only (±1 LSB + 32767/32768 scale asymmetry)
    assert np.abs(wav["samples"] - samples).max() < 2 / 32768


def test_extract_features_real_decode(media):
    feats = mm.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 90
    metas = {r["media_id"]: r for r in media.select("media_id", "kind", "meta").collect()}
    again = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    for mid, r in rows.items():
        assert r["feat"] == again[mid]["feat"]  # bit-stable across runs
        assert len(r["feat"]) == 8
        assert r["payload_hash"] == again[mid]["payload_hash"]
        meta = metas[mid]["meta"]
        if r["kind"] == "image":
            # REAL decode: dims come from the PNG IHDR and match the meta
            assert r["decoded"] and r["width"] == meta["width"]
            assert r["height"] == meta["height"]
            assert r["feat"][0] == 1.0
        elif r["kind"] == "audio":
            # REAL decode: duration from RIFF framing matches the meta
            assert r["decoded"] and r["duration_ms"] == meta["duration_ms"]
            assert r["feat"][0] == 2.0
            assert 0.3 < r["feat"][4] < 0.4  # RMS of a 0.5-amp sine ~ 0.354
        else:  # video: REAL Y4M decode — dims and duration from the stream
            assert r["decoded"] and r["feat"][0] == 3.0
            assert r["width"] == 32 and r["height"] == 24
            assert r["duration_ms"] == meta["duration_ms"]
    # payload column is gone — downstream shuffles carry no media bytes
    assert "payload" not in feats.columns


def test_strict_mode_decodes_all_modalities(spark, media):
    # strict mode WORKS for PNG/WAV/Y4M (real codecs)
    rows = mm.extract_features(media, strict=True).collect()
    assert len(rows) == 90 and all(r["decoded"] for r in rows)


def test_y4m_roundtrip_exact():
    from hypertrace_ingester_spark.functions import codecs

    frames = mm.media_video(5)
    vid = codecs.decode_y4m(codecs.encode_y4m(frames, mm.VIDEO_FPS, 1))
    assert vid["n_frames"] == len(frames)
    assert (vid["frames"] == frames).all()  # raw container is lossless
    assert vid["duration_ms"] == int(round(len(frames) * 1000 / mm.VIDEO_FPS))


def test_sample_frames_hash_real_frames(spark, media):
    """Sampled frame hashes come from the ACTUAL decoded luma planes."""
    import hashlib

    frames_df = mm.sample_frames(media, every_ms=1000, max_frames=4).toPandas()
    some = frames_df.iloc[0]
    i = int(some["media_id"].split("-")[1])
    vid_frames = mm.media_video(i)
    fidx = min(int(some["frame_ts_ms"] / 1000 * mm.VIDEO_FPS), len(vid_frames) - 1)
    expect = hashlib.sha256(vid_frames[fidx].tobytes()).hexdigest()[:16]
    assert some["frame_hash"] == expect


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_ms=1000, max_frames=4)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame_ts_ms", "frame_hash"}
    # only video rows produce frames; counts bounded by duration and cap
    n_video = media.filter(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() <= n_video
    assert (pdf["frame_idx"] < 4).all()
    per = pdf.groupby("media_id")["frame_idx"].apply(lambda s: sorted(s.tolist()))
    for idxs in per:
        assert idxs == list(range(len(idxs)))  # contiguous from 0


def test_strict_mode_raises_for_unknown_container(spark):
    unknown = spark.createDataFrame(
        [("m-0", "video", b"\x00compressed-h264-ish", {"width": None,
          "height": None, "duration_ms": 1000, "codec": "h264"})],
        mm.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as exc_info:
        mm.extract_features(unknown, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_images_nn_law(spark, media):
    """Resize: image rows re-encode at target dims obeying the closed-form
    nearest-neighbor floor-index law; audio/video pass through bytes."""
    resized = {r["media_id"]: r for r in mm.resize_images(media, 20, 12).collect()}
    for o in media.collect():
        r = resized[o["media_id"]]
        if o["kind"] == "image":
            out = codecs.decode_png(bytes(r["payload"]))
            assert out.shape[:2] == (12, 20)
            assert r["meta"]["width"] == 20 and r["meta"]["height"] == 12
            src = codecs.decode_png(bytes(o["payload"]))
            ys = (np.arange(12) * src.shape[0]) // 12
            xs = (np.arange(20) * src.shape[1]) // 20
            assert (out == src[ys][:, xs]).all()
        else:
            assert bytes(r["payload"]) == bytes(o["payload"])
            assert r["meta"] == o["meta"]


def _media_from_images(spark, imgs):
    rows = [
        (
            f"img-{k:03d}",
            "image",
            codecs.encode_png(img),
            {"width": img.shape[1], "height": img.shape[0],
             "duration_ms": None, "codec": "png"},
        )
        for k, img in enumerate(imgs)
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def _brute_pairs(hashes, max_hamming):
    import itertools

    hv = {r["media_id"]: int(r["ahash"]) & 0xFFFFFFFFFFFFFFFF for r in hashes}
    out = set()
    for a, b in itertools.combinations(sorted(hv), 2):
        d = bin(hv[a] ^ hv[b]).count("1")
        if d <= max_hamming:
            out.add((a, b, d))
    return out


def test_image_ahash_semantics(spark):
    """aHash: noisy re-render lands within a few bits; inverse image is
    ~all bits away; identical pixels hash identically."""
    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    base = ((xx * 4).astype(np.uint8))[..., None]          # smooth ramp
    noisy = base.copy()
    noisy[::7, ::11] = np.minimum(noisy[::7, ::11] + 5, 255)  # sparse +5 noise
    inverse = (255 - base).astype(np.uint8)
    df = _media_from_images(spark, [base, noisy, inverse, base.copy()])
    h = {r["media_id"]: int(r["ahash"]) & 0xFFFFFFFFFFFFFFFF
         for r in mm.image_ahash(df).collect()}
    assert h["img-000"] == h["img-003"]                     # bit-identical
    assert bin(h["img-000"] ^ h["img-001"]).count("1") <= 3  # near-dup
    assert bin(h["img-000"] ^ h["img-002"]).count("1") >= 56  # inverse flips


def test_image_near_dups_exact_recall_vs_bruteforce(spark, media):
    """Pigeonhole banding is EXACT: the banded join + bit_count verify must
    equal the all-pairs popcount set — on a corpus with planted near-dups
    (noisy copies) AND the varied generator images."""
    planted = []
    for i in (0, 3, 12):
        img = mm.media_image(i)
        planted.append(img)
        noisy = img.copy()
        noisy[0, 0, 0] = (int(noisy[0, 0, 0]) + 1) % 256   # 1-pixel wiggle
        planted.append(noisy)
    corpus = _media_from_images(spark, planted).union(
        media.filter(F.col("kind") == "image")
    )
    hashes = mm.image_ahash(corpus)
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm.image_near_dups(hashes, max_hamming=6).collect()
    }
    expected = _brute_pairs(hashes.collect(), 6)
    assert got == expected
    # the 1-pixel wiggles must be caught (cell means barely move)
    assert any(a == "img-000" and b == "img-001" for a, b, _ in got)


def test_image_near_dups_compose_with_clusters(spark):
    """(doc_a, doc_b) pairs feed the shared CC endgame: noisy triplet
    collapses to one canonical survivor."""
    from hypertrace_ingester_spark.operators import dedup

    img = mm.media_image(4)
    variants = [img]
    for bump in (1, 2):
        v = img.copy()
        v[0, 0, 0] = (int(v[0, 0, 0]) + bump) % 256
        variants.append(v)
    other = (255 - mm.media_image(7)).astype(np.uint8)
    df = _media_from_images(spark, variants + [other])
    hashes = mm.image_ahash(df)
    pairs = mm.image_near_dups(hashes, max_hamming=6)
    clusters = dedup.duplicate_clusters(pairs)
    kept = dedup.keep_canonical(hashes.withColumnRenamed("media_id", "doc_id"),
                                clusters)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == ["img-000", "img-003"]


def _wav_media(spark, clips, rate=4000):
    rows = [
        (
            f"aud-{k:03d}",
            "audio",
            codecs.encode_wav(s, rate),
            {"width": None, "height": None,
             "duration_ms": int(len(s) * 1000 / rate), "codec": "pcm_s16le"},
        )
        for k, s in enumerate(clips)
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def _hk_clip(seed, rate=4000, dur=2.0, n_frames=9, n_bands=9):
    """Deterministic broadband clip: per (frame, band) amplitude pattern
    ((n*3 + m*5 + seed) % 7) keeps every band-energy comparison decisive
    (no two adjacent-band energies tie — margins >= 4 amp^2 units)."""
    n = int(rate * dur)
    t = np.arange(n) / rate
    fb = (np.arange(n_frames + 1) * n) // n_frames
    s = np.zeros(n)
    for m in range(n_bands):
        f_m = (m + 0.5) * (rate / 2) / n_bands
        carrier = np.sin(2 * np.pi * f_m * t)
        amp = np.zeros(n)
        for fr in range(n_frames):
            amp[fb[fr]:fb[fr + 1]] = 0.01 * (1 + ((fr * 3 + m * 5 + seed) % 7))
        s += amp * carrier
    return s


def test_audio_fingerprint_semantics(spark):
    """Gain change → identical bits; low-level noise → a few bits;
    different content → far."""
    a = _hk_clip(0)
    t = np.arange(len(a)) / 4000
    noisy = a + 0.002 * np.sin(2 * np.pi * 997 * t) \
              + 0.002 * np.sin(2 * np.pi * 1501 * t + 1.0)
    half = 0.5 * a
    other = _hk_clip(3)
    df = _wav_media(spark, [a, noisy, half, other])
    h = {r["media_id"]: int(r["ahash"]) & 0xFFFFFFFFFFFFFFFF
         for r in mm.audio_ahash(df).collect()}
    assert len(h) == 4

    def ham(x, y):
        return bin(h[x] ^ h[y]).count("1")

    assert ham("aud-000", "aud-002") <= 1   # gain-invariant (quantization only)
    assert ham("aud-000", "aud-001") <= 4   # noise below every bit margin
    assert ham("aud-000", "aud-003") >= 16  # different content


def test_audio_near_dups_bruteforce_and_clusters(spark):
    """hamming_near_dups is modality-agnostic: exact set equality vs
    all-pairs popcount on audio fingerprints, and the a/noisy/half triplet
    collapses through the CC endgame."""
    from hypertrace_ingester_spark.operators import dedup

    a = _hk_clip(0)
    t = np.arange(len(a)) / 4000
    clips = [a, a + 0.002 * np.sin(2 * np.pi * 997 * t), 0.5 * a,
             _hk_clip(1), _hk_clip(2), _hk_clip(5)]
    hashes = mm.audio_ahash(_wav_media(spark, clips))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in mm.hamming_near_dups(hashes, max_hamming=6).collect()
    }
    assert got == _brute_pairs(hashes.collect(), 6)
    assert {(a_, b_) for a_, b_, _ in got} >= {
        ("aud-000", "aud-001"), ("aud-000", "aud-002"), ("aud-001", "aud-002")
    }
    clusters = dedup.duplicate_clusters(mm.hamming_near_dups(hashes, 6))
    kept = dedup.keep_canonical(
        hashes.withColumnRenamed("media_id", "doc_id"), clusters)
    assert kept.count() == 4  # canonical of the triplet + 3 distinct clips
