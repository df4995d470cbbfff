"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data-pipeline extension (driver mandate). Image (PNG), audio
(WAV) and video (Y4M raw-stream) rows are all decoded FOR REAL by the
stdlib-only codecs in functions/codecs.py — the synthetic generator emits
genuine container bytes, so decode, feature extraction, and per-frame
sampling run end-to-end with no fake. The remaining seam is COMPRESSED
codecs (H.264/MP3/JPEG): unknown payloads raise in strict mode or fall
back to a deterministic payload-hash fake; plugging ffmpeg/Pillow in
changes ONE branch of ``_decode_bytes``, every plan stays identical.

Scale design: media rows are wide (payload ~MB) — ``mapInPandas`` with a
small ``maxRecordsPerBatch`` keeps Arrow batches bounded; feature outputs
are narrow rows, so downstream shuffles never carry payload bytes (features
are projected out before any groupBy/join).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, payload_hash string, "
    "feat array<float>, decoded boolean, width int, height int, duration_ms int"
)

FRAME_SCHEMA = (
    "media_id string, frame_idx int, frame_ts_ms int, frame_hash string"
)

STRICT_DECODE = False  # strict: video (no stdlib codec) raises instead of faking
_FEAT_DIM = 8


def _decode_bytes(payload: bytes, kind: str, strict: bool = STRICT_DECODE):
    """THE codec seam → (feat float32[_FEAT_DIM], width, height, duration_ms,
    decoded).

    PNG and WAV payloads are decoded for real (functions/codecs.py):
    image features = [1, width, height, channels, pixel mean/255, pixel
    std/255, log1p(bytes), 0]; audio = [2, rate/1000, log1p(samples),
    duration_s, rms, peak, log1p(bytes), 0]. Video (or any container the
    stdlib can't parse) is the remaining seam: strict mode raises — prod
    behavior without a codec — else a deterministic sha256-derived fake,
    stable across runs/partitions so tests can assert exact values."""
    if codecs.is_png(payload):
        img = codecs.decode_png(payload)
        h, w, c = img.shape
        flat = img.astype(np.float64) / 255.0
        feat = np.array(
            [1.0, w, h, c, flat.mean(), flat.std(), np.log1p(len(payload)), 0.0],
            dtype=np.float32,
        )
        return feat, w, h, None, True
    if codecs.is_wav(payload):
        wav = codecs.decode_wav(payload)
        s = wav["samples"]
        rms = float(np.sqrt((s * s).mean())) if len(s) else 0.0
        peak = float(np.abs(s).max()) if len(s) else 0.0
        feat = np.array(
            [
                2.0,
                wav["sample_rate"] / 1000.0,
                np.log1p(wav["n_samples"]),
                wav["duration_ms"] / 1000.0,
                rms,
                peak,
                np.log1p(len(payload)),
                0.0,
            ],
            dtype=np.float32,
        )
        return feat, None, None, wav["duration_ms"], True
    if codecs.is_y4m(payload):
        vid = codecs.decode_y4m(payload)
        luma = vid["frames"].astype(np.float64) / 255.0
        feat = np.array(
            [
                3.0,
                vid["width"],
                vid["height"],
                vid["n_frames"],
                vid["duration_ms"] / 1000.0,
                luma.mean() if luma.size else 0.0,
                np.log1p(len(payload)),
                0.0,
            ],
            dtype=np.float32,
        )
        return feat, vid["width"], vid["height"], vid["duration_ms"], True
    if strict:
        raise NotImplementedError(
            f"no codec available for kind={kind!r} payload; plug a decoder "
            "into _decode_bytes (PNG/WAV/Y4M decode natively — compressed "
            "codecs like H.264/MP3 need an external library)"
        )
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: _FEAT_DIM * 4], dtype=np.uint32)
    feat = (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)
    return feat, None, None, None, False


def extract_features(media: DataFrame, batch_rows: int = 64,
                     strict: bool | None = None) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Output drops the payload column — downstream stages shuffle only
    narrow feature rows. ``strict`` is captured in the closure (module
    globals don't survive into worker processes)."""
    strict_flag = STRICT_DECODE if strict is None else strict

    def extractor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, nbytes, decoded = [], [], [], []
            widths, heights, durations = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                data = bytes(payload)
                nbytes.append(len(data))
                hashes.append(hashlib.sha256(data).hexdigest())
                feat, w, h, dur, ok = _decode_bytes(data, kind, strict_flag)
                feats.append(feat)
                widths.append(w)
                heights.append(h)
                durations.append(dur)
                decoded.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "payload_hash": hashes,
                    "feat": feats,
                    "decoded": pd.Series(decoded, dtype="bool"),
                    "width": pd.Series(widths, dtype="Int32"),
                    "height": pd.Series(heights, dtype="Int32"),
                    "duration_ms": pd.Series(durations, dtype="Int32"),
                }
            )

    return media.mapInPandas(extractor, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 16) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp.

    Y4M payloads decode for REAL — the sampled timestamp maps to its frame
    via the stream's fps and the hash is of the actual frame's luma bytes.
    Unknown containers (compressed codecs) fall back to the deterministic
    payload-derived fake so the operator stays total; plug an external
    decoder into the same branch for H.264-class inputs."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_hash = [], [], [], []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                data = bytes(payload)
                if codecs.is_y4m(data):
                    vid = codecs.decode_y4m(data)
                    duration, fps, frames = vid["duration_ms"], vid["fps"], vid["frames"]
                else:
                    duration, fps, frames = int(meta["duration_ms"] or 0), None, None
                n = min(max_frames, max(duration // every_ms, 0))
                for i in range(n):
                    ts = i * every_ms
                    if frames is not None:
                        fidx = min(int(ts / 1000 * fps), len(frames) - 1)
                        digest = hashlib.sha256(frames[fidx].tobytes()).hexdigest()[:16]
                    else:
                        digest = hashlib.sha256(
                            data + ts.to_bytes(8, "little")
                        ).hexdigest()[:16]
                    out_id.append(media_id)
                    out_idx.append(i)
                    out_ts.append(ts)
                    out_hash.append(digest)
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int32"),
                    "frame_hash": out_hash,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(sampler, schema=FRAME_SCHEMA)


def _nn_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (floor-index law: src = floor(dst*in/out)).

    Pure integer index-grid — deterministic across platforms, no float
    rounding ambiguity, and the same law tests can restate in closed form."""
    h_in, w_in = img.shape[0], img.shape[1]
    ys = (np.arange(height) * h_in) // height
    xs = (np.arange(width) * w_in) // width
    return img[ys][:, xs]


def resize_images(media: DataFrame, width: int, height: int,
                  batch_rows: int = 64) -> DataFrame:
    """Resize image rows to ``width``×``height`` (nearest-neighbor), re-encode
    as real PNG; audio/video rows pass through byte-identical.

    Driver-mandate op (decode / feature-extract / **resize** / frame-sample).
    Scale shape: one ``mapInPandas`` pass over the payload column, no
    shuffle — the resize is embarrassingly parallel and the output schema is
    the input schema, so it composes ahead of any feature/hash stage (and
    SHRINKS the payload bytes that later stages carry). Compressed codecs
    hit the same ``_decode_bytes`` seam documented on the module."""

    def resizer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                data = bytes(payload)
                if kind == "image" and codecs.is_png(data):
                    img = _nn_resize(codecs.decode_png(data), width, height)
                    data = codecs.encode_png(img)
                    meta = dict(meta)
                    meta["width"], meta["height"] = width, height
                payloads.append(data)
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(resizer, schema=MEDIA_SCHEMA)


def image_ahash(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Perceptual average-hash over image rows → (media_id, ahash bigint).

    aHash recipe (the classic pHash-family baseline): decode, collapse to
    luma (channel mean), nearest-neighbor downsample to
    ``hash_size``×``hash_size``, one bit per cell = cell > mean, packed
    row-major MSB-first into a signed 64-bit long. Near-identical images
    (re-encodes, small crops/noise) land within a few bits; unrelated
    images differ in ~32. Payload is dropped before return, so everything
    downstream shuffles 2 narrow columns."""
    if hash_size * hash_size != 64:
        raise ValueError("ahash packs exactly 64 bits (hash_size must be 8)")

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
        for pdf in batches:
            ids, hashes = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not codecs.is_png(data):
                    continue
                img = codecs.decode_png(data).astype(np.float64)
                luma = img.mean(axis=2) if img.ndim == 3 else img
                cells = _nn_resize(luma, hash_size, hash_size)
                bits = (cells > cells.mean()).ravel().astype(np.uint64)
                hashes.append(np.int64((bits * weights).sum(dtype=np.uint64)))
                ids.append(media_id)
            yield pd.DataFrame(
                {"media_id": ids, "ahash": pd.Series(hashes, dtype="int64")}
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(hasher, schema="media_id string, ahash bigint")
    )


def audio_ahash(media: DataFrame, n_frames: int = 9, n_bands: int = 9) -> DataFrame:
    """Perceptual audio fingerprint → (media_id, ahash bigint).

    Simplified Haitsma–Kalker (2002) recipe: decode WAV, split samples into
    ``n_frames`` equal frames (floor-index law), per frame compute rFFT
    band energies over ``n_bands`` equal spectral bands, then one bit per
    (frame-delta, band-pair): sign of the time-delta of the band-energy
    difference. (9 frames, 9 bands) → 8×8 = 64 bits, packed MSB-first into
    the same signed-long shape ``image_ahash`` emits, so both modalities
    share ``hamming_near_dups``. Gain-invariant by construction (a volume
    change scales every energy by the same factor, preserving every sign);
    robust to low-level noise on modulated signals; flat-energy clips
    (constant-amplitude tones) have borderline bits — a documented
    aHash-family property, not a defect."""
    n_bits = (n_frames - 1) * (n_bands - 1)
    if n_bits != 64:
        raise ValueError("fingerprint packs exactly 64 bits "
                         "((n_frames-1)*(n_bands-1) must be 64)")

    def hasher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
        for pdf in batches:
            ids, hashes_out = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if not codecs.is_wav(data):
                    continue
                s = codecs.decode_wav(data)["samples"]
                fb = (np.arange(n_frames + 1) * len(s)) // n_frames
                energies = np.zeros((n_frames, n_bands))
                for n in range(n_frames):
                    frame = s[fb[n]:fb[n + 1]]
                    spec = np.abs(np.fft.rfft(frame)) ** 2
                    bb = (np.arange(n_bands + 1) * len(spec)) // n_bands
                    energies[n] = [spec[bb[m]:bb[m + 1]].sum() for m in range(n_bands)]
                band_diff = energies[:, :-1] - energies[:, 1:]
                bits = (band_diff[1:] - band_diff[:-1] > 0).ravel().astype(np.uint64)
                hashes_out.append(np.int64((bits * weights).sum(dtype=np.uint64)))
                ids.append(media_id)
            yield pd.DataFrame(
                {"media_id": ids, "ahash": pd.Series(hashes_out, dtype="int64")}
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(hasher, schema="media_id string, ahash bigint")
    )


def hamming_near_dups(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs at Hamming distance ≤ ``max_hamming`` on a 64-bit
    perceptual hash (image aHash, audio fingerprint, …), found WITHOUT an
    all-pairs join.

    Pigeonhole banding (exact, not probabilistic): split the 64-bit hash
    into ``max_hamming + 1`` contiguous bit bands — any pair within the
    distance budget has at least one band with ZERO differing bits, so an
    exact-match self-join on (band_idx, band_value) has recall 1.0 by
    construction. Candidates are then verified JVM-side with
    ``bit_count(a ^ b)``. Scale shape: the banded frame is 3 longs per
    row, the join is a bucketed equi-join on the band key (never
    all-pairs), and the verify runs inside codegen. Output (doc_a, doc_b)
    composes with ``dedup.duplicate_clusters`` / ``keep_canonical``."""
    n_bands = max_hamming + 1
    widths = [64 // n_bands + (1 if i < 64 % n_bands else 0) for i in range(n_bands)]
    starts = [sum(widths[:i]) for i in range(n_bands)]

    banded = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("ahash"), starts[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("media_id", "ahash", "band.band_idx", "band.band_val")

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("doc_a"),
            F.col("b.media_id").alias("doc_b"),
            F.bit_count(
                F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# modality-named face kept for discoverability; one shared banded-join engine
image_near_dups = hamming_near_dups


AUDIO_RATE = 4000
VIDEO_FPS = 2


def media_video(i: int) -> np.ndarray:
    """Deterministic luma frames for row i → N×H×W uint8 (N = 1 + i%10)."""
    n, h, w = 1 + (i % 10), 24, 32
    ff, yy, xx = np.meshgrid(np.arange(n), np.arange(h), np.arange(w), indexing="ij")
    return ((xx + yy * 2 + ff * 11 + i) % 256).astype(np.uint8)


def media_image(i: int) -> np.ndarray:
    """Deterministic pixel pattern for row i (gradient, seeded by id)."""
    w, h = 16 + (i % 8) * 8, 16 + (i % 6) * 8
    c = (3, 1, 4)[(i // 3) % 3]
    yy, xx, cc = np.meshgrid(np.arange(h), np.arange(w), np.arange(c), indexing="ij")
    return ((xx * 3 + yy * 5 + cc * 7 + i) % 256).astype(np.uint8)


def media_audio(i: int) -> tuple[np.ndarray, int]:
    """Deterministic sine clip for row i → (samples, duration_ms)."""
    duration_ms = 500 + (i % 10) * 500
    n = AUDIO_RATE * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / AUDIO_RATE
    freq = 100.0 + (i % 50) * 10.0
    return 0.5 * np.sin(2 * np.pi * freq * t), duration_ms


def generate_media(spark: SparkSession, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table with REAL container payloads:
    image rows are genuine PNG bytes (gradient pattern seeded by id), audio
    rows genuine 16-bit PCM WAV sine clips, video rows genuine Y4M
    (YUV4MPEG2) luma streams. Payload synthesis runs Arrow-batched on
    executors (``mapInPandas``), never on the driver — the same
    distribution shape a real ingest scan has."""
    base = spark.range(0, n_rows, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads, metas = [], [], [], []
            for raw_id in pdf["id"]:
                i = int(raw_id)
                kind = ("image", "audio", "video")[i % 3]
                width = height = duration = None
                if kind == "image":
                    img = media_image(i)
                    height, width = img.shape[0], img.shape[1]
                    payload, codec = codecs.encode_png(img), "png"
                elif kind == "audio":
                    samples, duration = media_audio(i)
                    payload, codec = codecs.encode_wav(samples, AUDIO_RATE), "pcm_s16le"
                else:
                    frames = media_video(i)
                    duration = int(round(len(frames) * 1000 / VIDEO_FPS))
                    width, height = frames.shape[2], frames.shape[1]
                    payload, codec = codecs.encode_y4m(frames, VIDEO_FPS, 1), "y4m"
                ids.append(f"media-{i:06d}")
                kinds.append(kind)
                payloads.append(payload)
                metas.append(
                    {"width": width, "height": height, "duration_ms": duration, "codec": codec}
                )
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads, "meta": metas}
            )

    return base.mapInPandas(gen, schema=MEDIA_SCHEMA)
