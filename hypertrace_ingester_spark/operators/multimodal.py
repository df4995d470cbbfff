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
