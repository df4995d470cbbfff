"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data-pipeline extension (driver mandate). The Spark-side plumbing —
schemas, partitioning, Arrow-batched UDF signatures, batch shapes — is real
and tested; the actual codec calls (PIL/ffmpeg/librosa are not in this
container) are isolated behind ``_decode_bytes``, which either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
decode derived from the payload hash (test mode). Swapping in a real codec
changes ONE function; every plan stays identical.

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
    "feat array<float>, decoded boolean"
)

FRAME_SCHEMA = (
    "media_id string, frame_idx int, frame_ts_ms int, frame_hash string"
)

STRICT_DECODE = False  # real deployments flip this and plug a codec in
_FEAT_DIM = 8


def _decode_bytes(payload: bytes, kind: str, strict: bool = STRICT_DECODE) -> np.ndarray:
    """THE codec seam. STUB: no image/audio libs in this container.

    Strict mode raises (prod behavior without a codec); otherwise returns a
    deterministic fake 'decode' — a feature vector derived from the sha256
    of the payload, stable across runs/partitions so tests can assert exact
    values."""
    if strict:
        raise NotImplementedError(
            f"no codec available for kind={kind!r}; install a decoder and "
            "replace _decode_bytes"
        )
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: _FEAT_DIM * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(media: DataFrame, batch_rows: int = 64,
                     strict: bool | None = None) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow-batched).

    Output drops the payload column — downstream stages shuffle only
    narrow feature rows. ``strict`` is captured in the closure (module
    globals don't survive into worker processes)."""
    strict_flag = STRICT_DECODE if strict is None else strict

    def extractor(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, nbytes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                data = bytes(payload)
                nbytes.append(len(data))
                hashes.append(hashlib.sha256(data).hexdigest())
                feats.append(_decode_bytes(data, kind, strict_flag))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                    "payload_hash": hashes,
                    "feat": feats,
                    "decoded": True,
                }
            )

    return media.mapInPandas(extractor, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 16) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame timestamp (deterministic fake frame hash until a real decoder is
    plugged into ``_decode_bytes``)."""

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_hash = [], [], [], []
            for media_id, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                duration = int(meta["duration_ms"] or 0)
                data = bytes(payload)
                n = min(max_frames, max(duration // every_ms, 0))
                for i in range(n):
                    ts = i * every_ms
                    out_id.append(media_id)
                    out_idx.append(i)
                    out_ts.append(ts)
                    out_hash.append(
                        hashlib.sha256(data + ts.to_bytes(8, "little")).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {
                    "media_id": out_id,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_ts_ms": pd.Series(out_ts, dtype="int32"),
                    "frame_hash": out_hash,
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(sampler, schema=FRAME_SCHEMA)


def generate_media(spark: SparkSession, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (seeded from row id, JVM-side
    payload derivation — same pattern as datagen.generate_sequences)."""
    df = spark.range(0, n_rows, numPartitions=partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), 3) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("media-"), F.col("id").cast("string")), 512).cast("binary")
    meta = F.struct(
        F.when(kind == "image", (F.pmod(F.col("id"), 8) * 64 + 64).cast("int")).alias("width"),
        F.when(kind == "image", (F.pmod(F.col("id"), 6) * 64 + 64).cast("int")).alias("height"),
        F.when(kind != "image", (F.pmod(F.col("id"), 10) * 1000 + 500).cast("int")).alias(
            "duration_ms"
        ),
        kind.alias("codec"),
    )
    return df.select(
        F.format_string("media-%06d", "id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )
