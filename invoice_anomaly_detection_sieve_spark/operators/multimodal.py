"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata — the
span model's ``media_ref`` resolves to rows of a media table:

    media(media_key string, kind string, payload binary,
          meta struct<width int, height int, sample_rate int,
                      duration_ms int, mime string>)

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codecs (PIL/ffmpeg/torchaudio) are not
in this container, so the decode step is STUBBED: ``decode_stub=True``
produces a deterministic fake feature vector from the payload bytes,
keeping the Spark-side contract (schema, batching, partitioning) real and
tested; swap ``_decode_image``/``_decode_audio`` for real codecs in
production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_key string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int, mime:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_key string, kind string, feat array<float>, feat_dim int, decode_ok boolean"
)

FRAME_SAMPLE_SCHEMA = "media_key string, frame_idx int, frame_sha256 string"


def _decode_image(payload: bytes, meta) -> np.ndarray:
    """STUB — no image codec in this container.

    Real implementation: PIL.Image.open(BytesIO(payload)) → resize →
    np.asarray. The stub derives a deterministic 64-dim vector from a
    sha256 stream of the payload so downstream plumbing is testable.
    """
    raise NotImplementedError("image codec not available in sandbox; use decode_stub=True")


def _fake_features(payload: bytes, dim: int = 64) -> np.ndarray:
    out = np.empty(dim, dtype=np.float32)
    h = b""
    raw = payload or b""
    i = 0
    while i < dim:
        h = hashlib.sha256(h + raw[:256]).digest()
        take = min(dim - i, len(h))
        out[i : i + take] = np.frombuffer(h[:take], dtype=np.uint8).astype(np.float32) / 255.0
        i += take
    return out


def extract_media_features(
    media: DataFrame, dim: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batches).

    Partition-friendly: stateless per batch, no shuffle; heavy rows stay on
    the executor. At 100 TB this stage is bounded by payload I/O, so the
    input should be pre-bucketed by media_key to co-locate with joins.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    if decode_stub:
                        vec = _fake_features(payload, dim)
                    else:
                        vec = _decode_image(payload, meta)
                    feats.append([float(x) for x in vec])
                    ok.append(True)
                except Exception:  # noqa: BLE001 — per-row decode failures must not kill the job
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "media_key": pdf["media_key"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                    "decode_ok": ok,
                }
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_key,
    frame_idx, frame hash) per sampled frame. The decode is stubbed with a
    deterministic payload-slice hash; the fan-out shape (one row per
    sampled frame, governed by meta.duration_ms) is the real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, hashes = [], [], []
            for key, payload, meta in zip(pdf["media_key"], pdf["payload"], pdf["meta"]):
                duration = 0
                if meta is not None:
                    duration = (meta.get("duration_ms") if isinstance(meta, dict) else meta["duration_ms"]) or 0
                n_frames = max(1, duration // every_ms)
                raw = payload or b""
                for i in range(int(n_frames)):
                    keys.append(key)
                    idxs.append(i)
                    hashes.append(hashlib.sha256(raw + i.to_bytes(4, "big")).hexdigest())
            yield pd.DataFrame({"media_key": keys, "frame_idx": idxs, "frame_sha256": hashes})

    return media.where(F.col("kind") == "video").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def synth_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(128))
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 3500 if kind == "video" else None,
            "mime": f"{kind}/x-fake",
        }
        rows.append((f"MK-{i}", kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
