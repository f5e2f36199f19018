"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The image/audio codec libraries are NOT in this container, so the decode
step is STUBBED two ways (clearly marked):
- decode="fake": a deterministic fake decoder (content-hash-derived
  features) so the full Spark plumbing — schema, Arrow batch shape,
  mapInPandas signature, partitioning — is real and TESTED end to end;
- decode="real": raises NotImplementedError at the exact seam where
  PIL/librosa/av would plug in on a real cluster.

Scale shape: media bytes travel as Arrow binary batches through
mapInPandas (never row-at-a-time Python); feature extraction is
per-partition; metadata columns stay JVM-side for pruning/filtering.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "feat array<float>, n_frames int"
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table in the contract shape: payload bytes
    derive from sha256 of the id (no external data)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = hashlib.sha256(f"media{i}".encode()).digest() * (8 + i % 17)
        rows.append((
            i, kind,
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
            64 + (i % 8) * 32 if kind != "audio" else 0,
            64 + (i % 5) * 32 if kind != "audio" else 0,
            (1000 + i * 37) if kind != "image" else 0,
            bytearray(blob),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode_features(payload: bytes, kind: str, dim: int = 16) -> tuple[np.ndarray, int]:
    """Deterministic fake 'decode + feature-extract': features are bytes of
    sha256(payload) scaled to [0,1); frame count derives from length."""
    h = hashlib.sha256(payload).digest()
    feat = np.frombuffer((h * ((dim // len(h)) + 1))[: dim * 4], dtype=np.uint32 if False else np.uint8)[:dim]
    feat = (feat.astype(np.float32) / 255.0)
    n_frames = 1 if kind == "image" else 1 + len(payload) % 32
    return feat, n_frames


def extract_features(media: DataFrame, decode: str = "fake", dim: int = 16) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    decode="real" is the integration seam for PIL/librosa/av — it raises
    NotImplementedError here because the codecs are not installed in this
    container (stub mandated by the task brief)."""
    if decode not in ("fake", "real"):
        raise ValueError(decode)

    def kern(batches):
        for pdf in batches:
            feats, frames, hashes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload)
                if decode == "real":
                    raise NotImplementedError(
                        "real media decode needs PIL/librosa/av — not in this container; "
                        "plug the codec in here (same signature) on a real cluster"
                    )
                f, nf = _fake_decode_features(b, kind, dim)
                feats.append(f)
                frames.append(nf)
                hashes.append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda x: len(bytes(x))),
                "sha256": hashes,
                "feat": feats,
                "n_frames": frames,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(kern, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Pure-JVM frame-sampling plan: (media_id, frame_ts_ms) rows for
    video/audio — the schedule an actual decoder would follow. Stays
    column-expression-only so Catalyst prunes/pushes it."""
    return (
        media.filter(F.col("kind").isin("video", "audio"))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
