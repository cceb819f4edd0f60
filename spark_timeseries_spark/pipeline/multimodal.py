"""Multimodal column handling: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (image/audio libraries are not in
this container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-hash-seeded fake decode so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is real and testable.

Scale design: binary payloads never pass through Python row-at-a-time; they
move as Arrow buffers in ``mapInPandas`` batches. Metadata extraction and
filtering happen on the typed columns BEFORE any decode (predicate pushdown
keeps undecodable/oversized blobs out of the expensive stage), and
``spark.sql.files.maxPartitionBytes`` bounds per-task memory for blob scans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "doc_id long, width int, height int, channels int, format string, "
    "features array<float>"
)
AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_frames int, "
    "features array<float>"
)


def attach_binary_metadata(
    df: DataFrame, binary_col: str, fmt: str = "unknown"
) -> DataFrame:
    """Typed metadata columns computed JVM-side: size, digest, format tag.
    These are what scale-out filters/joins key on — decode comes later and
    only for surviving rows."""
    b = F.col(binary_col)
    return df.withColumns(
        {
            "media_size": F.length(b),
            "media_digest": F.md5(b),
            "media_format": F.lit(fmt),
        }
    )


def _fake_decode(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature i is the top 60
    bits of ``md5(payload || chr(1) || str(i))`` scaled to [0, 1) — stable
    across runs/partitions AND reproducible in plain SQL
    (``('0x' || substr(md5(..), 1, 15))::BIGINT / 2^60``), so the
    correctness oracle can check the full mapInPandas plumbing."""
    feats = [
        int(
            hashlib.md5(payload + b"\x01" + str(i).encode()).hexdigest()[:15], 16
        )
        / float(1 << 60)
        for i in range(n_features)
    ]
    return np.asarray(feats, dtype=np.float32)


def decode_image_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``. Real decode is
    stubbed (no image libs in this container): pass ``fake=True`` for the
    deterministic fake, else NotImplementedError surfaces per-batch."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an image library not present "
                    "in this environment; use fake=True for plumbing tests"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                feats = _fake_decode(payload, n_features)
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "width": 64,
                        "height": 64,
                        "channels": 3,
                        "format": "fake",
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=IMAGE_SCHEMA)


def decode_audio_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 8,
    frame_hop: int = 512,
    fake: bool = False,
) -> DataFrame:
    """Audio decode / frame-sample via ``mapInPandas`` (stubbed decode)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires an audio library not present "
                    "in this environment; use fake=True for plumbing tests"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                n_samples = max(len(payload), 1)
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "sample_rate": 16000,
                        "n_samples": n_samples,
                        "n_frames": (n_samples + frame_hop - 1) // frame_hop,
                        "features": _fake_decode(payload, n_features).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=AUDIO_SCHEMA)


VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, frame_digest string"
RESIZED_SCHEMA = "doc_id long, width int, height int, media binary"


def sample_video_frames(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    hop_bytes: int = 128,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Frame-sample videos via ``mapInPandas`` — the 1→N *exploding* decode
    shape (one video row yields many frame rows), which is the plumbing a
    real ffmpeg-backed sampler needs: per-frame rows with stable indices so
    downstream feature extraction / dedup can key on (doc_id, frame_idx).

    Real decode is stubbed (no video libs in this container). The fake
    samples ``min(max_frames, 1 + len(payload)//hop_bytes)`` frames and
    digests each as ``md5(payload ‖ 0x02 ‖ idx)`` — deterministic and
    SQL-reproducible, so the harness oracle checks the full explode shape."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires ffmpeg/video libraries not "
                    "present in this environment; use fake=True for "
                    "plumbing tests"
                )
            out = {"doc_id": [], "frame_idx": [], "frame_digest": []}
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                n = min(max_frames, 1 + len(payload) // hop_bytes)
                for i in range(n):
                    out["doc_id"].append(row[id_col])
                    out["frame_idx"].append(i)
                    out["frame_digest"].append(
                        hashlib.md5(
                            payload + b"\x02" + str(i).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(
        _sample, schema=VIDEO_FRAME_SCHEMA
    )


def resize_image(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "media",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing: binary in → binary out with the new dimensions
    attached. Real resample is stubbed; the fake emits a deterministic
    payload (md5 of the input tiled to width·height·3 bytes) so batch
    shapes, Arrow binary round-trip, and size accounting are testable."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height * 3
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resizing requires an image library not present "
                    "in this environment; use fake=True for plumbing tests"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                seed = hashlib.md5(payload).digest()
                fake_pixels = (seed * (target // len(seed) + 1))[:target]
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "width": width,
                        "height": height,
                        "media": fake_pixels,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)
