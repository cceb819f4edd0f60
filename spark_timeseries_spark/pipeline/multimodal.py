"""Multimodal column handling: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

Decode kernels, in decreasing order of realness:

- **audio**: REAL for WAV payloads — stdlib ``wave`` parses the container,
  numpy computes the RMS-envelope features; no external library needed.
- **image decode/resize**: real path behind a PIL import-guard (the
  container has no PIL today; if it appears, the real kernel activates
  with no code change). Without PIL, ``NotImplementedError`` unless
  ``fake=True``.
- **video frame-sampling**: needs ffmpeg/av — guarded the same way
  (currently always the guard), fake path exercises the 1→N explode shape.

``fake=True`` substitutes a deterministic content-hash-seeded fake decode
so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is testable (and SQL-replayable for the oracle) regardless of
which libraries exist.

Scale design: binary payloads never pass through Python row-at-a-time; they
move as Arrow buffers in ``mapInPandas`` batches. Metadata extraction and
filtering happen on the typed columns BEFORE any decode (predicate pushdown
keeps undecodable/oversized blobs out of the expensive stage), and
``spark.sql.files.maxPartitionBytes`` bounds per-task memory for blob scans.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real image kernels activate if PIL is ever present
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - container has no PIL
    _PILImage = None

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


def _real_image_features(payload: bytes, n_features: int) -> dict:
    """PIL-backed decode: grayscale n_features-bin histogram (normalized to
    sum 1) — a deterministic, library-stable feature for dedup/filtering."""
    img = _PILImage.open(io.BytesIO(payload))
    w, h = img.size
    fmt = (img.format or "unknown").lower()
    gray = np.asarray(img.convert("L"), dtype=np.float64).ravel()
    hist, _ = np.histogram(gray, bins=n_features, range=(0.0, 256.0))
    feats = (hist / max(hist.sum(), 1)).astype(np.float32)
    channels = len(img.getbands())
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "format": fmt,
        "features": feats.tolist(),
    }


def decode_image_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract images via ``mapInPandas``. Real decode
    activates when PIL is importable (import-guarded at module load);
    without it, pass ``fake=True`` for the deterministic fake, else
    NotImplementedError surfaces per-batch."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and _PILImage is None:
                raise NotImplementedError(
                    "image decoding requires PIL, which is not present in "
                    "this environment; use fake=True for plumbing tests"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                if fake:
                    rows.append(
                        {
                            "doc_id": row[id_col],
                            "width": 64,
                            "height": 64,
                            "channels": 3,
                            "format": "fake",
                            "features": _fake_decode(
                                payload, n_features
                            ).tolist(),
                        }
                    )
                else:
                    rows.append(
                        {"doc_id": row[id_col]}
                        | _real_image_features(payload, n_features)
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_decode, schema=IMAGE_SCHEMA)


def _real_wav_features(payload: bytes, n_features: int, frame_hop: int) -> dict:
    """REAL audio decode for WAV containers — stdlib ``wave`` + numpy, no
    external library. Features are the n_features-chunk RMS envelope of the
    first channel, normalized to [0, 1] by the sample-width full scale.
    Non-WAV payloads raise NotImplementedError (a compressed-codec decode
    genuinely needs ffmpeg-class libraries)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            n_ch = w.getnchannels()
            width = w.getsampwidth()
            n_samples = w.getnframes()
            raw = w.readframes(n_samples)
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"non-WAV audio payload ({e}); compressed codecs require audio "
            "libraries not present in this environment"
        ) from None
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype="u1").astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    mono = x[::n_ch] if n_ch > 1 else x  # first channel
    feats = np.zeros(n_features, dtype=np.float32)
    if mono.size:
        for i, chunk in enumerate(np.array_split(mono, n_features)):
            if chunk.size:
                feats[i] = np.sqrt(np.mean(chunk * chunk))
    return {
        "sample_rate": rate,
        "n_samples": int(n_samples),
        "n_frames": (int(n_samples) + frame_hop - 1) // frame_hop,
        "features": feats.tolist(),
    }


def decode_audio_features(
    df: DataFrame,
    binary_col: str = "media",
    id_col: str = "doc_id",
    n_features: int = 8,
    frame_hop: int = 512,
    fake: bool = False,
) -> DataFrame:
    """Audio decode / feature-extract via ``mapInPandas``. The real path is
    genuinely implemented for WAV (stdlib-only, see
    :func:`_real_wav_features`); compressed codecs still raise
    NotImplementedError. ``fake=True`` keeps the oracle-replayable fake."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                if fake:
                    n_samples = max(len(payload), 1)
                    rows.append(
                        {
                            "doc_id": row[id_col],
                            "sample_rate": 16000,
                            "n_samples": n_samples,
                            "n_frames": (n_samples + frame_hop - 1)
                            // frame_hop,
                            "features": _fake_decode(
                                payload, n_features
                            ).tolist(),
                        }
                    )
                else:
                    rows.append(
                        {"doc_id": row[id_col]}
                        | _real_wav_features(payload, n_features, frame_hop)
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
    attached. The real path activates when PIL is importable (bilinear
    resize, PNG-encoded output); the fake emits a deterministic payload
    (md5 of the input tiled to width·height·3 bytes) so batch shapes,
    Arrow binary round-trip, and size accounting are testable without it."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height * 3
        for pdf in batches:
            if not fake and _PILImage is None:
                raise NotImplementedError(
                    "image resizing requires PIL, which is not present in "
                    "this environment; use fake=True for plumbing tests"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col] or b"")
                if fake:
                    seed = hashlib.md5(payload).digest()
                    media = (seed * (target // len(seed) + 1))[:target]
                else:
                    img = _PILImage.open(io.BytesIO(payload)).resize(
                        (width, height), _PILImage.BILINEAR
                    )
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    media = buf.getvalue()
                rows.append(
                    {
                        "doc_id": row[id_col],
                        "width": width,
                        "height": height,
                        "media": media,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(_resize, schema=RESIZED_SCHEMA)
