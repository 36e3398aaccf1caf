"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, which substitutes a deterministic sha256-derived
feature vector. Everything around the stub — schema, Arrow batch
shape, mapInPandas plumbing, partitioning — is real and tested, so
swapping in PIL/librosa later only touches the marked function bodies.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mp3",
    b"\x1aE\xdf\xa3": "video/webm",
}


def blob_metadata(df: DataFrame, blob_col: str = "html") -> DataFrame:
    """Typed metadata for a binary column — pure JVM expressions."""
    b = F.col(blob_col)
    hexhead = F.hex(F.substring(b, 1, 4))
    mime = F.lit("application/octet-stream")
    for magic, m in MAGIC.items():
        mime = F.when(hexhead.startswith(magic.hex().upper()), F.lit(m)).otherwise(mime)
    return df.select(
        "*",
        F.length(b).cast("long").alias("blob_bytes"),
        F.sha2(b, 256).alias("blob_sha256"),
        mime.alias("blob_mime"),
    )


def _fake_features(blob: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 8 floats in [0,1)
    from sha256 bytes. REPLACE with a real decode when libs exist."""
    if blob is None:
        return [0.0] * FEATURE_DIM
    h = hashlib.sha256(blob).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_image_features(
    df: DataFrame, blob_col: str = "html", fake: bool = True
) -> DataFrame:
    """blob -> fixed-dim feature vector via Arrow-batched mapInPandas.

    The real implementation would decode + resize + embed per batch;
    the container has no imaging libs, so only the deterministic fake
    path is runnable (fake=False raises, clearly marked stub).
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/torchvision — not in this container"
        )
    out_fields = ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in df.schema)
    schema = f"{out_fields}, features array<double>"
    cols = df.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = pdf[blob_col].map(_fake_features)
            yield pdf[cols + ["features"]]

    return df.mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "html",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' plumbing: split a binary payload into fixed-
    stride chunks (stand-in for video frame extraction) — explodes to
    one row per frame with frame_idx, keeping lineage columns."""
    b = F.col(blob_col)
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor(F.length(b) / every_n_bytes).cast("int"), F.lit(max_frames - 1)
        ),
    )
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("long").alias("frame_idx"),
            F.substring(b, i * every_n_bytes + 1, every_n_bytes).alias("frame_bytes"),
        ),
    )
    return df.select("*", F.explode(frames).alias("frame")).select(
        "*", F.col("frame.frame_idx").alias("frame_idx"),
        F.col("frame.frame_bytes").alias("frame_bytes")
    ).drop("frame")


def decode_audio_features(
    df: DataFrame,
    blob_col: str = "html",
    fake: bool = True,
    sample_every: int = 16,
) -> DataFrame:
    """blob -> fixed-dim audio feature vector via Arrow-batched
    mapInPandas — the audio twin of :func:`decode_image_features`
    (module docstring promises both). The real implementation would
    decode (librosa/soundfile), resample, and pool per batch; this
    container has no audio libs, so only the deterministic fake path
    is runnable (``fake=False`` raises — clearly marked stub).

    The fake path differs from the image fake on purpose (strided
    byte pooling rather than a digest) so tests can tell the two
    pipelines apart; both are deterministic functions of the blob.
    """
    if not fake:
        raise NotImplementedError(
            "real audio decoding requires librosa/soundfile — not in this container"
        )
    out_fields = ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in df.schema)
    schema = f"{out_fields}, features array<double>"
    cols = df.columns

    def _fake_audio(blob: bytes) -> list[float]:
        if blob is None or len(blob) == 0:
            return [0.0] * FEATURE_DIM
        pooled = [0.0] * FEATURE_DIM
        counts = [0] * FEATURE_DIM
        for i in range(0, len(blob), sample_every):
            k = (i // sample_every) % FEATURE_DIM
            pooled[k] += blob[i] / 255.0
            counts[k] += 1
        return [p / c if c else 0.0 for p, c in zip(pooled, counts)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["features"] = pdf[blob_col].map(_fake_audio)
            yield pdf[cols + ["features"]]

    return df.mapInPandas(batches, schema=schema)
