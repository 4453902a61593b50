"""Multimodal columns: images/audio/video as opaque ``binary`` columns with typed
metadata, processed by stateful actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the *decode kernel* is a clearly
marked deterministic fake (:class:`FakeImageCodec`) — but everything Ray-side is
real and tested: schema, binary payload plumbing, small-batch sizing for large
payloads, per-actor one-time setup in ``__init__``, and the feature-extraction
output layout. Swapping in a real codec is a one-class change.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA_FIELDS = [
    ("image", pa.binary()),
    ("image_format", pa.string()),
    ("image_width", pa.int32()),
    ("image_height", pa.int32()),
]


def attach_fake_images(ds, id_col: str = "doc_id", side: int = 16):
    """Add a deterministic opaque binary 'image' column (md5-expanded bytes) with
    typed metadata — stands in for real decoded-on-read payload columns."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for i in ids:
            seed = hashlib.md5(f"img-{i}".encode()).digest()
            reps = (side * side * 3) // len(seed) + 1
            payloads.append((seed * reps)[: side * side * 3])
        return (
            batch.append_column("image", pa.array(payloads, pa.binary()))
            .append_column("image_format", pa.array(["raw-rgb"] * len(ids)))
            .append_column("image_width", pa.array([side] * len(ids), pa.int32()))
            .append_column("image_height", pa.array([side] * len(ids), pa.int32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class FakeImageCodec:
    """DETERMINISTIC FAKE decode kernel (no image libs in this container).

    A real deployment replaces ``decode`` with e.g. PIL/libvips; the interface —
    bytes in, HxWx3 uint8 out — and everything around it stays identical.
    """

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        need = width * height * 3
        if arr.size < need:
            raise ValueError("short image payload")
        return arr[:need].reshape(height, width, 3)


class ImageFeatureStage:
    """Actor-pool map_batches stage: codec/model loaded ONCE per actor in
    ``__init__`` (the stateful-stage contract), per-batch work in ``__call__``.

    Use with small ``batch_size`` — batches carry the binary payloads, so
    batch_size * concurrency * payload must fit the worker heap.
    """

    def __init__(self, codec: Optional[FakeImageCodec] = None):
        self.codec = codec or FakeImageCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["image"].to_pylist()
        widths = batch["image_width"].to_pylist()
        heights = batch["image_height"].to_pylist()
        means, stds = [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self.codec.decode(p, w, h)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
        out = batch.drop_columns(["image"])  # features out, payload dropped
        return out.append_column("pix_mean", pa.array(means, pa.float64())) \
                  .append_column("pix_std", pa.array(stds, pa.float64()))


def image_features(ds, *, batch_size: int = 64, concurrency=(1, 4)):
    """The canonical multimodal pipeline: payload column -> actor-pool feature
    extraction with payload-aware batch sizing."""
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


AUDIO_SCHEMA_FIELDS = [
    ("audio", pa.binary()),
    ("audio_format", pa.string()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int32()),
]


def attach_fake_audio(ds, id_col: str = "doc_id", n_samples: int = 64,
                      sample_rate: int = 16000):
    """Add a deterministic opaque binary 'audio' column (md5-expanded bytes as
    16-bit PCM) with typed metadata — the audio twin of
    :func:`attach_fake_images`."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for i in ids:
            seed = hashlib.md5(f"aud-{i}".encode()).digest()
            reps = (n_samples * 2) // len(seed) + 1
            payloads.append((seed * reps)[: n_samples * 2])
        n = len(ids)
        return (
            batch.append_column("audio", pa.array(payloads, pa.binary()))
            .append_column("audio_format", pa.array(["pcm-s16le"] * n))
            .append_column(
                "sample_rate", pa.array([sample_rate] * n, pa.int32())
            )
            .append_column("n_samples", pa.array([n_samples] * n, pa.int32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class FakeAudioCodec:
    """DETERMINISTIC FAKE decode kernel (no audio libs in this container).

    A real deployment replaces ``decode`` with e.g. soundfile/ffmpeg; the
    interface — bytes in, int16 sample array out — and everything around it
    stays identical.
    """

    def decode(self, payload: bytes, n_samples: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype="<i2")
        if arr.size < n_samples:
            raise ValueError("short audio payload")
        return arr[:n_samples]


class AudioFeatureStage:
    """Actor-pool map_batches stage for audio: codec loaded once per actor,
    per-batch vectorized loudness features (RMS, peak, duration)."""

    def __init__(self, codec: Optional[FakeAudioCodec] = None):
        self.codec = codec or FakeAudioCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["audio"].to_pylist()
        counts = batch["n_samples"].to_pylist()
        rates = batch["sample_rate"].to_pylist()
        rms, peak, dur = [], [], []
        for p, n, sr in zip(payloads, counts, rates):
            x = self.codec.decode(p, n).astype(np.float64)
            rms.append(float(np.sqrt(np.mean(x * x))))
            peak.append(int(np.abs(x).max()))
            dur.append(float(n) / float(sr))
        out = batch.drop_columns(["audio"])
        return (
            out.append_column("rms", pa.array(rms, pa.float64()))
            .append_column("peak", pa.array(peak, pa.int64()))
            .append_column("duration_s", pa.array(dur, pa.float64()))
        )


def audio_features(ds, *, batch_size: int = 64, concurrency=(1, 4)):
    """Audio twin of :func:`image_features`: payload column -> actor-pool
    loudness feature extraction."""
    return ds.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
