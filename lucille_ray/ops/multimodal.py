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


VIDEO_SCHEMA_FIELDS = [
    ("video", pa.binary()),
    ("video_format", pa.string()),
    ("n_frames", pa.int32()),
    ("frame_width", pa.int32()),
    ("frame_height", pa.int32()),
]


def attach_fake_video(ds, id_col: str = "doc_id", n_frames: int = 8,
                      side: int = 8):
    """Add a deterministic opaque binary 'video' column: ``n_frames`` raw RGB
    frames, frame f of doc i being md5("vid-{i}-{f}") tiled — so every frame
    is distinct and independently reconstructable."""

    frame_bytes = side * side * 3

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        payloads = []
        for i in ids:
            frames = []
            for f in range(n_frames):
                seed = hashlib.md5(f"vid-{i}-{f}".encode()).digest()
                reps = frame_bytes // len(seed) + 1
                frames.append((seed * reps)[:frame_bytes])
            payloads.append(b"".join(frames))
        n = len(ids)
        return (
            batch.append_column("video", pa.array(payloads, pa.binary()))
            .append_column("video_format", pa.array(["raw-rgb-frames"] * n))
            .append_column("n_frames", pa.array([n_frames] * n, pa.int32()))
            .append_column("frame_width", pa.array([side] * n, pa.int32()))
            .append_column("frame_height", pa.array([side] * n, pa.int32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class VideoFrameSampleStage:
    """Actor-pool map_batches stage: sample every ``stride``-th frame of each
    video payload and emit one ROW PER SAMPLED FRAME (flat-map expansion)
    with its mean pixel value — the decode/frame-sample shape a real
    ffmpeg-backed stage would keep identical."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frames_out, means_out = [], [], []
        ids = batch["doc_id"].to_pylist()
        payloads = batch["video"].to_pylist()
        nfs = batch["n_frames"].to_pylist()
        ws = batch["frame_width"].to_pylist()
        hs = batch["frame_height"].to_pylist()
        for i, p, nf, w, h in zip(ids, payloads, nfs, ws, hs):
            fb = w * h * 3
            arr = np.frombuffer(p, dtype=np.uint8)
            for f in range(0, nf, self.stride):
                frame = arr[f * fb: (f + 1) * fb]
                ids_out.append(i)
                frames_out.append(f)
                means_out.append(float(frame.astype(np.float64).mean()))
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(frames_out, pa.int64()),
                "frame_mean": pa.array(means_out, pa.float64()),
            }
        )


def video_frame_sample(ds, *, stride: int = 2, batch_size: int = 32,
                       concurrency=(1, 4)):
    """Frame-sampling pipeline: video payloads -> one row per sampled frame."""
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class VideoTemporalStage:
    """Actor-pool temporal-feature stage: decode each video payload's sampled
    frames and emit ONE ROW PER VIDEO with motion statistics over consecutive
    sampled-frame deltas plus the brightness trajectory — the shot-boundary /
    motion-energy shape a real decoder-backed stage would keep identical.

    Per video (frames sampled every ``stride``):
      * ``motion_mean`` / ``motion_max`` — mean/max over consecutive sampled
        pairs of the mean absolute per-pixel delta,
      * ``cut_count`` — pairs whose delta exceeds ``cut_threshold`` (a scene
        cut under a hard-threshold detector),
      * ``brightness_range`` — max - min of the sampled frames' mean pixel.
    """

    def __init__(self, stride: int = 2, cut_threshold: float = 60.0):
        self.stride = stride
        self.cut_threshold = cut_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["video"].to_pylist()
        nfs = batch["n_frames"].to_pylist()
        ws = batch["frame_width"].to_pylist()
        hs = batch["frame_height"].to_pylist()
        n_sampled, m_mean, m_max, cuts, b_range = [], [], [], [], []
        for p, nf, w, h in zip(payloads, nfs, ws, hs):
            fb = w * h * 3
            frames = np.frombuffer(p, dtype=np.uint8)[: nf * fb].reshape(nf, fb)
            sampled = frames[:: self.stride].astype(np.int16)
            k = sampled.shape[0]
            n_sampled.append(k)
            means = sampled.mean(axis=1, dtype=np.float64)
            b_range.append(float(means.max() - means.min()) if k else 0.0)
            if k >= 2:
                deltas = np.abs(np.diff(sampled, axis=0)).mean(
                    axis=1, dtype=np.float64
                )
                m_mean.append(float(deltas.mean()))
                m_max.append(float(deltas.max()))
                cuts.append(int((deltas > self.cut_threshold).sum()))
            else:
                m_mean.append(0.0)
                m_max.append(0.0)
                cuts.append(0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int32()),
                "motion_mean": pa.array(m_mean, pa.float64()),
                "motion_max": pa.array(m_max, pa.float64()),
                "cut_count": pa.array(cuts, pa.int64()),
                "brightness_range": pa.array(b_range, pa.float64()),
            }
        )


def video_temporal_features(ds, *, stride: int = 2,
                            cut_threshold: float = 60.0,
                            batch_size: int = 32, concurrency=(1, 4)):
    """Temporal-feature pipeline: video payloads -> one row per video with
    motion energy, scene-cut count, and brightness range (see
    :class:`VideoTemporalStage`)."""
    return ds.map_batches(
        VideoTemporalStage,
        fn_constructor_kwargs={
            "stride": stride, "cut_threshold": cut_threshold,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizeStage:
    """Actor-pool resize stage — REAL kernel (nearest-neighbor over raw RGB
    needs only numpy, no codec): payload in, resized payload out, metadata
    updated. Demonstrates the payload-transform (not feature-extract) shape:
    output batches still carry binary columns, so downstream stages chain."""

    def __init__(self, out_side: int):
        self.out_side = out_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = self.out_side
        payloads = batch["image"].to_pylist()
        ws = batch["image_width"].to_pylist()
        hs = batch["image_height"].to_pylist()
        out = []
        for p, w, h in zip(payloads, ws, hs):
            img = np.frombuffer(p, dtype=np.uint8)[: w * h * 3].reshape(h, w, 3)
            yi = (np.arange(s) * h) // s
            xi = (np.arange(s) * w) // s
            out.append(img[yi][:, xi].tobytes())
        n = len(out)
        names = batch.column_names
        return (
            batch.set_column(
                names.index("image"), "image", pa.array(out, pa.binary())
            )
            .set_column(
                names.index("image_width"), "image_width",
                pa.array([s] * n, pa.int32()),
            )
            .set_column(
                names.index("image_height"), "image_height",
                pa.array([s] * n, pa.int32()),
            )
        )


def resize_images(ds, out_side: int, *, batch_size: int = 64,
                  concurrency=(1, 4)):
    """Resize every image payload to ``out_side`` x ``out_side`` (nearest
    neighbor); chains with :func:`image_features`."""
    return ds.map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"out_side": out_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
