"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBS — the image/audio codec
libraries are not available in this environment (see NotImplementedError
markers / the deterministic fake decoder). Everything Ray-side is real
and tested: schemas, actor signatures, small-batch sizing for large
binary payloads, and output layout.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def real_decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image to HWC uint8. Requires an image codec
    library (PIL / cv2) that is NOT present in this environment."""
    raise NotImplementedError(
        "image codecs unavailable in this environment — wire PIL/cv2 here"
    )


def fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixels via sha256
    expansion. Same payload → same 'pixels' on every worker, which is all
    the pipeline plumbing needs for tests. Seeded from the payload's HEX
    encoding (not the raw bytes) so a SQL oracle can replicate it —
    DuckDB 1.0's sha256() only accepts VARCHAR."""
    w = max(1, min(width if width > 0 else 16, 64))
    h = max(1, min(height if height > 0 else 16, 64))
    need = w * h * 3
    seed = hashlib.sha256(payload.hex().encode()).digest()
    reps = (need // len(seed)) + 1
    buf = (seed * reps)[:need]
    return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


class ImageFeatures:
    """Actor-pool stage: (media_id, payload, width, height) →
    (media_id, mean_r/g/b, sha256). Decoder is injected — the fake by
    default, the real one when codecs exist. Use small batch_size: rows
    carry large binary payloads."""

    def __init__(self, decoder=None):
        self.decode = decoder or fake_decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        means = np.empty((len(payloads), 3), dtype=np.float64)
        shas = []
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            img = self.decode(p or b"", w, h)
            means[i] = img.reshape(-1, 3).mean(axis=0)
            shas.append(hashlib.sha256((p or b"").hex().encode()).hexdigest())
        return pa.table(
            {
                "media_id": ids,
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "payload_sha256": pa.array(shas, pa.string()),
            }
        )


class FrameSampler:
    """Video stage shape: (media_id, payload, duration_ms) → one row per
    sampled frame timestamp. Frame DECODE is stubbed; the explode/schema
    behavior is real."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        durs = batch.column("duration_ms").to_numpy(zero_copy_only=False)
        out_id, out_ts = [], []
        for mid, dur in zip(ids, durs):
            ts = np.arange(0, max(int(dur), 1), self.every_ms, dtype=np.int64)
            out_id.append(np.full(ts.shape[0], mid, dtype=np.int64))
            out_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id) if out_id else []),
                "frame_ts_ms": pa.array(np.concatenate(out_ts) if out_ts else []),
            }
        )


def image_features(ds: Dataset, concurrency=(1, 4), batch_size: int = 32) -> Dataset:
    """Small batches + actor pool: the layout for big binary payloads."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds: Dataset, every_ms: int = 1000, batch_size: int = 32) -> Dataset:
    return ds.map_batches(
        FrameSampler(every_ms), batch_format="pyarrow", batch_size=batch_size
    )


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus in MEDIA_SCHEMA (for tests/bench).
    Dims/durations are arithmetic in ``i`` (not an RNG stream) so a SQL
    oracle can regenerate the corpus exactly; ``seed`` is kept for API
    compatibility but unused."""
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (1 + i % 7)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(8 + (i * 37) % 56 if kind == "image" else -1)
        rows["height"].append(8 + (i * 53) % 56 if kind == "image" else -1)
        rows["duration_ms"].append(500 + (i * 997) % 9500 if kind != "image" else -1)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class ImageResizer:
    """Actor-pool stage: (media_id, payload, width, height) → resized
    raw-RGB rows (media_id, pixels: binary HWC uint8, width, height).
    Decode is injected (fake by default); the RESIZE itself is a real
    vectorized nearest-neighbor kernel over the decoded array — swapping
    in a real decoder makes this a production resize stage unchanged."""

    def __init__(self, out_w: int = 32, out_h: int = 32, decoder=None):
        self.out_w, self.out_h = out_w, out_h
        self.decode = decoder or fake_decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        out = []
        yi = None
        for p, w, h in zip(payloads, widths, heights):
            img = self.decode(p or b"", w, h)
            ih, iw = img.shape[0], img.shape[1]
            yi = (np.arange(self.out_h) * ih) // self.out_h
            xi = (np.arange(self.out_w) * iw) // self.out_w
            out.append(img[yi][:, xi].tobytes())
        return pa.table(
            {
                "media_id": ids,
                "pixels": pa.array(out, pa.binary()),
                "width": pa.array([self.out_w] * len(out), pa.int32()),
                "height": pa.array([self.out_h] * len(out), pa.int32()),
            }
        )


def real_decode_audio(payload: bytes) -> np.ndarray:
    """Decode encoded audio to a float32 mono waveform. Requires an audio
    codec library (soundfile / librosa) NOT present in this environment."""
    raise NotImplementedError(
        "audio codecs unavailable in this environment — wire soundfile here"
    )


def fake_decode_audio(payload: bytes, duration_ms: int, rate: int = 8000) -> np.ndarray:
    """Deterministic stand-in: bytes → pseudo-waveform in [-1, 1] via
    sha256 expansion (same payload → same samples on every worker)."""
    n = max(1, (max(int(duration_ms), 1) * rate) // 1000)
    n = min(n, 80_000)  # cap fake decode size
    seed = hashlib.sha256(payload.hex().encode()).digest()  # hex-seeded, see fake_decode_image
    reps = (n // len(seed)) + 1
    buf = (seed * reps)[:n]
    return (np.frombuffer(buf, dtype=np.uint8).astype(np.float32) - 127.5) / 127.5


class AudioFeatures:
    """Actor-pool stage: (media_id, payload, duration_ms) →
    (media_id, rms, zero_crossing_rate, n_samples, payload_sha256).
    Feature math is real vectorized numpy over the decoded waveform."""

    def __init__(self, decoder=None, rate: int = 8000):
        self.decode = decoder or fake_decode_audio
        self.rate = rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        rms = np.empty(len(payloads))
        zcr = np.empty(len(payloads))
        ns = np.empty(len(payloads), dtype=np.int64)
        shas = []
        for i, (p, d) in enumerate(zip(payloads, durs)):
            w = self.decode(p or b"", d, self.rate)
            # integer-exact sum of squares: w = q/127.5 with q = b-127.5,
            # so 4*q^2 = (2b-255)^2 is an exact int64 sum (order-free,
            # deterministic, and bit-replicable by a SQL oracle); rms =
            # sqrt(sumsq / (n * 65025)) with 65025 = 255^2.
            q2 = np.round(w * 255.0).astype(np.int64)  # 2b-255, exact
            rms[i] = float(np.sqrt(int((q2 * q2).sum()) / (w.shape[0] * 65025)))
            zcr[i] = float((np.signbit(w[1:]) != np.signbit(w[:-1])).mean()) if w.shape[0] > 1 else 0.0
            ns[i] = w.shape[0]
            shas.append(hashlib.sha256((p or b"").hex().encode()).hexdigest())
        return pa.table(
            {
                "media_id": ids,
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
                "n_samples": pa.array(ns, pa.int64()),
                "payload_sha256": pa.array(shas, pa.string()),
            }
        )


def resize_images(ds: Dataset, out_w: int = 32, out_h: int = 32,
                  concurrency=(1, 4), batch_size: int = 32) -> Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_features(ds: Dataset, concurrency=(1, 4), batch_size: int = 32) -> Dataset:
    return ds.map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
