"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The sandbox ships no image/audio codecs, so the *decode kernels* are stubs
(clearly marked), but the Ray-side plumbing is real and tested: schema,
actor-pool signature, small-batch sizing for wide binary rows, and output
layout.  A production deployment swaps ``_decode_image_stub`` for a real
decoder (PIL/torchvision/ffmpeg) without touching the pipeline shape.

Batch-size guidance: for B-byte payloads keep
``batch_size * B * concurrency`` under the worker heap target — e.g. 4 MiB
images at concurrency 8 -> batch_size ≤ 64 for a 2 GiB heap.  Blocks holding
binary columns should stay in ``batch_format="pyarrow"`` end-to-end (pandas
object dtype copies every payload).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),         # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for plumbing tests."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (payload_bytes // 32)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + (i % 8) * 32 if kind != "audio" else 0,
                "height": 64 + (i % 5) * 32 if kind != "audio" else 0,
                "duration_ms": 1000 + i % 5000 if kind != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixels derived from the payload hash.

    A real deployment replaces this with an actual codec; the function
    signature and output contract (H×W×3 uint8) are the real interface.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.RandomState(seed % (2**32))
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class ImageFeatures:
    """Actor-pool stage: decode (stubbed) + feature-extract image rows.

    Emits per-image mean/std channel stats and a 64-bit perceptual-hash-style
    fingerprint.  Use small ``batch_size`` — payloads are wide.
    """

    def __init__(self, target_size: int = 32):
        self.target = target_size  # a real impl would init the codec here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, means, stds, phashes = [], [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "image":
                continue
            img = _decode_image_stub(row["payload"], row["width"], row["height"])
            ids.append(row["media_id"])
            means.append([float(img[..., c].mean()) for c in range(3)])
            stds.append([float(img[..., c].std()) for c in range(3)])
            small = img[:: max(1, img.shape[0] // 8), :: max(1, img.shape[1] // 8), 0]
            bits = (small[:8, :8] > small[:8, :8].mean()).flatten()[:64]
            ph = 0
            for b in bits:
                ph = (ph << 1) | int(b)
            phashes.append(ph)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "channel_mean": pa.array(means, pa.list_(pa.float64())),
                "channel_std": pa.array(stds, pa.list_(pa.float64())),
                "phash": pa.array(phashes, pa.uint64()),
            }
        )


class AudioFeatures:
    """Actor-pool stage for audio rows: (stub) decode + frame-level stats.

    Emits per-clip RMS/zero-crossing-style features from deterministic fake
    samples; a real implementation holds the codec in ``__init__``."""

    def __init__(self, sample_rate: int = 16_000):
        self.sr = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rms, zcr, durs = [], [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "audio":
                continue
            seed = int.from_bytes(hashlib.sha256(row["payload"]).digest()[:8], "little")
            rng = np.random.RandomState(seed % (2**32))
            n = max(1, min(self.sr, row["duration_ms"] * self.sr // 1000))
            wave = rng.standard_normal(n).astype(np.float32)
            ids.append(row["media_id"])
            rms.append(float(np.sqrt(np.mean(wave**2))))
            zcr.append(float(np.mean(np.abs(np.diff(np.sign(wave))) > 0)))
            durs.append(row["duration_ms"])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
                "duration_ms": pa.array(durs, pa.int32()),
            }
        )


class FrameSampler:
    """Actor-pool stage for video rows: emit k evenly-spaced (stub) frames.

    1 video row -> k frame rows carrying (media_id, frame_idx, ts_ms, frame
    fingerprint); the real implementation would demux with ffmpeg in
    ``__init__``-held state.
    """

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss, fps = [], [], [], []
        for row in batch.to_pylist():
            if row["kind"] != "video":
                continue
            dur = max(1, row["duration_ms"])
            for j in range(self.k):
                ts = int(dur * j / self.k)
                ids.append(row["media_id"])
                idxs.append(j)
                tss.append(ts)
                fps.append(
                    int.from_bytes(
                        hashlib.sha256(row["payload"] + ts.to_bytes(4, "little")).digest()[:8],
                        "little",
                    )
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(tss, pa.int32()),
                "frame_fp": pa.array(fps, pa.uint64()),
            }
        )
