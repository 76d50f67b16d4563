"""Multimodal columns: opaque binary payloads + typed metadata, REAL kernels.

Media travel as ``binary`` columns with typed metadata (MEDIA_SCHEMA).  For
the raw uncompressed formats below every kernel in this module is a real
computation over the payload bytes — decode is ``np.frombuffer`` + reshape
(zero-copy), resize is true area/bilinear interpolation, features and frame
sampling read actual pixel/sample values:

- ``image/x-raw-rgb24``  — payload = height*width*3 interleaved uint8 pixels
- ``audio/x-raw-s16le``  — payload = n little-endian int16 PCM samples
- ``video/x-raw-rgb24``  — payload = n_frames concatenated rgb24 frames

Only *compressed* codecs (JPEG/PNG/MP3/MP4) are stubbed: the sandbox ships no
codec libraries, so ``decode_image`` falls back to PIL when importable and
otherwise raises ``NotImplementedError`` — the clearly-marked seam where a
production deployment plugs its decoder in.  The Ray-side shape is unchanged
either way: actor-pool ``map_batches`` stages, small batches for wide binary
rows, ``batch_format="pyarrow"`` end-to-end (pandas object dtype would copy
every payload).

Batch-size guidance: for B-byte payloads keep
``batch_size * B * concurrency`` under the worker heap target — e.g. 4 MiB
images at concurrency 8 -> batch_size ≤ 64 for a 2 GiB heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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

RAW_IMAGE_MIME = "image/x-raw-rgb24"
RAW_AUDIO_MIME = "audio/x-raw-s16le"
RAW_VIDEO_MIME = "video/x-raw-rgb24"
AUDIO_SR = 8_000  # samples/sec for the raw PCM format


def synthetic_media_table(n: int, payload_bytes: int = 0) -> pa.Table:
    """Deterministic media rows whose payloads ARE valid raw media.

    Image payloads are real rgb24 pixel buffers, audio payloads real s16le
    PCM, video payloads real concatenated rgb24 frames — so the decode /
    resize / feature kernels operate on genuine data.  Pixels/samples are
    seeded per row from sha256(media id), so the table is bit-identical
    across processes and parallelism levels.  ``payload_bytes`` is accepted
    for backwards compatibility and ignored (sizes follow the metadata).
    """
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        seed = int.from_bytes(hashlib.sha256(f"media{i}".encode()).digest()[:8], "little")
        rng = np.random.RandomState(seed % (2**32))
        if kind == "image":
            w, h = 64 + (i % 8) * 32, 64 + (i % 5) * 32
            payload = rng.randint(0, 256, size=h * w * 3, dtype=np.uint8).tobytes()
            dur = 0
        elif kind == "audio":
            w = h = 0
            dur = 1000 + i % 3000
            n_samp = dur * AUDIO_SR // 1000
            payload = rng.randint(-(2**15), 2**15, size=n_samp, dtype=np.int16).tobytes()
        else:  # video: small frames, 4..7 of them
            w, h = 32, 24
            n_frames = 4 + i % 4
            dur = 1000 + i % 5000
            payload = rng.randint(0, 256, size=n_frames * h * w * 3, dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": RAW_IMAGE_MIME, "audio": RAW_AUDIO_MIME,
                         "video": RAW_VIDEO_MIME}[kind],
                "width": w,
                "height": h,
                "duration_ms": dur,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, mime: str, width: int, height: int) -> np.ndarray:
    """Decode an image payload to an H×W×3 uint8 array.

    Raw rgb24 decodes zero-copy via frombuffer.  Compressed formats need a
    codec: we try PIL (absent in this sandbox) and otherwise raise — this is
    the ONLY stub seam in the module."""
    if mime == RAW_IMAGE_MIME:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size != height * width * 3:
            raise ValueError(f"rgb24 payload size {arr.size} != {height}x{width}x3")
        return arr.reshape(height, width, 3)
    try:  # pragma: no cover - no codecs in the sandbox
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            f"no codec available for mime={mime!r}; install PIL or provide "
            f"{RAW_IMAGE_MIME} payloads"
        ) from e


def decode_audio(payload: bytes, mime: str) -> np.ndarray:
    """Decode an audio payload to float32 samples in [-1, 1)."""
    if mime == RAW_AUDIO_MIME:
        return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
    raise NotImplementedError(  # pragma: no cover
        f"no codec available for mime={mime!r}; provide {RAW_AUDIO_MIME} payloads"
    )


def iter_video_frames(payload: bytes, mime: str, width: int, height: int) -> np.ndarray:
    """Decode a raw video payload to an (n_frames, H, W, 3) uint8 array."""
    if mime == RAW_VIDEO_MIME:
        frame_bytes = height * width * 3
        n_frames = len(payload) // frame_bytes
        arr = np.frombuffer(payload[: n_frames * frame_bytes], dtype=np.uint8)
        return arr.reshape(n_frames, height, width, 3)
    raise NotImplementedError(  # pragma: no cover
        f"no codec available for mime={mime!r}; provide {RAW_VIDEO_MIME} payloads"
    )


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """True bilinear resize (align-corners=False convention), numpy only."""
    h, w = img.shape[:2]
    # sample positions: centers of output pixels mapped into input space
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = img.astype(np.float32)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 bilinear-downsampled luminance vs its mean."""
    lum = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    small = resize_bilinear(np.repeat(lum[..., None], 3, axis=2), 8, 8)[..., 0]
    bits = (small > small.mean()).astype(np.uint64).ravel()
    return int(np.bitwise_or.reduce(bits << np.arange(63, -1, -1, dtype=np.uint64)))


class ImageFeatures:
    """Actor-pool stage: decode + feature-extract image rows (REAL kernels).

    Emits per-image channel mean/std (over the full-resolution pixels) and a
    64-bit perceptual hash computed from a real bilinear 8×8 downsample.
    Use small ``batch_size`` — payloads are wide."""

    def __init__(self, target_size: int = 32):
        self.target = target_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        # filter BEFORE to_pylist: converting skipped multi-MB audio/video
        # payloads to Python bytes just to test kind defeats the module's
        # stay-Arrow discipline
        batch = batch.filter(pc.equal(batch.column("kind"), "image"))
        ids, means, stds, phashes = [], [], [], []
        for row in batch.to_pylist():
            img = decode_image(row["payload"], row["mime"], row["width"], row["height"])
            ids.append(row["media_id"])
            px = img.reshape(-1, 3).astype(np.float64)
            means.append([float(v) for v in px.mean(axis=0)])
            stds.append([float(v) for v in px.std(axis=0)])
            phashes.append(_phash64(img))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "channel_mean": pa.array(means, pa.list_(pa.float64())),
                "channel_std": pa.array(stds, pa.list_(pa.float64())),
                "phash": pa.array(phashes, pa.uint64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: real bilinear resize, payload -> payload.

    Re-emits MEDIA_SCHEMA-shaped rows whose payload is the resized rgb24
    buffer — the standard pre-processing step before batched model
    inference.  Non-image rows pass through untouched."""

    def __init__(self, out_h: int = 64, out_w: int = 64):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        # only image payloads round-trip through Python; other media rows
        # pass through as their original Arrow buffers, uncopied
        is_img = pc.equal(batch.column("kind"), "image")
        rest = batch.filter(pc.invert(is_img))
        rows = batch.filter(is_img).to_pylist()
        for row in rows:
            img = decode_image(row["payload"], row["mime"], row["width"], row["height"])
            row["payload"] = resize_bilinear(img, self.out_h, self.out_w).tobytes()
            row["width"], row["height"] = self.out_w, self.out_h
            row["mime"] = RAW_IMAGE_MIME
        out = pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
        if rest.num_rows:
            out = pa.concat_tables([out, rest.cast(MEDIA_SCHEMA)])
        return out


class AudioFeatures:
    """Actor-pool stage for audio rows: real PCM decode + frame-level stats.

    RMS and zero-crossing rate are computed from the actual samples."""

    def __init__(self, sample_rate: int = AUDIO_SR):
        self.sr = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("kind"), "audio"))
        ids, rms, zcr, durs = [], [], [], []
        for row in batch.to_pylist():
            wave = decode_audio(row["payload"], row["mime"])
            if wave.size == 0:
                continue
            ids.append(row["media_id"])
            rms.append(float(np.sqrt(np.mean(wave.astype(np.float64) ** 2))))
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
    """Actor-pool stage for video rows: emit k evenly-spaced REAL frames.

    1 video row -> k frame rows carrying (media_id, frame_idx, ts_ms,
    frame_fp, mean_lum); the fingerprint is sha256 over the actual frame
    bytes and mean_lum the frame's true mean luminance."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("kind"), "video"))
        ids, idxs, tss, fps, lums = [], [], [], [], []
        for row in batch.to_pylist():
            frames = iter_video_frames(row["payload"], row["mime"],
                                       row["width"], row["height"])
            n_frames = frames.shape[0]
            if n_frames == 0:
                continue
            dur = max(1, row["duration_ms"])
            for j in range(self.k):
                src = min(n_frames - 1, n_frames * j // self.k)
                frame = frames[src]
                ids.append(row["media_id"])
                idxs.append(j)
                # timestamp of the frame actually emitted (src), not of the
                # nominal sample slot j — keeps ts_ms and frame consistent
                # when n_frames % k != 0 rounds src down
                tss.append(int(src * dur / n_frames))
                fps.append(int.from_bytes(
                    hashlib.sha256(frame.tobytes()).digest()[:8], "little"))
                lum = (0.299 * frame[..., 0] + 0.587 * frame[..., 1]
                       + 0.114 * frame[..., 2])
                lums.append(float(lum.mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(tss, pa.int32()),
                "frame_fp": pa.array(fps, pa.uint64()),
                "mean_lum": pa.array(lums, pa.float64()),
            }
        )
