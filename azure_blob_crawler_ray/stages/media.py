"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed
codecs.

The reference's only media handling is the binary-metadata fallback (ref
shared/processing/file_extractor.py:103-106); a training-data pipeline
needs decode / feature-extract / resize / frame-sample stages over opaque
``binary`` payload columns with typed metadata. The image/audio libraries
are NOT in this container, so the codec itself is a seam:

  * ``decode_fn=None``  -> DeterministicFakeCodec: derives shape/features
    from the payload bytes (splitmix-style), so schemas, batch sizing,
    actor-pool behavior and output layout are fully real and testable;
  * pass a real decode_fn (e.g. PIL/torchvision) in production.

Design for payload-heavy data: SMALL batch_size (payloads inflate
batches), actor pools (codec init once per actor), and the payload column
dropped as soon as features are extracted."""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import ray.data


class DeterministicFakeCodec:
    """Stands in for an image/audio decoder: 'decodes' payload bytes to a
    (height, width, channels) shape and a feature vector, all pure
    functions of the bytes. Raises NotImplementedError when asked for
    real pixel output, making the stub boundary explicit."""

    def decode_meta(self, payload: bytes) -> tuple:
        h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
        height = 16 + (h & 0x3FF)
        width = 16 + ((h >> 10) & 0x3FF)
        return height, width, 3

    def features(self, payload: bytes, dim: int) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(dim, dtype=np.float32)
        # byte-histogram features folded to dim buckets — deterministic.
        # Pad to a multiple of the bucket width so dims that don't divide
        # 256 (e.g. 48) fold cleanly instead of raising on reshape.
        hist = np.bincount(arr, minlength=256).astype(np.float32)
        width = 256 // min(dim, 256)
        pad = (-len(hist)) % width
        if pad:
            hist = np.concatenate([hist, np.zeros(pad, dtype=np.float32)])
        folded = hist.reshape(-1, width).sum(axis=1)[:dim]
        out = np.zeros(dim, dtype=np.float32)
        out[: len(folded)] = folded
        n = float(np.linalg.norm(out))
        return out / n if n else out

    def pixels(self, payload: bytes):
        raise NotImplementedError(
            "real image decoding requires an image library not present in "
            "this environment; inject a decode_fn"
        )


class MediaFeatureStage:
    """Actor-pool map_batches stage: binary payload -> (shape metadata +
    feature vector); payload column is dropped on output.

    Usage:
      ds.map_batches(MediaFeatureStage, fn_constructor_kwargs={'dim': 64},
                     batch_size=32, concurrency=(1, 8), num_cpus=1)
    """

    def __init__(self, dim: int = 64, decode_fn: Optional[Callable] = None):
        self.codec = DeterministicFakeCodec()
        self.decode_fn = decode_fn
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        heights, widths, feats = [], [], []
        for p in payloads:
            p = p or b""
            h, w, _c = self.codec.decode_meta(p)
            heights.append(h)
            widths.append(w)
            feats.append(self.codec.features(p, self.dim))
        flat = np.concatenate(feats) if feats else np.zeros(0, dtype=np.float32)
        keep = [c for c in batch.column_names if c != "payload"]
        out = batch.select(keep)
        out = out.append_column("height", pa.array(heights, type=pa.int32()))
        out = out.append_column("width", pa.array(widths, type=pa.int32()))
        out = out.append_column(
            "media_vec",
            pa.FixedSizeListArray.from_arrays(pa.array(flat, type=pa.float32()), self.dim),
        )
        return out


class FrameSampleStage:
    """Video frame sampling shape: one input row -> N metadata rows
    (frame index + virtual timestamp), flat_map-style via map_batches.
    Frame pixel extraction is behind the same codec seam."""

    def __init__(self, fps: float = 1.0, duration_key: str = "duration_s"):
        self.fps = fps
        self.duration_key = duration_key

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, ts = [], [], []
        durations = batch[self.duration_key].to_pylist()
        keys = batch["media_id"].to_pylist()
        for mid, dur in zip(keys, durations):
            n = max(1, int(float(dur or 0) * self.fps))
            for f in range(n):
                ids.append(mid)
                frames.append(f)
                ts.append(f / self.fps)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "frame": pa.array(frames, type=pa.int32()),
                "t_s": pa.array(ts, type=pa.float64()),
            }
        )


def media_features(
    ds: ray.data.Dataset,
    *,
    dim: int = 64,
    batch_size: int = 32,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """payload-bearing rows -> feature rows (payload dropped)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class MediaResizeStage:
    """Actor-pool resize stage: payload + decoded dims -> target-bounded
    dims + a deterministically subsampled payload (the byte-level stand-in
    for pixel resampling, which sits behind the codec seam like
    ``DeterministicFakeCodec.pixels``).  Aspect ratio is preserved; the
    output payload shrinks by the same area factor, so downstream batch
    sizing sees realistic post-resize byte volumes.  Payloads are mutated,
    never accumulated — one batch in flight per actor."""

    def __init__(
        self,
        max_side: int = 256,
        decode_fn: Optional[Callable] = None,
    ):
        self.codec = DeterministicFakeCodec()
        self.decode_fn = decode_fn
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        hs, ws, outs = [], [], []
        for p in payloads:
            p = p or b""
            h, w, _c = self.codec.decode_meta(p)
            scale = min(1.0, self.max_side / max(h, w, 1))
            nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
            stride = max(1, int(round(1.0 / max(scale * scale, 1e-9))))
            hs.append(nh)
            ws.append(nw)
            outs.append(p[::stride] if scale < 1.0 else p)
        keep = [c for c in batch.column_names if c != "payload"]
        out = batch.select(keep)
        out = out.append_column("height", pa.array(hs, type=pa.int32()))
        out = out.append_column("width", pa.array(ws, type=pa.int32()))
        out = out.append_column("payload", pa.array(outs, type=pa.large_binary()))
        return out


def media_resize(
    ds: ray.data.Dataset,
    *,
    max_side: int = 256,
    batch_size: int = 32,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """payload-bearing rows -> aspect-preserving bounded-size rows."""
    return ds.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample(
    ds: ray.data.Dataset,
    *,
    fps: float = 1.0,
    batch_size: int = 256,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """(media_id, duration_s) rows -> one row per sampled frame."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"fps": fps},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
