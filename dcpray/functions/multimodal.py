"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (kind, width/height or duration, codec). Decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages — the model/codec load happens once per actor.

The decode kernels themselves are STUBBED: the container has no
PIL/ffmpeg/torchvision (see repo environment constraints). Each stage
has two modes:

- ``fake=True`` (default): a deterministic, content-derived fake —
  byte-histogram features, hash-seeded "frames" — so the Ray-side
  plumbing (schema, batch sizing, actor signature, output layout) is
  real and TESTED;
- ``fake=False``: raises ``NotImplementedError`` naming the library a
  real deployment would plug in at that exact point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media(batch: pa.Table, text_col: str = "text",
                     key_col: str = "doc_id") -> pa.Table:
    """Deterministic binary payloads derived from a text column — the
    test stand-in for real image/audio bytes."""
    kinds = ["image", "audio", "video"]
    ids = batch[key_col].to_numpy(zero_copy_only=False)
    payloads, kind, w, h, dur = [], [], [], [], []
    for i, t in zip(ids, batch[text_col].to_pylist()):
        b = (t or "").encode("utf-8")
        payloads.append((b * (1 + 256 // max(1, len(b))))[:256])
        k = kinds[int(i) % 3]
        kind.append(k)
        w.append(64 if k == "image" else 0)
        h.append(64 if k == "image" else 0)
        dur.append(0 if k == "image" else 1000 + int(i) % 5000)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "duration_ms": pa.array(dur, pa.int32()),
        }
    )


class ImageFeatureExtractor:
    """Actor-pool stage: binary image payload → feature vector.

    Real mode would decode with PIL + run a vision model loaded in
    ``__init__``; this container has neither, so fake mode computes a
    deterministic 16-bin byte histogram (unit-normalized). The stage
    shape (small batch_size for large payloads, concurrency=N actors,
    num_cpus per actor) is the part that transfers to production."""

    FEAT_DIM = 16

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real decode path: PIL.Image.open + torchvision model load "
                "would happen here (libraries not in this container)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, self.FEAT_DIM))
        for i, payload in enumerate(batch["payload"].to_pylist()):
            arr = np.frombuffer(payload or b"\0", dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=self.FEAT_DIM).astype(np.float64)
            feats[i] = hist / max(1.0, hist.sum())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize stub — passes metadata through with the
    new dimensions; fake mode truncates/pads payload proportionally."""

    def __init__(self, width: int, height: int, fake: bool = True):
        if not fake:
            raise NotImplementedError("real path: PIL Image.resize here")
        self.w, self.h = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        size = max(1, self.w * self.h // 64)
        payloads = [
            (p or b"\0")[:size].ljust(size, b"\0") for p in batch["payload"].to_pylist()
        ]
        t = batch.drop_columns(["payload", "width", "height"])
        return (
            t.append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("width", pa.array([self.w] * n, pa.int32()))
            .append_column("height", pa.array([self.h] * n, pa.int32()))
        )


class FrameSampler:
    """Actor-pool stage: video payload → N sampled frames (flat-map:
    one row in, N rows out). Fake mode slices the byte payload into
    evenly spaced chunks; real mode is the ffmpeg seek+decode point."""

    def __init__(self, num_frames: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("real path: ffmpeg/pyav frame seek here")
        self.n = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for mid, payload, kind in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["kind"].to_pylist(),
        ):
            if kind != "video":
                continue
            b = payload or b"\0"
            step = max(1, len(b) // self.n)
            for f in range(self.n):
                ids.append(mid)
                fidx.append(f)
                frames.append(b[f * step : f * step + step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
