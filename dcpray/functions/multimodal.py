"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns alongside (kind, width/height or duration, codec). Decode /
feature-extract / resize / frame-sample run as actor-pool
``map_batches`` stages — the model/codec load happens once per actor.

Decode modes per stage:

- ``fake=True`` (default): a deterministic, content-derived fake —
  byte-histogram features, hash-seeded "frames" — so the Ray-side
  plumbing (schema, batch sizing, actor signature, output layout) is
  real and TESTED regardless of codec availability;
- ``fake=False``: a REAL pure-numpy codec path for the formats that
  need no external library — 24-bit BI_RGB **BMP** (``encode_bmp`` /
  ``decode_bmp``: header parse, bottom-up rows, BGR order, 4-byte row
  padding) and PCM16 **WAV** (``encode_wav`` / ``decode_wav``: RIFF
  chunk walk). Image feature-extraction and resize decode BMPs for
  real; only the video ``FrameSampler`` still raises
  ``NotImplementedError`` (frame seek genuinely needs ffmpeg/pyav, not
  in this container).
"""

from __future__ import annotations

import struct

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


# ------------------------------------------------- pure-numpy codecs


def encode_bmp(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up rows,
    BGR channel order, rows padded to 4 bytes — the classic layout)."""
    h, w, c = pix.shape
    assert c == 3
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), np.uint8)
    bgr = pix[::-1, :, ::-1]  # bottom-up, BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB. Handles bottom-up
    and top-down row order and row padding; rejects other bit depths /
    compressions loudly."""
    if data is None or len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (null/short/bad magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={comp})")
    top_down = h_signed < 0
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, count=row_size * h, offset=off)
    bgr = arr.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → PCM16 RIFF/WAVE bytes."""
    data = np.asarray(samples, np.int16).tobytes()
    n = len(data)
    return (b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", n) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 RIFF/WAVE bytes → ((n, channels) int16 samples, rate).
    Walks the chunk list (tolerates extra chunks before data)."""
    if data is None or len(data) < 12 or data[:4] != b"RIFF" \
            or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload (null/short/bad magic)")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_fmt}, bits={bits})")
    samples = np.frombuffer(raw, np.int16)
    return samples.reshape(-1, channels), rate


#: deterministic pixel formula shared with the SQL oracle: flat pixel i
#: (row-major RGB) of a doc with n_chars characters is
#: (n_chars*7 + i*13) % 256 — the decode round-trip is verified because
#: the oracle computes the closed form while the pipeline must actually
#: parse the BMP it encoded
BMP_W = BMP_H = 8


def synthesize_bmp_media(batch: pa.Table, text_col: str = "text",
                         key_col: str = "doc_id") -> pa.Table:
    """Real, decodable 8×8 BMP payload per document, pixels derived
    deterministically from the text length (see formula above)."""
    import pyarrow.compute as pc

    ids = batch[key_col].to_numpy(zero_copy_only=False)
    n_chars = pc.utf8_length(
        pc.fill_null(batch[text_col], "")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.arange(BMP_W * BMP_H * 3, dtype=np.int64)
    flat = (n_chars[:, None] * 7 + idx[None, :] * 13) % 256  # (n, 192)
    payloads = [
        encode_bmp(row.astype(np.uint8).reshape(BMP_H, BMP_W, 3))
        for row in flat
    ]
    n = batch.num_rows
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["image"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([BMP_W] * n, pa.int32()),
        "height": pa.array([BMP_H] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


def bmp_pixel_stats(batch: pa.Table) -> pa.Table:
    """REAL decode stage: parse each BMP payload and report decoded
    dimensions + mean pixel value (6dp half-up, matching DuckDB round).
    The per-item decode loop is inherent to decode work; everything
    around it (schema, batch flow) is the production shape."""
    from dcpray.functions.textstats import round6_half_up

    dims_w, dims_h, means = [], [], []
    for payload in batch["payload"].to_pylist():
        if payload is None:
            # a missing blob is a data condition, not a job-killer:
            # emit null stats for the row (same tolerance as the real
            # FrameSampler path), keep decoding the rest
            dims_h.append(None)
            dims_w.append(None)
            means.append(None)
            continue
        pix = decode_bmp(payload)
        dims_h.append(pix.shape[0])
        dims_w.append(pix.shape[1])
        means.append(float(pix.mean()))
    valid = [m for m in means if m is not None]
    rounded = iter(round6_half_up(valid))
    means = [None if m is None else float(next(rounded)) for m in means]
    return pa.table({
        "media_id": batch["media_id"],
        "width": pa.array(dims_w, pa.int32()),
        "height": pa.array(dims_h, pa.int32()),
        "pixel_mean": pa.array(means, pa.float64()),
    })


#: deterministic sample formula shared with the SQL oracle: sample i of
#: a doc with n_chars characters is ((n_chars*11 + i*17) % 512) - 256
WAV_N_SAMPLES = 256
WAV_RATE = 16000


def synthesize_wav_media(batch: pa.Table, text_col: str = "text",
                         key_col: str = "doc_id") -> pa.Table:
    """Real, decodable PCM16 WAV payload per document, samples derived
    deterministically from the text length (see formula above)."""
    import pyarrow.compute as pc

    ids = batch[key_col].to_numpy(zero_copy_only=False)
    n_chars = pc.utf8_length(
        pc.fill_null(batch[text_col], "")
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    idx = np.arange(WAV_N_SAMPLES, dtype=np.int64)
    flat = ((n_chars[:, None] * 11 + idx[None, :] * 17) % 512) - 256  # (n, 256)
    payloads = [encode_wav(row.astype(np.int16), WAV_RATE) for row in flat]
    n = batch.num_rows
    dur = int(round(WAV_N_SAMPLES / WAV_RATE * 1000))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["audio"] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([0] * n, pa.int32()),
        "height": pa.array([0] * n, pa.int32()),
        "duration_ms": pa.array([dur] * n, pa.int32()),
    })


def wav_audio_stats(batch: pa.Table) -> pa.Table:
    """REAL audio decode stage: parse each WAV payload (RIFF chunk walk)
    and report sample count, rate, and RMS amplitude (6dp half-up,
    matching DuckDB round) — the audio sibling of ``bmp_pixel_stats``."""
    from dcpray.functions.textstats import round6_half_up

    ns, rates, rms = [], [], []
    for payload in batch["payload"].to_pylist():
        samples, rate = decode_wav(payload)
        x = samples[:, 0].astype(np.float64)
        ns.append(samples.shape[0])
        rates.append(rate)
        rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
    rms = round6_half_up(rms)
    return pa.table({
        "media_id": batch["media_id"],
        "n_samples": pa.array(ns, pa.int32()),
        "rate": pa.array(rates, pa.int32()),
        "rms": pa.array(rms, pa.float64()),
    })


class ImageFeatureExtractor:
    """Actor-pool stage: binary image payload → feature vector.

    ``fake=True`` histograms the RAW payload bytes (no decode — runs on
    any binary column). ``fake=False`` REALLY decodes each payload as a
    24-bit BMP (``decode_bmp``) and histograms the decoded PIXELS — the
    same output schema, so downstream stages are mode-agnostic. A
    heavier deployment would swap ``decode_bmp`` for PIL + a vision
    model loaded here in ``__init__``; the stage shape (small
    batch_size for large payloads, concurrency=N actors) is the part
    that transfers."""

    FEAT_DIM = 16

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list = [None] * batch.num_rows
        for i, payload in enumerate(batch["payload"].to_pylist()):
            if self.fake:
                arr = np.frombuffer(payload or b"\0", dtype=np.uint8)
            elif payload is None:
                continue  # null payload -> null feature row, job lives
            else:
                arr = decode_bmp(payload).reshape(-1)
            hist = np.bincount(arr >> 4, minlength=self.FEAT_DIM).astype(np.float64)
            feats[i] = hist / max(1.0, hist.sum())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class ImageResizer:
    """Actor-pool stage: resize to (width, height). ``fake=True``
    truncates/pads the opaque payload proportionally (plumbing-only);
    ``fake=False`` REALLY decodes the BMP, nearest-neighbor resamples
    with numpy index strides, and re-encodes a valid BMP."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.w, self.h = width, height
        self.fake = fake

    def _resize(self, payload: bytes) -> bytes:
        pix = decode_bmp(payload)
        h0, w0, _ = pix.shape
        ri = (np.arange(self.h) * h0 // self.h).clip(0, h0 - 1)
        ci = (np.arange(self.w) * w0 // self.w).clip(0, w0 - 1)
        return encode_bmp(pix[ri][:, ci])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            size = max(1, self.w * self.h // 64)
            payloads = [
                (p or b"\0")[:size].ljust(size, b"\0")
                for p in batch["payload"].to_pylist()
            ]
        else:
            payloads = [None if p is None else self._resize(p)
                        for p in batch["payload"].to_pylist()]
        t = batch.drop_columns(["payload", "width", "height"])
        return (
            t.append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("width", pa.array([self.w] * n, pa.int32()))
            .append_column("height", pa.array([self.h] * n, pa.int32()))
        )


def _load_pyav():
    """Import-guarded video decoder. Returns the ``av`` module when a
    container ships PyAV/ffmpeg, else None — the real FrameSampler path
    lights up automatically, and the stub stays loud otherwise."""
    try:
        import av  # type: ignore

        return av
    except ImportError:
        return None


class FrameSampler:
    """Actor-pool stage: video payload → N sampled frames (flat-map:
    one row in, N rows out). Fake mode slices the byte payload into
    evenly spaced chunks; real mode decodes via PyAV when it is
    importable (evenly spaced frames re-encoded as BMP), and raises a
    loud NotImplementedError when no media library exists in the
    container (this sandbox)."""

    def __init__(self, num_frames: int = 4, fake: bool = True):
        self._av = None
        if not fake:
            self._av = _load_pyav()
            if self._av is None:
                raise NotImplementedError(
                    "real path needs ffmpeg/pyav for frame seek; install "
                    "`av` or use fake=True")
        self.n = num_frames
        self.fake = fake

    def _decode_frames(self, payload: bytes) -> list[bytes]:
        """PyAV path: decode all frames once (bounded clips), keep n
        evenly spaced ones, re-encode each as BMP so downstream image
        stages (resize/feature-extract) consume them unchanged."""
        import io

        frames = []
        try:
            with self._av.open(io.BytesIO(payload)) as container:
                decoded = [f for f in container.decode(video=0)]
        except Exception:
            # null/truncated/corrupt payloads must not kill the job —
            # emit empty frames, mirroring the fake path's tolerance
            decoded = []
        if not decoded:
            return [b""] * self.n
        idx = [min(len(decoded) - 1, i * len(decoded) // self.n)
               for i in range(self.n)]
        for i in idx:
            rgb = decoded[i].to_ndarray(format="rgb24")
            frames.append(encode_bmp(rgb))
        return frames

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
            if not self.fake:
                for f, fr in enumerate(self._decode_frames(b)):
                    ids.append(mid)
                    fidx.append(f)
                    frames.append(fr)
                continue
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
