"""Deterministic content-hash sampling / splitting.

Large-scale training pipelines need samples and holdout splits that are
(a) reproducible across runs and engines, (b) a pure function of
content, not of row order or partitioning, and (c) cheap to verify.
These operators key on the lower 64 bits of md5 — bit-for-bit
compatible with DuckDB's ``md5_number_lower``, so a SQL oracle checks
the exact row set (little-endian bytes [8:16] of the digest; verified
in tests).

md5 is inherently per-item (same as ``fingerprint_md5``); everything
around the digest loop is vectorized, and at scale the stage is an
embarrassingly parallel ``map_batches`` filter — no exchange at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def md5_lower64(col, salt: str = "") -> np.ndarray:
    """uint64 lower-64-bit md5 per row (DuckDB ``md5_number_lower``
    parity). Null rows hash to 0 with a separate validity mask — use
    the mask, not the value, for null semantics."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = np.zeros(len(col), np.uint64)
    for i, t in enumerate(col.to_pylist()):
        if t is not None:
            out[i] = int.from_bytes(
                hashlib.md5((t + salt).encode("utf-8")).digest()[8:], "little"
            )
    return out


def hash_sample(ds, col: str = "text", mod: int = 10, keep: int = 0,
                salt: str = ""):
    """Deterministic 1-in-``mod`` sample: keep rows where
    ``md5_lower64(col + salt) % mod == keep``. Null rows are dropped
    (SQL ``WHERE NULL % mod = k`` is never true). Same content + same
    salt ⇒ same sample, on any engine, at any partitioning."""

    def flt(t: pa.Table) -> pa.Table:
        c = t[col]
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        h = md5_lower64(c, salt)
        mask = valid & (h % np.uint64(mod) == np.uint64(keep))
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow")


def hash_split(ds, col: str = "text", weights: tuple = (8, 1, 1),
               salt: str = "", split_col: str = "split",
               names: tuple = ("train", "val", "test")):
    """Deterministic train/val/test assignment: bucket =
    ``md5_lower64(col + salt) % sum(weights)`` mapped to the named
    split by cumulative weight ranges. Appends ``split_col``; null
    content gets a null split."""
    assert len(weights) == len(names)
    bounds = np.cumsum(np.asarray(weights, np.uint64))
    total = np.uint64(bounds[-1])

    def tag(t: pa.Table) -> pa.Table:
        c = t[col]
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        h = md5_lower64(c, salt) % total
        idx = np.searchsorted(bounds, h, side="right")
        labels = np.asarray(names, object)[idx]
        arr = pa.array(
            [l if v else None for l, v in zip(labels, valid)], pa.string()
        )
        return t.append_column(split_col, arr)

    return ds.map_batches(tag, batch_format="pyarrow")
