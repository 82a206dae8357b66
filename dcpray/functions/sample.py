"""Deterministic content-hash sampling / splitting.

Large-scale training pipelines need samples and holdout splits that are
(a) reproducible across runs and engines, (b) a pure function of
content, not of row order or partitioning, and (c) cheap to verify.
These operators key on the lower 64 bits of md5 — bit-for-bit
compatible with DuckDB's ``md5_number_lower``, so a SQL oracle checks
the exact row set (little-endian bytes [8:16] of the digest; verified
in tests).

Two hash modes:

- ``hash="md5"`` (default) — the oracle-checked variant. md5 is
  inherently per-item (~10⁶ rows/s/core), the cost of bit-exact SQL
  verifiability.
- ``hash="fast"`` — the production variant at 100 TB: vectorized
  non-cryptographic hashing (pandas siphash + splitmix64, ~50× the md5
  loop). Same determinism / content-purity / uniformity properties and
  the same sampling RATE; the selected SET differs from md5 by design,
  so it has no SQL oracle (rows-only driver check + parity tests).

Either way the stage is an embarrassingly parallel ``map_batches``
filter — no exchange at all.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import hash_strings, splitmix64


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


def fast_lower64(col, salt: str = "") -> np.ndarray:
    """Vectorized non-cryptographic sibling of ``md5_lower64``: pandas'
    fixed-key siphash of the content, salted by mixing a constant
    derived from ``salt`` through splitmix64 (salting by mixing, not by
    concatenation — equivalent determinism, no per-row string build).
    Null rows hash to the salt mix; use the validity mask for null
    semantics, exactly as with ``md5_lower64``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash_strings(col)
    if salt:
        sm = np.uint64(int.from_bytes(
            hashlib.md5(salt.encode("utf-8")).digest()[:8], "little"))
        h = h ^ sm
    return splitmix64(h)


_HASHERS = {"md5": md5_lower64, "fast": fast_lower64}


def hash_sample(ds, col: str = "text", mod: int = 10, keep: int = 0,
                salt: str = "", hash: str = "md5"):
    """Deterministic 1-in-``mod`` sample: keep rows where
    ``hash64(col, salt) % mod == keep``. Null rows are dropped
    (SQL ``WHERE NULL % mod = k`` is never true). Same content + same
    salt ⇒ same sample, on any engine, at any partitioning.
    ``hash="fast"`` swaps the md5 loop for the vectorized splitmix
    hash (same rate, different — unverifiable-by-SQL — set)."""
    hasher = _HASHERS[hash]

    def flt(t: pa.Table) -> pa.Table:
        c = t[col]
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        h = hasher(c, salt)
        mask = valid & (h % np.uint64(mod) == np.uint64(keep))
        return t.filter(pa.array(mask))

    return ds.map_batches(flt, batch_format="pyarrow")


def bernoulli_sample(ds, rate: float, col: str = "text",
                     salt: str = "", hash: str = "md5"):
    """Deterministic rate-``p`` Bernoulli sample: keep rows where
    ``hash64(col, salt) < floor(rate * 2^64)`` — the arbitrary-rate
    sibling of ``hash_sample`` (which only does 1-in-mod rates). Same
    content + same salt ⇒ same sample on any engine at any
    partitioning; the SQL oracle is ``md5_number_lower(col || salt) <
    <threshold>`` with the identical integer threshold. Null rows are
    dropped (their hash is undefined, like hash_sample). Zero
    exchange, embarrassingly parallel."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("bernoulli_sample: rate must be in [0, 1]")
    hasher = _HASHERS[hash]
    threshold = np.uint64(min(int(rate * 2.0 ** 64), 2 ** 64 - 1))

    def flt(t: pa.Table) -> pa.Table:
        c = t[col]
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        h = hasher(c, salt)
        return t.filter(pa.array(valid & (h < threshold)))

    return ds.map_batches(flt, batch_format="pyarrow")


def hash_split(ds, col: str = "text", weights: tuple = (8, 1, 1),
               salt: str = "", split_col: str = "split",
               names: tuple = ("train", "val", "test"), hash: str = "md5"):
    """Deterministic train/val/test assignment: bucket =
    ``hash64(col, salt) % sum(weights)`` mapped to the named
    split by cumulative weight ranges. Appends ``split_col``; null
    content gets a null split."""
    assert len(weights) == len(names)
    hasher = _HASHERS[hash]
    bounds = np.cumsum(np.asarray(weights, np.uint64))
    total = np.uint64(bounds[-1])
    name_arr = pa.array(list(names), pa.string())

    def tag(t: pa.Table) -> pa.Table:
        c = t[col]
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        h = hasher(c, salt) % total
        idx = np.searchsorted(bounds, h, side="right")
        # vectorized label build: take with a null-masked index array —
        # null index slots yield null labels directly. (pc.if_else with
        # a multi-chunk condition + flat string values emits corrupt
        # offsets on pyarrow 16.1 — offsets accumulate across chunks
        # past the per-chunk data buffer — so keep everything flat.)
        idx_arr = pa.array(idx.astype(np.int64), mask=~valid)
        return t.append_column(split_col, name_arr.take(idx_arr))

    return ds.map_batches(tag, batch_format="pyarrow")


def stratified_sample(ds, group_col: str, n: int, id_col: str,
                      salt: str = "", hash: str = "md5",
                      partitions: int = 64):
    """Deterministic n-per-group (stratified) sample: within each group
    keep the n rows with the SMALLEST ``hash64(str(id), salt)``, ties
    broken by id — a pure function of content, so the sample is stable
    across runs, engines, and partitionings, and a different ``salt``
    draws an independent sample. ``hash="md5"`` is DuckDB
    ``md5_number_lower(cast(id AS varchar))``-exact (SQL oracle:
    row_number() over (partition by group order by md5, id) <= n);
    ``hash="fast"`` is the vectorized production sibling.

    Scale shape: reuses the top-k-per-group combiner — each batch
    forwards at most n rows per group it contains, the one exchange
    moves O(n · groups-per-batch), never the input."""
    from dcpray.functions.agg import topk_per_group

    hasher = _HASHERS[hash]
    cols = ds.schema().names

    def add_rank(t: pa.Table) -> pa.Table:
        h = hasher(pc.cast(t[id_col], pa.string()), salt)
        return t.append_column("_rank_h", pa.array(h))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = topk_per_group(ranked, group_col, "_rank_h", n,
                         tiebreak_col=id_col, descending=False,
                         partitions=partitions)
    return out.map_batches(lambda t: t.select(cols), batch_format="pyarrow")
