"""Distributed Lloyd's k-means over an embedding column.

The clustering step of corpus curation (topic balancing, dedup-aware
sampling, IVF coarse quantization at full-corpus fidelity). Iterative,
so there is no SQL oracle — correctness is established by equivalence
to a single-process numpy reference on the same deterministic init
(tests/test_kmeans.py).

Scale shape per iteration: centroids are broadcast ONCE via ``ray.put``
(memoized per worker); every batch assigns its vectors with one matmul
and emits a single fixed-size partial row — the (k × dim) sum matrix
and k counts — so the driver reduction is O(#batches) tiny rows
streamed through ``iter_batches`` into O(k·dim) memory. The corpus
never shuffles and is re-read lazily each iteration (cache upstream
with ``.materialize()`` if it fits the object store; at 100 TB the
re-read IS the design — k-means passes are compute-light).

Init is a pure function of content: the k distinct rows with the
smallest ``splitmix64(id)`` (the same hashed-id sampling the IVF
quantizer uses — reproducible across runs, block orders, engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dcpray.functions.ann import _normalize, _stack
from dcpray.hashing import splitmix64


def _init_centroids(ds, vec_col: str, id_col: str, k: int) -> np.ndarray:
    """k deterministic seed vectors: smallest hashed ids corpus-wide."""

    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.view(np.uint64)).view(np.int64)
        if len(h) > k:
            keep = np.argpartition(h, k - 1)[:k]
            t = t.take(pa.array(keep))
            h = h[keep]
        return pa.table({"_h": pa.array(h), vec_col: t[vec_col]})

    try:
        bt = (ds.select_columns([id_col, vec_col])
              .map_batches(local, batch_format="pyarrow")
              .sort("_h").limit(k)
              .take_batch(k, batch_format="pyarrow"))
    except ValueError as e:  # Ray's opaque "The dataset is empty."
        raise ValueError(
            "cannot fit k-means on an EMPTY corpus (the input dataset "
            "has no rows — check upstream filters)") from e
    return _stack(bt[vec_col])


def _partial_sums(t: pa.Table, cref, vec_col: str, metric: str) -> pa.Table:
    """One row per batch: flattened per-centroid sum matrix + counts."""
    import ray

    from dcpray.rayutil import worker_memo

    cents = worker_memo(("kmeans_c", cref.hex()), lambda: ray.get(cref))
    m = _stack(t[vec_col])
    k, dim = cents.shape
    if m.shape[0] == 0:
        sums = np.zeros((k, dim))
        cnts = np.zeros(k, np.int64)
    else:
        if metric == "cosine":
            assign = (_normalize(m) @ cents.T).argmax(axis=1)
        else:  # l2: argmin ||x-c||² = argmax (x·c - ||c||²/2)
            assign = (m @ cents.T
                      - 0.5 * (cents * cents).sum(axis=1)).argmax(axis=1)
        sums = np.zeros((k, dim))
        np.add.at(sums, assign, m)
        cnts = np.bincount(assign, minlength=k).astype(np.int64)
    return pa.table({
        "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
        "cnts": pa.array([cnts], pa.list_(pa.int64())),
    })


def kmeans_fit(ds, vec_col: str = "embedding", id_col: str = "vec_id",
               k: int = 8, iters: int = 10, metric: str = "l2",
               init: np.ndarray | None = None) -> np.ndarray:
    """Fit k centroids with ``iters`` Lloyd iterations; returns a
    (k, dim) float64 matrix. ``metric`` is ``"l2"`` or ``"cosine"``
    (cosine normalizes inputs and re-normalizes centroids each step —
    spherical k-means). Empty clusters keep their previous centroid."""
    import ray

    if metric not in ("l2", "cosine"):
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    cents = init if init is not None else _init_centroids(
        ds, vec_col, id_col, k)
    cents = np.asarray(cents, np.float64).copy()
    if metric == "cosine":
        cents = _normalize(cents)
    k, dim = cents.shape
    for _ in range(iters):
        cref = ray.put(cents)
        part = ds.map_batches(
            lambda t, cref=cref: _partial_sums(t, cref, vec_col, metric),
            batch_format="pyarrow")
        sums = np.zeros((k, dim))
        cnts = np.zeros(k, np.int64)
        for b in part.iter_batches(batch_size=None, batch_format="pyarrow"):
            for srow, crow in zip(b["sums"].to_pylist(),
                                  b["cnts"].to_pylist()):
                sums += np.asarray(srow).reshape(k, dim)
                cnts += np.asarray(crow, np.int64)
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz, None]
        if metric == "cosine":
            cents = _normalize(cents)
    return cents


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id", metric: str = "l2",
                  out_col: str = "cluster"):
    """Assign every row to its nearest centroid: Dataset of
    (id_col, out_col). Zero exchange — one broadcast, one matmul per
    batch."""
    import ray

    if metric not in ("l2", "cosine"):
        # same guard kmeans_fit applies — a typo'd metric must not
        # silently fall through to the l2 branch
        raise ValueError(f"metric must be 'l2' or 'cosine', got {metric!r}")
    cents = np.asarray(centroids, np.float64)
    if metric == "cosine":
        # externally-supplied (or l2-fit) centroids may be unnormalized;
        # a cosine argmax against raw centroids is biased toward the
        # largest-norm centroid, not the nearest direction
        cents = _normalize(cents)
    cref = ray.put(cents)

    def assign(t: pa.Table, cref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        c = worker_memo(("kmeans_c", cref.hex()),
                        lambda: __import__("ray").get(cref))
        m = _stack(t[vec_col])
        if m.shape[0] == 0:
            a = np.empty(0, np.int32)
        elif metric == "cosine":
            a = (_normalize(m) @ c.T).argmax(axis=1).astype(np.int32)
        else:
            a = (m @ c.T - 0.5 * (c * c).sum(axis=1)) \
                .argmax(axis=1).astype(np.int32)
        return pa.table({id_col: t[id_col], out_col: pa.array(a)})

    return ds.map_batches(assign, fn_args=(cref,), batch_format="pyarrow")
