"""Approximate-nearest-neighbor search over an embedding column.

Two paths:

- ``topk_cosine`` — brute-force baseline: the query matrix is broadcast
  once (``ray.put``), every batch is scored with one numpy matmul, each
  batch emits its local top-k per query, and a final tiny groupby
  reduces the per-batch candidates (num_blocks × k rows per query) to
  the global top-k. Exact, embarrassingly parallel, zero shuffle of the
  corpus.
- ``ivf_topk`` — the scale path: k-means coarse quantizer (trained on a
  driver-side sample, deterministic seed), corpus partitioned by nearest
  centroid (one hash-groupby), queries probe only the ``nprobe`` nearest
  lists. At cluster scale the per-list partitions are the unit of
  placement; scoring touches ~nprobe/nlist of the corpus.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _stack(col) -> np.ndarray:
    return np.stack(col.to_pylist()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BatchScorer:
    """Actor-pool stage: score one Arrow batch of embeddings against the
    broadcast query matrix; emit the batch-local top-k per query."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # fetched once per actor, zero-copy reads
        self.qids = q["qid"]
        self.qmat = _normalize(q["mat"])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_stack(batch["embedding"]))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        scores = self.qmat @ emb.T  # Q × B
        k = min(self.k, emb.shape[0])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        flat = top.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.int64()),
                "vec_id": pa.array(ids[flat], pa.int64()),
                "score": pa.array(
                    np.round(np.take_along_axis(scores, top, 1).reshape(-1), 6)
                ),
            }
        )


def _global_topk(group: pa.Table, k: int) -> pa.Table:
    t = group.sort_by([("score", "descending"), ("vec_id", "ascending")])
    return t.slice(0, k)


def topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                concurrency: int = 4):
    """Exact cosine top-k for each query vector. ``queries`` is (Q, d)."""
    import ray

    ref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": np.asarray(queries)})
    cand = ds.map_batches(
        BatchScorer, fn_constructor_args=(ref, k),
        batch_format="pyarrow", concurrency=concurrency, batch_size=8192,
    )
    return cand.groupby("query_id").map_groups(
        lambda g: _global_topk(g, k), batch_format="pyarrow"
    )


# ----------------------------------------------------------------- IVF


def train_centroids(sample: np.ndarray, nlist: int, iters: int = 8,
                    seed: int = 11) -> np.ndarray:
    """Deterministic mini k-means on a sample (the coarse quantizer)."""
    rng = np.random.RandomState(seed)
    sample = _normalize(sample)
    cents = sample[rng.choice(len(sample), size=min(nlist, len(sample)), replace=False)]
    for _ in range(iters):
        sim = sample @ cents.T
        assign = sim.argmax(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def _training_sample(ds, sample_size: int) -> np.ndarray:
    """Deterministic quantizer-training sample: the ``sample_size`` rows
    with the SMALLEST hashed vec_ids — a pseudo-random selection that is
    a pure function of the corpus CONTENT, independent of block arrival
    order and corpus size (``take_batch`` returns whichever blocks land
    first, so both the order AND the set it samples vary between Dataset
    executions — centroids, list assignment and probe order would all be
    irreproducible). One narrow pass keeps per-block survivors, then a
    small sort over ≤ blocks×sample_size candidate rows."""
    from dcpray.hashing import splitmix64

    def local(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.view(np.uint64))
        if len(h) > sample_size:
            keep = np.argpartition(h, sample_size - 1)[:sample_size]
            t = t.take(pa.array(keep))
            h = h[keep]
        return pa.table({"_h": pa.array(h.view(np.int64)),
                         "embedding": t["embedding"]})

    cand = ds.select_columns(["vec_id", "embedding"]).map_batches(
        local, batch_format="pyarrow"
    )
    bt = cand.sort("_h").limit(sample_size).take_batch(
        sample_size, batch_format="pyarrow"
    )
    return _stack(bt["embedding"])


class ListAssigner:
    def __init__(self, cents_ref):
        import ray

        self.cents = ray.get(cents_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_stack(batch["embedding"]))
        lists = (emb @ self.cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


class ProbedScorer(BatchScorer):
    """Scores one IVF list's rows against only the queries probing that
    list. The broadcast query/probe matrices arrive as ObjectRefs and
    are fetched from the node-local object store (zero-copy for numpy) —
    never serialized into task closures. The group is scored in bounded
    chunks; the per-chunk local top-k union still contains the global
    top-k (exactness preserved through the final reduce)."""

    CHUNK = 8192

    def __init__(self, queries_ref, k: int, probes_ref):
        super().__init__(queries_ref, k)
        import ray

        self.probes = ray.get(probes_ref)  # Q × nprobe list ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        # segment by list FIRST: a batch may bundle several small lists
        # (the persisted-index read coalesces files into blocks), and
        # each list's rows must be scored only against the queries that
        # probe THAT list — a union mask would let a query's top-k
        # include vectors from lists it never probed
        lv = batch["ivf_list"].to_numpy(zero_copy_only=False)
        if len(lv) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        order = np.argsort(lv, kind="stable")
        t = batch.take(pa.array(order))
        lv = lv[order]
        new = np.r_[True, lv[1:] != lv[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(lv)]
        parts = []
        for s, e in zip(starts, ends):
            qmask = np.isin(self.probes, lv[s]).any(axis=1)
            if not qmask.any():
                continue
            sub = BatchScorer.__new__(BatchScorer)
            sub.qids, sub.qmat, sub.k = self.qids[qmask], self.qmat[qmask], self.k
            seg = t.slice(int(s), int(e - s))
            parts += [
                BatchScorer.__call__(sub, seg.slice(off, self.CHUNK))
                for off in range(0, seg.num_rows, self.CHUNK)
            ]
        if not parts:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


_PROBED_CACHE: dict = {}


def _probed_score(group: pa.Table, qref, k: int, probes_ref) -> pa.Table:
    """Worker-side entry for the probed scorer: memoizes the constructed
    scorer per (qref, k) so repeated tasks in one worker process skip
    the (already zero-copy) ref resolution and query re-normalization."""
    key = (qref.hex(), k, probes_ref.hex())
    sc = _PROBED_CACHE.get(key)
    if sc is None:
        _PROBED_CACHE.clear()
        sc = _PROBED_CACHE[key] = ProbedScorer(qref, k, probes_ref)
    return sc(group)


def build_ivf_index(ds, index_dir: str, nlist: int = 32,
                    sample_size: int = 10_000, concurrency: int = 4) -> dict:
    """Materialize a partitioned IVF index: the corpus is assigned to its
    nearest coarse centroid and written as ONE parquet file per list
    (``list-NNNNN.parquet``, ivf_list carried as a column) plus the
    centroid matrix (``centroids.parquet``) and ``meta.json``. Build
    once, query many — ``ivf_query`` then reads ONLY the probed lists'
    files, the ANN analogue of the replay path's watermark file pruning:
    at cluster scale each list file is the unit of placement and a query
    touches ~nprobe/nlist of the corpus at the FILE level, not per-row.
    """
    import json

    import ray

    os.makedirs(index_dir, exist_ok=True)
    sample = _training_sample(ds, sample_size)
    cents = train_centroids(sample, nlist)
    cents_ref = ray.put(cents)
    assigned = ds.map_batches(
        ListAssigner, fn_constructor_args=(cents_ref,),
        batch_format="pyarrow", concurrency=concurrency, batch_size=8192,
    )

    def write_list(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        list_id = int(group["ivf_list"][0].as_py())
        path = os.path.join(index_dir, f"list-{list_id:05d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(group, tmp, row_group_size=65536)
        os.rename(tmp, path)
        return pa.table({"ivf_list": pa.array([list_id], pa.int32()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    stats = assigned.groupby("ivf_list").map_groups(
        write_list, batch_format="pyarrow"
    ).to_pandas()

    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"list_id": pa.array(range(len(cents)), pa.int32()),
                  "centroid": pa.array([list(map(float, c)) for c in cents],
                                       pa.list_(pa.float64()))}),
        os.path.join(index_dir, "centroids.parquet"),
    )
    meta = {"nlist": int(len(cents)), "dim": int(cents.shape[1]),
            "num_vectors": int(stats["rows"].sum()),
            "lists": {int(r.ivf_list): int(r.rows) for r in stats.itertuples()}}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_query(index_dir: str, queries: np.ndarray, query_ids: np.ndarray,
              k: int = 10, nprobe: int = 8):
    """Query a persisted IVF index: resolve each query's nprobe nearest
    lists from the stored centroids, read ONLY those lists' parquet
    files, score each against the queries probing it, reduce to the
    global top-k. Exact when nprobe == nlist (the full-probe variant is
    oracle-checked against brute force)."""
    import pyarrow.parquet as pq
    import ray

    cent_tab = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = _normalize(_stack(cent_tab["centroid"]))
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probed = sorted(set(order.reshape(-1).tolist()))
    paths = [os.path.join(index_dir, f"list-{l:05d}.parquet") for l in probed]
    paths = [p for p in paths if os.path.exists(p)]  # empty lists have no file
    probes_ref = ray.put(order.astype(np.int32))
    qref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": qmat})
    import ray.data as rd

    ds = rd.read_parquet(paths)
    cand = ds.map_batches(
        _probed_score_batches, fn_args=(qref, k, probes_ref),
        batch_format="pyarrow", batch_size=8192,
    )
    return cand.groupby("query_id").map_groups(
        lambda g: _global_topk(g, k), batch_format="pyarrow"
    )


def _probed_score_batches(batch: pa.Table, qref, k: int, probes_ref) -> pa.Table:
    """map_batches form of the probed scorer. Batches may BUNDLE several
    small list files into one block; ProbedScorer segments by ivf_list
    internally, so per-list probe semantics hold regardless of block
    packing."""
    return _probed_score(batch, qref, k, probes_ref)


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
             nlist: int = 32, nprobe: int = 8, sample_size: int = 10_000,
             concurrency: int = 4):
    """IVF approximate top-k. Recall depends on nprobe/nlist; exact when
    nprobe == nlist. The corpus is re-partitioned ONCE by list id (the
    same bucketing shuffle the merge uses), so repeated query batches
    reuse the layout."""
    import ray

    sample = _training_sample(ds, sample_size)
    cents = train_centroids(sample, nlist)
    cents_ref = ray.put(cents)
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probes_ref = ray.put(order.astype(np.int32))
    qref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": qmat})

    assigned = ds.map_batches(
        ListAssigner, fn_constructor_args=(cents_ref,),
        batch_format="pyarrow", concurrency=concurrency, batch_size=8192,
    )
    # co-locate each IVF list, then score each list against only the
    # queries that probe it. The scorer runs as TASK-pool map_groups with
    # the broadcast ObjectRefs passed via fn_args: each task resolves
    # them from the node-local object store (zero-copy plasma read,
    # memoized per worker process) — a driver-constructed bound method
    # would instead pickle the query/probe matrices into every task, and
    # a second actor pool here can deadlock with ListAssigner's pool on
    # small clusters (both pools reserve CPUs across the intervening
    # sort).
    cand = assigned.groupby("ivf_list").map_groups(
        _probed_score, fn_args=(qref, k, probes_ref), batch_format="pyarrow"
    )
    return cand.groupby("query_id").map_groups(
        lambda g: _global_topk(g, k), batch_format="pyarrow"
    )
