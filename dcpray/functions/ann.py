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
import pyarrow.compute as pc


def _stack(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list/fixed-size-list embedding
    column — ZERO-COPY view of Arrow's flat values buffer (one vectorized
    astype when the child is float32), never a per-row ``to_pylist``
    round-trip. Shared by every vector op (ANN scoring, IVF assignment,
    hyperplane signing, exact-cosine pairs)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        widths = offs[1:] - offs[:-1]
        dim = int(widths[0])
        if (widths != dim).any():
            raise ValueError("ragged embedding column (rows differ in dim)")
    flat = pc.list_flatten(col)  # honors offsets/slices; no copy
    try:
        vals = flat.to_numpy(zero_copy_only=True)
    except pa.ArrowInvalid:  # nulls in the child values: rare, fall back
        vals = flat.to_numpy(zero_copy_only=False)
    return vals.reshape(n, dim).astype(np.float64, copy=False)


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
        if batch.num_rows == 0:
            # empty block (empty corpus file / upstream filter): _stack
            # loses the dim at n=0 and the matmul would crash
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
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


def _score_batches(batch: pa.Table, qref, k: int) -> pa.Table:
    """TASK-pool form of ``BatchScorer``: broadcast queries arrive as an
    ObjectRef via ``fn_args`` (node-local zero-copy read, memoized per
    worker process) — no actor-pool spin-up cost, and it composes with
    the downstream groupby at any CPU count."""
    from dcpray.rayutil import worker_memo

    sc = worker_memo(("batch_scorer", qref.hex(), k),
                     lambda: BatchScorer(qref, k))
    return sc(batch)


def topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                concurrency: int = 4):
    """Exact cosine top-k for each query vector. ``queries`` is (Q, d).
    ``concurrency`` kept for API compat; the scorer is a task pool."""
    import ray

    ref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": np.asarray(queries)})
    cand = ds.map_batches(
        _score_batches, fn_args=(ref, k),
        batch_format="pyarrow", batch_size=8192,
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
        # SIGNED int64 view end-to-end: the local top-k filter must use
        # the SAME order as the global sort("_h") below (int64) — mixing
        # unsigned-local with signed-global would make the surviving
        # sample depend on block boundaries (a top-bit-set hash dropped
        # in a big block but kept in a small one jumps the signed sort)
        h = splitmix64(ids.view(np.uint64)).view(np.int64)
        if len(h) > sample_size:
            keep = np.argpartition(h, sample_size - 1)[:sample_size]
            t = t.take(pa.array(keep))
            h = h[keep]
        return pa.table({"_h": pa.array(h),
                         "embedding": t["embedding"]})

    cand = ds.select_columns(["vec_id", "embedding"]).map_batches(
        local, batch_format="pyarrow"
    )
    try:
        bt = cand.sort("_h").limit(sample_size).take_batch(
            sample_size, batch_format="pyarrow"
        )
    except ValueError as e:  # Ray's opaque "The dataset is empty."
        raise ValueError(
            "cannot train a quantizer on an EMPTY corpus (the input "
            "dataset has no rows — check upstream filters)") from e
    return _stack(bt["embedding"])


class ListAssigner:
    def __init__(self, cents_ref):
        import ray

        self.cents = ray.get(cents_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_stack(batch["embedding"]))
        lists = (emb @ self.cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


def _assign_batches(batch: pa.Table, cents_ref) -> pa.Table:
    """TASK-pool form of ``ListAssigner``: the centroid matrix arrives as
    an ObjectRef via ``fn_args`` (node-local zero-copy read, memoized per
    worker process via ``worker_memo``). A task pool never reserves CPUs
    the way an actor pool does, so this composes with a downstream
    AllToAll (groupby / aggregate) at ANY cpu count — an actor pool
    sized to the whole node starves the shuffle tasks and deadlocks the
    plan."""
    from dcpray.rayutil import worker_memo

    def fetch():
        import ray

        return ray.get(cents_ref)

    cents = worker_memo(("ivf_cents", cents_ref.hex()), fetch)
    emb = _normalize(_stack(batch["embedding"]))
    lists = (emb @ cents.T).argmax(axis=1).astype(np.int32)
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


def _probed_score(group: pa.Table, qref, k: int, probes_ref) -> pa.Table:
    """Worker-side entry for the probed scorer: memoizes the constructed
    scorer per (qref, k, probes) so repeated tasks in one worker process
    skip the (already zero-copy) ref resolution and query
    re-normalization."""
    from dcpray.rayutil import worker_memo

    sc = worker_memo(("probed_scorer", qref.hex(), k, probes_ref.hex()),
                     lambda: ProbedScorer(qref, k, probes_ref))
    return sc(group)


def build_ivf_index(ds, index_dir: str, nlist: int = 32,
                    sample_size: int = 10_000, concurrency: int = 4,
                    part_rows: int = 262_144) -> dict:
    """Materialize a partitioned IVF index: the corpus is assigned to its
    nearest coarse centroid and written as parquet PART files per list
    (``list-NNNNN-partKK.parquet``, ivf_list carried as a column) plus
    the centroid matrix (``centroids.parquet``) and ``meta.json``. Build
    once, query many — ``ivf_query`` then reads ONLY the probed lists'
    files, the ANN analogue of the replay path's watermark file pruning:
    at cluster scale each part file is the unit of placement and a query
    touches ~nprobe/nlist of the corpus at the FILE level, not per-row.

    Task memory is bounded STRUCTURALLY, not by nlist choice: a first
    narrow pass counts rows per list (one tiny aggregate), each list is
    split into ``ceil(rows / part_rows)`` hash-parts of ``vec_id``, and
    the write groupby keys on (list, part) — so no task ever holds a
    whole flooded list, only ~``part_rows`` rows in expectation (hash
    split; worst-case concentration is binomial around that). The count
    pass recomputes the cheap centroid matmul instead of materializing
    the assigned corpus — streaming twice beats spilling 100 TB once.
    """
    import shutil

    # build into a SIBLING temp dir and swap at the END: part counts
    # are data-dependent, so a rebuild-in-place could leave stale part
    # files (phantom vectors) — and a delete-first rebuild that crashes
    # mid-build would leave a silently partial index. With the swap, a
    # failure at any point leaves the previous index fully intact (and
    # the temp dir is cleaned up on failure). normpath: a trailing
    # slash would otherwise derive the temp dir INSIDE the final dir.
    final_dir = os.path.normpath(index_dir)
    index_dir = f"{final_dir}.building-{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir)
    try:
        return _build_ivf_into(ds, index_dir, final_dir, nlist, sample_size,
                               concurrency, part_rows)
    except BaseException:
        shutil.rmtree(index_dir, ignore_errors=True)
        raise


def _build_ivf_into(ds, index_dir: str, final_dir: str, nlist: int,
                    sample_size: int, concurrency: int,
                    part_rows: int) -> dict:
    import json
    import shutil

    import ray

    from dcpray.hashing import splitmix64

    sample = _training_sample(ds, sample_size)
    cents = train_centroids(sample, nlist)
    cents_ref = ray.put(cents)

    def assigned():
        # task pool, not an actor pool: both passes end in an AllToAll,
        # and an actor pool sized to the node would starve it (see
        # _assign_batches); ``concurrency`` is kept for API compat but
        # no longer pins actors
        return ds.map_batches(
            _assign_batches, fn_args=(cents_ref,),
            batch_format="pyarrow", batch_size=8192,
        )

    # pass 1: rows per list (per-batch partial counts -> tiny groupby)
    def count_partial(t: pa.Table) -> pa.Table:
        vc = t["ivf_list"].value_counts()
        return pa.table({"ivf_list": vc.field("values"),
                         "n_part": vc.field("counts").cast(pa.int64())})

    from ray.data.aggregate import Sum

    counts = (assigned().select_columns(["ivf_list"])
              .map_batches(count_partial, batch_format="pyarrow")
              .groupby("ivf_list").aggregate(Sum("n_part", alias_name="rows"))
              .to_pandas())
    list_rows = {int(r.ivf_list): int(r.rows) for r in counts.itertuples()}
    nparts = np.ones(len(cents), dtype=np.int64)
    for lid, rows in list_rows.items():
        nparts[lid] = max(1, -(-rows // part_rows))

    # pass 2: key on (list, hash-part of vec_id); one write task per part
    def add_part_key(t: pa.Table) -> pa.Table:
        lv = t["ivf_list"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (splitmix64(ids.view(np.uint64))
                % nparts[lv].astype(np.uint64)).astype(np.int64)
        return t.append_column("_lp", pa.array(lv * (1 << 20) + part))

    def write_part(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        lp = int(group["_lp"][0].as_py())
        list_id, part = lp >> 20, lp & ((1 << 20) - 1)
        path = os.path.join(index_dir, f"list-{list_id:05d}-part{part:03d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(group.drop_columns(["_lp"]), tmp, row_group_size=65536)
        os.rename(tmp, path)
        return pa.table({"ivf_list": pa.array([list_id], pa.int32()),
                         "rows": pa.array([group.num_rows], pa.int64())})

    stats = assigned().map_batches(add_part_key, batch_format="pyarrow") \
        .groupby("_lp").map_groups(write_part, batch_format="pyarrow").to_pandas()

    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"list_id": pa.array(range(len(cents)), pa.int32()),
                  "centroid": pa.array([list(map(float, c)) for c in cents],
                                       pa.list_(pa.float64()))}),
        os.path.join(index_dir, "centroids.parquet"),
    )
    meta = {"nlist": int(len(cents)), "dim": int(cents.shape[1]),
            "num_vectors": int(stats["rows"].sum()),
            "part_rows": int(part_rows),
            "parts": {int(l): int(p) for l, p in enumerate(nparts)},
            "lists": list_rows}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    # swap: old index (if any) moves aside, new one takes its place.
    # A crash between the two renames leaves final_dir absent and the
    # previous build recoverable under .old (queries fail LOUDLY on the
    # missing centroids file — never silently partial).
    old_dir = f"{final_dir}.old-{os.getpid()}"
    if os.path.exists(final_dir):
        os.rename(final_dir, old_dir)
    os.rename(index_dir, final_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
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

    import glob as _glob

    cent_tab = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = _normalize(_stack(cent_tab["centroid"]))
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probed = sorted(set(order.reshape(-1).tolist()))
    # each probed list may be several part files (flooded lists are split
    # at build time); legacy single-file lists match the same glob
    paths = sorted(
        p for l in probed
        for p in _glob.glob(
            # "-part" anchors the 5-digit id: a bare prefix glob would
            # also match 6+-digit list ids (probing list 10001 at
            # nlist=200000 would read every list-100010..100019 file)
            os.path.join(_glob.escape(index_dir),
                         f"list-{l:05d}-part*.parquet")
        )
    )
    import ray.data as rd

    if not paths:  # every probed list is empty (tiny/degenerate index)
        return rd.from_arrow(pa.table({"query_id": pa.array([], pa.int64()),
                                       "vec_id": pa.array([], pa.int64()),
                                       "score": pa.array([], pa.float64())}))
    probes_ref = ray.put(order.astype(np.int32))
    qref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": qmat})

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
    nprobe == nlist.

    No corpus shuffle at all: scoring a vector in list L against the
    queries that probe L is a PER-ROW decision, so the probed scorer
    runs directly in ``map_batches`` on the assignment output —
    ``ProbedScorer`` segments each batch by ivf_list internally and
    skips segments no query probes. Task memory is one batch, the only
    exchange is the tiny per-batch candidate top-k reduce. (The earlier
    ``groupby("ivf_list")`` co-location was an all-to-all that bought
    nothing the in-batch segmentation doesn't already give; co-location
    matters only for the PERSISTED index, where it prunes at the file
    level — see ``build_ivf_index``.) Broadcast query/probe matrices
    travel as ObjectRefs via ``fn_args`` (node-local zero-copy reads,
    memoized per worker), never pickled into task closures."""
    import ray

    sample = _training_sample(ds, sample_size)
    cents = train_centroids(sample, nlist)
    cents_ref = ray.put(cents)
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    order = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
    probes_ref = ray.put(order.astype(np.int32))
    qref = ray.put({"qid": np.asarray(query_ids, dtype=np.int64), "mat": qmat})

    assigned = ds.map_batches(
        _assign_batches, fn_args=(cents_ref,),
        batch_format="pyarrow", batch_size=8192,
    )
    cand = assigned.map_batches(
        _probed_score_batches, fn_args=(qref, k, probes_ref),
        batch_format="pyarrow", batch_size=8192,
    )
    return cand.groupby("query_id").map_groups(
        lambda g: _global_topk(g, k), batch_format="pyarrow"
    )


# ------------------------------------------------------- kNN self-join


def _round_half_away(x: np.ndarray, dp: int) -> np.ndarray:
    """DuckDB round()-compatible rounding (half AWAY FROM ZERO) for
    signed values — cosines can be negative, so the non-negative
    floor(x+0.5) form the dedup pairs use would pull -0.00005 to 0."""
    s = 10.0 ** dp
    return np.where(x >= 0, np.floor(x * s + 0.5), np.ceil(x * s - 0.5)) / s


def _topk_vs_members(ids, x, mids, mx, k, dp, chunk_rows=4096):
    """SHARED kernel of the brute scorer and the IVF per-list kernel —
    one implementation so the two paths' row-identical contract cannot
    silently desynchronize. Top-k of each prober row (``ids``/``x``,
    normalized) against the member matrix (``mids`` sorted ascending /
    ``mx``): ROUNDED-cosine descending, neighbor-id ties ascending,
    self masked by WHOLE duplicate-id runs. Prober rows are processed
    in ``chunk_rows`` slices so task memory is chunk × members — never
    probers × members (at full probe, probers ≈ the corpus).
    Returns (id, nbr, rank, cosine) flat arrays."""
    oi, on, orr, oc = [], [], [], []
    for s0 in range(0, len(ids), chunk_rows):
        idi = ids[s0:s0 + chunk_rows]
        cos4 = _round_half_away(x[s0:s0 + chunk_rows] @ mx.T, dp)
        lo = np.searchsorted(mids, idi, side="left")
        hi = np.searchsorted(mids, idi, side="right")
        lens = hi - lo
        rows = np.repeat(np.arange(len(idi)), lens)
        cols = lo.repeat(lens) + (np.arange(lens.sum())
                                  - np.repeat(np.cumsum(lens) - lens,
                                              lens))
        cos4[rows, cols] = -np.inf
        kk = min(k, cos4.shape[1])
        # stable argsort of the NEGATED rounded cosine: equal cosines
        # keep column order, and columns are ascending by neighbor id
        order = np.argsort(-cos4, axis=1, kind="stable")[:, :kk]
        c = np.take_along_axis(cos4, order, axis=1)
        keep = np.isfinite(c.ravel())  # drop masked self column(s)
        oi.append(np.repeat(idi, kk)[keep])
        on.append(mids[order].ravel()[keep])
        orr.append(np.tile(np.arange(1, kk + 1, dtype=np.int64),
                           len(idi))[keep])
        oc.append(c.ravel()[keep])
    cat = (lambda ps, dt: np.concatenate(ps) if ps
           else np.empty(0, dt))
    return (cat(oi, np.int64), cat(on, np.int64), cat(orr, np.int64),
            cat(oc, np.float64))


class _KnnSelfScorer:
    """Per-worker-memoized kernel for the exact kNN self-join: the
    normalized corpus matrix (sorted by id ASCENDING) is broadcast once
    via ``ray.put``; each batch is one ``batch × corpus`` float64
    matmul. Ranking is on the ROUNDED cosine (ties → neighbor id
    ascending) so the order is identical to the SQL oracle's —
    full-precision floats differ between engines in the last ulp and
    would flip near-tie ranks."""

    def __init__(self, corpus_ref, id_col: str, emb_col: str, k: int,
                 round_dp: int):
        import ray

        self.ids, self.xn = ray.get(corpus_ref)
        self.id_col, self.emb_col = id_col, emb_col
        self.k, self.dp = k, round_dp

    OUT_SCHEMA = pa.schema([("_id", pa.int64()), ("nbr_id", pa.int64()),
                            ("rank", pa.int64()), ("cosine", pa.float64())])

    def _empty(self) -> pa.Table:
        t = self.OUT_SCHEMA.empty_table()
        return t.rename_columns([self.id_col] + t.column_names[1:])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # dynamic splits emit empty blocks;
            return self._empty()  # _stack's (0, 0) would break the matmul
        from dcpray.functions.agg import require_nonnull

        require_nonnull(batch, (self.id_col, self.emb_col),
                        "knn_self_join")
        ids = batch[self.id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        emb = _stack(batch[self.emb_col])
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        if (nrm == 0).any():
            raise ValueError("knn_self_join: zero-norm embedding "
                             "(cosine undefined)")
        i, nb, rk, c = _topk_vs_members(ids, emb / nrm, self.ids,
                                        self.xn, self.k, self.dp)
        return pa.table({
            self.id_col: pa.array(i),
            "nbr_id": pa.array(nb),
            "rank": pa.array(rk),
            "cosine": pa.array(c),
        })


def _knn_self_batches(batch: pa.Table, corpus_ref, id_col: str,
                      emb_col: str, k: int, round_dp: int) -> pa.Table:
    """TASK-pool form of ``_KnnSelfScorer`` (same rationale as
    ``_score_batches``: no actor spin-up, per-worker memoized corpus)."""
    from dcpray.rayutil import worker_memo

    sc = worker_memo(("knn_self", corpus_ref.hex(), id_col, emb_col, k,
                      round_dp),
                     lambda: _KnnSelfScorer(corpus_ref, id_col, emb_col,
                                            k, round_dp))
    return sc(batch)


def knn_self_join(ds, k: int = 3, id_col: str = "vec_id",
                  emb_col: str = "embedding", round_dp: int = 4,
                  concurrency: int = 4, batch_size: int = 2048):
    """Exact k-nearest-neighbor SELF-join over an embedding column:
    for every row, its ``k`` most-cosine-similar OTHER rows as
    ``(id, nbr_id, rank, cosine)`` — the similarity-graph primitive
    (near-dup clustering seeds, retrieval eval, diversity sampling).

    DRIVER-BOUNDED like ``embedding_exact_pairs``: the corpus matrix is
    materialized once on the driver and broadcast (``ray.put``), every
    batch then scores in one numpy matmul — O(n·N) compute distributed
    per batch, which IS the exact-kNN lower bound. The broadcast bounds
    the corpus (~10⁷ × 64-dim ≈ 5 GB); per-task memory is
    ``batch_size × N × 8`` bytes for the cosine matrix, so shrink
    ``batch_size`` as the corpus grows (2048 × 10⁶ rows ≈ 16 GB is
    past a worker heap — a million-row corpus wants ~256). Above that,
    route through ``build_ivf_index``/``ivf_topk`` (probe-bounded
    approximate path) or ``embedding_dup_pairs`` (hyperplane LSH).

    ``cosine`` is rounded to ``round_dp`` (half away from zero, DuckDB
    ``round()``-compatible) and ties rank by neighbor id ascending, so
    a SQL oracle over ``list_cosine_similarity(CAST(a AS DOUBLE[]),
    CAST(b AS DOUBLE[]))`` checks the result value-for-value."""
    import ray

    from dcpray.functions.agg import require_nonnull

    ids_parts, emb_parts = [], []
    for bt in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        # loud: a null id would decode through float64 (corrupting ids
        # >= 2^53) and a null embedding would mis-stack the matrix
        require_nonnull(bt, (id_col, emb_col), "knn_self_join")
        ids_parts.append(bt[id_col].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        emb_parts.append(_stack(bt[emb_col]))
    ids = np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
    if len(ids) == 0:
        # SCHEMA-PINNED empty output (not the input schema — downstream
        # selects nbr_id/rank/cosine and must not crash on empty input)
        import ray.data

        t = _KnnSelfScorer.OUT_SCHEMA.empty_table()
        return ray.data.from_arrow(
            t.rename_columns([id_col] + t.column_names[1:]))
    x = np.concatenate(emb_parts)
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    if (nrm == 0).any():
        raise ValueError("knn_self_join: zero-norm embedding in corpus")
    xn = x / nrm
    srt = np.argsort(ids, kind="stable")  # columns ascending by id
    ref = ray.put((ids[srt], xn[srt]))
    # task pool, not an actor pool: the kernel is stateless beyond the
    # memoized broadcast read, tasks have no pool spin-up latency, and
    # a fixed pool can starve the upstream exchange into a scheduling
    # deadlock on small CPU counts (seen at 4 CPUs). ``concurrency``
    # kept for API compat, like topk_cosine.
    del concurrency
    return ds.map_batches(
        _knn_self_batches, fn_args=(ref, id_col, emb_col, k, round_dp),
        batch_format="pyarrow", batch_size=batch_size,
    )


def _knn_ivf_fanout(batch: pa.Table, cents_ref, nprobe: int,
                    id_col: str, emb_col: str) -> pa.Table:
    """One output row per (input row, probed list): the row's NORMALIZED
    embedding rides along; ``is_member`` marks its primary (top-1)
    list — the list whose group will index it."""
    import ray

    from dcpray.functions.agg import require_nonnull
    from dcpray.rayutil import worker_memo

    if batch.num_rows == 0:
        return pa.table({"ivf_list": pa.array([], pa.int32()),
                         id_col: pa.array([], pa.int64()),
                         emb_col: pa.array([], pa.large_list(pa.float64())),
                         "is_member": pa.array([], pa.bool_())})
    require_nonnull(batch, (id_col, emb_col), "knn_self_join_ivf")
    cents = worker_memo(("knn_ivf_cents", cents_ref.hex()),
                        lambda: ray.get(cents_ref))
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = _stack(batch[emb_col])
    nrm = np.linalg.norm(emb, axis=1, keepdims=True)
    if (nrm == 0).any():
        raise ValueError("knn_self_join_ivf: zero-norm embedding")
    xn = emb / nrm
    sim = xn @ cents.T
    probes = np.argsort(-sim, axis=1, kind="stable")[:, :nprobe]
    n, d = xn.shape
    flat = np.repeat(np.arange(n), nprobe)
    lists = probes.ravel().astype(np.int32)
    member = np.zeros(n * nprobe, bool)
    member[::nprobe] = True  # column 0 of argsort = primary list
    rep = xn[flat].ravel()
    # int64 offsets: int32 caps one batch's flat values at 2^31 —
    # batch_size × nprobe × dim crosses that with modern dims
    emb_out = pa.LargeListArray.from_arrays(
        pa.array(np.arange(n * nprobe + 1) * d, pa.int64()),
        pa.array(rep, pa.float64()))
    return pa.table({"ivf_list": pa.array(lists),
                     id_col: pa.array(ids[flat]),
                     emb_col: emb_out,
                     "is_member": pa.array(member)})


def _knn_ivf_list_topk(group: pa.Table, k: int, round_dp: int,
                       id_col: str, emb_col: str) -> pa.Table:
    """Per-list kernel: every prober in the group scores against the
    group's MEMBER rows (one matmul), local top-k with the brute
    path's exact ordering (rounded cosine desc, neighbor id asc)."""
    mem_mask = group["is_member"].to_numpy(zero_copy_only=False)
    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    x = _stack(group[emb_col])  # already normalized at fan-out
    mids, mx = ids[mem_mask], x[mem_mask]
    if len(mids) == 0 or len(ids) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "nbr_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    srt = np.argsort(mids, kind="stable")
    mids, mx = mids[srt], mx[srt]
    # shared kernel, CHUNKED over prober rows: at full probe the
    # probers of one list approach the whole corpus, and an unchunked
    # probers × members matmul would scale task memory with the corpus
    i, nb, _rk, c = _topk_vs_members(ids, x, mids, mx, k, round_dp)
    return pa.table({
        id_col: pa.array(i),
        "nbr_id": pa.array(nb),
        "cosine": pa.array(c),
    })


def _knn_merge_partition(t: pa.Table, k: int, id_col: str) -> pa.Table:
    """Final per-partition merge: each vector's ≤ nprobe×k candidates →
    global top-k with a rank column (cosine desc, neighbor id asc)."""
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    nbr = t["nbr_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cos = t["cosine"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nbr, -cos, ids))
    gs = ids[order]
    first = np.r_[True, gs[1:] != gs[:-1]] if len(gs) else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, len(gs)])
    rank = np.arange(len(gs)) - np.repeat(starts, sizes)
    rk = (rank[rank < k] + 1).astype(np.int64)
    return pa.table({
        id_col: pa.array(gs[rank < k]),
        "nbr_id": pa.array(nbr[order][rank < k]),
        "rank": pa.array(rk),
        "cosine": pa.array(cos[order][rank < k]),
    })


def knn_self_join_ivf(ds, k: int = 3, nlist: int = 32, nprobe: int = 8,
                      id_col: str = "vec_id", emb_col: str = "embedding",
                      round_dp: int = 4, sample_size: int = 10_000,
                      partitions: int = 64):
    """The SCALE path for the kNN similarity graph: IVF-bucketed
    self-join — no corpus broadcast, no driver materialization.
    Approximate for ``nprobe < nlist``; EXACT (row-identical to
    ``knn_self_join``) when ``nprobe == nlist``.

    Scale shape: centroids train on a deterministic hashed-id sample
    (driver-side, O(sample×dim)) and broadcast once; each row fans out
    to its ``nprobe`` nearest lists (the one all-to-all, nprobe× the
    corpus bytes); each list group runs ONE probers × members matmul
    and keeps k candidates per prober; a coarse-partition merge on the
    vector id reduces ≤ nprobe×k candidates per vector to the global
    top-k. Per-task memory is one list's members × probers — bounded
    by list population, never the corpus. Same ordering contract as
    the brute path (4dp half-away-from-zero rounded cosine, neighbor
    id ties ascending), so the same SQL oracle verifies full-probe
    runs. Assumes ``id_col`` is unique (it is the merge key: a
    duplicated id's candidate sets would merge into one top-k, where
    the brute path emits one top-k per row)."""
    import ray
    import ray.data

    from dcpray.functions.agg import add_coarse_pk

    sds = ds.select_columns([id_col, emb_col])
    if (id_col, emb_col) != ("vec_id", "embedding"):
        # _training_sample keys on the canonical names
        sds = sds.map_batches(
            lambda t: t.rename_columns(["vec_id", "embedding"]),
            batch_format="pyarrow")
    try:
        sample = _training_sample(sds, sample_size)
    except ValueError as e:
        if "EMPTY corpus" not in str(e):
            raise  # data-integrity errors (nulls, ragged dims) stay LOUD
        # EMPTY corpus: schema-pinned empty output, like knn_self_join
        t = _KnnSelfScorer.OUT_SCHEMA.empty_table()
        return ray.data.from_arrow(
            t.rename_columns([id_col] + t.column_names[1:]))
    cents = train_centroids(sample, nlist)
    nprobe = min(nprobe, len(cents))
    cents_ref = ray.put(cents)
    fanned = ds.map_batches(
        _knn_ivf_fanout, fn_args=(cents_ref, nprobe, id_col, emb_col),
        batch_format="pyarrow", batch_size=8192)
    cand = fanned.groupby("ivf_list").map_groups(
        lambda g: _knn_ivf_list_topk(g.drop_columns(["ivf_list"]), k,
                                     round_dp, id_col, emb_col),
        batch_format="pyarrow")
    keyed = cand.map_batches(
        lambda t: add_coarse_pk(t, id_col, partitions),
        batch_format="pyarrow")
    out = keyed.groupby("_pk").map_groups(
        lambda g: _knn_merge_partition(g.drop_columns(["_pk"]), k, id_col),
        batch_format="pyarrow")
    # schema pin for DEGENERATE corpora (e.g. one vector, whose only
    # candidate is self-masked): every group returns empty and the
    # final dataset would have no schema at all — union with a typed
    # empty table keeps the operator contract
    pin = _KnnSelfScorer.OUT_SCHEMA.empty_table()
    pin = pin.rename_columns([id_col] + pin.column_names[1:])
    return ray.data.from_arrow(pin).union(out)
