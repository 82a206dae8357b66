"""Partition-aligned replay — the shuffle-free merge strategy.

The reference never shuffles: each vBucket is an independent, ordered
substream (go-dcp invokes one listener chain per vBucket;
/root/reference/connector.go:70-123), and vb is a pure function of the
document key (Couchbase vb = crc32(key) % 1024; couchbase/event.go:16).
A vb-partitioned WAL is therefore ALREADY hash-partitioned by
conversation. This stage exploits that: the lake's merge buckets are
defined as ``bucket = vb % num_buckets``, so every change for one key —
and the committed lake row it must LWW-merge against — lives in exactly
one bucket, and replay becomes an embarrassingly-parallel per-bucket
job:

    for each bucket b (one Ray Data task each):
        read its vb-group's unprocessed WAL files (direct pq.read_table,
        no driver-side fragment machinery) → validate/DLQ → mapper →
        chunked local LWW reduce → merge against the committed bucket
        file (or the bootstrap base partition) → write bucket-b Parquet

No groupby, no sort, no all-to-all: at 100 TB this is the difference
between moving every block twice and moving nothing. The generic
``shuffle`` strategy (stages/merge.py) remains for WALs that are NOT
key-partitioned (multi-vb files) and as the salted-bucket skew fallback.

Memory is bounded per task: WAL files are reduced in chunks of
``chunk_rows`` (partials collapse to ≤1 row per key before
concatenation), so a version-flooded hot conversation never holds more
than one chunk of raw events plus the reduced survivors.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcpray.schema import OP_MUTATION
from dcpray.stages.merge import lww_filter, normalize_to
from dcpray.stages.reject import make_reject_filter

#: WAL columns that never reach the merge (checkpoint/metrics only);
#: `vb` is kept until validation, then dropped
PRUNE_AFTER_VALIDATE = ("vb", "cas", "rev_no", "collection", "event_time")


def _cap_arrow_threads(n: int = 2) -> None:
    """Each ray task gets num_cpus=1, but pyarrow defaults its internal
    compute/IO pools to ALL cores — 32 concurrent merge tasks would spawn
    ~1000 threads and thrash (measured: 32-CPU run slower than 8-CPU).
    Cap per-process pools so concurrency comes from Ray, not Arrow."""
    if pa.cpu_count() > n:
        pa.set_cpu_count(n)
    if pa.io_thread_count() > n:
        pa.set_io_thread_count(n)


_LAKE_RENAMES = {"_seqno": "seqno", "_op": "op"}
_OUT_RENAMES = {"seqno": "_seqno", "op": "_op"}


def _guard_mapper_alignment(out: pa.Table, bucket: int, num_buckets: int) -> None:
    """The aligned strategy merges each bucket independently, so a mapper
    running inside bucket b must emit only rows that BELONG to bucket b
    (vb % num_buckets == b). A key-rewriting / fan-out mapper that emits
    rows for other vbuckets would place keys in the wrong bucket (or
    duplicate them across buckets) — that workload needs
    strategy='shuffle', which re-partitions by the OUTPUT key."""
    vb = out["vb"].to_numpy(zero_copy_only=False).astype(np.int64)
    if ((vb % num_buckets) != bucket).any():
        raise ValueError(
            f"mapper emitted rows whose vb does not map to bucket {bucket}; "
            "the aligned strategy requires a vb-preserving mapper — use "
            "ReplayConfig(strategy='shuffle') for key-rewriting mappers"
        )


def _prep_to(t: pa.Table, payload_schema: pa.Schema) -> pa.Table:
    """normalize to the merge schema; fill lake-side seqno/op."""
    if "_seqno" in t.schema.names or "_op" in t.schema.names:
        t = t.rename_columns([_LAKE_RENAMES.get(c, c) for c in t.schema.names])
    t = normalize_to(t, payload_schema)
    i = t.schema.get_field_index("op")
    t = t.set_column(i, "op", pc.fill_null(t["op"], OP_MUTATION))
    i = t.schema.get_field_index("seqno")
    return t.set_column(i, "seqno", pc.fill_null(t["seqno"], 0))


def _reduce_wal(spec: dict, bucket: int, wal_paths: list[str]
                ) -> tuple[list[pa.Table], int]:
    """The shared WAL side of a bucket merge: chunked read →
    validate/DLQ → mapper (+ alignment guard) → local LWW per chunk.
    Returns (reduced partials, raw rows read). ONE implementation for
    both ``merge_bucket`` and the hot-split ``partial_reduce`` — they
    previously carried verbatim copies of this loop (r5 review)."""
    payload_schema = spec["merge_schema"]
    mapper = spec.get("mapper")
    rejected_dir = None
    if spec.get("rejection_log", True):
        rejected_dir = os.path.join(
            spec["lake_dir"], "rejected", spec["run_id"], f"b{bucket:05d}")
        os.makedirs(rejected_dir, exist_ok=True)
    validate = make_reject_filter(
        spec["wm_arr"], rejected_dir, spec.get("rejection_include_value", True)
    )
    chunk_rows = spec.get("chunk_rows", 1_000_000)

    partials: list[pa.Table] = []
    pending: list[pa.Table] = []
    pending_rows = 0
    rows_in = 0

    def _reduce_pending():
        nonlocal pending, pending_rows
        if not pending:
            return
        chunk = pa.concat_tables(pending, promote_options="permissive")
        pending, pending_rows = [], 0
        chunk = validate(chunk)
        if mapper is not None:
            from dcpray.stages.mapper import identity_mapper, validate_mapper_output

            chunk = validate_mapper_output(mapper(chunk))
            if mapper is not identity_mapper and spec.get("num_buckets"):
                _guard_mapper_alignment(chunk, bucket, spec["num_buckets"])
        if chunk.num_rows:
            partials.append(lww_filter(_prep_to(chunk, payload_schema)))

    for p in wal_paths:
        t = pq.read_table(p)
        rows_in += t.num_rows
        pending.append(t)
        pending_rows += t.num_rows
        if pending_rows >= chunk_rows:
            _reduce_pending()
    _reduce_pending()
    return partials, rows_in


def merge_bucket(
    spec: dict,
    bucket: int,
    wal_paths: list[str],
    base_paths: list[str],
    base_tables: tuple = (),
    return_table: bool = False,
):
    """One bucket's whole pipeline: chunked WAL read → validate/DLQ →
    mapper → local LWW → merge against base (files and/or in-memory
    tables) → stable sort → tmp+rename Parquet write → stats dict.

    ``spec`` carries the per-run parameters (lake_dir, run_id,
    merge_schema, wm_arr, mapper, rejection knobs, chunk_rows,
    num_buckets) so both the stateless task path and the stateful actor
    pool share this function. ``base_tables`` may be staged bootstrap
    slices or an actor's cached copy of the committed bucket."""
    import time

    _cap_arrow_threads()
    t_start = time.perf_counter()
    lake_dir = spec["lake_dir"]
    run_id = spec["run_id"]
    payload_schema = spec["merge_schema"]

    partials, rows_in = _reduce_wal(spec, bucket, wal_paths)
    t_wal = time.perf_counter()

    # ---- base side: committed bucket file / staged slices / actor cache ----
    # NO per-input lww_filter here: base inputs are the already-reduced
    # output of a previous merge (or bootstrap slices), and the final
    # concat lww_filter below dedups globally anyway — the per-input
    # pass full-sorted every large bucket twice per delta (r5 review).
    # The WAL-side per-chunk filter stays: it bounds MEMORY.
    for p in base_paths:
        partials.append(_prep_to(pq.read_table(p), payload_schema))
    for s in base_tables:
        partials.append(_prep_to(s, payload_schema))

    t_base = time.perf_counter()
    if partials:
        t = lww_filter(pa.concat_tables(partials, promote_options="none"))
    else:
        t = payload_schema.empty_table()

    # winning tombstones are PERSISTED (see merge.py for the rule)
    n_live = pc.sum(pc.equal(t["op"], OP_MUTATION)).as_py() or 0
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    t = t.rename_columns([_OUT_RENAMES.get(c, c) for c in t.schema.names])

    rel = os.path.join("data", run_id, f"bucket-{bucket:05d}.parquet")
    path = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    # 64k row groups: downstream readers (and the bootstrapless base
    # reads of future runs) can parallelize within one bucket file
    pq.write_table(t, tmp, row_group_size=65536)
    os.rename(tmp, path)
    t_end = time.perf_counter()
    stats = {
        "bucket": bucket,
        "rows_in": rows_in,
        "rows_out": int(n_live),
        "tombstoned_keys": t.num_rows - int(n_live),
        "path": rel,
        "bytes": os.path.getsize(path),
        "t_wal_s": round(t_wal - t_start, 4),
        "t_base_s": round(t_base - t_wal, 4),
        "t_merge_s": round(t_end - t_base, 4),
    }
    return (stats, t) if return_table else (stats, None)


# Design note (why merge_bucket dispatches as plain ``ray.remote`` tasks
# from _run_aligned rather than a Dataset stage): the fan-out is a fixed
# list of a few hundred independent, internally vectorized merges with
# 1-row control inputs, a shape where Ray Data's streaming executor adds
# ~3× wall (measured 10.2s vs 3.2s for the identical closure at 32 CPUs
# on the 10M-event fixture) for machinery — block accounting, per-op
# backpressure — that buys nothing here. All row-level transforms stay
# in the Dataset API; task retries + tmp-rename idempotent writes
# preserve the semantics. Staged bootstrap slices are passed as TASK
# ARGUMENTS, not fetched in a ray.get loop: Ray resolves them before the
# task starts — one batched pull instead of ~25 serial IPC round-trips.
# (A make_aligned_merger wrapper used to live here; it was dead code on
# the production path — replay builds the spec itself — and its spec
# omitted num_buckets, silently disabling the mapper alignment guard
# for any external caller. r5 review.)


class MergeApplier:
    """STATEFUL merge-applier (wrap with ``ray.remote`` via
    make_merge_pool): the actor-pool analogue of the reference's
    long-lived producer holding the compacted topic's latest-per-key
    state (SURVEY §2 K1/K2). Each bucket is pinned to one actor
    (``bucket % pool_size``), which caches the bucket's committed table
    across runs — a continuous tail then merges each delta against the
    in-memory copy instead of re-reading the lake file (cache validated
    by the exact file path it wrote; any mismatch, restart, or eviction
    falls back to reading base_paths, so correctness never depends on the
    cache). Cache is LRU-bounded by total rows per actor."""

    def __init__(self, cache_rows_limit: int = 2_000_000):
        self._cache: dict[int, tuple[str, pa.Table]] = {}
        self._lru: list[int] = []
        self._rows = 0
        self._limit = cache_rows_limit

    def _remember(self, bucket: int, path: str, table: pa.Table) -> None:
        old = self._cache.pop(bucket, None)
        if old is not None:
            self._rows -= old[1].num_rows
            self._lru.remove(bucket)
        self._cache[bucket] = (path, table)
        self._lru.append(bucket)
        self._rows += table.num_rows
        while self._rows > self._limit and len(self._lru) > 1:
            ev = self._lru.pop(0)
            self._rows -= self._cache.pop(ev)[1].num_rows

    def merge(self, spec, bucket, wal_paths, base_paths, *base_slices):
        tables = list(base_slices)
        hit = False
        cached = self._cache.get(bucket)
        if cached is not None and list(base_paths) == [cached[0]]:
            tables.append(cached[1])
            base_paths = []
            hit = True
        stats, out = merge_bucket(
            spec, bucket, wal_paths, list(base_paths), tuple(tables),
            return_table=True,
        )
        self._remember(bucket, os.path.join(spec["lake_dir"], stats["path"]), out)
        stats["base_cache_hit"] = hit
        return stats


def make_merge_pool(size: int, cache_rows_limit: int = 2_000_000):
    """Create the stateful merge-applier actor pool (one per slot;
    bucket → actor affinity is bucket % size). A failed actor fails the
    run — the committed manifest is untouched and the rerun (cold cache)
    converges, the same crash contract as the stateless path.

    Actors reserve 0 logical CPUs: a long-lived pool that pinned one CPU
    per idle actor would starve the scan/bootstrap tasks that must run
    between deltas (observed as a scheduling deadlock when pool size =
    cluster CPUs). The pool SIZE is the concurrency control — each actor
    processes one merge at a time — so size it to the cores you want the
    merge phase to use."""
    import ray

    cls = ray.remote(num_cpus=0)(MergeApplier)
    return [cls.remote(cache_rows_limit) for _ in range(size)]


def _split_snapshot_file(path: str, num_vbuckets: int, num_buckets: int):
    """Read one snapshot file, slice it by bucket, put each slice in the
    object store. Returns {bucket: ObjectRef} (refs only — tiny)."""
    import ray

    from dcpray.hashing import vb_of_conv

    _cap_arrow_threads()
    t = pq.read_table(path)
    if t.num_rows == 0:
        # empty part files are routine writer output (a Spark/pandas
        # empty partition); the edge arithmetic below would IndexError
        return {}
    b = vb_of_conv(t["conv_id"], num_vbuckets).astype(np.int64) % num_buckets
    order = np.argsort(b, kind="stable")
    t = t.take(pa.array(order))
    bs = b[order]
    edges = np.r_[np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]]), len(bs)]
    return {
        int(bs[edges[i]]): ray.put(
            t.slice(int(edges[i]), int(edges[i + 1] - edges[i])).combine_chunks()
        )
        for i in range(len(edges) - 1)
    }


def submit_snapshot_splits(
    snap_paths: list[str], num_vbuckets: int, num_buckets: int
) -> list:
    """Non-blocking half of stage_base_snapshot: submit the split tasks
    and return their futures, so the driver can overlap the snapshot
    staging with the WAL footer scan."""
    import ray

    split = ray.remote(num_cpus=1)(_split_snapshot_file)
    return [split.remote(p, num_vbuckets, num_buckets) for p in snap_paths]


def collect_snapshot_splits(futures: list) -> dict[int, list]:
    import ray

    out: dict[int, list] = {}
    for d in ray.get(futures):
        for b, ref in d.items():
            out.setdefault(b, []).append(ref)
    return out


def stage_base_snapshot(
    snap_paths: list[str], num_vbuckets: int, num_buckets: int
) -> dict[int, list]:
    """Bootstrap helper: stage the initial (unpartitioned) snapshot as
    per-bucket Arrow slices in the OBJECT STORE, so each aligned merge
    task fetches exactly its own rows — a single-hop exchange with no
    intermediate files and no re-reads. This is the one place the engine
    drops below the Dataset API: a keyed exchange with a known integer
    partition id needs no sampling, sorting or aggregator actors, just
    ray.put/ray.get.

    Single-run durability only: the refs die with the driver, which is
    fine because a crashed bootstrap rerun starts from the snapshot again
    (manifest not yet committed). At 100 TB the snapshot would already be
    bucket-partitioned by a previous run and take the base_paths route.

    Returns bucket → [ObjectRef of pa.Table]."""
    return collect_snapshot_splits(
        submit_snapshot_splits(snap_paths, num_vbuckets, num_buckets)
    )


def partial_reduce(spec: dict, bucket: int, wal_paths: list[str]) -> pa.Table:
    """Hot-bucket straggler mitigation: the WAL side of merge_bucket only
    (read → validate/DLQ → mapper → local LWW), returning the reduced
    partial instead of writing a file. A version-flooded bucket's segment
    list is split across several of these in parallel; LWW's
    associativity makes feeding the partials into the final merge task
    exactly equivalent to one sequential pass — the aligned-strategy
    form of the north rule's salted sub-key splitting (sub-key = segment
    range instead of turn hash, so the lake's bucket layout is
    untouched)."""
    _cap_arrow_threads()
    payload_schema = spec["merge_schema"]
    partials, _rows_in = _reduce_wal(spec, bucket, wal_paths)
    if not partials:
        out = payload_schema.empty_table()
    else:
        out = lww_filter(pa.concat_tables(partials, promote_options="none"))
    # rows_in accounting for split buckets happens in _run_aligned
    # (patched from rows_of) — the merge path rebuilds tables through
    # normalize_to, which drops schema metadata, so no per-table channel
    # exists here
    return out
