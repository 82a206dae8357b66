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


def make_aligned_merger(
    lake_dir: str,
    run_id: str,
    merge_schema: pa.Schema,
    wm_arr: np.ndarray,
    *,
    mapper=None,
    rejection_log: bool = True,
    rejection_include_value: bool = True,
    chunk_rows: int = 1_000_000,
):
    """Returns ``merge_one(bucket, wal_paths, base_paths) -> stats dict``
    performing the whole per-bucket pipeline. Output files are
    tmp+renamed so task retries are idempotent; nothing is visible until
    the manifest commit.

    Dispatched as plain ``ray.remote`` tasks rather than a Dataset stage:
    the fan-out is a fixed list of a few hundred independent, internally
    vectorized merges with 1-row control inputs, a shape where Ray Data's
    streaming executor adds ~3× wall (measured 10.2s vs 3.2s for the
    identical closure at 32 CPUs on the 10M-event fixture) for machinery
    — block accounting, per-op backpressure — that buys nothing here. All
    row-level transforms stay in the Dataset API; task retries +
    idempotent writes preserve the semantics."""
    lake_renames = {"_seqno": "seqno", "_op": "op"}
    out_renames = {"seqno": "_seqno", "op": "_op"}
    payload_schema = merge_schema

    def _prep(t: pa.Table) -> pa.Table:
        """normalize to the merge schema; fill lake-side seqno/op."""
        if "_seqno" in t.schema.names or "_op" in t.schema.names:
            t = t.rename_columns([lake_renames.get(c, c) for c in t.schema.names])
        t = normalize_to(t, payload_schema)
        i = t.schema.get_field_index("op")
        t = t.set_column(i, "op", pc.fill_null(t["op"], OP_MUTATION))
        i = t.schema.get_field_index("seqno")
        return t.set_column(i, "seqno", pc.fill_null(t["seqno"], 0))

    def merge_one(
        bucket: int,
        wal_paths: list[str],
        base_paths: list[str],
        *base_slices: pa.Table,
    ) -> dict:
        """``base_slices`` are this bucket's staged bootstrap slices,
        passed as TASK ARGUMENTS (not fetched in a ray.get loop): Ray
        resolves them before the task starts, so the object store serves
        one batched pull per task instead of ~25 serial IPC round-trips —
        the get loop was the top contention source at 32 concurrent
        tasks (t_base 51 CPU-s → ~0)."""
        import time

        _cap_arrow_threads()
        t_start = time.perf_counter()
        rejected_dir = None
        if rejection_log:
            rejected_dir = os.path.join(lake_dir, "rejected", run_id, f"b{bucket:05d}")
            os.makedirs(rejected_dir, exist_ok=True)
        validate = make_reject_filter(wm_arr, rejected_dir, rejection_include_value)

        # ---- WAL side: chunked read → validate → mapper → local LWW ----
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
                chunk = mapper(chunk)
            if chunk.num_rows:
                partials.append(lww_filter(_prep(chunk)))

        for p in wal_paths:
            t = pq.read_table(p)
            rows_in += t.num_rows
            pending.append(t)
            pending_rows += t.num_rows
            if pending_rows >= chunk_rows:
                _reduce_pending()
        _reduce_pending()
        t_wal = time.perf_counter()

        # ---- base side: committed bucket file and/or staged bootstrap
        # slices (object-store values resolved by Ray before task start) ----
        for p in base_paths:
            partials.append(lww_filter(_prep(pq.read_table(p))))
        for s in base_slices:
            partials.append(lww_filter(_prep(s)))

        t_base = time.perf_counter()
        if partials:
            t = lww_filter(pa.concat_tables(partials, promote_options="none"))
        else:
            t = payload_schema.empty_table()

        # winning tombstones are PERSISTED (see merge.py for the rule)
        n_live = pc.sum(pc.equal(t["op"], OP_MUTATION)).as_py() or 0
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        t = t.rename_columns([out_renames.get(c, c) for c in t.schema.names])

        rel = os.path.join("data", run_id, f"bucket-{bucket:05d}.parquet")
        path = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.rename(tmp, path)
        t_end = time.perf_counter()
        return {
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

    return merge_one


def _split_snapshot_file(path: str, num_vbuckets: int, num_buckets: int):
    """Read one snapshot file, slice it by bucket, put each slice in the
    object store. Returns {bucket: ObjectRef} (refs only — tiny)."""
    import ray

    from dcpray.hashing import vb_of_conv

    _cap_arrow_threads()
    t = pq.read_table(path)
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
