"""Lake maintenance: tombstone compaction + garbage collection.

Compaction is the table analogue of Kafka's compacted-topic cleanup
(delete.retention.ms): a winning tombstone is PERSISTED by the merge (so
later-arriving older mutations stay dead — see stages/merge.py), and may
only be physically dropped once no unprocessed WAL segment can still
deliver an older version of that key. For a bounded replay that is
simply "every known WAL file is processed"; compact() enforces it
against the manifest unless ``force=True``.

GC removes data directories of runs that never committed (a killed run's
orphaned bucket files are invisible — readers only ever see the CURRENT
manifest's file list — but they hold disk until collected).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any

import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcpray.schema import OP_LAKE_COL, OP_MUTATION
from dcpray.state.checkpoint import Lake, Manifest, new_run_id


def _compact_one(lake_dir: str, run_id: str, rel_path: str, bucket: int) -> dict:
    """Rewrite one bucket file without tombstone rows. Returns the new
    file entry + counts. Skips (returns the old entry) when clean."""
    from dcpray.stages.aligned import _cap_arrow_threads

    _cap_arrow_threads()
    src = os.path.join(lake_dir, rel_path)
    # probe with ONE column first: most buckets of a previously
    # compacted (or low-delete) lake are clean, and reading every
    # payload column just to discover dropped == 0 doubles compaction
    # I/O for nothing (r5 review)
    nrows = pq.ParquetFile(src).metadata.num_rows
    if OP_LAKE_COL not in pq.read_schema(src).names:
        return {"path": rel_path, "bucket": bucket, "rows": nrows, "dropped": 0}
    ops = pq.read_table(src, columns=[OP_LAKE_COL])
    n_live = pc.sum(pc.equal(ops[OP_LAKE_COL], OP_MUTATION)).as_py() or 0
    dropped = nrows - n_live
    if dropped == 0:
        return {"path": rel_path, "bucket": bucket, "rows": nrows, "dropped": 0}
    t = pq.read_table(src)
    t = t.filter(pc.equal(t[OP_LAKE_COL], OP_MUTATION))
    rel = os.path.join("data", run_id, f"bucket-{bucket:05d}.parquet")
    dst = os.path.join(lake_dir, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp, row_group_size=65536)
    os.rename(tmp, dst)
    return {"path": rel, "bucket": bucket, "rows": t.num_rows, "dropped": int(dropped)}


def compact(lake: Lake, wal_dir: str | None = None, *, force: bool = False) -> dict[str, Any]:
    """Drop persisted tombstones from every bucket file and commit a new
    manifest. Safe only once the WAL is fully processed (checked against
    ``wal_dir`` unless ``force``); Ray must be initialized."""
    import ray

    t0 = time.perf_counter()
    prev = lake.store.load_current()
    if prev is None:
        raise ValueError("nothing to compact: lake has no committed manifest")
    if not force:
        if wal_dir is None:
            raise ValueError("pass wal_dir for the safety check, or force=True")
        from dcpray.sources import wal as walmod

        scan = walmod.scan_wal(wal_dir)
        floor = walmod.effective_floor(
            scan, prev.processed_floor, prev.processed_floor_ids
        )
        residual = set(prev.processed_wal)
        unprocessed = [
            i.path for i in scan
            if not walmod.is_processed(i, residual, floor)
        ]
        if unprocessed:
            raise ValueError(
                f"{len(unprocessed)} WAL files not yet processed — a dropped "
                "tombstone could resurrect an older mutation; replay first "
                f"(e.g. {unprocessed[0]})"
            )

    run_id = new_run_id()
    task = ray.remote(num_cpus=1, max_retries=3)(_compact_one)
    out = ray.get([
        task.remote(lake.lake_dir, run_id, f["path"], f["bucket"])
        for f in prev.files
    ])
    files = [{"path": o["path"], "bucket": o["bucket"], "rows": o["rows"]} for o in out]
    metrics = {
        "op": "compact",
        "dropped_tombstones": int(sum(o["dropped"] for o in out)),
        "buckets_rewritten": sum(1 for o in out if o["dropped"]),
        "buckets_clean": sum(1 for o in out if not o["dropped"]),
        "wall_s": round(time.perf_counter() - t0, 3),
    }
    manifest = Manifest(
        run_id=run_id,
        seq=prev.seq + 1,
        parent=prev.run_id,
        num_buckets=prev.num_buckets,
        salted=prev.salted,
        watermarks=prev.watermarks,
        files=files,
        metrics=metrics,
        processed_wal=prev.processed_wal,
        processed_floor=prev.processed_floor,
        processed_floor_ids=prev.processed_floor_ids,
        strategy=prev.strategy,
        num_vbuckets=prev.num_vbuckets,
    )
    lake.store.commit(manifest)
    lake.write_metrics(run_id, metrics)
    return metrics


def gc(lake: Lake, keep_manifests: int = 5, grace_s: float = 3600.0) -> dict[str, Any]:
    """Garbage-collect the lake, preserving two invariants:

    1. every RETAINED manifest's data files stay readable (time-travel
       ``read_at`` never sees a retained manifest with deleted data) —
       manifests are pruned FIRST, then liveness is the union of all
       still-retained manifests' file lists, not just CURRENT's;
    2. an IN-FLIGHT replay's already-written files survive: an
       uncommitted run's dir is unreferenced by any manifest, so only
       dirs older than ``grace_s`` (mtime cutoff) are deleted — run
       concurrently with a replay, gc leaves the young run dir alone and
       the subsequent commit publishes intact files.

    The DLQ (rejected/) is an audit log — never GC'd."""
    # manifest pruning goes through the store interface, so gc works
    # against any backend (POSIX pointer store or a conditional-put KV)
    removed_manifests = lake.store.prune_manifests(keep_manifests)

    live_runs = {
        os.path.basename(os.path.dirname(f["path"]))
        for m in lake.store.history()
        for f in m.files
    }
    cutoff = time.time() - grace_s
    removed_dirs = 0
    data_root = os.path.join(lake.lake_dir, "data")
    def _mtime(p):
        # tolerate a CONCURRENT gc / external cleanup deleting the
        # entry between listdir and stat (r5 review; same hardening as
        # wal.scan_wal's vanished-file handling)
        try:
            return os.path.getmtime(p)
        except FileNotFoundError:
            return None

    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            p = os.path.join(data_root, d)
            mt = _mtime(p)
            if d not in live_runs and mt is not None and mt < cutoff:
                shutil.rmtree(p, ignore_errors=True)
                removed_dirs += 1
    tmp_root = os.path.join(lake.lake_dir, "tmp")
    if os.path.isdir(tmp_root):
        for d in os.listdir(tmp_root):
            p = os.path.join(tmp_root, d)
            mt = _mtime(p)
            if mt is not None and mt < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    # per-run metrics dumps of runs no retained manifest references
    live_run_ids = {m.run_id for m in lake.store.history()}
    metrics_root = os.path.join(lake.lake_dir, "metrics")
    removed_metrics = 0
    if os.path.isdir(metrics_root):
        for f in os.listdir(metrics_root):
            # ONLY per-run dumps (<run_id>.json) are gc-able; anything
            # else in metrics/ — notably the live stream.jsonl commit
            # log — must survive maintenance
            if not f.endswith(".json"):
                continue
            p = os.path.join(metrics_root, f)
            mt = _mtime(p)
            if f.removesuffix(".json") not in live_run_ids                     and mt is not None and mt < cutoff:
                try:
                    os.remove(p)
                    removed_metrics += 1
                except FileNotFoundError:
                    pass
    return {"op": "gc", "removed_run_dirs": removed_dirs,
            "removed_manifests": removed_manifests,
            "removed_metrics": removed_metrics}
