"""The CDC replay pipeline: WAL → mapper → LWW merge → lake + manifest.

Two physical strategies for the same logical job (SURVEY §7):

- ``aligned`` (default) — shuffle-free. The WAL is vBucket-partitioned
  and vb is a pure function of the key (Couchbase vb = crc32(key)%1024;
  reference couchbase/event.go:16), so lake buckets defined as
  ``vb % num_buckets`` inherit the stream's hash partitioning: one Ray
  task per bucket reads its own vb-group's files, LWW-reduces locally,
  merges against its committed bucket file, writes. No groupby, no sort,
  no all-to-all — the table analogue of the reference's per-vBucket
  independent listener chains (connector.go:70-123). See stages/aligned.py.
- ``shuffle`` — general. ``read_parquet → map_batches(validate/DLQ) →
  map_batches(mapper) → map_batches(precombine LWW + salted bucket) →
  groupby(bucket).map_groups(merge-apply) `` for WALs that are NOT
  key-partitioned (multi-vb files) and as the salted-key skew fallback
  (a hot conversation's turns spread over buckets).

Delivery semantics (upgraded from the reference's at-least-once, SURVEY §3):

- a run processes whole WAL files and commits a manifest only after every
  bucket file is fully written (the analogue of dcpCheckpointCommit after
  flush, producer_batch.go:143; manual checkpointing, connector.go:166);
- a crash mid-run leaves the previous manifest current → the rerun
  replays the same delta; LWW by seqno makes the replay idempotent, so
  the observable result is exactly-once;
- resume skips already-processed WAL files exactly: the manifest keeps
  per-vb processed FLOORS (every scanned file at or below the floor is
  applied) plus an exact residual list for stragglers whose seqno range
  reaches above the floor — O(#vb + #stragglers), not O(#segments)
  (wal.compact_processed). The floor's in-order-visibility assumption
  is CHECKED: a per-vb xor-identity of the covered file set voids a
  floor whose sub-floor files changed in any way (late out-of-order
  arrival, deletion, swap) and replays that vb, exact by LWW
  idempotence (wal.effective_floor);
- incremental runs rewrite only buckets touched by the delta
  (copy-forward of untouched bucket files), so run cost scales with the
  delta, not the table.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from dcpray.config import ReplayConfig
from dcpray.sources import wal as walmod
from dcpray.stages.mapper import Mapper, apply_mapper
from dcpray.stages.merge import (
    BUCKET_COL,
    make_bucket_merger,
    make_precombine,
    merge_schema_from,
)
from dcpray.stages.reject import make_reject_filter
from dcpray.state.checkpoint import Lake, Manifest, new_run_id


@dataclass
class RunResult:
    run_id: str
    committed: bool
    manifest: Manifest | None
    metrics: dict[str, Any] = field(default_factory=dict)
    # one stats row per bucket WRITTEN this run (rows_in/rows_out/
    # tombstoned_keys/...) — the sink fan-out surface. Deliberately NOT
    # the manifest file list: that includes carry-forward buckets
    # untouched by this run, which must not be re-acked per commit.
    bucket_stats: list = field(default_factory=list)


def _probe_mapper_schema(mapper: Mapper | None, schema: pa.Schema) -> pa.Schema:
    if mapper is None:
        return schema
    try:
        return mapper(schema.empty_table()).schema
    except Exception:
        return schema


def _affected_buckets(paths, num_buckets: int, salted: bool) -> set[int]:
    """Shuffle strategy only — column-pruned pre-pass: which merge buckets
    does the delta touch? Reads only (conv_id, turn_idx) so an incremental
    run can copy forward every untouched bucket file. (The aligned
    strategy knows this from footers alone.)"""
    import pyarrow.compute as pc

    from dcpray.hashing import bucket_of, bucket_of_conv
    from dcpray.sources.io import read_parquet_fast

    ds = read_parquet_fast(paths, columns=["conv_id", "turn_idx"])

    def _b(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["conv_id"]))
        if salted:
            b = bucket_of(t["conv_id"], t["turn_idx"], num_buckets)
        else:
            b = bucket_of_conv(t["conv_id"], num_buckets)
        import numpy as np

        return pa.table({"b": pa.array(np.unique(b), pa.int32())})

    return set(ds.map_batches(_b, batch_format="pyarrow").unique("b"))


def _snapshot_paths(base_snapshot_dir: str | None) -> list[str]:
    if not base_snapshot_dir:
        return []
    import glob

    return sorted(glob.glob(os.path.join(base_snapshot_dir, "*.parquet")))


def _num_vb_from_layout(wal_dir: str) -> int:
    """vb modulus from the WAL's directory names alone (wal/vb_NNNN/...),
    without reading any footer — lets the bootstrap snapshot staging start
    concurrently with the footer scan. 0 when the layout isn't vb-named."""
    import glob
    import re

    vbs = [
        int(m.group(1))
        for d in glob.glob(os.path.join(wal_dir, "*"))
        if (m := re.fullmatch(r"vb[_=](\d+)", os.path.basename(d)))
    ]
    return max(vbs) + 1 if vbs else 0


def replay(
    lake: Lake,
    wal_dir: str,
    *,
    config: ReplayConfig | None = None,
    mapper: Mapper | None = None,
    base_snapshot_dir: str | None = None,
    copy_forward: bool = True,
    max_files: int | None = None,
    strict_watermark_rows: bool = False,
    merge_pool: list | None = None,
) -> RunResult:
    """Replay (the unprocessed part of) a WAL into the lake. Returns after
    the manifest commit; Ray must already be initialized by the caller.

    ``max_files`` limits the run to the first N unprocessed files (used by
    tests to simulate incremental arrival / a killed partial ingest).
    ``strict_watermark_rows`` additionally row-filters seqno ≤ watermark —
    only valid when WAL segments are seqno-contiguous per vb.
    """
    cfg = config or ReplayConfig()
    if not os.path.isdir(wal_dir):
        # startup validation parity (reference CheckTopics errors on a
        # missing topic, kafka/client.go:184-200): a mistyped WAL path
        # must fail loudly, not commit-nothing silently. An EXISTING but
        # empty directory is a legitimate no-op (a tail polls one).
        raise FileNotFoundError(f"WAL directory does not exist: {wal_dir}")
    t0 = time.perf_counter()
    phase_t: dict[str, float] = {}
    prev = lake.store.load_current()
    wm = dict(prev.watermarks) if prev else {}
    processed: set[str] = set(prev.processed_wal) if prev else set()
    prev_floor: dict[int, int] = dict(prev.processed_floor) if prev else {}
    num_buckets = prev.num_buckets if prev else cfg.num_buckets
    salted = prev.salted if prev else cfg.salted
    strategy = prev.strategy if prev else cfg.strategy

    # bootstrap overlap: when a fresh aligned lake will need the base
    # snapshot staged, submit the split tasks BEFORE the footer scan so
    # both run on the cluster concurrently (the vb modulus comes from the
    # config or the directory layout — footers not needed for it)
    early_splits = None
    early_num_vb = 0
    if strategy == "aligned" and not (prev and prev.files):
        snap = _snapshot_paths(base_snapshot_dir)
        early_num_vb = cfg.num_vbuckets or _num_vb_from_layout(wal_dir)
        if snap and early_num_vb:
            from dcpray.stages.aligned import submit_snapshot_splits

            early_splits = submit_snapshot_splits(snap, early_num_vb, num_buckets)

    all_infos = walmod.scan_wal(wal_dir)
    phase_t["scan_s"] = round(time.perf_counter() - t0, 3)
    # the stream's vb modulus: every vbucket of a real stream appears in
    # the log layout even before this run's delta (Couchbase fixes 1024);
    # inferred from the FULL scan — never from a truncated delta — or
    # pinned explicitly via cfg.num_vbuckets
    observed_num_vb = max([i.vb for i in all_infos] + [vb for vb in wm] + [-1]) + 1
    # void floors whose sub-floor file SET changed since commit (late
    # out-of-order segment, deletion, or swap): those vbs replay in
    # full — exact by LWW idempotence — instead of silently skipping
    prev_floor = walmod.effective_floor(
        all_infos, prev_floor,
        prev.processed_floor_ids if prev else {},
    )
    infos = [
        i for i in all_infos if not walmod.is_processed(i, processed, prev_floor)
    ]
    infos.sort(key=lambda i: i.path)
    if max_files is not None:
        infos = infos[:max_files]
    if not infos:
        if early_splits:
            # nothing to replay: cancel the speculative bootstrap split
            # tasks or a polling tail re-reads and pins the whole
            # snapshot on EVERY empty poll until the first real delta
            import ray

            for fut in early_splits:
                ray.cancel(fut, force=True)
        return RunResult(run_id="", committed=False, manifest=prev,
                         metrics={"events_in": 0, "note": "no new WAL files"})

    if strategy == "aligned" and any(i.vb < 0 for i in infos):
        # multi-vb files break the partition-alignment invariant
        if prev and prev.files:
            # an EXISTING aligned lake has vb-based bucket ids; silently
            # flipping to hash-based bucket ids would carry forward base
            # files under one partitioning while rewriting updated keys
            # under another — duplicate (conv_id, turn_idx) rows with
            # conflicting payloads. The strategy is pinned at lake
            # creation (like num_vbuckets); refuse loudly.
            bad = sorted(i.path for i in infos if i.vb < 0)[:3]
            raise ValueError(
                "WAL delta contains multi-vb segment(s) "
                f"(e.g. {bad}) but this lake was created with the "
                "'aligned' strategy, whose bucket ids are vb-based. "
                "Either split the segments per vbucket, or rebuild the "
                "lake with ReplayConfig(strategy='shuffle')."
            )
        strategy = "shuffle"

    delta_schema = walmod.unified_schema(infos)
    run_id = new_run_id()
    wm_arr = walmod.watermark_array(
        wm if strict_watermark_rows else {},
        num_vb_hint=max((i.vb for i in infos), default=0) + 1,
    )

    ctx = dict(
        lake=lake, cfg=cfg, mapper=mapper, infos=infos, wm=wm, wm_arr=wm_arr,
        prev=prev, run_id=run_id, num_buckets=num_buckets, salted=salted,
        strategy=strategy, delta_schema=delta_schema, copy_forward=copy_forward,
        base_snapshot_dir=base_snapshot_dir, observed_num_vb=observed_num_vb,
    )
    if strategy == "aligned":
        ctx["early_splits"] = (early_num_vb, early_splits) if early_splits else None
        ctx["merge_pool"] = merge_pool
    elif early_splits:
        # the run flipped to shuffle after the speculative bootstrap
        # submit: cancel the split tasks instead of letting them read
        # and pin the whole snapshot for nothing (r5 review)
        import ray

        for f in early_splits:
            ray.cancel(f, force=True)
        early_splits = None
    t1 = time.perf_counter()
    if strategy == "aligned":
        stats, carried, num_vbuckets = _run_aligned(**ctx, phase_t=phase_t)
    else:
        stats, carried = _run_shuffle(**ctx)
        num_vbuckets = prev.num_vbuckets if prev else 0
    phase_t["merge_s"] = round(time.perf_counter() - t1, 3)

    # ---- checkpoint commit (only now does anything become visible) ----
    new_wm = dict(wm)
    for vb, s in walmod.file_watermarks(infos).items():
        new_wm[vb] = max(new_wm.get(vb, 0), s)
    files = [
        {"path": s["path"], "bucket": int(s["bucket"]), "rows": int(s["rows_out"])}
        for s in stats
    ] + carried
    rejected = lake.rejected_count(run_id) if cfg.rejection_log else 0
    metrics = {
        "strategy": strategy,
        "events_in": int(sum(i.rows for i in infos)),
        "wal_files": len(infos),
        "rejected_rows": int(rejected),
        "rows_out": int(sum(s["rows_out"] for s in stats)),
        "rows_carried_forward": int(sum(f["rows"] for f in carried)),
        "tombstoned_keys": int(sum(s["tombstoned_keys"] for s in stats)),
        "buckets_written": len(stats),
        "buckets_carried": len(carried),
        "wall_s": round(time.perf_counter() - t0, 3),
        **phase_t,
    }
    metrics["events_per_s"] = round(metrics["events_in"] / max(1e-9, metrics["wall_s"]), 1)
    for k in ("t_wal_s", "t_base_s", "t_merge_s"):
        if stats and k in stats[0]:
            metrics[f"{k}_sum"] = round(sum(s[k] for s in stats), 2)
    if stats and "base_cache_hit" in stats[0]:
        metrics["base_cache_hits"] = sum(1 for s in stats if s["base_cache_hit"])
    if stats:
        # skew observability: a hot conversation shows up as one bucket's
        # rows_in far above the mean (north-rule skew handling is the
        # salted shuffle strategy; this is how you notice you need it)
        rins = sorted((int(s["rows_in"]) for s in stats), reverse=True)
        metrics["bucket_rows_in_max"] = rins[0]
        metrics["bucket_rows_in_mean"] = int(sum(rins) / len(rins))
    new_floor, residual, floor_ids = walmod.compact_processed(
        all_infos, processed | {i.path for i in infos}, prev_floor
    )
    manifest = Manifest(
        run_id=run_id,
        seq=(prev.seq + 1) if prev else 1,
        parent=prev.run_id if prev else None,
        num_buckets=num_buckets,
        salted=salted,
        watermarks=new_wm,
        files=files,
        metrics=metrics,
        processed_wal=residual,
        processed_floor=new_floor,
        processed_floor_ids=floor_ids,
        strategy=strategy,
        num_vbuckets=num_vbuckets,
    )
    if cfg.commit_orphan_lease_s is not None:
        # orchestrators with fast crash-recovery reruns lower the orphan
        # takeover lease to their restart latency (POSIX store only;
        # passed as a kwarg so custom/CAS stores keep the plain
        # single-argument commit signature)
        lake.store.commit(manifest, orphan_lease=cfg.commit_orphan_lease_s)
    else:
        lake.store.commit(manifest)
    try:
        # observability only — the manifest above IS the durable record;
        # a metrics-dir write failure must not turn a committed run into
        # an apparent failure (same contract as the builder's
        # stream-metrics / handler writes)
        lake.write_metrics(run_id, metrics)
    except OSError:
        import logging

        logging.getLogger("dcpray.replay").warning(
            "metrics dump for committed run %s failed (non-fatal)",
            run_id, exc_info=True)
    shutil.rmtree(os.path.join(lake.lake_dir, "tmp", run_id), ignore_errors=True)
    return RunResult(run_id=run_id, committed=True, manifest=manifest,
                     metrics=metrics, bucket_stats=list(stats))


# --------------------------------------------------------------- aligned


def _run_aligned(*, lake, cfg, mapper, infos, wm, wm_arr, prev, run_id,
                 num_buckets, salted, strategy, delta_schema, copy_forward,
                 base_snapshot_dir, observed_num_vb, phase_t=None,
                 early_splits=None, merge_pool=None):
    """Shuffle-free per-bucket merge (stages/aligned.py). Returns
    (stats_rows, carried_files, num_vbuckets)."""
    phase_t = phase_t if phase_t is not None else {}
    from dcpray.stages.aligned import collect_snapshot_splits, stage_base_snapshot

    # the vb modulus of the stream: fixed at lake creation, else pinned by
    # config, else the full-scan observation
    num_vbuckets = (prev.num_vbuckets if prev and prev.num_vbuckets else 0) or \
        cfg.num_vbuckets or observed_num_vb
    if observed_num_vb > num_vbuckets:
        # a vb beyond the pinned modulus means the base snapshot was
        # bucketed with the WRONG conv→vb mapping at bootstrap — silent
        # continuation would duplicate keys across buckets. The modulus is
        # a stream constant (Couchbase: 1024); pin it via
        # ReplayConfig(num_vbuckets=...) when the first delta may not yet
        # cover every vbucket.
        raise ValueError(
            f"WAL contains vb up to {observed_num_vb - 1} but this lake was "
            f"bootstrapped with num_vbuckets={num_vbuckets}; recreate the "
            "lake with ReplayConfig(num_vbuckets=<stream constant>)"
        )

    by_bucket: dict[int, list[str]] = {}
    for i in infos:
        by_bucket.setdefault(i.vb % num_buckets, []).append(i.path)

    carried: list[dict] = []
    base_of: dict[int, list[str]] = {}
    if prev and prev.files:
        for f in prev.files:
            b = f["bucket"]
            if b in by_bucket:
                base_of.setdefault(b, []).append(lake.abspath(f["path"]))
            elif copy_forward:
                carried.append(f)
            else:
                by_bucket.setdefault(b, [])
                base_of.setdefault(b, []).append(lake.abspath(f["path"]))
        import pyarrow.parquet as pq

        # permissive like every other unify here: after a type-widening
        # tranche, new bucket files carry the wide type while
        # carried-forward buckets keep the old one — the strict default
        # would raise and permanently brick incremental replay (r5
        # review)
        base_schema = pa.unify_schemas(
            [pq.read_schema(lake.abspath(f["path"])) for f in prev.files],
            promote_options="permissive",
        ) if prev.files else None
    base_refs = None
    if not (prev and prev.files):
        snap = _snapshot_paths(base_snapshot_dir)
        base_schema = None
        if snap:
            import pyarrow.parquet as pq

            base_schema = pa.unify_schemas([pq.read_schema(p) for p in snap], promote_options="permissive")
            tb = time.perf_counter()
            if early_splits and early_splits[0] == num_vbuckets:
                base_refs = collect_snapshot_splits(early_splits[1])
            else:
                if early_splits:
                    # modulus mismatch: the speculative splits are for
                    # the wrong vb modulus — cancel before re-staging
                    import ray as _ray

                    for f in early_splits[1]:
                        _ray.cancel(f, force=True)
                base_refs = stage_base_snapshot(snap, num_vbuckets, num_buckets)
            phase_t["bootstrap_s"] = round(time.perf_counter() - tb, 3)
            for b in base_refs:
                by_bucket.setdefault(b, [])  # base-only buckets still materialize

    mapped_schema = _probe_mapper_schema(mapper, delta_schema)
    mschema = merge_schema_from(mapped_schema, base_schema)
    mschema = pa.schema([f for f in mschema if f.name != BUCKET_COL])

    # raw-task fan-out (see the design note in stages/aligned.py for why not a
    # Dataset stage); largest buckets first for better core packing
    import ray

    rows_of = {b: sum(i.rows for i in infos if i.vb % num_buckets == b)
               for b in by_bucket}
    order = sorted(by_bucket, key=lambda b: -rows_of[b])

    # hot-bucket split: a flooded bucket's segments reduce in parallel
    # partial-LWW tasks that feed its one merge (exact by associativity)
    from dcpray.stages.aligned import partial_reduce

    spec = dict(
        lake_dir=lake.lake_dir, run_id=run_id, merge_schema=mschema,
        wm_arr=wm_arr, mapper=mapper, rejection_log=cfg.rejection_log,
        rejection_include_value=cfg.rejection_include_value,
        num_buckets=num_buckets,
        chunk_rows=cfg.merge_chunk_rows,
    )
    wal_of: dict[int, list] = {}
    parts_of: dict[int, list] = {}
    n_hot = 0
    partial_task = None
    for b in order:
        paths = by_bucket[b]
        if rows_of[b] > cfg.hot_bucket_rows and len(paths) > 1:
            if partial_task is None:
                partial_task = ray.remote(num_cpus=1, max_retries=3)(partial_reduce)
            n_groups = min(len(paths),
                           max(2, (2 * rows_of[b]) // cfg.hot_bucket_rows))
            groups = [paths[i::n_groups] for i in range(int(n_groups))]
            parts_of[b] = [partial_task.remote(spec, b, g) for g in groups]
            wal_of[b] = []
            n_hot += 1
        else:
            wal_of[b] = paths
            parts_of[b] = []
    phase_t["hot_buckets_split"] = n_hot

    if merge_pool:
        # stateful merge-applier actor pool: bucket → actor affinity so a
        # continuous tail merges each delta against the actor's cached
        # copy of the committed bucket (stages/aligned.py MergeApplier)
        stats = ray.get([
            merge_pool[b % len(merge_pool)].merge.remote(
                spec, b, wal_of[b], base_of.get(b, []),
                *parts_of[b], *((base_refs or {}).get(b, ())),
            )
            for b in order
        ])
    else:
        from dcpray.stages.aligned import merge_bucket

        def _merge(b, wal_paths, base_paths, *base_tables):
            return merge_bucket(spec, b, wal_paths, base_paths, base_tables)[0]

        merge_task = ray.remote(num_cpus=1, max_retries=3)(_merge)
        stats = ray.get([
            merge_task.remote(
                b, wal_of[b], base_of.get(b, []),
                *parts_of[b], *((base_refs or {}).get(b, ())),
            )
            for b in order
        ])
    # a split bucket's merge saw partial tables, not raw WAL rows — report
    # the true delta size for skew observability
    for s in stats:
        b = int(s["bucket"])
        if parts_of.get(b):
            s["rows_in"] = rows_of[b]
    return stats, carried, num_vbuckets


# --------------------------------------------------------------- shuffle


def _run_shuffle(*, lake, cfg, mapper, infos, wm, wm_arr, prev, run_id,
                 num_buckets, salted, strategy, delta_schema, copy_forward,
                 base_snapshot_dir, observed_num_vb=0):
    """Generic salted-bucket groupby merge. Returns (stats_rows, carried)."""
    import ray.data as rd

    from dcpray.sources.io import read_parquet_fast

    paths = [i.path for i in infos]

    # ---- source + validation/DLQ ----
    ds = read_parquet_fast(paths, schema=delta_schema)
    rejected_dir = lake.rejected_dir(run_id) if cfg.rejection_log else None
    ds = ds.map_batches(
        make_reject_filter(wm_arr, rejected_dir, cfg.rejection_include_value),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    # ---- user mapper (flat-map / filter / project) ----
    ds = apply_mapper(ds, mapper, cfg.batch_size)
    mapped_schema = _probe_mapper_schema(mapper, delta_schema)

    # ---- base side: committed lake (incremental) or bootstrap snapshot ----
    base_ds = None
    base_schema = None
    carried: list[dict] = []
    from dcpray.stages.mapper import identity_mapper

    if prev and prev.files:
        if (mapper is not None and mapper is not identity_mapper
                and not getattr(mapper, "filter_only", False)):
            # _affected_buckets is computed from the RAW delta's keys, but
            # a mapper is a flat-map that may emit keys absent from the
            # raw delta — those keys' buckets would be simultaneously
            # merged into AND carried forward (duplicate keys, base rows
            # missing from the LWW). Rewriting every bucket is the only
            # correct choice without running the mapper twice. Mappers
            # declared filter-only (mark_filter_only) keep copy-forward:
            # a filter's output keys are a subset of the raw delta's, so
            # the pre-pass bucket set is a safe superset.
            copy_forward = False
        if copy_forward:
            affected = _affected_buckets(paths, num_buckets, salted)
            touched = [f for f in prev.files if f["bucket"] in affected]
            carried = [f for f in prev.files if f["bucket"] not in affected]
        else:
            touched = list(prev.files)
        if touched:
            import pyarrow.parquet as pq

            base_paths = [lake.abspath(f["path"]) for f in touched]
            base_schema = pa.unify_schemas([pq.read_schema(p) for p in base_paths], promote_options="permissive")
            base_ds = read_parquet_fast(base_paths, schema=base_schema)
    else:
        snap = _snapshot_paths(base_snapshot_dir)
        if snap:
            import pyarrow.parquet as pq

            # initial snapshot = version 0 of every preloaded key; the
            # precombine stage fills the missing seqno/op as (0, mutation)
            base_schema = pa.unify_schemas([pq.read_schema(p) for p in snap], promote_options="permissive")
            base_ds = read_parquet_fast(snap, schema=base_schema)

    # ---- the one shuffle: precombine → bucket → merge-apply (sink) ----
    mschema = merge_schema_from(mapped_schema, base_schema)
    pre = make_precombine(mschema, num_buckets, salted)
    delta_p = ds.map_batches(pre, batch_format="pyarrow", batch_size=cfg.batch_size)
    union = delta_p.union(base_ds.map_batches(pre, batch_format="pyarrow", batch_size=cfg.batch_size)) if base_ds is not None else delta_p
    # push-based sort shuffle pipelines map-side sorting with the reduce
    # (measured 3.1s vs 5.4s pull-based on the sf0.1 merge); scoped around
    # plan construction AND execution so the caller's DataContext is
    # untouched afterwards
    from dcpray.rayutil import push_based_shuffle

    with push_based_shuffle():
        stats_ds = union.groupby(BUCKET_COL).map_groups(
            make_bucket_merger(lake.lake_dir, run_id), batch_format="pyarrow"
        )
        stats = stats_ds.take_all()  # ≤ num_buckets tiny rows; merge runs here
    return stats, carried
