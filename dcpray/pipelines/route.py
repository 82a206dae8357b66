"""Collection → table routing — the reference's topic router (M2).

``getTopicName`` resolves each message's destination from
``collectionTopicMapping`` and PANICS on a missing mapping
(/root/reference/connector.go:125-140; config
``config/config.go:18``). Here each collection routes to its own lake
table; an unmapped collection raises unless a ``default`` lake is given.

One replay pass per destination: each pass composes a vectorized
collection filter in front of the user mapper, so only that table's
events reach its merge. The WAL footer cache + watermark pruning make
the repeated source scans cheap; at 100 TB with many destinations you
would instead split the stream once per segment (a map stage writing one
filtered WAL per destination) and replay each — same semantics, one
read — which this module's ``split_wal_by_collection`` provides.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from dcpray.config import ReplayConfig
from dcpray.pipelines.replay import RunResult, replay
from dcpray.state.checkpoint import Lake


def _collection_filter(collections, user_mapper=None):
    """Vectorized mapper prefix keeping only the given collection(s).
    Pure filters keep incremental copy-forward (mark_filter_only);
    composing a user mapper inherits ITS filter-only declaration."""
    from dcpray.stages.mapper import mark_filter_only

    if isinstance(collections, str):
        collections = [collections]
    value_set = pa.array(sorted(collections), pa.string())

    def _m(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["collection"], value_set=value_set))
        return user_mapper(batch) if user_mapper is not None else batch

    if user_mapper is None or getattr(user_mapper, "filter_only", False):
        mark_filter_only(_m)
    return _m


def wal_collections(wal_dir: str) -> set[str]:
    """Distinct collections present in the WAL (column-pruned read)."""
    from dcpray.sources.io import read_parquet_fast
    import glob

    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))
    if not paths:
        return set()
    ds = read_parquet_fast(paths, columns=["collection"])
    return {c for c in ds.unique("collection") if c is not None}


def replay_routed(
    tables: dict[str, Lake],
    wal_dir: str,
    *,
    config: ReplayConfig | None = None,
    mapper=None,
    base_snapshot_dirs: dict[str, str] | None = None,
    default: Lake | None = None,
    **kwargs: Any,
) -> dict[str, RunResult]:
    """Replay each collection's events into its mapped lake.

    ``tables``: collection → Lake (collectionTopicMapping analogue).
    ``default``: lake for unmapped collections; None → raise (the
    reference panics, connector.go:136-138)."""
    import os as _os

    if not _os.path.isdir(wal_dir):
        # replay() fails loudly on a mistyped WAL path; the routed
        # entry point must not reintroduce a silent commit-nothing no-op
        raise FileNotFoundError(f"WAL directory not found: {wal_dir}")
    present = wal_collections(wal_dir)
    unmapped = sorted(present - set(tables))
    routes = dict(tables)
    if unmapped:
        if default is None:
            raise KeyError(f"no table mapping for collections {unmapped}")
        for c in unmapped:
            routes[c] = default

    # Group collections by destination lake: the reference allows a
    # many-to-one collectionTopicMapping, and each replay commits the
    # full WAL file set as processed — so TWO replays into one lake would
    # have the second see "no new WAL files" and silently drop its
    # collection's events. One replay per lake, filtering to every
    # collection routed there, preserves the mapping semantics exactly.
    by_lake: dict[str, tuple[Lake, list[str]]] = {}
    for coll in sorted(present):
        lk = routes[coll]
        key = os.path.abspath(lk.lake_dir)
        by_lake.setdefault(key, (lk, []))[1].append(coll)

    out: dict[str, RunResult] = {}
    for _key, (lk, colls) in sorted(by_lake.items()):
        snaps = {(base_snapshot_dirs or {}).get(c) for c in colls}
        if len(snaps) > 1:
            raise ValueError(
                f"collections {colls} share lake {lk.lake_dir} but have "
                f"different base_snapshot_dirs {sorted(s or '' for s in snaps)}"
            )
        res = replay(
            lk,
            wal_dir,
            config=config,
            mapper=_collection_filter(colls, mapper),
            base_snapshot_dir=next(iter(snaps)) if snaps else None,
            **kwargs,
        )
        for c in colls:
            out[c] = res
    return out


def split_wal_by_collection(wal_dir: str, out_dir: str) -> dict[str, str]:
    """Scale path for many destinations: one distributed pass that writes
    a per-collection WAL mirror (same vb dir layout), so each destination
    replays its own slice without re-reading the shared stream. Returns
    collection → its WAL dir."""
    import glob

    import ray

    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))

    def _split_one(path: str) -> list[str]:
        import pyarrow.parquet as pq

        from dcpray.stages.aligned import _cap_arrow_threads

        _cap_arrow_threads()
        t = pq.read_table(path)
        rel = os.path.relpath(path, wal_dir)
        seen = []
        for coll in pc.unique(t["collection"]).to_pylist():
            if coll is None:
                continue
            part = t.filter(pc.equal(t["collection"], coll))
            dst = os.path.join(out_dir, coll, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            pq.write_table(part, dst + ".tmp")
            os.rename(dst + ".tmp", dst)
            seen.append(coll)
        return seen

    task = ray.remote(num_cpus=1, max_retries=3)(_split_one)
    colls = {c for part in ray.get([task.remote(p) for p in paths]) for c in part}
    return {c: os.path.join(out_dir, c) for c in sorted(colls)}
