"""Collection → table routing — the reference's topic router (M2).

``getTopicName`` resolves each message's destination from
``collectionTopicMapping`` and PANICS on a missing mapping
(/root/reference/connector.go:125-140; config
``config/config.go:18``). Here each collection routes to its own lake
table; an unmapped collection — including a NULL collection — raises
unless a ``default`` lake is given (null rows then route to the
default; they are never silently dropped).

One replay pass per destination: each pass composes a vectorized
collection filter in front of the user mapper, so only that table's
events reach its merge. Per-file collection sets are cached beside the
WAL footer cache (validated by size+mtime), so repeated routed runs /
tail polls read the collection column of NEW segments only; at 100 TB
with many destinations you would instead split the stream once per
segment (a map stage writing one filtered WAL per destination) and
replay each — same semantics, one read — which this module's
``split_wal_by_collection`` provides.
"""

from __future__ import annotations

import os
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from dcpray.config import ReplayConfig
from dcpray.pipelines.replay import RunResult, replay
from dcpray.state.checkpoint import Lake


def _collection_filter(collections, user_mapper=None, include_null=False):
    """Vectorized mapper prefix keeping only the given collection(s)
    (plus NULL-collection rows when ``include_null`` — the default
    lake's share). Pure filters keep incremental copy-forward
    (mark_filter_only); composing a user mapper inherits ITS
    filter-only declaration."""
    from dcpray.stages.mapper import mark_filter_only

    if isinstance(collections, str):
        collections = [collections]
    value_set = pa.array(sorted(collections), pa.string())

    def _m(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["collection"], value_set=value_set)
        if include_null:
            m = pc.or_kleene(m, pc.is_null(batch["collection"]))
        # is_in is null -> null for null inputs; fill so filter drops
        # (or keeps, above) them EXPLICITLY instead of by null-masking
        batch = batch.filter(pc.fill_null(m, False))
        return user_mapper(batch) if user_mapper is not None else batch

    if user_mapper is None or getattr(user_mapper, "filter_only", False):
        mark_filter_only(_m)
    return _m


_COLL_CACHE_NAME = "collections"


def _file_collections(wal_dir: str) -> tuple[set[str], bool]:
    """(distinct non-null collections, any-null?) across the WAL —
    column-pruned reads of ONLY files not already in the persistent
    per-file cache (size+mtime validated, stored beside the footer
    cache), so a tail poll costs O(new segments), not O(total WAL)."""
    import glob
    import json

    import pyarrow.parquet as pq

    from dcpray.sources import wal as walmod

    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"),
                             recursive=True))
    cache_path = walmod._cache_path(wal_dir) + ".collections"
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except Exception:
        cache = {}
    out: set[str] = set()
    has_null = False
    dirty = False
    live = set()
    todo: list[tuple[str, object]] = []
    for p in paths:
        try:
            st = os.stat(p)
        except FileNotFoundError:
            continue
        live.add(p)
        e = cache.get(p)
        if not (e and e["size"] == st.st_size
                and e["mtime_ns"] == st.st_mtime_ns):
            todo.append((p, st))
            continue
        out.update(e["collections"])
        has_null = has_null or e["has_null"]

    def _read_one(p: str) -> dict | None:
        try:
            t = pq.read_table(p, columns=["collection"])
        except FileNotFoundError:
            return None  # deleted between stat and read — skip like scan_wal
        vals = pc.unique(t["collection"]).to_pylist()
        return {"collections": sorted(v for v in vals if v is not None),
                "has_null": any(v is None for v in vals)}

    if todo:
        # cold misses fan out like scan_wal's footer scan — a serial
        # driver loop over thousands of new segments would take minutes
        # where a distributed read takes seconds (r5 review)
        import ray

        if len(todo) >= 256 and ray.is_initialized():
            task = ray.remote(num_cpus=0.5)(_read_one)
            results = ray.get([task.remote(p) for p, _ in todo])
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as ex:
                results = list(ex.map(_read_one, (p for p, _ in todo)))
        for (p, st), r in zip(todo, results):
            if r is None:
                live.discard(p)
                continue
            e = {"size": st.st_size, "mtime_ns": st.st_mtime_ns, **r}
            cache[p] = e
            dirty = True
            out.update(e["collections"])
            has_null = has_null or e["has_null"]
    if dirty or len(cache) != len(live):
        cache = {p: e for p, e in cache.items() if p in live}
        import uuid

        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        tmp = f"{cache_path}.tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(cache, f)
        os.rename(tmp, cache_path)
    return out, has_null


def wal_collections(wal_dir: str) -> set[str]:
    """Distinct (non-null) collections present in the WAL."""
    return _file_collections(wal_dir)[0]


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
    ``default``: lake for unmapped collections — including rows whose
    collection is NULL; None → raise (the reference panics,
    connector.go:136-138). Every replay marks the full WAL file set
    processed, so a silently-dropped row would be lost FOREVER — hence
    the loud unmapped/null contract."""
    import os as _os

    if not _os.path.isdir(wal_dir):
        # replay() fails loudly on a mistyped WAL path; the routed
        # entry point must not reintroduce a silent commit-nothing no-op
        raise FileNotFoundError(f"WAL directory not found: {wal_dir}")
    present, has_null = _file_collections(wal_dir)
    unmapped = sorted(present - set(tables))
    routes = dict(tables)
    if unmapped or has_null:
        if default is None:
            what = list(unmapped) + (["<null collection>"] if has_null
                                     else [])
            raise KeyError(f"no table mapping for collections {what}")
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
    default_key = (os.path.abspath(default.lake_dir)
                   if default is not None else None)
    if has_null and default_key is not None and default_key not in by_lake:
        by_lake[default_key] = (default, [])

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
            mapper=_collection_filter(
                colls, mapper,
                include_null=has_null and _key == default_key),
            base_snapshot_dir=next(iter(snaps)) if snaps else None,
            **kwargs,
        )
        for c in colls:
            out[c] = res
        if has_null and _key == default_key:
            out["<null>"] = res
    return out


def split_wal_by_collection(wal_dir: str, out_dir: str) -> dict[str, str]:
    """Scale path for many destinations: one distributed pass that writes
    a per-collection WAL mirror (same vb dir layout), so each destination
    replays its own slice without re-reading the shared stream. Returns
    collection → its WAL dir.

    Collection names become directory components, so they are validated
    (``[A-Za-z0-9_.-]+``, no path separators / traversal) and a NULL
    collection raises — silently skipping either would lose those rows
    from every mirror; map or scrub them upstream first."""
    import glob

    import ray

    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))

    def _split_one(path: str) -> list[str]:
        import re

        import pyarrow.parquet as pq

        from dcpray.stages.aligned import _cap_arrow_threads

        _cap_arrow_threads()
        t = pq.read_table(path)
        rel = os.path.relpath(path, wal_dir)
        seen = []
        for coll in pc.unique(t["collection"]).to_pylist():
            if coll is None:
                raise ValueError(
                    f"{path} contains rows with a NULL collection — they "
                    "belong to no mirror; route them (replay_routed "
                    "default=) or scrub upstream before splitting")
            if not re.fullmatch(r"[A-Za-z0-9_.\-]+", coll) or coll in (".", ".."):
                raise ValueError(
                    f"collection name {coll!r} in {path} is not a safe "
                    "directory component; sanitize the stream before "
                    "splitting")
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
