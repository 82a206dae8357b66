"""Incrementally-maintained aggregate views over the lake.

A CDC engine's downstream consumers rarely want the raw table — they
want an aggregate of it (rows per role, latest ts per tool, mean turn
length) kept fresh as commits land. Recomputing the aggregate from the
full table after every commit costs O(table); this module keeps it
O(changed buckets):

- every committed data file (one bucket of one run) gets a SIDECAR
  parquet under ``<lake>/views/<name>/`` holding that bucket's
  PARTIAL aggregate rows (``functions.agg.partial_aggregate`` — the
  same associative partial/merge algebra ``coarse_groupby`` uses);
- ``refresh`` computes sidecars ONLY for data files that don't have
  one yet. Incremental replay carries untouched buckets' file entries
  forward unchanged (replay.py copy-forward), so their sidecars stay
  valid by construction and a refresh after a delta commit costs one
  small Ray task per REWRITTEN bucket, never a table scan;
- ``read`` merges the current manifest's sidecars — O(view) work,
  independent of table size — through one coarse exchange
  (``merge_partial_dataset``) so even views with millions of groups
  never concentrate on the driver.

Crash safety mirrors the lake's: sidecars are tmp+rename, and a
half-refreshed view is simply refreshed again (idempotent by file
path — a data file's partial is a pure function of its content).
Historical sidecars are pruned only when their data file is gone
(after ``gc``), so ``read(at=seq)`` time travel works for any
still-retained manifest whose files were refreshed.

Reference parity: the reference has no view layer (its sink is Kafka;
consumers build their own state). This is lake-side machinery the
north rule's "incremental ingest" implies: commit → cheap delta
maintenance downstream, not re-reads of 100 TB.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcpray.schema import OP_LAKE_COL, OP_MUTATION


@dataclass(frozen=True)
class ViewSpec:
    """An aggregate view definition: GROUP BY ``keys``, one output
    column per ``(column, op, alias)`` agg with op in
    {count, sum, min, max, mean} (count = SQL count(*))."""

    name: str
    keys: tuple[str, ...]
    aggs: tuple[tuple[str, str, str], ...]
    #: aggregate only live rows (op == mutation), the table consumers
    #: see — set False to aggregate tombstones too (audit views)
    mutation_only: bool = True

    def __post_init__(self):
        if not self.name or "/" in self.name:
            raise ValueError(f"bad view name {self.name!r}")
        object.__setattr__(self, "keys", tuple(self.keys))
        object.__setattr__(self, "aggs",
                           tuple(tuple(a) for a in self.aggs))
        from dcpray.functions.agg import _validate_aggs
        _validate_aggs(list(self.aggs))

    def to_json(self) -> str:
        return json.dumps({"name": self.name, "keys": list(self.keys),
                           "aggs": [list(a) for a in self.aggs],
                           "mutation_only": self.mutation_only},
                          sort_keys=True)


def _part_name(rel_path: str) -> str:
    """Sidecar file name for one data file: the lake-relative path,
    flattened (invertible enough for orphan pruning, readable in a
    directory listing). ``data/r-abc/bucket-00008.parquet`` →
    ``part@data@r-abc@bucket-00008.parquet``."""
    return "part@" + rel_path.replace("/", "@")


def _normalize(t: pa.Table, need: dict[str, pa.DataType]) -> pa.Table:
    """Add columns this (older-schema) bucket file lacks as typed nulls
    so every sidecar carries an identical partial schema."""
    for name, typ in need.items():
        if name not in t.schema.names:
            t = t.append_column(name, pa.nulls(t.num_rows, typ))
        elif t.schema.field(name).type != typ:
            t = t.set_column(t.schema.names.index(name), name,
                             pc.cast(t[name], typ))
    return t


def _compute_part(data_path: str, out_path: str, keys: list[str],
                  aggs: list[tuple[str, str, str]],
                  need: dict[str, pa.DataType],
                  mutation_only: bool) -> int:
    """Read ONE bucket file, collapse it to partial-aggregate rows,
    write the sidecar atomically. Runs as a Ray task per rewritten
    bucket; the bucket file is the unit of incrementality."""
    cols = sorted(set(keys) | {c for c, _, _ in aggs})
    fcols = list(cols)
    pf_names = pq.read_schema(data_path).names
    if mutation_only and OP_LAKE_COL in pf_names:
        fcols.append(OP_LAKE_COL)
    t = pq.read_table(data_path, columns=[c for c in fcols if c in pf_names])
    if mutation_only and OP_LAKE_COL in t.schema.names:
        t = t.filter(pc.equal(t[OP_LAKE_COL], OP_MUTATION))
        t = t.drop_columns([OP_LAKE_COL])
    t = _normalize(t, need)
    from dcpray.functions.agg import partial_aggregate
    part = partial_aggregate(t, keys, aggs)
    tmp = f"{out_path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:6]}"
    pq.write_table(part, tmp)
    os.rename(tmp, out_path)
    return part.num_rows


class IncrementalView:
    """One named aggregate view bound to a lake. ``refresh()`` after
    each commit (cost: one task per rewritten bucket); ``read()`` /
    ``read_table()`` any time the current manifest is fully refreshed."""

    def __init__(self, lake, spec: ViewSpec):
        self.lake = lake
        self.spec = spec
        self.view_dir = os.path.join(lake.lake_dir, "views", spec.name)

    # ---- spec pinning ----
    def _check_spec(self) -> None:
        os.makedirs(self.view_dir, exist_ok=True)
        spath = os.path.join(self.view_dir, "spec.json")
        want = self.spec.to_json()
        if os.path.exists(spath):
            with open(spath) as f:
                have = f.read()
            if have != want:
                raise ValueError(
                    f"view {self.spec.name!r} exists with a different "
                    "spec; use a new name (sidecars are spec-specific)")
        else:
            from dcpray.state.checkpoint import _atomic_write
            _atomic_write(spath, want)

    def _need_types(self, files: list[dict]) -> dict[str, pa.DataType]:
        """Unified type per referenced column across the manifest's
        files (footer metadata only) — older bucket files missing an
        evolved column aggregate it as nulls, same as readers see."""
        cols = sorted(set(self.spec.keys) | {c for c, _, _ in self.spec.aggs})
        schemas = [pq.read_schema(self.lake.abspath(f["path"])) for f in files]
        uni = pa.unify_schemas(schemas, promote_options="permissive")
        need = {}
        for c in cols:
            if c not in uni.names:
                raise ValueError(
                    f"view column {c!r} exists in no committed file")
            need[c] = uni.field(c).type
        return need

    # ---- maintenance ----
    def refresh(self, at: int | None = None) -> dict:
        """Bring the view up to date with the current (or, for
        backfilling time travel, a historical ``at=seq``) manifest.
        Computes sidecars only for data files that lack one; prunes
        sidecars whose data file was garbage-collected. Idempotent and
        crash-safe (rerun finishes the job). Returns maintenance
        metrics — ``buckets_computed`` is the incremental cost."""
        import ray

        self._check_spec()
        m = (self.lake.manifest_at(at) if at is not None
             else self.lake.store.load_current())
        if m is None:
            raise ValueError("nothing committed yet; replay first")
        files = m.files
        missing = [f for f in files if not os.path.exists(
            os.path.join(self.view_dir, _part_name(f["path"])))]
        rows = 0
        if missing:
            need = self._need_types(files)
            task = ray.remote(num_cpus=1)(_compute_part)
            refs = [task.remote(
                self.lake.abspath(f["path"]),
                os.path.join(self.view_dir, _part_name(f["path"])),
                list(self.spec.keys), [list(a) for a in self.spec.aggs],
                need, self.spec.mutation_only) for f in missing]
            rows = sum(ray.get(refs))
        # a sidecar is live iff ANY retained manifest still references
        # its data file — the same liveness rule gc() applies to the
        # data files themselves, so time travel over retained history
        # keeps working while dead sidecars can't accumulate
        live = {_part_name(f["path"])
                for hm in self.lake.store.history() for f in hm.files}
        pruned = 0
        for n in os.listdir(self.view_dir):
            if n.startswith("part@") and n not in live:
                os.remove(os.path.join(self.view_dir, n))
                pruned += 1
        return {"view": self.spec.name, "seq": m.seq,
                "buckets_total": len(files),
                "buckets_computed": len(missing),
                "partial_rows_written": rows, "parts_pruned": pruned}

    # ---- reads ----
    def _part_paths(self, at: int | None) -> list[str]:
        m = (self.lake.manifest_at(at) if at is not None
             else self.lake.store.load_current())
        if m is None:
            raise ValueError("nothing committed yet; replay first")
        paths = []
        for f in m.files:
            p = os.path.join(self.view_dir, _part_name(f["path"]))
            if not os.path.exists(p):
                raise RuntimeError(
                    f"view {self.spec.name!r} is stale for commit "
                    f"{m.seq}: missing sidecar for {f['path']}; call "
                    "refresh() first")
            paths.append(p)
        return paths

    def _empty_partials(self) -> pa.Table:
        """Typed empty partial table for a ZERO-FILE manifest (the
        lake's own readers guard this state; pa.concat_tables([]) /
        unify_schemas([]) would raise). Types come from any sidecar
        ever written for this view; a view that has never had one has
        no knowable schema — raise the stale-view error instead."""
        import glob

        cands = sorted(glob.glob(os.path.join(self.view_dir,
                                              "part@*.parquet")))
        if not cands:
            raise RuntimeError(
                f"view {self.spec.name!r} has no sidecars and the "
                "manifest lists no files — the view schema is unknown; "
                "refresh() after a non-empty commit")
        return pq.read_schema(cands[0]).empty_table()

    def read(self, at: int | None = None, partitions: int = 16):
        """The merged view as a lazy Dataset — one coarse exchange over
        sidecar partials, O(view size), independent of table size."""
        import ray.data as rd

        from dcpray.functions.agg import merge_partial_dataset
        from dcpray.sources.io import read_parquet_fast
        paths = self._part_paths(at)
        if not paths:
            src = rd.from_arrow(self._empty_partials())
        else:
            # read_parquet_fast: plain read_parquet's per-fragment
            # footer prefetch costs seconds at hundreds of sidecars
            schema = pa.unify_schemas([pq.read_schema(p) for p in paths],
                                      promote_options="permissive")
            src = read_parquet_fast(paths, schema=schema)
        return merge_partial_dataset(
            src, list(self.spec.keys),
            [tuple(a) for a in self.spec.aggs], partitions=partitions)

    def read_table(self, at: int | None = None) -> pa.Table:
        """Small-view convenience: merge the sidecars in one driver
        call (use ``read()`` when group count is large)."""
        from dcpray.functions.agg import merge_partials
        paths = self._part_paths(at)
        if not paths:
            parts = self._empty_partials()
        else:
            # "permissive": sidecars carried forward from BEFORE a type
            # evolution (e.g. int32 -> int64 partials) must still
            # concat — reuse is keyed on file existence, not schema
            parts = pa.concat_tables([pq.read_table(p) for p in paths],
                                     promote_options="permissive")
        return merge_partials(parts, list(self.spec.keys),
                              [tuple(a) for a in self.spec.aggs])
