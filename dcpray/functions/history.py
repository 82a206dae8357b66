"""Change-history operators over versioned streams and the lake.

Two CDC-native views the reference leaves implicit in its Kafka topics:

- ``version_history``: SCD-Type-2 per-key version chain over any
  (keys, version) stream — each row gains ``valid_to`` (the NEXT
  version of the same key, NULL while current) and ``is_current``.
  The reference's compacted topic keeps only the LAST version per key
  (kafka/client.go:235-275); the full history is exactly what the
  pre-compaction log holds. One coarse exchange on the key hash, one
  lexsort + shifted-compare per partition.

- ``lake_diff``: CHANGE DATA FEED between two committed manifest
  versions of a dcpray lake — per-key insert / update / delete rows,
  the table-form analogue of consuming the Kafka changelog between two
  offsets. ZERO exchange: bucket files are aligned across manifests
  (same ``bucket = hash % num_buckets`` pinning, copy-forward reuses
  unchanged files byte-identically), so buckets whose file path is
  unchanged are skipped without opening them, and each changed bucket
  pair diffs independently in one task via a local Arrow full-outer
  join. Cost scales with CHANGED buckets, not table size.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.functions.agg import _hash_key_columns, require_nonnull

__all__ = ["version_history", "wal_version_history", "lake_diff",
           "table_diff", "write_changefeed", "read_changefeed",
           "ChangefeedGapError"]


def _adjacent_equal(col: pa.ChunkedArray) -> np.ndarray:
    """bool[n-1]: row i equals row i+1 — Arrow-native, so strings and
    timestamps compare by VALUE (dictionary indices would only give
    first-appearance order)."""
    arr = col.combine_chunks()
    n = len(arr)
    if n < 2:
        return np.zeros(0, bool)
    return pc.equal(arr.slice(1), arr.slice(0, n - 1)).to_numpy(
        zero_copy_only=False)


def version_history(ds, keys: list[str], version_col: str,
                    valid_to_col: str = "valid_to",
                    current_col: str = "is_current",
                    partitions: int = 64):
    """SCD Type-2 version chain: for every row, ``valid_to`` = the next
    ``version_col`` of the same key (NULL for the key's latest version)
    and ``is_current`` = that NULL-ness — i.e. SQL
    ``LEAD(version) OVER (PARTITION BY keys ORDER BY version)``.

    Requires non-null keys/version and a UNIQUE (keys, version) pair
    per row (per-vb DCP seqnos guarantee this for WAL streams,
    couchbase/event.go:20); ties would make LEAD order-dependent in SQL
    too. Scale shape: ONE coarse exchange on the key hash, then one
    lexsort + one shifted vectorized compare per partition — no
    per-group loop, no global sort."""

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_hash_key_columns(t, keys)
              % np.uint64(partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    def assign(group: pa.Table) -> pa.Table:
        return _assign_history(group.drop_columns(["_pk"]), keys,
                               version_col, valid_to_col, current_col)

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def _assign_history(group: pa.Table, keys: list[str], version_col: str,
                    valid_to_col: str, current_col: str) -> pa.Table:
    """The per-partition SCD2 kernel: Arrow sort by (keys, version) —
    VALUE order for every orderable type, including string versions —
    then one shifted vectorized compare for the validity chain.
    Requires every row of a key to be present in ``group``."""
    require_nonnull(group, (*keys, version_col), "version_history")
    order = pc.sort_indices(
        group, sort_keys=[(k, "ascending") for k in (*keys, version_col)])
    out = group.take(order)
    n = out.num_rows
    same_next = np.zeros(n, bool)
    if n > 1:
        same_next[:-1] = np.logical_and.reduce(
            [_adjacent_equal(out[k]) for k in keys])
    vers = out[version_col].combine_chunks()
    nxt = np.arange(1, n + 1)
    nxt[-1:] = 0  # masked off below
    valid_to = pc.if_else(
        pa.array(same_next),
        vers.take(pa.array(np.where(same_next, nxt, 0))),
        pa.nulls(n, vers.type))
    return (out.append_column(valid_to_col, valid_to)
            .append_column(current_col, pa.array(~same_next)))


def wal_version_history(wal_dir: str, keys=("conv_id", "turn_idx"),
                        version_col: str = "seqno",
                        columns: list[str] | None = None,
                        valid_to_col: str = "valid_to",
                        current_col: str = "is_current",
                        validate: bool = True):
    """``version_history`` over a vb-partitioned WAL with ZERO
    exchange: the key → vb mapping is a pure function (Couchbase:
    crc32(key) % 1024, SURVEY §4), so every version of a key already
    lives in ONE ``wal/vb=NNNN/`` directory — each vb directory is one
    independent task (read → validate → SCD2 kernel), inheriting the
    stream's partitioning exactly like the aligned LWW merge
    (dcpray/stages/aligned.py). Use the generic ``version_history``
    when the input is not key-partitioned."""
    import os

    import ray.data

    import pyarrow.parquet as pq

    from dcpray.sources import wal as walmod
    from dcpray.stages.reject import make_reject_filter

    infos = walmod.scan_wal(wal_dir)
    by_vb: dict[str, list[str]] = {}
    for i in infos:
        by_vb.setdefault(os.path.dirname(i.path), []).append(i.path)
    items = [{"paths": sorted(ps)} for _, ps in sorted(by_vb.items())]
    rej = make_reject_filter(walmod.watermark_array({}, 1), None) \
        if validate else None
    key_list = list(keys)
    need = columns
    if need is not None:
        # the reject filter's contract is fixed: it reads
        # vb/seqno/conv_id/turn_idx/op regardless of this op's keys
        filter_cols = {"vb", "seqno", "conv_id", "turn_idx", "op"} \
            if validate else set()
        need = sorted({*need, *key_list, version_col} | filter_cols)

    def hist(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            t = pa.concat_tables(
                [pq.read_table(p, columns=need) for p in row["paths"]],
                promote_options="default")
            if rej is not None:
                t = rej(t)
            outs.append(_assign_history(t, key_list, version_col,
                                        valid_to_col, current_col))
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(items).map_batches(
        hist, batch_format="pyarrow", batch_size=1)


def table_diff(old_ds, new_ds, keys: list[str],
               value_cols: list[str] | None = None,
               partitions: int = 64):
    """Generic CHANGE-SET between two datasets sharing a key: per-key
    insert / update / delete rows (SQL MERGE's source-vs-target
    classification). ``lake_diff`` is the zero-exchange special case
    for committed lake manifests; this generic form pays ONE coarse
    exchange on the key hash, then full-outer-joins each partition's
    old/new slices locally with the same ``_diff_pair`` kernel
    (value-identical rows emit nothing; delete rows carry old values).
    Requires non-null keys (use lake_diff's reader contract upstream)
    and assumes each key appears at most once per side."""
    old_schema = (old_ds.schema().base_schema
                  if hasattr(old_ds.schema(), "base_schema")
                  else old_ds.schema())
    if value_cols is None:
        value_cols = [c for c in old_schema.names if c not in keys]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = t.select(list(keys) + value_cols)
            pk = (_hash_key_columns(t, list(keys))
                  % np.uint64(partitions)).astype(np.int32)
            return (t.append_column("_pk", pa.array(pk))
                    .append_column("_side", pa.array(
                        np.full(t.num_rows, side, np.int8))))

        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow"))

    def diff(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        g = g.drop_columns(["_pk", "_side"])
        return _diff_pair(g.filter(pa.array(side == 0)),
                          g.filter(pa.array(side == 1)),
                          list(keys), value_cols)

    return both.groupby("_pk").map_groups(diff, batch_format="pyarrow")


def _manifest_at(lake, seq: int):
    for m in lake.store.history():
        if m.seq == seq:
            return m
    raise ValueError(f"no manifest with seq={seq} in {lake.lake_dir}")


def _conform(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = {}
    for f in schema:
        if f.name in t.column_names:
            cols[f.name] = pc.cast(t[f.name], f.type)
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols)


def _diff_pair(old_t: pa.Table, new_t: pa.Table, keys: list[str],
               value_cols: list[str]) -> pa.Table:
    """Full-outer key join of one bucket's old/new states, classified
    into insert/update/delete; payload-identical rewrites (LWW re-merge
    with a higher seqno but equal values) emit nothing."""
    old_t = old_t.append_column("__po", pa.array(
        np.ones(old_t.num_rows, np.int8)))
    new_t = new_t.append_column("__pn", pa.array(
        np.ones(new_t.num_rows, np.int8)))
    j = old_t.join(new_t, keys=keys, join_type="full outer",
                   left_suffix="_o", right_suffix="_n",
                   coalesce_keys=True)
    in_old = pc.is_valid(j["__po"])
    in_new = pc.is_valid(j["__pn"])
    changed = pa.array(np.zeros(j.num_rows, bool))
    for c in value_cols:
        a, b = j[f"{c}_o"], j[f"{c}_n"]
        same = pc.and_(pc.is_null(a), pc.is_null(b))
        if pa.types.is_floating(a.type):
            # SQL IS DISTINCT FROM treats NaN = NaN as equal; Arrow's
            # not_equal(NaN, NaN) is true — special-case it or a
            # NaN-carrying no-op commit emits spurious updates
            same = pc.or_(same, pc.and_(
                pc.is_nan(pc.fill_null(a, 0.0)),
                pc.is_nan(pc.fill_null(b, 0.0))))
        ne = pc.if_else(same, False,
                        pc.fill_null(pc.not_equal(a, b), True))
        changed = pc.or_(changed, ne)
    is_ins = pc.and_(in_new, pc.invert(in_old))
    is_del = pc.and_(in_old, pc.invert(in_new))
    is_upd = pc.and_(pc.and_(in_old, in_new), changed)
    keep = pc.or_(pc.or_(is_ins, is_del), is_upd)
    j = j.append_column("_change_type", pc.if_else(
        is_ins, pa.scalar("insert", pa.string()),
        pc.if_else(is_del, pa.scalar("delete", pa.string()),
                   pa.scalar("update", pa.string()))))
    # delete rows carry the OLD values (there is no new row), others NEW
    sel = {k: j[k] for k in keys}
    sel["_change_type"] = j["_change_type"]
    for c in value_cols:
        sel[c] = pc.if_else(is_del, j[f"{c}_o"], j[f"{c}_n"])
    return pa.table(sel).filter(keep)


def lake_diff(lake, from_seq: int, to_seq: int,
              keys: tuple[str, ...] = ("conv_id", "turn_idx"),
              exclude: tuple[str, ...] = ("_op", "_seqno", "vb")):
    """CHANGE DATA FEED between two committed manifests of a dcpray
    lake: a Dataset of ``keys + _change_type + value columns`` with one
    row per key inserted, updated (any payload column differs,
    null-safe) or deleted between ``from_seq`` and ``to_seq``. Delete
    rows carry the old values, insert/update rows the new.

    Scale shape: manifests pin bucket alignment, and incremental replay
    COPY-FORWARDS untouched buckets by reference — identical bucket
    paths are skipped without reading a byte, so the diff costs
    O(changed buckets), not O(table). Each changed bucket pair is one
    independent task: two column-pruned Parquet reads + a local Arrow
    full-outer join on the key (both files hold the same key range by
    construction, so no exchange exists to do). Tombstoned rows
    (``_op != 'mutation'``) are excluded from both states, matching the
    reader contract."""
    import ray.data

    import pyarrow.parquet as pq

    ma, mb = _manifest_at(lake, from_seq), _manifest_at(lake, to_seq)
    if ma.num_buckets != mb.num_buckets:
        raise ValueError(
            f"manifests disagree on num_buckets ({ma.num_buckets} vs "
            f"{mb.num_buckets}); diff requires aligned buckets")
    old_by_b = {f["bucket"]: f["path"] for f in ma.files}
    new_by_b = {f["bucket"]: f["path"] for f in mb.files}
    pairs = []
    for b in sorted(set(old_by_b) | set(new_by_b)):
        po, pn = old_by_b.get(b), new_by_b.get(b)
        if po != pn:  # copy-forwarded buckets are byte-identical: skip
            pairs.append({"bucket": b, "old": po or "", "new": pn or ""})

    # one unified value schema across every touched file (footer reads
    # only) so every task emits identically-typed blocks even when
    # schema evolution differs per bucket — and so empty diffs carry an
    # explicit schema instead of a schema-less RefBundle
    fields: dict[str, pa.DataType] = {}
    rels = [rel for p in pairs for rel in (p["old"], p["new"]) if rel]
    if not rels:  # nothing changed: type the empty result off any file
        rels = [f["path"] for f in (mb.files or ma.files)[:1]]
    for rel in rels:
        for f in pq.read_schema(lake.abspath(rel)):
            fields.setdefault(f.name, f.type)
    key_list = [k for k in keys]
    value_cols = [c for c in fields
                  if c not in keys and c not in exclude]
    out_schema = pa.schema(
        [(k, fields[k]) for k in key_list]
        + [("_change_type", pa.string())]
        + [(c, fields[c]) for c in value_cols])
    read_schema = pa.schema([(c, fields[c])
                             for c in (*key_list, *value_cols)])
    lake_dir = lake.lake_dir

    def diff(batch: pa.Table) -> pa.Table:
        import os

        outs = [out_schema.empty_table()]
        for row in batch.to_pylist():
            sides = []
            for rel in (row["old"], row["new"]):
                if rel:
                    path = os.path.join(lake_dir, rel)
                    have = set(pq.read_schema(path).names)
                    t = pq.read_table(
                        path,
                        columns=[c for c in read_schema.names
                                 if c in have] + ["_op"])
                    t = t.filter(pc.equal(t["_op"], "mutation"))
                    sides.append(_conform(t, read_schema))
                else:
                    sides.append(read_schema.empty_table())
            outs.append(_diff_pair(sides[0], sides[1],
                                   key_list, value_cols))
        return pa.concat_tables(outs)

    if not pairs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_items(pairs).map_batches(
        diff, batch_format="pyarrow", batch_size=1)


def write_changefeed(lake, seq: int,
                     keys: tuple[str, ...] = ("conv_id", "turn_idx"),
                     exclude: tuple[str, ...] = ("_op", "_seqno", "vb")
                     ) -> dict:
    """Persist commit ``seq``'s CHANGE FEED to
    ``<lake>/changefeed/seq=<seq>/`` as Parquet — the durable analogue
    of the reference PRODUCING each change to its Kafka topic
    (connector.go:103-123): downstream consumers read the feed files
    instead of recomputing diffs or rescanning the table. The first
    commit (no parent manifest) is the bootstrap feed: the full state
    as ``insert`` rows, exactly what a consumer starting from the
    topic's beginning would see.

    Idempotent and crash-safe: written to a tmp dir then atomically
    renamed; an existing feed dir is left untouched (returns
    ``{"skipped": True}``). Cost: O(changed buckets) like
    ``lake_diff``."""
    import os
    import shutil
    import uuid

    out_dir = os.path.join(lake.lake_dir, "changefeed", f"seq={seq}")
    if os.path.exists(out_dir):
        return {"seq": seq, "skipped": True}
    retained = {m.seq: m for m in lake.store.history()}
    if seq not in retained:
        raise ValueError(f"no manifest with seq={seq}")
    # Bootstrap ONLY the true first commit (parent is None). "Oldest
    # RETAINED" is not the same thing: after gc() prunes a commit's
    # parent, fabricating a full-state insert feed for it would corrupt
    # every incremental consumer downstream (ADVICE r4) — the real
    # delta is no longer derivable, so say so.
    if retained[seq].parent is None:
        ds = lake.read_at(seq)
        names = ds.schema().names

        def boot(t: pa.Table) -> pa.Table:
            cols = {k: t[k] for k in keys}
            cols["_change_type"] = pa.array(
                ["insert"] * t.num_rows, pa.string())
            for c in names:
                if c not in keys and c not in exclude:
                    cols[c] = t[c]
            return pa.table(cols)

        feed = ds.map_batches(boot, batch_format="pyarrow")
    else:
        # commits are consecutive integers (replay/compact set
        # seq = prev.seq + 1), so the parent manifest is exactly seq-1
        if (seq - 1) not in retained:
            raise ValueError(
                f"changefeed for seq={seq} can no longer be derived: its "
                f"parent manifest seq={seq - 1} was gc-ed (earliest "
                f"retained seq is {min(retained)}). Write feeds before "
                "pruning (PipelineBuilder.attach_changefeed persists one "
                "per commit); consumers must re-bootstrap from the lake "
                "state instead.")
        feed = lake_diff(lake, seq - 1, seq, keys=keys, exclude=exclude)
    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        os.makedirs(tmp, exist_ok=True)
        feed.write_parquet(tmp)
        import glob as _glob

        if not _glob.glob(os.path.join(tmp, "*.parquet")):
            # a NO-CHANGE commit (e.g. compact, idempotent re-replay)
            # has an empty feed, and Ray's write_parquet emits no file
            # for 0 rows — persist an explicit empty file so the feed's
            # existence and schema survive for consumers
            import pyarrow.parquet as _pq

            sch = feed.schema()
            sch = sch.base_schema if hasattr(sch, "base_schema") else sch
            _pq.write_table(sch.empty_table(),
                            os.path.join(tmp, "part-empty.parquet"))
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        os.rename(tmp, out_dir)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return {"seq": seq, "skipped": False, "dir": out_dir}


class ChangefeedGapError(ValueError):
    """A consumer asked for a feed range with missing commits (gc-ed
    before being written, or never written). Incremental application of
    a gapped feed silently diverges the consumer's mirror, so this is a
    hard error; the message names the earliest contiguous start.
    Recovery contract: re-bootstrap the mirror from the lake's state
    (``lake.read_current()`` / ``read_at``) and resume the feed from
    the seq you bootstrapped at — ``examples/incremental_sync.py``
    shows the pattern."""


def read_changefeed(lake, from_seq: int, to_seq: int):
    """Dataset of the persisted change feeds for commits in
    ``(from_seq, to_seq]`` — "the messages between two offsets".

    Commits are consecutive integers, so the range must be covered by a
    feed dir for EVERY seq in it; the persisted ``changefeed/`` tree
    itself is the log of record (feed dirs of gc-ed manifests remain
    readable). A consumer that fell behind a pruned/unwritten feed gets
    ``ChangefeedGapError`` — applying a partial range would silently
    corrupt its mirror — with the earliest contiguous start named;
    recover by re-bootstrapping from the lake state."""
    import glob
    import os
    import re

    import ray.data

    cur = lake.store.load_current()
    if cur is None:
        raise ValueError("lake has no committed manifest")
    if to_seq > cur.seq:
        raise ValueError(f"to_seq={to_seq} is beyond the lake's current "
                         f"commit (seq={cur.seq})")
    if from_seq >= to_seq:
        raise ValueError(f"no committed seqs in ({from_seq}, {to_seq}]")
    feed_root = os.path.join(lake.lake_dir, "changefeed")
    have: set[int] = set()
    if os.path.isdir(feed_root):
        for n in os.listdir(feed_root):
            m = re.fullmatch(r"seq=(\d+)", n)
            if m and os.path.isdir(os.path.join(feed_root, n)):
                have.add(int(m.group(1)))
    want = list(range(from_seq + 1, to_seq + 1))
    missing = [s for s in want if s not in have]
    if missing:
        # every feed ABOVE max(missing) exists, so that is the earliest
        # from_seq with contiguous coverage through to_seq
        raise ChangefeedGapError(
            f"persisted changefeed is missing seq={missing[0]} "
            f"({len(missing)} of {len(want)} commits in "
            f"({from_seq}, {to_seq}] absent — gc-ed or never written). "
            f"Earliest contiguous feed start is from_seq={max(missing)}; "
            f"a consumer at seq {from_seq} must re-bootstrap from the "
            "lake state (lake.read_current()/read_at) and resume the "
            "feed from there.")
    dirs = [os.path.join(feed_root, f"seq={s}") for s in want]
    files = [f for d in dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    # partitioning=None: the seq=N dir name must not hive-infer a
    # phantom `seq` column into the feed schema
    return ray.data.read_parquet(files, partitioning=None)
