"""Last-writer-wins keyed merge — the core operator.

The table analogue of Kafka log compaction (latest-per-key retention),
which is the reference's only "reduce" and the destination of its whole
dataflow (/root/reference/kafka/client.go:235-275 compacted topics;
SURVEY §2 K2). Properties the implementation relies on:

- **Order-free**: winner per (conv_id, turn_idx) is the max-``seqno`` row
  — a commutative, associative reduce — so blocks may arrive in any
  order (Ray Data gives no cross-block ordering; WAL files are written
  out of seqno order on purpose, FIXTURES.md §3).
- **Pre-combine**: each Arrow batch is LWW-reduced locally inside
  ``map_batches`` before the shuffle (the "partial aggregation" rule —
  multi-version keys and hot-key version floods collapse to ≤1 row per
  key per block before any data moves).
- **One shuffle**: rows are hash-bucketed by the FULL key
  (conv_id, turn_idx) — the structurally-salted form; a hot conversation
  spreads over buckets (north-rule skew handling) — then
  ``groupby(bucket).map_groups`` co-locates each key exactly once.
- **Tombstones**: the winning row's op ∈ {deletion, expiration} removes
  the key (NewDeleteEvent/NewExpireEvent carry nil value,
  couchbase/event.go:24-56). Winning tombstones are PERSISTED in the
  bucket file (readers filter ``_op = 'mutation'``) so a late-arriving
  OLDER mutation of the key stays dead on replay; they are physically
  dropped only by ``compact()`` once every known WAL segment is
  processed — the table analogue of compacted-topic
  ``delete.retention.ms``. (Do NOT "optimize" the drop back into the
  merge: it silently resurrects deleted keys on out-of-order replays.)
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcpray.hashing import bucket_of, bucket_of_conv
from dcpray.schema import (
    BUCKET_COL,
    OP_LAKE_COL,
    OP_MUTATION,
    SEQNO_LAKE_COL,
)

#: columns that never flow into the merge shuffle (checkpoint/metrics only)
DROP_BEFORE_SHUFFLE = ("vb", "cas", "rev_no", "collection", "event_time")


def lww_filter(table: pa.Table) -> pa.Table:
    """Keep the max-seqno row per (conv_id, turn_idx). Fully vectorized:
    one Arrow sort + adjacent-equality mask (no per-key Python)."""
    n = table.num_rows
    if n <= 1:
        return table
    idx = pc.sort_indices(
        table,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("seqno", "descending"),
        ],
    )
    t = table.take(idx)
    conv = t["conv_id"].combine_chunks()
    turn = t["turn_idx"].combine_chunks()
    same = pc.and_(
        pc.equal(conv.slice(1), conv.slice(0, n - 1)),
        pc.equal(turn.slice(1), turn.slice(0, n - 1)),
    ).to_numpy(zero_copy_only=False)
    first = np.r_[True, ~same.astype(bool)]
    return t.filter(pa.array(first))


def normalize_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project/pad a batch to the canonical merge schema (Arrow schema
    unification: missing columns become nulls — schema evolution)."""
    cols = []
    for f in schema:
        if f.name in table.schema.names:
            col = table[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols], schema=schema)


def merge_schema_from(delta_schema: pa.Schema, base_schema: pa.Schema | None) -> pa.Schema:
    """Canonical shuffle schema: unified payload + (seqno, op, _bucket)."""
    lake_to_cdc = {SEQNO_LAKE_COL: "seqno", OP_LAKE_COL: "op"}
    fields: dict[str, pa.Field] = {}
    for sch in filter(None, [delta_schema, base_schema]):
        for f in sch:
            if f.name in DROP_BEFORE_SHUFFLE or f.name in (BUCKET_COL,):
                continue
            name = lake_to_cdc.get(f.name, f.name)
            if name == "seqno":
                f = pa.field("seqno", pa.uint64())
            elif name == "op":
                f = pa.field("op", pa.string())
            fields.setdefault(name, f)
    fields.setdefault("seqno", pa.field("seqno", pa.uint64()))
    fields.setdefault("op", pa.field("op", pa.string()))
    ordered = [fields[n] for n in fields]
    return pa.schema(ordered).append(pa.field(BUCKET_COL, pa.int32()))


def make_precombine(schema: pa.Schema, num_buckets: int, salted: bool = True):
    """map_batches stage: normalize → assign bucket → local LWW reduce."""
    payload_schema = pa.schema([f for f in schema if f.name != BUCKET_COL])

    lake_renames = {SEQNO_LAKE_COL: "seqno", OP_LAKE_COL: "op"}

    def _pre(batch: pa.Table) -> pa.Table:
        if SEQNO_LAKE_COL in batch.schema.names or OP_LAKE_COL in batch.schema.names:
            batch = batch.rename_columns(
                [lake_renames.get(c, c) for c in batch.schema.names]
            )
        t = normalize_to(batch, payload_schema)
        # committed lake files carry _seqno but no op: a materialized row
        # is by construction a live mutation at its recorded seqno
        i = t.schema.get_field_index("op")
        t = t.set_column(i, "op", pc.fill_null(t["op"], OP_MUTATION))
        i = t.schema.get_field_index("seqno")
        t = t.set_column(i, "seqno", pc.fill_null(t["seqno"], 0))
        if salted:
            b = bucket_of(t["conv_id"], t["turn_idx"], num_buckets)
        else:
            b = bucket_of_conv(t["conv_id"], num_buckets)
        t = t.append_column(BUCKET_COL, pa.array(b, type=pa.int32()))
        return lww_filter(t)

    return _pre


STATS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("tombstoned_keys", pa.int64()),
        ("path", pa.string()),
        ("bytes", pa.int64()),
    ]
)


def make_bucket_merger(lake_dir: str, run_id: str):
    """map_groups fn for ``groupby(_bucket)``: final LWW → drop tombstoned
    keys → stable (conv_id, turn_idx) order → write the bucket's Parquet
    file (tmp+rename, so task retries are idempotent) → emit a stats row.

    This stage is also the sink (the analogue of the producer flush,
    producer_batch.go:107-144): writing inside the merge task keeps the
    bucket's rows from crossing the object store one more time. The file
    becomes visible only when the manifest commits (exactly-once)."""
    data_rel = os.path.join("data", run_id)

    out_renames = {"seqno": SEQNO_LAKE_COL, "op": OP_LAKE_COL}

    def _merge(group: pa.Table) -> pa.Table:
        bucket = int(group[BUCKET_COL][0].as_py())
        rows_in = group.num_rows
        t = lww_filter(group)
        # winning tombstones are PERSISTED (as _op != mutation), not
        # dropped: an older mutation may still arrive in a later run
        # (WAL files interleave seqnos), and only the stored tombstone's
        # higher seqno keeps it dead. Readers filter _op == mutation;
        # a full compaction may GC tombstones once every older segment
        # is known processed (same rule as Kafka compacted-topic
        # tombstone retention).
        n_live = pc.sum(pc.equal(t["op"], OP_MUTATION)).as_py() or 0
        tombstoned = t.num_rows - n_live
        t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        t = t.rename_columns(
            [out_renames.get(c, c) for c in t.schema.names]
        ).drop_columns([BUCKET_COL])
        rel = os.path.join(data_rel, f"bucket-{bucket:05d}.parquet")
        path = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(t, tmp, row_group_size=65536)
        os.rename(tmp, path)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "rows_in": pa.array([rows_in], pa.int64()),
                "rows_out": pa.array([int(n_live)], pa.int64()),
                "tombstoned_keys": pa.array([int(tombstoned)], pa.int64()),
                "path": pa.array([rel], pa.string()),
                "bytes": pa.array([os.path.getsize(path)], pa.int64()),
            },
            schema=STATS_SCHEMA,
        )

    return _merge
