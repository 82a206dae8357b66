"""The user-extension Mapper stage and routing.

Mirrors the reference's single user transform
``type Mapper func(couchbase.Event) []message.KafkaMessage``
(/root/reference/mapper.go:8): a flat-map that may return 0..N output
rows per input row — returning an empty batch slice filters
(connector.go:98-101 acks-and-skips), returning >1 row per input fans
out (README.md:16), and rewriting columns projects.

Here a Mapper is a vectorized function ``pa.Table -> pa.Table`` applied
via ``map_batches(batch_format="pyarrow")`` — one call per Arrow batch,
zero-copy from the object store, instead of one call per event. A CDC
mapper must preserve the bookkeeping columns (vb, seqno, op, conv_id,
turn_idx) for the downstream merge; payload columns are free to change.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from dcpray.schema import OP_MUTATION

Mapper = Callable[[pa.Table], pa.Table]

#: columns a CDC mapper must keep for merge/checkpoint correctness
REQUIRED_CDC_COLUMNS = ("vb", "seqno", "op", "conv_id", "turn_idx")


def mark_filter_only(mapper: Mapper) -> Mapper:
    """Declare that a mapper only FILTERS rows (output keys ⊆ input
    keys; no fan-out, no key rewrites). Incremental shuffle-strategy
    runs may then keep copy-forward: the affected-bucket pre-pass —
    computed from the RAW delta's keys — is a safe superset of the
    mapper output's buckets. Mappers without this mark disable
    copy-forward on incremental runs (a flat-map may emit keys absent
    from the raw delta)."""
    mapper.filter_only = True
    return mapper


def identity_mapper(batch: pa.Table) -> pa.Table:
    """Default CDC mapper: pass everything through (tombstones included —
    the merge stage needs them to delete keys)."""
    return batch


def default_kafka_mapper(batch: pa.Table) -> pa.Table:
    """Parity with the reference's DefaultMapper
    (/root/reference/mapper.go:10-20): drop deletions/expirations, project
    key+value. Useful for export-style pipelines, NOT for lake upsert
    (it drops the tombstones the merge needs)."""
    return batch.filter(pc.equal(batch["op"], OP_MUTATION))


def validate_mapper_output(batch: pa.Table) -> pa.Table:
    missing = [c for c in REQUIRED_CDC_COLUMNS if c not in batch.schema.names]
    if missing:
        raise ValueError(
            f"mapper output dropped required CDC columns {missing}; "
            f"a CDC mapper must preserve {REQUIRED_CDC_COLUMNS}"
        )
    # mapper output runs AFTER the reject filter, so null keys here are
    # the MAPPER's doing — and the LWW merge treats every null-key row
    # as a distinct first row, so un-keyed junk would accumulate in the
    # lake that no later run could ever replace or delete (r5 review)
    for c in ("conv_id", "turn_idx"):
        n = batch[c].null_count
        if n:
            raise ValueError(
                f"mapper emitted {n} rows with null {c!r}; mapper output "
                "must carry non-null merge keys (filter such rows inside "
                "the mapper, or dead-letter them upstream)"
            )
    return batch


def apply_mapper(ds, mapper: Mapper | None, batch_size: int | None = 65536):
    """Attach the mapper stage to a Dataset (no-op for None/identity)."""
    if mapper is None or mapper is identity_mapper:
        return ds

    def _run(batch: pa.Table) -> pa.Table:
        return validate_mapper_output(mapper(batch))

    return ds.map_batches(_run, batch_format="pyarrow", batch_size=batch_size)


# ---- message headers (reference kafka/message/message.go:5-10) ----

HEADERS_COL = "headers"


def with_headers(batch: pa.Table, headers: dict) -> pa.Table:
    """Attach an explicit message-headers column — parity with
    ``KafkaMessage.Headers`` (``[]kafka.Header{Key, Value}``,
    /root/reference/kafka/message/message.go:5-10). The column is
    ``map<string, string>``; values may be Python-string constants or
    per-row string arrays. Headers ride the schema like any payload
    column: through the merge, schema unification, and into the lake
    (Parquet maps), so a consumer reads them back per row.

    Built vectorized: one tiled key array + one interleave-take over the
    value columns — no per-row Python."""
    import numpy as np

    n = batch.num_rows
    keys = sorted(headers)
    k = len(keys)
    if k == 0 or n == 0:
        return batch.append_column(
            HEADERS_COL,
            pa.array([[]] * n, pa.map_(pa.string(), pa.string())),
        )
    key_flat = pa.array(np.tile(np.array(keys, dtype=object), n), pa.string())
    cols = []
    for key in keys:
        v = headers[key]
        if isinstance(v, str):
            cols.append(pa.nulls(n, pa.string()).fill_null(v))
        else:
            # normalize FIRST (map_batches columns are ChunkedArrays),
            # cast after — so non-string per-row values (ints,
            # timestamps) stringify instead of failing the build
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            arr = v if isinstance(v, pa.Array) else pa.array(v)
            cols.append(arr.cast(pa.string()))
    stacked = pa.concat_arrays(cols)  # column-major, length k*n
    idx = (np.arange(n * k) % k) * n + (np.arange(n * k) // k)  # row-major
    items = stacked.take(pa.array(idx))
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * k, pa.int32())
    return batch.append_column(
        HEADERS_COL, pa.MapArray.from_arrays(offsets, key_flat, items)
    )


def header_value(batch: pa.Table, key: str) -> pa.Array:
    """Per-row value of one header key (null where absent) — the
    consumer-side accessor."""
    col = batch[HEADERS_COL]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.map_lookup(col, query_key=key, occurrence="first")


# ---- routing (reference topic router, connector.go:125-140) ----


def route_column(batch: pa.Table, mapping: dict[str, str], default: str | None = None) -> pa.Table:
    """Resolve each row's destination table from its collection — the
    analogue of collectionTopicMapping; unknown collection raises unless a
    default is given (the reference panics, connector.go:136-138)."""
    coll = batch["collection"].combine_chunks()
    uniq = pc.unique(coll).to_pylist()
    unknown = [c for c in uniq if c not in mapping]
    if unknown and default is None:
        raise KeyError(f"no table mapping for collections {unknown}")
    # vectorized resolve: index each row into the (tiny) unique list,
    # then one take from the resolved route array — no per-row Python
    route_of = pa.array([mapping.get(c, default) for c in uniq],
                        pa.string())
    idx = pc.index_in(coll, value_set=pa.array(uniq, coll.type))
    routes = route_of.take(idx) if uniq \
        else pa.nulls(batch.num_rows, pa.string())
    return batch.append_column("route", routes)


def split_by_route(ds, routes: list[str]):
    """One lazy Dataset per destination table (filter pushdown per route)."""
    out = {}
    for r in routes:
        out[r] = ds.map_batches(
            lambda t, _r=r: t.filter(pc.equal(t["route"], _r)),
            batch_format="pyarrow",
        )
    return out
