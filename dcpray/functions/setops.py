"""Distributed SQL set operations: INTERSECT / EXCEPT / UNION (all
DISTINCT variants — the reference has no set ops at all, SURVEY §2
"negative space"; these close it for relational-breadth pipelines like
train/holdout membership checks).

Scale shape (shared): each side is collapsed to per-batch DISTINCT rows
FIRST (an Arrow group_by with no aggregates — O(batch) work, output
bounded by distinct keys per batch), tagged with a side marker, then
ONE coarse exchange on the row hash co-locates equal rows; membership
is decided per partition by a vectorized min/max over the side marker.
Rows moved: O(per-batch-distinct), never O(input). SQL null semantics
(NULLs compare EQUAL in set ops, unlike joins) fall out of Arrow's
group_by treating null as a regular group and ``_hash_key_columns``
mixing validity into the hash.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.functions.agg import _hash_key_columns

__all__ = ["intersect_distinct", "except_distinct", "union_distinct"]


def _tagged_distinct(ds, cols: list[str], side: int):
    def f(t: pa.Table) -> pa.Table:
        d = t.select(cols).group_by(cols, use_threads=False).aggregate([])
        return d.append_column(
            "_side", pa.array(np.full(d.num_rows, side, np.int8)))

    return ds.map_batches(f, batch_format="pyarrow")


def _set_op(a_ds, b_ds, cols: list[str], keep, partitions: int):
    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_hash_key_columns(t, cols)
              % np.uint64(partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    both = _tagged_distinct(a_ds, cols, 0).union(
        _tagged_distinct(b_ds, cols, 1))

    def combine(g: pa.Table) -> pa.Table:
        m = (g.drop_columns(["_pk"])
             .group_by(cols, use_threads=False)
             .aggregate([("_side", "min"), ("_side", "max")]))
        return m.filter(keep(m["_side_min"], m["_side_max"])) \
                .select(cols)

    return (both.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(combine, batch_format="pyarrow"))


def intersect_distinct(a_ds, b_ds, cols: list[str], partitions: int = 64):
    """``a INTERSECT b``: distinct rows of ``cols`` present in BOTH
    inputs (SQL INTERSECT DISTINCT, NULLs compare equal)."""
    return _set_op(a_ds, b_ds, cols,
                   lambda lo, hi: pc.and_(pc.equal(lo, 0), pc.equal(hi, 1)),
                   partitions)


def except_distinct(a_ds, b_ds, cols: list[str], partitions: int = 64):
    """``a EXCEPT b``: distinct rows of ``cols`` in ``a`` and NOT in
    ``b`` (SQL EXCEPT DISTINCT, NULLs compare equal)."""
    return _set_op(a_ds, b_ds, cols,
                   lambda lo, hi: pc.equal(hi, 0), partitions)


def union_distinct(a_ds, b_ds, cols: list[str], partitions: int = 64):
    """``a UNION b`` (DISTINCT): every distinct row of either input —
    no side bookkeeping (unlike intersect/except, membership is
    irrelevant), just per-batch distinct → one exchange → per-partition
    distinct."""
    def distinct(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols, use_threads=False).aggregate([])

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_hash_key_columns(t, cols)
              % np.uint64(partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    both = a_ds.map_batches(distinct, batch_format="pyarrow").union(
        b_ds.map_batches(distinct, batch_format="pyarrow"))
    return (both.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(lambda g: distinct(g.drop_columns(["_pk"])),
                        batch_format="pyarrow"))
