"""As-of (backward) join — the temporal join Ray Data lacks natively.

For each left row (key, ts), attach the right row of the same key with
the greatest right.ts ≤ left.ts (SQL: ``ASOF LEFT JOIN r ON l.key =
r.key AND l.ts >= r.ts``). Left rows with no prior right row keep
nulls.

Scale shape: ONE coarse-partition exchange — both sides are tagged and
grouped by ``hash(key) % partitions`` (the verified-pairs-join
machinery), so all rows of one key co-locate; inside each partition the
match is a fully vectorized merge: one lexsort of the union by
(key, ts, side) with right-before-left at ties, then a segment-reset
cummax that forward-fills the last-seen right row index within each
key. No per-row Python, no per-key Python. Partitioning assumption:
one key's rows fit in a partition task (salt hot keys upstream if not).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import splitmix64


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              right_cols: dict[str, str], partitions: int = 64):
    """Backward as-of left join.

    ``right_cols`` maps right-side column → output name (e.g.
    ``{"ts": "click_ts", "value": "click_value"}``). Returns all left
    columns plus the renamed right columns (null where no right row of
    the same key has ts ≤ the left row's ts). Equal timestamps match
    (``>=``); among equal-ts right rows the last in (key, ts) order
    wins — emit only tie-invariant right columns if that matters."""
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_right = [(rc, name, right_types[rc]) for rc, name in right_cols.items()]

    union_fields = (
        [("_k", pa.int64()), ("_ts", pa.int64()), ("_side", pa.int8()),
         ("_pk", pa.int32())]
        + [(n, left_types[n]) for n in left_names]
        + [(f"_r_{name}", t) for _, name, t in out_right]
    )
    union_schema = pa.schema(union_fields)

    def _pk_of(k: np.ndarray) -> np.ndarray:
        return (splitmix64(k.view(np.uint64)) % np.uint64(partitions)).astype(np.int32)

    def tag_left(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t[ts_col], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = t.num_rows
        cols = {"_k": pa.array(k), "_ts": pa.array(ts),
                "_side": pa.array(np.ones(n, np.int8)),
                "_pk": pa.array(_pk_of(k))}
        for name in left_names:
            cols[name] = t[name]
        for _, name, typ in out_right:
            cols[f"_r_{name}"] = pa.nulls(n, typ)
        return pa.table(cols, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        k = t[key_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t[ts_col], pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = t.num_rows
        cols = {"_k": pa.array(k), "_ts": pa.array(ts),
                "_side": pa.array(np.zeros(n, np.int8)),
                "_pk": pa.array(_pk_of(k))}
        for name in left_names:
            cols[name] = pa.nulls(n, left_types[name])
        for rc, name, typ in out_right:
            cols[f"_r_{name}"] = t[rc].cast(typ)
        return pa.table(cols, schema=union_schema)

    def merge(group: pa.Table) -> pa.Table:
        k = group["_k"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        side = group["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        # right (side 0) BEFORE left (side 1) at equal (key, ts): the
        # join is inclusive (l.ts >= r.ts)
        order = np.lexsort((side, ts, k))
        ks, ss = k[order], side[order]
        is_right = ss == 0
        n = len(ks)
        # segment-reset cummax forward-fill of the last right row's
        # position: marker = seg_id * (n+1) + sorted_pos for right rows,
        # -1 otherwise; a cummax can then never leak across keys
        # (validity check: marker // (n+1) == seg_id)
        seg_start = np.r_[True, ks[1:] != ks[:-1]]
        seg_id = np.cumsum(seg_start.astype(np.int64)) - 1
        base = np.int64(n + 1)
        marker = np.where(is_right, seg_id * base + np.arange(n, dtype=np.int64), -1)
        filled = np.maximum.accumulate(marker)
        valid = (filled >= 0) & (filled // base == seg_id)
        right_sorted_pos = np.where(valid, filled % base, 0)

        left_mask = ~is_right
        left_orig = order[left_mask]                  # rows in group order
        match_valid = valid[left_mask]
        match_pos = right_sorted_pos[left_mask]       # position in sorted order
        right_orig = order[match_pos]                 # group-order row of the match

        out_cols = {}
        lt = group.select(left_names).take(pa.array(left_orig))
        for name in left_names:
            out_cols[name] = lt[name]
        # null-masked gather indices (mask=True ⇒ null row → null output)
        idx_arr = pa.array(right_orig.astype(np.int64), mask=~match_valid)
        for _, name, _t in out_right:
            out_cols[name] = group[f"_r_{name}"].take(idx_arr)
        return pa.table(out_cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby("_pk").map_groups(merge, batch_format="pyarrow")
