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

SQL null semantics: right rows with a null key or ts are dropped (they
can never match); left rows with a null key or ts are emitted with null
right columns (LEFT join) but never match anything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import splitmix64

_UNIT_RANK = {"s": 0, "ms": 1, "us": 2, "ns": 3}
_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
_TS_SENTINEL = np.int64(np.iinfo(np.int64).min)


def _common_ts_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType | None:
    """The type both ts columns are cast to before the int64 compare —
    comparing raw int64 views of DIFFERENT timestamp units would
    silently mis-join (ns values dwarf us values). Returns None for
    numeric (non-timestamp) columns, which compare directly."""
    lts, rts = pa.types.is_timestamp(lt), pa.types.is_timestamp(rt)
    if lts != rts:
        raise TypeError(f"as-of ts columns disagree: {lt} vs {rt}")
    if not lts:
        return None
    if getattr(lt, "tz", None) != getattr(rt, "tz", None):
        raise TypeError(f"as-of ts timezones disagree: {lt} vs {rt}")
    finer = lt if _UNIT_RANK[lt.unit] >= _UNIT_RANK[rt.unit] else rt
    return finer


def _key_ts_arrays(t: pa.Table, key_col: str, ts_col: str,
                   ts_common) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(key, ts, valid) — null-free int64 arrays plus the validity
    mask. Nulls are FILLED before to_numpy (a nullable int64 decodes
    through float64 and corrupts large ids) and handled via the mask,
    never via sentinel collisions."""
    valid = pc.and_(pc.is_valid(t[key_col]), pc.is_valid(t[ts_col])) \
        .to_numpy(zero_copy_only=False)
    k = pc.fill_null(pc.cast(t[key_col], pa.int64()), 0) \
        .combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    ts_col_v = t[ts_col]
    if ts_common is not None:
        ts_col_v = pc.cast(ts_col_v, ts_common)
    ts = pc.fill_null(pc.cast(ts_col_v, pa.int64()), int(_TS_SENTINEL)) \
        .combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    return k, ts, valid


def _asof_merge_arrays(k: np.ndarray, ts: np.ndarray, side: np.ndarray,
                       ok: np.ndarray):
    """The vectorized as-of merge core over a tagged union of rows
    (side 0 = right, 1 = left): one lexsort by (key, ts, side) with
    right-before-left at ties (inclusive ``>=``), then a segment-reset
    cummax forward-fill of the last-seen right row position — marker =
    seg_id * (n+1) + sorted_pos for right rows, -1 otherwise, so a
    cummax can never leak across key segments (validity check:
    marker // (n+1) == seg_id). Returns (left_row_indices,
    matched_right_row_indices, match_valid) in the INPUT arrays' row
    numbering."""
    order = np.lexsort((side, ts, k))
    ks, ss = k[order], side[order]
    is_right = ss == 0
    n = len(ks)
    seg_start = np.r_[True, ks[1:] != ks[:-1]]
    seg_id = np.cumsum(seg_start.astype(np.int64)) - 1
    base = np.int64(n + 1)
    marker = np.where(is_right, seg_id * base + np.arange(n, dtype=np.int64), -1)
    filled = np.maximum.accumulate(marker)
    valid = (filled >= 0) & (filled // base == seg_id)
    right_sorted_pos = np.where(valid, filled % base, 0)

    left_mask = ~is_right
    left_orig = order[left_mask]
    # a null-key/ts left row is emitted but never matches
    match_valid = valid[left_mask] & ok[left_orig]
    right_orig = order[right_sorted_pos[left_mask]]
    return left_orig, right_orig, match_valid


def _plan_temporal_join(left_ds, right_ds, key_col: str, ts_col: str,
                        right_cols: dict[str, str], partitions: int,
                        drop_invalid_left: bool, negate_ts: bool = False):
    """Shared front half of the temporal joins: resolve schemas and the
    common ts type, and build the tagged union Dataset both sides feed
    into one coarse-partition exchange. ``drop_invalid_left`` picks the
    null semantics — inner joins drop null-key/ts left rows up front
    (and carry no ``_ok`` column at all); left joins keep them with
    ``_ok`` = 0 so the merge emits them unmatched. Returns
    (tagged_ds, left_names, out_right, ts_common)."""
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_ds.schema().names, right_ds.schema().types))
    out_right = [(rc, name, right_types[rc]) for rc, name in right_cols.items()]
    ts_common = _common_ts_type(left_types[ts_col], right_types[ts_col])

    with_ok = not drop_invalid_left
    union_fields = (
        [("_k", pa.int64()), ("_ts", pa.int64()), ("_side", pa.int8())]
        + ([("_ok", pa.int8())] if with_ok else [])
        + [("_pk", pa.int32())]
        + [(n, left_types[n]) for n in left_names]
        + [(f"_r_{name}", t) for _, name, t in out_right]
    )
    union_schema = pa.schema(union_fields)

    def _pk_of(k: np.ndarray) -> np.ndarray:
        return (splitmix64(k.view(np.uint64)) % np.uint64(partitions)).astype(np.int32)

    def tag_left(t: pa.Table) -> pa.Table:
        k, ts, valid = _key_ts_arrays(t, key_col, ts_col, ts_common)
        if negate_ts:  # forward as-of = backward on -ts, done in-tag
            ts = -ts
        if drop_invalid_left:
            t = t.filter(pa.array(valid))
            k, ts = k[valid], ts[valid]
        n = t.num_rows
        cols = {"_k": pa.array(k), "_ts": pa.array(ts),
                "_side": pa.array(np.ones(n, np.int8))}
        if with_ok:
            cols["_ok"] = pa.array(valid.astype(np.int8))
        cols["_pk"] = pa.array(_pk_of(k))
        for name in left_names:
            cols[name] = t[name]
        for _, name, typ in out_right:
            cols[f"_r_{name}"] = pa.nulls(n, typ)
        return pa.table(cols, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        k, ts, valid = _key_ts_arrays(t, key_col, ts_col, ts_common)
        if negate_ts:
            ts = -ts
        # null key/ts right rows can never match: drop them here
        t = t.filter(pa.array(valid))
        k, ts = k[valid], ts[valid]
        n = t.num_rows
        cols = {"_k": pa.array(k), "_ts": pa.array(ts),
                "_side": pa.array(np.zeros(n, np.int8))}
        if with_ok:
            cols["_ok"] = pa.array(np.ones(n, np.int8))
        cols["_pk"] = pa.array(_pk_of(k))
        for name in left_names:
            cols[name] = pa.nulls(n, left_types[name])
        for rc, name, typ in out_right:
            cols[f"_r_{name}"] = t[rc].cast(typ)
        return pa.table(cols, schema=union_schema)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged, left_names, out_right, ts_common


def asof_join(left_ds, right_ds, key_col: str, ts_col: str,
              right_cols: dict[str, str], partitions: int = 64,
              direction: str = "backward"):
    """As-of left join — ``direction="backward"`` (default) matches
    each left row with the LATEST same-key right row at
    ``right.ts <= left.ts``; ``"forward"`` with the EARLIEST at
    ``right.ts >= left.ts`` (implemented by negating the internal
    int64 timestamp, which reduces forward to the same vectorized
    segment-cummax merge — zero extra machinery).

    ``right_cols`` maps right-side column → output name (e.g.
    ``{"ts": "click_ts", "value": "click_value"}``). Returns all left
    columns plus the renamed right columns (null where no right row
    qualifies). Equal timestamps match in BOTH directions; among
    equal-ts right rows the last in (key, ts) order wins — emit only
    tie-invariant right columns if that matters."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}")
    tagged, left_names, out_right, _ = _plan_temporal_join(
        left_ds, right_ds, key_col, ts_col, right_cols, partitions,
        drop_invalid_left=False, negate_ts=(direction == "forward"),
    )

    def merge(group: pa.Table) -> pa.Table:
        k = group["_k"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        side = group["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        ok = group["_ok"].combine_chunks().to_numpy(zero_copy_only=False) != 0
        left_orig, right_orig, match_valid = _asof_merge_arrays(k, ts, side, ok)

        out_cols = {}
        lt = group.select(left_names).take(pa.array(left_orig))
        for name in left_names:
            out_cols[name] = lt[name]
        # null-masked gather indices (mask=True ⇒ null row → null output)
        idx_arr = pa.array(right_orig.astype(np.int64), mask=~match_valid)
        for _, name, _t in out_right:
            out_cols[name] = group[f"_r_{name}"].take(idx_arr)
        return pa.table(out_cols)

    return tagged.groupby("_pk").map_groups(merge, batch_format="pyarrow")


def asof_join_broadcast(left_ds, right, key_col: str, ts_col: str,
                        right_cols: dict[str, str]):
    """Backward as-of left join against a SMALL right side with ZERO
    exchange: the right table (a ``pa.Table`` or a small Dataset) is
    key/ts-sorted once on the driver and broadcast via ``ray.put``;
    every left batch then merges locally — the left side streams
    straight through ``map_batches``, nothing shuffles, and output rows
    keep their batch order. This is the dimension-lookup scale path
    (prices, configs, snapshots as-of an event time); right-side bound
    is the worker heap (O(rows × cols) once per node, zero-copy reads).
    Same semantics as ``asof_join`` (inclusive ``>=``, SQL null
    handling)."""
    import ray

    if not isinstance(right, pa.Table):
        right = pa.concat_tables(
            list(right.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
    left_schema = left_ds.schema()
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right.schema.names, right.schema.types))
    out_right = [(rc, name, right_types[rc]) for rc, name in right_cols.items()]
    ts_common = _common_ts_type(left_types[ts_col], right_types[ts_col])

    rk, rts, rvalid = _key_ts_arrays(right, key_col, ts_col, ts_common)
    keep = np.flatnonzero(rvalid)           # null right rows never match
    order = np.lexsort((rts[keep], rk[keep]))
    sel = keep[order]
    r_payload = right.select([rc for rc, _, _ in out_right]) \
        .take(pa.array(sel)).rename_columns([name for _, name, _ in out_right])
    ref = ray.put({"k": np.ascontiguousarray(rk[sel]),
                   "ts": np.ascontiguousarray(rts[sel]),
                   "payload": r_payload})

    def match(batch: pa.Table, rref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        r = worker_memo(("asof_right", rref.hex()), lambda: __import__("ray").get(rref))
        rk, rts = r["k"], r["ts"]
        lk, lts, lok = _key_ts_arrays(batch, key_col, ts_col, ts_common)
        nb = len(lk)
        if nb == 0:
            out_cols = {name: batch[name] for name in batch.schema.names}
            for _, name, typ in out_right:
                out_cols[name] = pa.nulls(0, typ)
            return pa.table(out_cols)
        # restrict the merge to right rows under keys PRESENT in this
        # batch: per-batch cost is O((T + B) log) with T = touched right
        # rows, INDEPENDENT of the total right size — never a re-sort of
        # the whole broadcast side per batch
        bo = np.lexsort((lts, lk))
        lk_s = lk[bo]
        run_start = np.r_[True, lk_s[1:] != lk_s[:-1]] if nb else \
            np.empty(0, bool)
        uk = lk_s[np.flatnonzero(run_start)] if nb else np.empty(0, np.int64)
        lo = np.searchsorted(rk, uk, "left")
        hi = np.searchsorted(rk, uk, "right")
        sizes = (hi - lo).astype(np.int64)
        T = int(sizes.sum())
        roff = np.cumsum(sizes) - sizes
        touched = (np.repeat(lo - roff, sizes)
                   + np.arange(T, dtype=np.int64)) if T else np.empty(0, np.int64)
        # dense run ids replace the key in the merge (both sides sorted)
        rid_right = np.repeat(np.arange(len(uk), dtype=np.int64), sizes)
        rid_left = (np.cumsum(run_start.astype(np.int64)) - 1) if nb else \
            np.empty(0, np.int64)
        k2 = np.concatenate([rid_right, rid_left])
        ts2 = np.concatenate([rts[touched], lts[bo]])
        side2 = np.r_[np.zeros(T, np.int8), np.ones(nb, np.int8)]
        ok2 = np.r_[np.ones(T, bool), lok[bo]]
        left_pos, right_pos, valid = _asof_merge_arrays(k2, ts2, side2, ok2)
        batch_rows = bo[left_pos - T]           # original batch row ids
        right_rows = touched[np.where(valid, right_pos, 0)] if T else \
            np.zeros(nb, np.int64)
        inv = np.argsort(batch_rows)            # restore batch row order
        idx_arr = pa.array(right_rows[inv].astype(np.int64), mask=~valid[inv])
        out_cols = {name: batch[name] for name in batch.schema.names}
        for _, name, _t in out_right:
            out_cols[name] = r["payload"][name].take(idx_arr)
        return pa.table(out_cols)

    return left_ds.map_batches(match, fn_args=(ref,), batch_format="pyarrow")


def _range_match_arrays(rk_s: np.ndarray, rt_s: np.ndarray, lk: np.ndarray,
                        lt: np.ndarray, window: np.int64):
    """The vectorized trailing-window match core. Rights must be sorted
    by (key, ts); lefts are in arbitrary order. Returns
    (left_pos_repeat, right_sorted_pos): one entry per matched pair,
    with ``left_pos_repeat`` indexing the left arrays and
    ``right_sorted_pos`` indexing the SORTED right arrays. Mechanism:
    union of sorted rights + two bound-markers per left, markers AFTER
    rights at equal (key, ts) — cumcount(right) at marker position =
    #rights with (k, ts) <= marker, giving the exclusive lower (> t-w)
    and inclusive upper (<= t) bounds in one lexsort; the pair list is
    a ragged expansion of those ranges. SATURATING lower bound: lt near
    int64.min would otherwise wrap positive; an underflowed bound means
    "-infinity" and its marker sorts BEFORE rights at the saturated
    value (side -1)."""
    nr, nl = len(rk_s), len(lk)
    uk = np.concatenate([rk_s, lk, lk])
    underflow = lt < _TS_SENTINEL + window
    lower = np.maximum(lt, _TS_SENTINEL + window) - window
    uts = np.concatenate([rt_s, lower, lt])
    lower_side = np.where(underflow, np.int8(-1), np.int8(1))
    uside = np.concatenate([np.zeros(nr, np.int8), lower_side,
                            np.ones(nl, np.int8)])
    order = np.lexsort((uside, uts, uk))
    cum = np.cumsum((uside[order] == 0).astype(np.int64))
    pos_of = np.empty(len(order), np.int64)
    pos_of[order] = np.arange(len(order))
    lo = cum[pos_of[nr : nr + nl]]           # rights <= (k, t-w)
    hi = cum[pos_of[nr + nl :]]              # rights <= (k, t)
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    coff = np.cumsum(counts) - counts
    right_sorted_pos = np.repeat(lo - coff, counts) \
        + np.arange(total, dtype=np.int64)
    left_pos = np.repeat(np.arange(nl, dtype=np.int64), counts)
    return left_pos, right_sorted_pos


def range_join(left_ds, right_ds, key_col: str, ts_col: str,
               right_cols: dict[str, str], window_s: float,
               partitions: int = 64):
    """Trailing-window range join (inner): for each left row (key, ts),
    emit ONE OUTPUT ROW PER right row of the same key with
    ``ts - window < right.ts <= ts`` (SQL: ``JOIN r ON l.key = r.key
    AND r.ts > l.ts - INTERVAL w AND r.ts <= l.ts``). Output
    cardinality is the true match count — budget for fan-out on dense
    windows.

    Scale shape: the same single coarse-partition exchange as
    ``asof_join``; inside each partition the window bounds resolve with
    ONE lexsort over rights + two bound-markers per left row — the
    cumulative right count at each marker IS the row's 0-based range in
    the partition's (key, ts)-sorted right array (rows between a left
    row's two markers share its key by construction), and the pair list
    is a vectorized ragged expansion of those ranges. Null keys/ts on
    either side produce no matches (inner-join SQL semantics: invalid
    rows are dropped up front, so no ``_ok`` column rides the
    exchange)."""
    if not window_s > 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    tagged, left_names, out_right, ts_common = _plan_temporal_join(
        left_ds, right_ds, key_col, ts_col, right_cols, partitions,
        drop_invalid_left=True,
    )
    import math

    # CEILING, not round: for integer timestamps the exclusive bound
    # r.ts > l.ts - w excludes ts <= floor(l.ts - w) = l.ts - ceil(w),
    # so a fractional (or sub-resolution) window must round UP — round()
    # would silently collapse window_s=0.5 at second resolution to an
    # empty join. The 1e-9 guard absorbs float dust (0.1*1e9 etc).
    unit = _UNIT_PER_S[ts_common.unit] if ts_common is not None else 1
    window = np.int64(math.ceil(window_s * unit - 1e-9))

    def merge(group: pa.Table) -> pa.Table:
        k = group["_k"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = group["_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        side = group["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        is_right = side == 0
        r_rows = np.flatnonzero(is_right)
        l_rows = np.flatnonzero(~is_right)
        nr, nl = len(r_rows), len(l_rows)
        empty = {**{n: group[n].take(pa.array(np.empty(0, np.int64)))
                    for n in left_names},
                 **{name: group[f"_r_{name}"].take(pa.array(np.empty(0, np.int64)))
                    for _, name, _t in out_right}}
        if nr == 0 or nl == 0:
            return pa.table(empty)
        rk, rt = k[r_rows], ts[r_rows]
        r_order = np.lexsort((rt, rk))
        rk_s, rt_s = rk[r_order], rt[r_order]
        lk, lt = k[l_rows], ts[l_rows]
        left_pos, ridx_sorted = _range_match_arrays(rk_s, rt_s, lk, lt, window)
        if len(left_pos) == 0:
            return pa.table(empty)
        pair_left = l_rows[left_pos]
        pair_right = r_rows[r_order[ridx_sorted]]
        out_cols = {}
        lt_tab = group.select(left_names).take(pa.array(pair_left))
        for name in left_names:
            out_cols[name] = lt_tab[name]
        for _, name, _t in out_right:
            out_cols[name] = group[f"_r_{name}"].take(pa.array(pair_right))
        return pa.table(out_cols)

    return tagged.groupby("_pk").map_groups(merge, batch_format="pyarrow")


def range_join_broadcast(left_ds, right, key_col: str, ts_col: str,
                         right_cols: dict[str, str], window_s: float):
    """Trailing-window range join (inner) against a SMALL right side
    with ZERO exchange — the dimension-lookup form of ``range_join``,
    mirroring ``asof_join_broadcast``: the right table (``pa.Table`` or
    small Dataset) is (key, ts)-sorted once on the driver and broadcast
    via ``ray.put``; every left batch matches locally and the left side
    streams straight through ``map_batches``. Per-batch cost is
    O((T + B) log) with T = right rows under keys PRESENT in the batch
    — INDEPENDENT of total right size. Same semantics as ``range_join``
    (``t - w < r.ts <= t``, inner-join null handling, ceil'd fractional
    windows); output rows are ordered by (batch row, right row)."""
    import math

    import ray

    if not window_s > 0:
        raise ValueError(f"window_s must be positive, got {window_s}")
    if not isinstance(right, pa.Table):
        right = pa.concat_tables(
            list(right.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
    left_schema = left_ds.schema()
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right.schema.names, right.schema.types))
    out_right = [(rc, name, right_types[rc]) for rc, name in right_cols.items()]
    ts_common = _common_ts_type(left_types[ts_col], right_types[ts_col])
    unit = _UNIT_PER_S[ts_common.unit] if ts_common is not None else 1
    window = np.int64(math.ceil(window_s * unit - 1e-9))

    rk, rts, rvalid = _key_ts_arrays(right, key_col, ts_col, ts_common)
    keep = np.flatnonzero(rvalid)           # null right rows never match
    order = np.lexsort((rts[keep], rk[keep]))
    sel = keep[order]
    r_payload = right.select([rc for rc, _, _ in out_right]) \
        .take(pa.array(sel)).rename_columns([name for _, name, _ in out_right])
    ref = ray.put({"k": np.ascontiguousarray(rk[sel]),
                   "ts": np.ascontiguousarray(rts[sel]),
                   "payload": r_payload})

    def match(batch: pa.Table, rref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        r = worker_memo(("range_right", rref.hex()),
                        lambda: __import__("ray").get(rref))
        lk, lts, lok = _key_ts_arrays(batch, key_col, ts_col, ts_common)
        valid_rows = np.flatnonzero(lok)    # inner join: invalid lefts drop
        lk2, lt2 = lk[valid_rows], lts[valid_rows]
        nb = len(lk2)

        def emptied() -> pa.Table:
            zero = pa.array(np.empty(0, np.int64))
            cols = {name: batch[name].take(zero)
                    for name in batch.schema.names}
            for _, name, _t in out_right:
                cols[name] = r["payload"][name].take(zero)
            return pa.table(cols)

        if nb == 0 or len(r["k"]) == 0:
            return emptied()
        # restrict to right rows under keys PRESENT in this batch (same
        # machinery as asof_join_broadcast): dense run ids replace the
        # key, so the match core never touches the full right side
        bo = np.lexsort((lt2, lk2))
        lk_s = lk2[bo]
        run_start = np.r_[True, lk_s[1:] != lk_s[:-1]]
        uk = lk_s[np.flatnonzero(run_start)]
        lo = np.searchsorted(r["k"], uk, "left")
        hi = np.searchsorted(r["k"], uk, "right")
        sizes = (hi - lo).astype(np.int64)
        T = int(sizes.sum())
        if T == 0:
            return emptied()
        roff = np.cumsum(sizes) - sizes
        touched = np.repeat(lo - roff, sizes) + np.arange(T, dtype=np.int64)
        rid_right = np.repeat(np.arange(len(uk), dtype=np.int64), sizes)
        rid_left = np.cumsum(run_start.astype(np.int64)) - 1
        left_pos, ridx = _range_match_arrays(
            rid_right, r["ts"][touched], rid_left, lt2[bo], window)
        if len(left_pos) == 0:
            return emptied()
        batch_rows = valid_rows[bo[left_pos]]
        right_rows = touched[ridx]
        ord2 = np.lexsort((right_rows, batch_rows))  # deterministic order
        batch_rows, right_rows = batch_rows[ord2], right_rows[ord2]
        out_cols = {name: batch[name].take(pa.array(batch_rows))
                    for name in batch.schema.names}
        for _, name, _t in out_right:
            out_cols[name] = r["payload"][name].take(pa.array(right_rows))
        return pa.table(out_cols)

    return left_ds.map_batches(match, fn_args=(ref,), batch_format="pyarrow")


# ------------------------------------------------------- broadcast equi-join


def broadcast_join(left_ds, right, on: str | list[str],
                   right_on: str | list[str] | None = None,
                   right_cols: dict[str, str] | None = None,
                   how: str = "inner"):
    """Hash equi-join against a SMALL right side with ZERO exchange —
    the dimension-enrichment join of star-schema pipelines (orders ⋈
    customer ⋈ nation), and the engine's answer to "never shuffle the
    fact table to join a lookup".

    The right side (``pa.Table`` or small Dataset) is collected ONCE on
    the driver, pruned to join keys + requested payload columns,
    broadcast via ``ray.put``, and memoized per worker process; every
    left batch then runs one Acero hash join locally
    (``pa.Table.join``), so the big side streams straight through
    ``map_batches``. Right-side bound is the worker heap — use the
    coarse-partition machinery instead when the right side is not a
    lookup table.

    ``how`` is ``"inner"``, ``"left"`` (SQL LEFT OUTER), ``"semi"``
    (EXISTS — left rows with a match, left columns only) or ``"anti"``
    (NOT EXISTS — left rows without one; null-key left rows are KEPT,
    matching SQL NOT EXISTS, same convention as ``hash_join``). Null
    join keys otherwise never match (inner/semi drop them, left emits
    null payload). For semi/anti the broadcast is the right side's
    DISTINCT keys only — the cheapest possible membership filter.
    ``right_cols`` maps right column → output name and defaults to
    every non-key right column under its own name; a name colliding
    with a left column raises.
    """
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner'/'left'/'semi'/'anti', got {how!r}")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("on/right_on length mismatch")
    if not isinstance(right, pa.Table):
        right = pa.concat_tables(
            list(right.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
    if how in ("semi", "anti"):
        right_cols = {}
        right = pa.TableGroupBy(right.select(rkeys), rkeys).aggregate([])
    if right_cols is None:
        right_cols = {c: c for c in right.schema.names if c not in rkeys}
    left_names = set(left_ds.schema().names)
    for rc, name in right_cols.items():
        if name in left_names:
            raise ValueError(
                f"right column {rc!r} -> {name!r} collides with a left "
                "column; rename via right_cols")
    payload = right.select(rkeys + list(right_cols)).rename_columns(
        rkeys + [right_cols[c] for c in right_cols])
    # pre-combine so every worker joins against contiguous buffers
    ref = ray.put(payload.combine_chunks())
    join_type = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]

    def match(batch: pa.Table, rref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        r = worker_memo(("bjoin", rref.hex()),
                        lambda: __import__("ray").get(rref))
        return batch.join(r, keys=lkeys, right_keys=rkeys,
                          join_type=join_type)

    return left_ds.map_batches(match, fn_args=(ref,), batch_format="pyarrow")


# ------------------------------------------------- distributed hash equi-join


_HOW_TO_ACERO = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _bloom_positions(h: np.ndarray, nbits: int):
    """Three derived probe positions per uint64 key hash (double
    hashing: h1 + i·h2 mod nbits, nbits a power of two)."""
    h2 = splitmix64(h)
    mask = np.uint64(nbits - 1)
    return (h & mask, (h + h2) & mask, (h + h2 + h2) & mask)


def build_key_bloom(ds, keys: list[str], nbits: int = 1 << 23,
                    cast_types: dict | None = None) -> np.ndarray:
    """One streaming pass over ``ds`` building a Bloom bitset of its
    (non-null) join-key hashes: each batch emits a packed
    ``nbits/8``-byte partial bitmap, OR-reduced on the driver —
    driver memory is the FIXED bitmap size, never the key count.
    k=3 probes ⇒ false-positive rate ≈ (n/nbits)³·ish; size ``nbits``
    to ≳ 8× the expected distinct-key count."""
    from dcpray.functions.agg import _hash_key_columns

    if nbits & (nbits - 1):
        raise ValueError("nbits must be a power of two")
    nbytes = nbits // 8

    def partial(t: pa.Table) -> pa.Table:
        sel = t
        if cast_types:
            sel = pa.table({ln: t[rn].cast(ty)
                            for ln, (rn, ty) in cast_types.items()})
            use_keys = list(cast_types)
        else:
            use_keys = keys
        m = pc.is_valid(sel[use_keys[0]])
        for k in use_keys[1:]:
            m = pc.and_(m, pc.is_valid(sel[k]))
        sel = sel.filter(m)
        h = _hash_key_columns(sel, use_keys)
        bits = np.zeros(nbits, bool)
        for pos in _bloom_positions(h, nbits):
            bits[pos.astype(np.int64)] = True
        return pa.table({"bm": pa.array([np.packbits(bits).tobytes()],
                                        pa.binary())})

    acc = np.zeros(nbytes, np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in b["bm"].to_pylist():
            acc |= np.frombuffer(blob, np.uint8)
    return acc


#: logical-plan leaves whose re-execution is just a (pruned) file or
#: in-memory scan — safe to consume multiple times without pinning
_CHEAP_RESCAN_OPS = {"Read", "InputData", "FromArrow", "FromItems",
                     "FromPandas", "FromNumpy"}
#: pass-through ops that keep a rescan cheap AND deterministic (column
#: pruning). Limit is deliberately NOT here: with preserve_order unset,
#: limit over a multi-block read may keep a DIFFERENT row subset on
#: each lineage re-execution — a multi-consumer re-scan would then
#: split hot/cold over different rows than the count pass saw, so a
#: limited input must be materialized.
_TRANSPARENT_OPS = {"Project"}


def _is_cheap_rescan(ds) -> bool:
    """True when ``ds`` is a bare (possibly projected) read or an
    already-materialized dataset — multi-consumer lineage re-execution
    costs only the scan. Conservatively False when the plan can't be
    inspected (unknown Ray version internals ⇒ materialize)."""
    try:
        node = ds._logical_plan.dag
        while (type(node).__name__ in _TRANSPARENT_OPS
               and len(node.input_dependencies) == 1):
            node = node.input_dependencies[0]
        return (type(node).__name__ in _CHEAP_RESCAN_OPS
                and not node.input_dependencies)
    except Exception:
        return False


def _bloom_contains(bloom: np.ndarray, h: np.ndarray, nbits: int) -> np.ndarray:
    ok = np.ones(len(h), bool)
    for pos in _bloom_positions(h, nbits):
        p = pos.astype(np.int64)
        ok &= (bloom[p >> 3] >> (7 - (p & 7).astype(np.uint8))) & 1 == 1
    return ok


def hash_join(left_ds, right_ds, on: str | list[str],
              right_on: str | list[str] | None = None,
              right_cols: dict[str, str] | None = None,
              how: str = "inner", partitions: int = 64,
              bloom_prefilter: bool = False, bloom_bits: int = 1 << 23):
    """Large×large distributed equi-join — the general shuffle join for
    when NEITHER side fits a broadcast (fact ⋈ fact; `broadcast_join`
    is the zero-exchange path for dimension lookups).

    Scale shape: ONE coarse-partition exchange. Both sides are tagged
    with ``hash(keys) % partitions`` (the same multi-column key hash
    every coarse operator shares) and unioned; each partition then runs
    ONE local Acero hash join over its co-located slice — Python once
    per partition, the join kernel itself vectorized C++. The exchange
    moves each side exactly once; for ``how="inner"`` null-key rows of
    both sides are dropped BEFORE the exchange (they can never match),
    and for semi/anti joins the right side ships only its key columns.
    Partitioning assumption: one key's rows from both sides fit in one
    partition task — the usual coarse contract; salt hot keys upstream
    if a single join key is order-of-a-partition hot.

    ``how``: ``"inner"`` | ``"left"`` (LEFT OUTER) | ``"right"``
    (RIGHT OUTER) | ``"full"`` (FULL OUTER — both sides preserved,
    key columns coalesced) | ``"semi"`` (left rows with ≥1 match,
    payload-free) | ``"anti"`` (left rows with NO match — the
    "subtract already-processed keys" filter). Null join keys follow
    SQL: they never match anything, but PRESERVED sides keep them —
    ``anti``/``left``/``full`` keep null-key left rows,
    ``right``/``full`` keep null-key right rows (emitted with the
    other side's columns null); non-preserved sides drop them before
    the exchange.

    ``right_cols`` maps right column → output name (defaults to every
    non-key right column under its own name; collisions with left
    column names raise — rename explicitly). Right key columns are
    value-cast to the left key types before hashing so `int32 ⋈ int64`
    or `us ⋈ ns` timestamps co-partition correctly; an unsafe cast
    raises rather than mis-joining.

    ``bloom_prefilter=True`` (inner/semi only) adds one extra streaming
    pass over the right side that builds a fixed-size Bloom bitset of
    its key hashes (``build_key_bloom``); left rows whose keys cannot
    match are then dropped BEFORE the exchange. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    only its matching fraction — pay one cheap right-side scan to
    avoid moving left rows that join to nothing. False positives only
    cost wasted shuffle (Acero still drops them); semantics are
    identical and tested equal. Size ``bloom_bits`` ≳ 8× the right
    side's distinct keys (default 2^23 bits = 1 MiB broadcast).

    Reference parity: the reference has no join stage at all (its sink
    is a message queue); this operator exists for the lake side of the
    engine, where replayed tables are joined downstream.
    """
    import ray

    from dcpray.functions.agg import _hash_key_columns

    if how not in _HOW_TO_ACERO:
        raise ValueError(
            f"how must be one of {sorted(_HOW_TO_ACERO)}, got {how!r}")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys
    if len(lkeys) != len(rkeys):
        raise ValueError("on/right_on length mismatch")

    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right_ds.schema()
    right_types = dict(zip(right_schema.names, right_schema.types))
    payload_free = how in ("semi", "anti")
    if payload_free:
        right_cols = {}
    elif right_cols is None:
        right_cols = {c: c for c in right_schema.names if c not in rkeys}
    for rc, name in right_cols.items():
        if name in left_names:
            raise ValueError(
                f"right column {rc!r} -> {name!r} collides with a left "
                "column; rename via right_cols")
    out_right = [(rc, name, right_types[rc]) for rc, name in right_cols.items()]

    union_schema = pa.schema(
        [("_side", pa.int8()), ("_pk", pa.int32())]
        + [(n, left_types[n]) for n in left_names]
        + [(name, t) for _, name, t in out_right]
    )

    bloom_ref = None
    if bloom_prefilter:
        if how not in ("inner", "semi"):
            raise ValueError(
                "bloom_prefilter only applies to how='inner'/'semi' "
                "(left/anti must keep every left row)")
        bloom = build_key_bloom(
            right_ds, lkeys, nbits=bloom_bits,
            cast_types={ln: (rn, left_types[ln])
                        for ln, rn in zip(lkeys, rkeys)})
        bloom_ref = ray.put(bloom)

    def _valid_keys(t: pa.Table, keys: list[str]) -> pa.Array:
        m = pc.is_valid(t[keys[0]])
        for k in keys[1:]:
            m = pc.and_(m, pc.is_valid(t[k]))
        return m

    def tag_left(t: pa.Table) -> pa.Table:
        # null keys never match; drop them pre-exchange whenever the
        # LEFT side is not preserved (inner/semi/right)
        if how in ("inner", "semi", "right"):
            t = t.filter(_valid_keys(t, lkeys))
        if bloom_ref is not None:
            from dcpray.rayutil import worker_memo

            bm = worker_memo(("bloom", bloom_ref.hex()),
                             lambda: __import__("ray").get(bloom_ref))
            keep = _bloom_contains(bm, _hash_key_columns(t, lkeys),
                                   bloom_bits)
            t = t.filter(pa.array(keep))
        pk = (_hash_key_columns(t, lkeys)
              % np.uint64(partitions)).astype(np.int32)
        n = t.num_rows
        cols = {"_side": pa.array(np.ones(n, np.int8)),
                "_pk": pa.array(pk)}
        for name in left_names:
            cols[name] = t[name]
        for _, name, typ in out_right:
            cols[name] = pa.nulls(n, typ)
        return pa.table(cols, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        # null keys never match; keep them only when the RIGHT side is
        # preserved (full/right emit them with null left columns —
        # Acero itself never matches null keys, so co-locating a
        # partition's null-key rows from both sides is harmless)
        if how not in ("full", "right"):
            t = t.filter(_valid_keys(t, rkeys))
        # key values live in the LEFT key columns' slots (cast to the
        # left types so both sides hash identically)
        keyed = pa.table(
            {ln: t[rn].cast(left_types[ln]) for ln, rn in zip(lkeys, rkeys)})
        pk = (_hash_key_columns(keyed, lkeys)
              % np.uint64(partitions)).astype(np.int32)
        n = t.num_rows
        cols = {"_side": pa.array(np.zeros(n, np.int8)),
                "_pk": pa.array(pk)}
        for name in left_names:
            cols[name] = keyed[name] if name in lkeys else pa.nulls(
                n, left_types[name])
        for rc, name, typ in out_right:
            cols[name] = t[rc]
        return pa.table(cols, schema=union_schema)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))
    acero_how = _HOW_TO_ACERO[how]
    payload_names = [name for _, name, _ in out_right]

    def join_part(g: pa.Table) -> pa.Table:
        side = g["_side"]
        lt = g.filter(pc.equal(side, 1)).select(left_names)
        rt = g.filter(pc.equal(side, 0)).select(lkeys + payload_names)
        out = lt.join(rt, keys=lkeys, join_type=acero_how)
        # Acero emits left cols then payload, but not necessarily in
        # our declared order — normalize for stable union-of-groups
        return out.select(left_names + (payload_names if not payload_free
                                        else []))

    return tagged.groupby("_pk").map_groups(join_part, batch_format="pyarrow")


# --------------------------------------------------- skew-aware hash join


def hash_join_skew(left_ds, right_ds, on: str | list[str],
                   right_on: str | list[str] | None = None,
                   right_cols: dict[str, str] | None = None,
                   how: str = "inner", partitions: int = 64,
                   hot_threshold: int = 1_000_000,
                   max_hot_keys: int = 10_000,
                   max_hot_right_rows: int = 5_000_000,
                   materialize: bool | str = "auto"):
    """``hash_join`` with EXPLICIT hot-key handling — the skew escape
    hatch for the coarse-partition contract ("one key's rows fit one
    partition task"), which a power-law fact table violates.

    Mechanism (the AQE-style split):

    1. one cheap streaming pass over the LEFT side counts rows per key
       (per-batch ``value_counts`` partials through ``coarse_groupby``
       — the exchange moves one row per distinct key per batch);
    2. keys with ≥ ``hot_threshold`` left rows form the hot set (≤
       ``max_hot_keys``, loudly guarded — a million hot keys means the
       threshold is wrong, not the engine);
    3. the RIGHT rows of hot keys are collected and broadcast (hot
       keys are few and dimension-like on the right by assumption —
       ``max_hot_right_rows`` caps that collection — it raises before
       the driver materializes an un-broadcastable right side), and
       hot LEFT rows join against them with ZERO exchange via
       ``broadcast_join``'s per-batch Acero path;
    4. cold rows take the normal coarse-partitioned ``hash_join``;
    5. the union of both paths is the result — semantics identical to
       ``hash_join`` (tested equal on skewed fixtures).

    Supports ``how`` in {"inner", "left"} (semi/anti rarely skew-bind;
    use plain hash_join). At the default threshold this degenerates to
    plain hash_join cost + one counting pass.

    Cost note: the LEFT side is consumed three times (key-count pass,
    hot filter, cold filter) and the right twice — Ray Data recomputes
    lineage per consumer. For a bare (possibly column-pruned) file
    read that re-scan is cheap and streaming beats pinning; for a
    DERIVED pipeline it would re-run the whole upstream per consumer,
    so ``materialize="auto"`` (default) detects the derived case from
    the logical plan and ``.materialize()``s that side once up front —
    trading spillable object-store space for the re-computations
    (r4 verdict #3). Pass ``materialize=True``/``False`` to force.
    """
    import ray  # noqa: F401  (broadcast path inits lazily)

    from dcpray.functions.agg import coarse_groupby

    if how not in ("inner", "left"):
        raise ValueError("hash_join_skew supports how='inner'/'left'")
    if materialize == "auto":
        if not _is_cheap_rescan(left_ds):
            left_ds = left_ds.materialize()
        if not _is_cheap_rescan(right_ds):
            right_ds = right_ds.materialize()
    elif materialize:
        left_ds = left_ds.materialize()
        right_ds = right_ds.materialize()
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = ([right_on] if isinstance(right_on, str) else list(right_on)) \
        if right_on is not None else lkeys
    if len(lkeys) != 1 or len(rkeys) != 1:
        raise ValueError("hash_join_skew takes a single join key "
                         "(composite keys rarely concentrate; use hash_join)")
    lk, rk = lkeys[0], rkeys[0]

    # pass 1: per-key left counts, keep only keys over the threshold —
    # the filter runs distributed, the driver sees ONLY hot keys
    counts = coarse_groupby(
        left_ds.select_columns([lk]), [lk], [(lk, "count", "__n")],
        partitions=partitions)
    def hot_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["__n"],
                                         pa.scalar(hot_threshold)))

    hot_batches = list(
        counts.map_batches(hot_only, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    hot_tab = (pa.concat_tables(hot_batches, promote_options="default")
               if hot_batches else None)
    if hot_tab is not None and hot_tab.num_rows > max_hot_keys:
        raise ValueError(
            f"{hot_tab.num_rows} keys exceed hot_threshold="
            f"{hot_threshold} (> max_hot_keys={max_hot_keys}); raise the "
            "threshold — this corpus is uniformly heavy, not skewed")
    hot_vals = (hot_tab[lk].combine_chunks()
                if hot_tab is not None and hot_tab.num_rows else None)

    if hot_vals is None or len(hot_vals) == 0:
        return hash_join(left_ds, right_ds, on=lk, right_on=rk,
                         right_cols=right_cols, how=how,
                         partitions=partitions)

    def _split(ds_in, key, want_hot):
        vs = hot_vals

        def f(t: pa.Table) -> pa.Table:
            m = pc.is_in(t[key], value_set=vs)
            return t.filter(m if want_hot else
                            pc.invert(pc.fill_null(m, False)))

        return ds_in.map_batches(f, batch_format="pyarrow")

    # hot path: right rows of hot keys broadcast once, zero exchange
    hr_batches = []
    hot_right_rows = 0
    for b in _split(right_ds, rk, True).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        hot_right_rows += b.num_rows
        if hot_right_rows > max_hot_right_rows:
            raise ValueError(
                f"hot keys own > max_hot_right_rows={max_hot_right_rows} "
                "right rows — the right side is not dimension-like for "
                "these keys; broadcast would not fit, use hash_join")
        hr_batches.append(b)
    rs = right_ds.schema()
    hot_right = (pa.concat_tables(hr_batches, promote_options="default")
                 if hr_batches else
                 pa.schema(list(zip(rs.names, rs.types))).empty_table())
    hot_join = broadcast_join(_split(left_ds, lk, True), hot_right,
                              on=lk, right_on=rk, right_cols=right_cols,
                              how=how)
    # cold path: the ordinary single-exchange join
    cold_join = hash_join(_split(left_ds, lk, False),
                          _split(right_ds, rk, False),
                          on=lk, right_on=rk, right_cols=right_cols,
                          how=how, partitions=partitions)
    return hot_join.union(cold_join)
