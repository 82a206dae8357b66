"""Windowed / session operators over event streams.

Sessionization is the canonical "streaming window" a training-data or
analytics pipeline needs that Ray Data lacks natively: assign each
event to a per-key session, where a new session starts when the gap to
the previous event of the same key exceeds a threshold.

Scale shape: ONE coarse-partition exchange on the session key
(``hash(key) % partitions`` — the same pattern as ``coarse_groupby``),
then fully vectorized work inside each partition: one lexsort over
(key, ts, tiebreak), a diff, and a cumsum. Python runs once per
partition, never per key or per session. The partitioning assumption is
the usual one: all events of one key fit in one partition's task (keys
are users/devices — bounded); a key so hot it overflows a partition
needs the same hot-split treatment as the merge path's hot buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.functions.agg import add_coarse_pk

_UNIT_PER_S = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _gap_threshold(ts_type: pa.DataType, gap_s: float) -> np.int64:
    """gap_s in the COLUMN'S native integer unit — a timestamp column's
    int64 view is in its own unit (us, ns, ...), and comparing against a
    microsecond constant would silently mis-sessionize ns data."""
    if pa.types.is_timestamp(ts_type):
        return np.int64(round(gap_s * _UNIT_PER_S[ts_type.unit]))
    # numeric ts columns are taken to be seconds
    return np.int64(round(gap_s))


def _group_codes(col) -> np.ndarray:
    """int64 EQUALITY codes for a group-key column: strings go through
    dictionary codes (r5 review — astype(int64) crashed on string keys
    that add_coarse_pk was deliberately extended to accept), integer-
    like types cast directly."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return pc.dictionary_encode(arr).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def _session_bounds(group: pa.Table, key_col: str, ts_col: str,
                    gap_s: float, tiebreak_col: str | None):
    """The shared session-assignment core: sort one partition by
    (key, ts, tiebreak), flag session starts (first-of-key or gap >
    threshold in the column's native unit), and derive per-row session
    ordinals. Returns (order, sorted_ts, session_starts, session_ends,
    sid_per_sorted_row). Nulls in key/ts/tiebreak raise loudly — a null
    ts would otherwise round-trip through float64 (NaN gap comparisons
    always False ⇒ the row silently joins the previous session) and a
    null key would corrupt ids ≥ 2^53 via the same float64 decode."""
    from dcpray.functions.agg import require_nonnull

    require_nonnull(group, (key_col, ts_col, tiebreak_col), "sessionize")
    k = _group_codes(group[key_col])
    ts = pc.cast(group[ts_col], pa.int64()).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    gap_thr = _gap_threshold(group.schema.field(ts_col).type, gap_s)
    if tiebreak_col is not None:
        tb = tiebreak_codes(group[tiebreak_col])
        order = np.lexsort((tb, ts, k))
    else:
        order = np.lexsort((ts, k))
    ks, tss = k[order], ts[order]
    first_of_key = np.r_[True, ks[1:] != ks[:-1]]
    gap = np.r_[np.int64(0), tss[1:] - tss[:-1]]
    new_session = first_of_key | (gap > gap_thr)
    starts = np.flatnonzero(new_session)
    ends = np.r_[starts[1:], len(ks)]
    # session ordinal within key: cumsum of new-session flags minus the
    # cumsum value at the key's first row
    cs = np.cumsum(new_session.astype(np.int64))
    key_starts = np.flatnonzero(first_of_key)
    key_base = cs[key_starts]
    sid = cs - np.repeat(key_base, np.diff(np.r_[key_starts, len(ks)]))
    return order, tss, starts, ends, sid


def sessionize(ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0, tiebreak_col: str | None = "event_id",
               partitions: int = 64):
    """Append a ``session_id`` column: per-key session ordinal (0-based,
    in time order). A new session starts when the gap to the key's
    previous event exceeds ``gap_s`` seconds (strictly greater — equal
    gaps stay in-session, matching SQL ``> INTERVAL``). Ties on ts are
    ordered by ``tiebreak_col`` so the assignment is deterministic.

    Returns the input rows (all columns) + ``session_id`` (int64)."""
    _guard_output_names(ds, ["session_id"], "sessionize")

    def assign(group: pa.Table) -> pa.Table:
        order, _, _, _, sid = _session_bounds(
            group, key_col, ts_col, gap_s, tiebreak_col
        )
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        return out.append_column("session_id", pa.array(sid, pa.int64()))

    return (ds.map_batches(add_coarse_pk, fn_args=(key_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def session_stats(ds, key_col: str = "user_id", ts_col: str = "ts",
                  gap_s: float = 1800.0, value_col: str | None = "value",
                  tiebreak_col: str | None = "event_id",
                  partitions: int = 64):
    """Per-(key, session) aggregate: n_events, session_start,
    session_end (+ sum of ``value_col`` when given). ONE exchange:
    session assignment AND the per-session aggregate run inside the
    same partition task (sessions never span partitions, because a
    key's rows are co-located). Key dtype is preserved from the
    input."""

    def assign_and_agg(group: pa.Table) -> pa.Table:
        order, tss, starts, ends, sid = _session_bounds(
            group, key_col, ts_col, gap_s, tiebreak_col
        )
        start_rows = pa.array(order[starts])
        cols = {
            key_col: group[key_col].take(start_rows),  # dtype-preserving
            "session_id": pa.array(sid[starts], pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "session_start": pc.cast(pa.array(tss[starts]),
                                     group[ts_col].type),
            "session_end": pc.cast(pa.array(tss[ends - 1]),
                                   group[ts_col].type),
        }
        if value_col:
            v = group[value_col].combine_chunks().to_numpy(
                zero_copy_only=False
            ).astype(np.float64)[order]
            cols["sum_value"] = pa.array(np.add.reduceat(v, starts))
        return pa.table(cols)

    return (ds.map_batches(add_coarse_pk, fn_args=(key_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign_and_agg, batch_format="pyarrow"))


def hopping_window(ds, ts_col: str = "ts", size_s: float = 1800,
                   hop_s: float = 600,
                   aggs: list[tuple[str, str, str]] | None = None,
                   key_col: str | None = None, partitions: int = 64,
                   out_col: str = "window_start"):
    """Overlapping (hopping) time-window aggregate: windows of
    ``size_s`` seconds starting every ``hop_s`` seconds, epoch-aligned;
    each event lands in exactly ``size/hop`` windows. ``size_s`` must
    be a multiple of ``hop_s``. With ``hop_s == size_s`` this is a
    tumbling window.

    Scale shape: a vectorized 1→(size/hop) row expansion inside
    ``map_batches`` (repeat + tile, no Python loop), then ONE
    ``coarse_groupby`` exchange that moves only per-batch partial
    aggregates per (window, key) — the expanded rows never shuffle.
    Null-ts rows are dropped (SQL: a null can't fall in a window);
    ``aggs`` follows coarse_groupby's ``(column, op, alias)`` spec and
    defaults to an event count.
    """
    from dcpray.functions.agg import coarse_groupby

    _guard_output_names(ds, [out_col], "hopping_window")
    aggs = aggs or [(ts_col, "count", "n_events")]
    keys = [out_col] + ([key_col] if key_col else [])

    def expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        ts_type = ts.type
        hop_n = np.int64(_gap_threshold(ts_type, hop_s))
        size_n = np.int64(_gap_threshold(ts_type, size_s))
        if hop_n <= 0 or size_n % hop_n:
            raise ValueError("size_s must be a positive multiple of hop_s")
        nwin = int(size_n // hop_n)
        tt = t.filter(pc.is_valid(ts))
        v = pc.cast(tt[ts_col], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        bucket = (v // hop_n) * hop_n
        total = len(v) * nwin
        rep = np.arange(total) // nwin
        j = np.arange(total) % nwin
        ws = bucket[rep] - j.astype(np.int64) * hop_n
        out = tt.take(pa.array(rep))
        ws_arr = pa.array(ws)
        if pa.types.is_timestamp(ts_type):
            ws_arr = ws_arr.cast(ts_type)
        return out.append_column(out_col, ws_arr)

    expanded = ds.map_batches(expand, batch_format="pyarrow")
    return coarse_groupby(expanded, keys, aggs, partitions=partitions)


# the shared descending-order key (ADVICE r4 + r5 NaN extension) lives
# beside the other coarse-operator primitives; re-exported here because
# every descending window op uses it
from dcpray.functions.agg import desc_key as _desc_key  # noqa: E402
from dcpray.functions.agg import tiebreak_codes  # noqa: E402


def _guard_output_names(ds, out_names, op: str) -> None:
    """pyarrow happily builds tables with DUPLICATE column names, so an
    output column colliding with an input one silently yields two
    same-named columns and name-based access picks an arbitrary one —
    every window op raises upfront instead (ADVICE r4)."""
    rs = ds.schema()
    if rs is None:  # empty derived dataset — names unknowable; the
        return      # per-batch append surfaces any clash downstream
    clash = sorted(set(out_names) & set(rs.names))
    if clash:
        raise ValueError(
            f"{op}: output column(s) {clash} already exist in the "
            "input; rename them upstream or pick different output names")


def rank_in_group(ds, group_col: str, order_col: str,
                  tiebreak_col: str, descending: bool = False,
                  out_col: str = "rank", partitions: int = 64,
                  cumsum_col: str | None = None,
                  cumsum_out: str = "running_sum",
                  ranks: tuple[str, ...] = ()):
    """SQL window functions over a distributed table: per-group
    ``row_number()`` (1-based, ordered by ``order_col`` with a
    deterministic ``tiebreak_col``) and, optionally, the running
    ``SUM(cumsum_col)`` over the same frame (ROWS UNBOUNDED PRECEDING)
    plus any of ``ranks`` ⊆ {"rank", "dense_rank", "percent_rank",
    "cume_dist"} — the tie-aware family, where PEERS are rows with
    equal ``order_col`` only (the tiebreak does NOT split peers,
    matching SQL ``OVER (ORDER BY order_col)``; row_number alone uses
    the tiebreak). percent_rank = (rank−1)/(n−1) and cume_dist =
    peers_through_current/n as single float64 divisions of exact
    integers — bit-identical to SQL.

    Scale shape: the standard ONE coarse-partition exchange on the
    group key, then one lexsort + cumsum per partition — Python once
    per partition, never per group. Same partitioning contract as
    sessionize (a key's rows fit one partition task); nulls in
    group/order/tiebreak raise loudly (see ``require_nonnull``)."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    bad = set(ranks) - {"rank", "dense_rank", "percent_rank", "cume_dist"}
    if bad:
        raise ValueError(f"unsupported ranks: {sorted(bad)}")
    if "rank" in ranks and out_col == "rank":
        raise ValueError("out_col='rank' collides with ranks=('rank',...); "
                         "name the row_number column differently "
                         "(e.g. out_col='row_number')")
    in_names = set(ds.schema().names)
    clash = sorted(({out_col, *ranks}
                    | ({cumsum_out} if cumsum_col is not None else set()))
                   & in_names)
    if clash:
        raise ValueError(
            f"output column(s) {clash} already exist in the input; "
            "rename them upstream or pick different output names")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col, tiebreak_col),
                        "rank_in_group")
        g = _group_codes(group[group_col])
        v = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(group[tiebreak_col])
        vkey = _desc_key(v) if descending else v
        order = np.lexsort((tb, vkey, g))
        gs = g[order]
        n = len(gs)
        first = np.r_[True, gs[1:] != gs[:-1]] if n else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, sizes)
        idx = np.arange(n)
        rownum = idx - seg_start + 1
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        out = out.append_column(out_col, pa.array(rownum, pa.int64()))
        if ranks:
            vs = vkey[order]
            # value-run boundaries WITHIN each group (peers share a run)
            vr_first = first.copy()
            if n > 1:
                vr_first[1:] |= vs[1:] != vs[:-1]
            vr_starts = np.flatnonzero(vr_first)
            vr_sizes = np.diff(np.r_[vr_starts, n])
            run_start = np.repeat(vr_starts, vr_sizes)
            run_end = np.repeat(vr_starts + vr_sizes - 1, vr_sizes)
            grp_size = np.repeat(sizes, sizes)
            rk = run_start - seg_start + 1
            if "rank" in ranks:
                out = out.append_column("rank", pa.array(rk, pa.int64()))
            if "dense_rank" in ranks:
                dense = np.cumsum(vr_first)
                dense = dense - np.repeat(dense[starts] - 1, sizes)
                out = out.append_column("dense_rank",
                                        pa.array(dense, pa.int64()))
            if "percent_rank" in ranks:
                pr = np.where(grp_size > 1,
                              (rk - 1) / np.maximum(grp_size - 1, 1), 0.0)
                out = out.append_column("percent_rank", pa.array(pr))
            if "cume_dist" in ranks:
                cd = (run_end - seg_start + 1) / grp_size
                out = out.append_column("cume_dist", pa.array(cd))
        if cumsum_col is not None:
            vals = group[cumsum_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64)[order]
            cs = np.cumsum(vals)
            # segment reset: subtract the cumsum just before each group
            base = np.repeat(np.r_[0.0, cs[starts[1:] - 1]], sizes)
            out = out.append_column(cumsum_out, pa.array(cs - base))
        return out

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def _rolling_arrays(gs: np.ndarray, vs: np.ndarray, window: int,
                    aggs) -> dict:
    """The pure trailing-window kernel over (key, value) arrays that are
    ALREADY sorted by (key, order, tiebreak): sum/mean/count via prefix
    sums, min/max via ≤ window−1 shifted O(n)-memory passes (never an
    n×window materialization). Module-level so the property tests can
    drive it directly against a brute-force reference."""
    n = len(gs)
    if np.isnan(vs).any():
        # the global cumsum would propagate one group's NaN into every
        # later group's windowed sum in this partition — refuse loudly
        # (Arrow nulls are already rejected by require_nonnull upstream)
        raise ValueError("rolling aggregates require NaN-free values; "
                         "drop or fill NaNs upstream")
    first = np.r_[True, gs[1:] != gs[:-1]] if n else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, n])
    seg_start = np.repeat(starts, sizes)          # group start per row
    idx = np.arange(n)
    lo = np.maximum(seg_start, idx - window + 1)  # window start per row
    cnt = idx - lo + 1
    res: dict = {}
    if {"sum", "mean"} & set(aggs):
        cs = np.cumsum(vs)
        win_sum = cs[idx] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0.0)
        if "sum" in aggs:
            res["sum"] = win_sum
        if "mean" in aggs:
            res["mean"] = win_sum / np.maximum(cnt, 1)
    if "count" in aggs:
        res["count"] = cnt.astype(np.int64)
    if {"min", "max"} & set(aggs):
        mn = vs.copy() if "min" in aggs else None
        mx = vs.copy() if "max" in aggs else None
        for k in range(1, window):
            valid = idx - k >= lo    # in-window AND same group
            if not valid.any():
                break
            shifted = np.r_[np.full(k, np.nan), vs[:-k]] if k <= n \
                else np.full(n, np.nan)
            if mn is not None:
                mn = np.where(valid, np.fmin(mn, shifted), mn)
            if mx is not None:
                mx = np.where(valid, np.fmax(mx, shifted), mx)
        if mn is not None:
            res["min"] = mn
        if mx is not None:
            res["max"] = mx
    return res


def rolling_agg(ds, group_col: str, order_col: str, value_col: str,
                window: int, tiebreak_col: str,
                aggs: tuple[str, ...] = ("sum", "mean"),
                partitions: int = 64, prefix: str = "rolling_"):
    """Per-key MOVING-WINDOW aggregates over the trailing ``window``
    rows — SQL's ``agg(value) OVER (PARTITION BY key ORDER BY order
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — distributed.

    Scale shape: identical to ``rank_in_group`` — ONE coarse exchange
    on the group key, then one lexsort + prefix-sum arithmetic per
    partition; sum/mean/count come from cumsum differences (no per-row
    loop), min/max from a strided sliding-window view (O(n·window)
    comparisons vectorized — fine for the dashboard-style windows this
    models; a monotonic deque beats it only at window >> 100). Sum over
    FLOATS accumulates in a different order than SQL's segment tree —
    pass integer values (cents) when bit-exactness matters, as
    ``events_rank_running`` does. Nulls in key/order/tiebreak raise;
    null values are rejected too (SQL windowed aggs skip nulls, which
    would need a per-row valid-count — keep the contract explicit)."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if window < 1:
        raise ValueError("window must be >= 1 row")
    bad = set(aggs) - {"sum", "mean", "count", "min", "max"}
    if bad:
        raise ValueError(f"unsupported rolling aggs: {sorted(bad)}")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col, tiebreak_col,
                                value_col), "rolling_agg")
        g = pc.dictionary_encode(
            group[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(group[tiebreak_col])
        v = group[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((tb, o, g))
        res = _rolling_arrays(g[order], v[order], window, aggs)
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        for name, arr in res.items():
            out = out.append_column(prefix + name, pa.array(arr))
        return out

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def _sparse_table_minmax(vs: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                         want_min: bool, want_max: bool):
    """min/max over the per-row VARIABLE ranges [lo, hi] (inclusive) in
    O(n log n): classic sparse table, fully vectorized — level k holds
    the running extreme of 2^k consecutive values; each query is the
    extreme of two overlapping power-of-two blocks. Memory is
    n · log2(max frame length) · 8 bytes per requested extreme within
    the partition task — size ``partitions`` so a partition's rows ×
    ~20 levels fit the worker heap, or restrict ``aggs`` to
    sum/mean/count (prefix sums, O(n)) for very wide frames."""
    n = len(vs)
    res = {}
    if n == 0:
        if want_min:
            res["min"] = vs
        if want_max:
            res["max"] = vs
        return res
    lengths = hi - lo + 1
    kmax = int(np.log2(max(int(lengths.max()), 1)))
    mins = [vs] if want_min else None
    maxs = [vs] if want_max else None
    for k in range(1, kmax + 1):
        h = 1 << (k - 1)
        if mins is not None:
            mins.append(np.fmin(mins[-1][:-h], mins[-1][h:]))
        if maxs is not None:
            maxs.append(np.fmax(maxs[-1][:-h], maxs[-1][h:]))
    k = np.floor(np.log2(lengths)).astype(np.int64)
    out_min = np.empty(n) if want_min else None
    out_max = np.empty(n) if want_max else None
    for kk in range(kmax + 1):
        m = k == kk
        if not m.any():
            continue
        w = 1 << kk
        l2 = hi[m] - w + 1
        if want_min:
            out_min[m] = np.fmin(mins[kk][lo[m]], mins[kk][l2])
        if want_max:
            out_max[m] = np.fmax(maxs[kk][lo[m]], maxs[kk][l2])
    if want_min:
        res["min"] = out_min
    if want_max:
        res["max"] = out_max
    return res


def _rolling_range_arrays(gs: np.ndarray, ts: np.ndarray, vs: np.ndarray,
                          delta: int, aggs) -> dict:
    """RANGE-frame kernel over arrays ALREADY sorted by (key, ts):
    per row, aggregate every same-key row with
    ``ts_j ∈ [ts_i − delta, ts_i]`` — including FOLLOWING peers with
    ``ts_j == ts_i``, exactly SQL's ``RANGE ... AND CURRENT ROW``.

    The variable lower bound comes from ONE extra lexsort: each row
    emits a marker at value ``ts_i − delta`` that sorts BEFORE data
    rows at equal value; a cumulative data-count at the marker's merged
    position IS the global index of the first in-window row (clamped to
    the group start — markers that underflow into earlier groups clamp
    there). The upper bound is the row's (key, ts) run end. sum/mean/
    count via prefix-sum differences; min/max via a vectorized sparse
    table (the ROWS kernel's shifted passes need a FIXED width)."""
    n = len(gs)
    if np.isnan(vs).any():
        raise ValueError("rolling aggregates require NaN-free values; "
                         "drop or fill NaNs upstream")
    first = np.r_[True, gs[1:] != gs[:-1]] if n else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, n])
    seg_start = np.repeat(starts, sizes)
    idx = np.arange(n)

    # lower bound: marker-merge (flag 0 = marker sorts before data at
    # equal value -> bound is INCLUSIVE)
    a_g = np.r_[gs, gs]
    a_val = np.r_[ts, ts - delta]
    a_flag = np.r_[np.ones(n, np.int8), np.zeros(n, np.int8)]
    a_idx = np.r_[idx, idx]
    order2 = np.lexsort((a_flag, a_val, a_g))
    data_before = np.cumsum(a_flag[order2]) - a_flag[order2]
    is_marker = a_flag[order2] == 0
    lo = np.empty(n, np.int64)
    lo[a_idx[order2][is_marker]] = data_before[is_marker]
    lo = np.maximum(lo, seg_start)

    # upper bound: end of the (key, ts) run (SQL peer rows)
    new_run = np.r_[True, (gs[1:] != gs[:-1]) | (ts[1:] != ts[:-1])] \
        if n else np.zeros(0, bool)
    run_id = np.cumsum(new_run) - 1
    ends = np.flatnonzero(np.r_[new_run[1:], True]) if n \
        else np.zeros(0, np.int64)
    hi = ends[run_id] if n else np.zeros(0, np.int64)

    cnt = hi - lo + 1
    res: dict = {}
    if {"sum", "mean"} & set(aggs):
        cs = np.cumsum(vs)
        win_sum = cs[hi] - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0.0)
        if "sum" in aggs:
            res["sum"] = win_sum
        if "mean" in aggs:
            res["mean"] = win_sum / np.maximum(cnt, 1)
    if "count" in aggs:
        res["count"] = cnt.astype(np.int64)
    if {"min", "max"} & set(aggs):
        res.update(_sparse_table_minmax(vs, lo, hi, "min" in aggs,
                                        "max" in aggs))
    return res


def rolling_agg_range(ds, group_col: str, ts_col: str, value_col: str,
                      interval_s: float,
                      aggs: tuple[str, ...] = ("sum", "mean"),
                      partitions: int = 64, prefix: str = "rolling_"):
    """Per-key TIME-RANGE moving aggregates — SQL
    ``agg(value) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN
    INTERVAL interval PRECEDING AND CURRENT ROW)`` — distributed.
    The frame is defined by TIME distance, not row count (the ROWS
    sibling is ``rolling_agg``), and includes CURRENT ROW's peers
    (equal ts), exactly as in SQL.

    Scale shape: ONE coarse exchange on the group key, then per
    partition one lexsort of the rows plus one lexsort of a 2n
    marker-merge resolving every variable window start — no per-row or
    per-group loop (see ``_rolling_range_arrays``). Pass integer values
    (cents) when bit-exactness vs a SQL oracle matters. Nulls in
    key/ts/value raise loudly."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if interval_s < 0:
        raise ValueError("interval_s must be >= 0")
    bad = set(aggs) - {"sum", "mean", "count", "min", "max"}
    if bad:
        raise ValueError(f"unsupported rolling aggs: {sorted(bad)}")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, ts_col, value_col),
                        "rolling_agg_range")
        g = pc.dictionary_encode(
            group[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ty = group[ts_col].type
        tsv = group[ts_col].combine_chunks()
        if pa.types.is_timestamp(ty):
            tsv = pc.cast(tsv, pa.int64())
        t = tsv.to_numpy(zero_copy_only=False).astype(np.int64)
        delta = _gap_threshold(ty, interval_s) if pa.types.is_timestamp(ty) \
            else np.int64(round(interval_s))
        v = group[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        order = np.lexsort((t, g))
        res = _rolling_range_arrays(g[order], t[order], v[order],
                                    int(delta), aggs)
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        for name, arr in res.items():
            out = out.append_column(prefix + name, pa.array(arr))
        return out

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def lag_lead(ds, group_col: str, order_col: str, value_col: str,
             tiebreak_col: str, lags: tuple[int, ...] = (1,),
             leads: tuple[int, ...] = (1,), partitions: int = 64):
    """Per-key LAG/LEAD — SQL ``LAG(value, k)`` / ``LEAD(value, k)``
    ``OVER (PARTITION BY key ORDER BY order, tiebreak)`` — distributed.
    Adds one ``lag_k`` column per entry in ``lags`` and one ``lead_k``
    per entry in ``leads``; rows whose shifted position falls outside
    their group get NULL, exactly as in SQL.

    Scale shape: same as ``rank_in_group`` — ONE coarse exchange on the
    group key, one lexsort per partition, then each shift is a single
    vectorized gather with a group-boundary mask."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if any(k < 1 for k in (*lags, *leads)):
        raise ValueError("lag/lead offsets must be >= 1")
    _guard_output_names(ds, [f"lag_{k}" for k in lags]
                        + [f"lead_{k}" for k in leads], "lag_lead")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col, tiebreak_col),
                        "lag_lead")
        g = pc.dictionary_encode(
            group[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(group[tiebreak_col])
        order = np.lexsort((tb, o, g))
        gs = g[order]
        n = len(gs)
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        vals = out[value_col].combine_chunks()
        idx = np.arange(n)
        for k in lags:
            src = idx - k
            ok = (src >= 0) & (gs[np.maximum(src, 0)] == gs)
            taken = pa.Array.from_pandas(
                np.where(ok, src, 0)).cast(pa.int64())
            shifted = vals.take(taken)
            shifted = pc.if_else(pa.array(ok), shifted,
                                 pa.nulls(n, vals.type))
            out = out.append_column(f"lag_{k}", shifted)
        for k in leads:
            src = idx + k
            ok = (src < n) & (gs[np.minimum(src, n - 1)] == gs)
            taken = pa.Array.from_pandas(
                np.where(ok, src, 0)).cast(pa.int64())
            shifted = vals.take(taken)
            shifted = pc.if_else(pa.array(ok), shifted,
                                 pa.nulls(n, vals.type))
            out = out.append_column(f"lead_{k}", shifted)
        return out

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def ntile_in_group(ds, group_col: str, order_col: str, tiebreak_col: str,
                   n: int, descending: bool = False,
                   out_col: str = "ntile", partitions: int = 64):
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order, tiebreak)``
    — distribute each group's rows into ``n`` buckets as evenly as
    possible (the first ``count % n`` buckets get one extra row),
    1-based like SQL. Same scale shape as ``rank_in_group``: one coarse
    exchange, one lexsort + closed-form bucket arithmetic per
    partition."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if n < 1:
        raise ValueError("n must be >= 1")
    _guard_output_names(ds, [out_col], "ntile_in_group")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col, tiebreak_col),
                        "ntile_in_group")
        g = pc.dictionary_encode(
            group[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(group[tiebreak_col])
        if descending:
            v = _desc_key(v)
        order = np.lexsort((tb, v, g))
        gs = g[order]
        first = np.r_[True, gs[1:] != gs[:-1]]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, len(gs)])
        r = np.arange(len(gs)) - np.repeat(starts, sizes)  # 0-based rank
        cnt = np.repeat(sizes, sizes)
        q, rem = cnt // n, cnt % n
        big = rem * (q + 1)              # rows covered by the +1 buckets
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                r < big, r // np.maximum(q + 1, 1),
                rem + np.where(q > 0, (r - big) // np.maximum(q, 1), 0))
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        return out.append_column(out_col,
                                 pa.array((tile + 1).astype(np.int64)))

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def forward_fill(ds, group_col: str, order_col: str, value_col: str,
                 tiebreak_col: str, out_col: str | None = None,
                 partitions: int = 64):
    """LOCF imputation — fill null values with the key's LAST non-null
    value in (order, tiebreak) order; SQL's ``last_value(v IGNORE
    NULLS) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``. Leading nulls (no prior value in the group) stay
    null. Same scale shape as the other window ops: one coarse
    exchange, then one lexsort + one ``maximum.accumulate`` per
    partition (group resets fall out of position comparison — a
    previous group's last valid position is always < this group's
    start)."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if out_col is not None:
        _guard_output_names(ds, [out_col], "forward_fill")

    def assign(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col, tiebreak_col),
                        "forward_fill")
        g = pc.dictionary_encode(
            group[group_col].combine_chunks()).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(group[tiebreak_col])
        order = np.lexsort((tb, o, g))
        gs = g[order]
        n = len(gs)
        out = group.drop_columns(["_pk"]).take(pa.array(order))
        v = out[value_col].combine_chunks()
        first = np.r_[True, gs[1:] != gs[:-1]] if n else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, n])
        seg_start = np.repeat(starts, sizes)
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        idx = np.arange(n)
        last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
        ok = last_valid >= seg_start       # a prior value IN this group
        src = np.where(ok, last_valid, 0)
        filled = pc.if_else(pa.array(ok), v.take(pa.array(src)),
                            pa.nulls(n, v.type))
        name = out_col or value_col
        if out_col is None:
            return out.set_column(out.column_names.index(value_col),
                                  value_col, filled)
        return out.append_column(name, filled)

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assign, batch_format="pyarrow"))


def percent_rank_global(ds, order_col: str, out_col: str = "percent_rank",
                        max_distinct: int = 5_000_000):
    """Exact ``PERCENT_RANK() OVER (ORDER BY order_col)`` across the
    WHOLE dataset — corpus-wide percentile normalization (quality-score
    calibration, outlier gating) without a global sort.

    Scale shape: no all-to-all. Pass 1 collapses each batch to its
    distinct values + counts (one Arrow groupby per batch) and the
    driver merges those partials into the value CDF — O(distinct)
    driver bytes, guarded by ``max_distinct`` with a loud error (use
    ``exact_quantiles``/``histogram`` for unbounded-cardinality
    columns). Pass 2 broadcasts the CDF (``ray.put``) and attaches
    ``count_less / (n - 1)`` per row with one searchsorted per batch —
    float64 division of exact integers, bit-identical to the SQL
    engine's arithmetic. Nulls and NaN in ``order_col`` raise (filter
    first); ``n == 1`` yields 0.0 like SQL.

    The input is re-executed between the two passes (the same re-read
    design as tfidf_top_terms), so the upstream pipeline must be
    DETERMINISTIC: a value pass 2 sees that pass 1 did not raises
    loudly instead of silently taking a neighbor's rank —
    ``materialize()`` a nondeterministic input first."""
    import ray

    from dcpray.functions.agg import require_nonnull

    _guard_output_names(ds, [out_col], "percent_rank_global")

    def partial(t: pa.Table) -> pa.Table:
        require_nonnull(t, (order_col,), "percent_rank_global")
        g = pa.TableGroupBy(t.select([order_col]), [order_col]) \
            .aggregate([([], "count_all")])
        return g.rename_columns([order_col, "_n"])

    parts = []
    for bt in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        parts.append(bt)
    if not parts or sum(p.num_rows for p in parts) == 0:
        rs = ds.schema()
        if rs is not None:
            # SCHEMA-PINNED empty output: a map_batches whose UDF never
            # ran leaves the mapped dataset's schema None, so build the
            # (input + out_col) empty table directly (the join.py
            # empty-side convention)
            import ray.data

            out_schema = pa.schema(list(zip(rs.names, rs.types))
                                   + [(out_col, pa.float64())])
            return ray.data.from_arrow(out_schema.empty_table())
        # input schema itself unknowable (empty AND derived): fall
        # through with an empty CDF — empty/unknown in, empty/unknown
        # out, and any row a nondeterministic re-execution conjures up
        # hits the unseen-value guard in assign
        merged = pa.table({order_col: pa.array([], pa.float64()),
                           "_n_sum": pa.array([], pa.int64())})
    else:
        merged = pa.TableGroupBy(pa.concat_tables(parts), [order_col]) \
            .aggregate([("_n", "sum")])
    if merged.num_rows > max_distinct:
        raise ValueError(
            f"percent_rank_global: {merged.num_rows} distinct values "
            f"exceed max_distinct={max_distinct} — this operator's CDF "
            "is distinct-bounded by design; quantize first or use "
            "exact_quantiles/histogram")
    vals = merged[order_col].to_numpy(zero_copy_only=False)
    cnts = merged["_n_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    if vals.dtype.kind == "f":
        if np.isnan(vals).any():
            raise ValueError("percent_rank_global: NaN in order column")
        vals = vals + 0.0  # -0.0 and +0.0 are SQL peers
    srt = np.argsort(vals, kind="stable")
    vals, cnts = vals[srt], cnts[srt]
    count_less = np.cumsum(cnts) - cnts
    n = int(cnts.sum())
    ref = ray.put((vals, count_less))

    def assign(t: pa.Table, _ref=ref, _n=n) -> pa.Table:
        require_nonnull(t, (order_col,), "percent_rank_global")
        v, cl = ray.get(_ref)
        x = t[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        if x.dtype.kind == "f":
            x = x + 0.0
        idx = np.searchsorted(v, x)
        # loud determinism guard: a value pass 1 never saw would take a
        # NEIGHBOR'S count_less silently (or index past the CDF)
        oob = idx >= len(v)
        bad = oob.copy()
        inb = ~oob
        bad[inb] = v[idx[inb]] != x[inb]
        if bad.any():
            raise ValueError(
                "percent_rank_global: pass 2 saw a value pass 1 did "
                "not — the upstream pipeline is nondeterministic "
                "across re-executions; materialize() it first")
        if _n <= 1:
            pr = np.zeros(len(x), np.float64)
        else:
            pr = cl[idx].astype(np.float64) / np.float64(_n - 1)
        return t.append_column(out_col, pa.array(pr))

    return ds.map_batches(assign, batch_format="pyarrow")
