"""Distributed aggregation helpers.

``coarse_groupby`` is the library form of the pattern that made
``events_hourly`` 6× faster than Ray's per-group aggregate machinery at
~100k groups: pre-aggregate each batch with one vectorized Arrow
groupby (the shuffle then moves ONE row per distinct key per batch, not
every input row), exchange on a COARSE partition of the key hash, and
merge each partition with a second vectorized Arrow groupby — so Python
is called once per partition, never once per group.

Scale shape: the all-to-all moves only partial-aggregate rows; skewed
keys cannot concentrate a partition beyond their distinct-key count
(the partial combine already collapsed multiplicity); ``partitions``
bounds the number of merge tasks independently of group cardinality.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import _GOLDEN, hash_strings, splitmix64

#: op -> (arrow partial fn, arrow merge fn). ``mean`` decomposes into
#: sum+count partials and a final divide; ``count`` merges by sum.
_OPS = {
    "count": ("count", "sum"),
    "sum": ("sum", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    "mean": (None, None),  # handled via sum + countv
    "var": (None, None),   # handled via sum + countv + sumsq
    "std": (None, None),   # sqrt(var)
}


def add_coarse_pk(t: pa.Table, key_col: str, partitions: int,
                  pk_col: str = "_pk") -> pa.Table:
    """Append the coarse partition key ``hash(key) % partitions`` — the
    ONE exchange key every coarse-partition operator (groupby, window,
    top-k, as-of join) shares. Null keys hash from a filled sentinel;
    callers that need SQL null semantics must handle null rows
    themselves (see asof_join)."""
    ty = t[key_col].type
    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        h = hash_strings(t[key_col])
        pk = (splitmix64(h) % np.uint64(partitions)).astype(np.int32)
        return t.append_column(pk_col, pa.array(pk))
    c = t[key_col]
    if pa.types.is_date32(ty) or pa.types.is_time32(ty):
        # Arrow has no direct date32/time32 -> int64 cast (same hop as
        # _hash_key_columns); a daily-partition date is a natural key
        c = pc.cast(c, pa.int32())
    k = pc.fill_null(pc.cast(c, pa.int64()), 0) \
        .combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    pk = (splitmix64(k.view(np.uint64)) % np.uint64(partitions)).astype(np.int32)
    return t.append_column(pk_col, pa.array(pk))


def float_total_order(v: np.ndarray) -> np.ndarray:
    """IEEE-754 total-order key: uint64 whose ascending order equals
    the SQL total order of the float values (NaN greatest, matching
    DuckDB; -0.0 < +0.0)."""
    f = v.astype(np.float64)
    f = np.where(np.isnan(f), np.float64("nan"), f)  # normalize NaN sign
    # collapse -0.0 onto +0.0 (IEEE: -0.0 + 0.0 == +0.0): SQL treats
    # the zeros as PEERS, but their raw bit patterns differ and would
    # split a rank peer-run / flip a topk tiebreak by sign
    f = f + 0.0
    bits = f.view(np.uint64)
    neg = (bits >> np.uint64(63)) == 1
    return np.where(neg, ~bits, bits | np.uint64(1 << 63))


def tiebreak_codes(tb_col) -> np.ndarray:
    """ASCENDING order key for a tiebreak column of ANY orderable
    dtype: ints pass through, floats take the IEEE total-order bits
    (no int64 truncation that collapses 0.2 and 0.9 to one key),
    datetime64/timedelta64 view as int64, and everything else —
    strings, time32/time64 (which decode to datetime.time OBJECTS,
    so .view(int64) would raise), decimals — ranks via sorted-unique
    codes. Shared by topk_per_group and every window op."""
    if isinstance(tb_col, pa.ChunkedArray):
        tb_col = tb_col.combine_chunks()
    if pa.types.is_integer(tb_col.type):
        return tb_col.to_numpy(zero_copy_only=False).astype(np.int64)
    if pa.types.is_floating(tb_col.type):
        return float_total_order(tb_col.to_numpy(zero_copy_only=False))
    raw = tb_col.to_numpy(zero_copy_only=False)
    if raw.dtype.kind in "mM":
        return raw.view(np.int64)
    return np.unique(np.asarray(raw, object), return_inverse=True)[1]


def desc_key(v: np.ndarray) -> np.ndarray:
    """Order key whose ASCENDING lexsort yields ``v`` DESCENDING —
    plain ``-v`` is wrong for four dtypes: datetime64/timedelta64 raise
    TypeError on negation, unsigned ints wrap modulo 2**w (0 would sort
    FIRST instead of last), int64's minimum negates to itself, and
    float NaN ignores the sign flip (numpy sorts NaN last either way,
    while SQL DESC puts NaN FIRST — NaN ranks above everything in
    DuckDB's total order). Integers map through the order-preserving
    biased uint64 representation and invert; floats map through the
    IEEE-754 total-order bit trick so NaN lands where the SQL oracle
    puts it. Shared by every descending-capable coarse operator
    (rank_in_group, ntile_in_group, topk_per_group)."""
    if v.dtype.kind in "mM":
        v = v.view(np.int64)
    if v.dtype.kind == "u":
        return np.uint64(np.iinfo(np.uint64).max) - v.astype(np.uint64)
    if v.dtype.kind == "i":
        u = v.astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        return np.uint64(np.iinfo(np.uint64).max) - u
    if v.dtype.kind == "f":
        return np.uint64(np.iinfo(np.uint64).max) - float_total_order(v)
    return -v


def require_nonnull(t: pa.Table, cols, op: str) -> None:
    """Loud guard for operators whose vectorized core assumes null-free
    key/order columns (a nullable int64 ``to_numpy`` decodes through
    float64 — NaN comparisons silently mis-sort/mis-sessionize and large
    ids corrupt). Arrow tracks null counts, so this is O(#chunks)."""
    for c in cols:
        if c is not None and t[c].null_count:
            raise ValueError(
                f"{op} requires non-null {c!r} (found {t[c].null_count} "
                "null rows); drop or fill nulls upstream"
            )


def _hash_key_columns(t: pa.Table, keys: list[str]) -> np.ndarray:
    """uint64 hash combining the key columns (string / int / bool /
    timestamp / date), order-sensitive, stable across workers."""
    acc = np.zeros(t.num_rows, np.uint64)
    for k in keys:
        col = t[k]
        ty = col.type
        if pa.types.is_string(ty) or pa.types.is_large_string(ty):
            h = hash_strings(col)
        elif (pa.types.is_integer(ty) or pa.types.is_boolean(ty)
              or pa.types.is_temporal(ty)):
            # fill nulls BEFORE to_numpy so the array stays int64 end to
            # end (a nullable int64 decodes through float64, corrupting
            # keys >= 2^53 — the same key would then hash differently in
            # null-bearing vs null-free batches and land in two coarse
            # partitions); nulls are distinguished from a literal fill
            # value by mixing the validity mask in separately
            c = col
            if pa.types.is_date32(ty) or pa.types.is_time32(ty):
                # Arrow has no direct date32/time32 -> int64 cast
                c = pc.cast(c, pa.int32())
            c = pc.cast(c, pa.int64()).combine_chunks()
            v = pc.fill_null(c, 0).to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            h = v.view(np.uint64)
            if c.null_count:
                nulls = pc.is_null(c).to_numpy(zero_copy_only=False)
                h = np.where(nulls, np.uint64(0xC2B2AE3D27D4EB4F), h)
        else:
            raise TypeError(f"unhashable groupby key type for {k!r}: {ty}")
        with np.errstate(over="ignore"):
            acc = splitmix64(acc ^ (h * _GOLDEN))
    return acc


def _validate_aggs(aggs: list[tuple[str, str, str]]) -> None:
    if not aggs:
        raise ValueError("aggs must be non-empty")
    for _, op, _ in aggs:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}; one of {sorted(_OPS)}")


def _resolve_partials(aggs):
    """(col, fn) -> stable partial column name, plus the sorted spec.
    ``mean`` decomposes into sum + countv (VALID-count) partials of the
    same column — dividing by count(*) would silently shrink the mean
    of any nullable column, since SQL AVG ignores nulls. ``count``
    itself stays count(*) (mode="all"), the reference's event-count
    semantics."""
    partial_needed: dict[tuple[str, str], str] = {}
    for col, op, _ in aggs:
        if op == "mean":
            fns = ("sum", "countv")
        elif op in ("var", "std"):
            fns = ("sum", "countv", "sumsq")
        else:
            fns = (_OPS[op][0],)
        for fn in fns:
            partial_needed.setdefault((col, fn), f"__p_{col}_{fn}")
    return partial_needed, sorted(partial_needed)


def partial_aggregate(t: pa.Table, keys: list[str],
                      aggs: list[tuple[str, str, str]]) -> pa.Table:
    """One vectorized Arrow groupby collapsing a batch to its partial
    rows: the key columns plus one stable ``__p_<col>_<fn>`` column per
    needed partial. The building block shared by ``coarse_groupby``,
    ``hopping_window`` and the lake's incremental views — partials with
    the SAME spec merge associatively via ``merge_partials`` no matter
    where or when they were computed."""
    partial_needed, spec = _resolve_partials(aggs)
    # dedupe the selection: an aggregated column that is ALSO a key
    # (e.g. count of the key itself) must appear once, or Acero
    # fails with an ambiguous FieldRef deep inside the task
    sel = keys + sorted({c for c, _ in spec} - set(keys))
    t = t.select(sel)
    # sumsq has no Arrow grouped kernel: square into a derived float64
    # column and SUM that (float64 from the partial on — int64 squares
    # of large values would overflow silently)
    for c, f in spec:
        if f == "sumsq":
            sq = pc.multiply(pc.cast(t[c], pa.float64()),
                             pc.cast(t[c], pa.float64()))
            t = t.append_column(f"__sq_{c}", sq)
    out = pa.TableGroupBy(t, keys).aggregate([
        (c, "count", pc.CountOptions(mode="all")) if f == "count"
        else (c, "count", pc.CountOptions(mode="only_valid"))
        if f == "countv"
        else (f"__sq_{c}", "sum") if f == "sumsq"
        else (c, f)
        for c, f in spec
    ])
    # arrow output order: key columns first, then "<col>_<fn>" in
    # spec order — rename the latter to the stable partial names
    return out.rename_columns(keys + [partial_needed[cf] for cf in spec])


def merge_partials_keep(g: pa.Table, keys: list[str],
                        aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Collapse a union of ``partial_aggregate`` outputs to ONE partial
    row per key — output stays in PARTIAL form (stable ``__p_*``
    columns), so it can merge again at a coarser key set (the rollup
    cascade) or later in time (incremental views)."""
    partial_needed, spec = _resolve_partials(aggs)
    merge_aggs = []
    for col, fn in spec:
        pname = partial_needed[(col, fn)]
        merge_fn = "sum" if fn in ("sum", "count", "countv", "sumsq") \
            else fn
        merge_aggs.append((pname, merge_fn))
    merged = pa.TableGroupBy(
        g.select(keys + [partial_needed[cf] for cf in spec]), keys
    ).aggregate(merge_aggs)
    return merged.rename_columns(
        keys + [partial_needed[cf] for cf in spec]
    )


def finalize_partials(merged: pa.Table, keys: list[str],
                      aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Partial columns → final (keys, alias) columns: sum/min/max pass
    through, count casts to int64, mean divides its sum partial by its
    count partial. Pure column arithmetic — no grouping."""
    partial_needed, _ = _resolve_partials(aggs)
    cols = {k: merged[k] for k in keys}
    for col, op, alias in aggs:
        if op == "mean":
            s = merged[partial_needed[(col, "sum")]]
            c = merged[partial_needed[(col, "countv")]]
            cols[alias] = pc.divide(pc.cast(s, pa.float64()),
                                    pc.cast(c, pa.float64()))
        elif op in ("var", "std"):
            # POPULATION variance by the E[x²]−E[x]² identity, evaluated
            # in this exact float64 op order — an oracle writing
            # sum(x*x)/n - (sum(x)/n)*(sum(x)/n) is bit-identical.
            # Exact while the integer sums stay ≤ 2^53 (integer inputs
            # like cents); beyond that, like any one-pass identity, it
            # loses precision — shift/center upstream if that matters.
            s = pc.cast(merged[partial_needed[(col, "sum")]], pa.float64())
            c = pc.cast(merged[partial_needed[(col, "countv")]],
                        pa.float64())
            s2 = pc.cast(merged[partial_needed[(col, "sumsq")]],
                         pa.float64())
            m = pc.divide(s, c)
            v = pc.subtract(pc.divide(s2, c), pc.multiply(m, m))
            cols[alias] = pc.sqrt(v) if op == "std" else v
        else:
            v = merged[partial_needed[(col, _OPS[op][0])]]
            cols[alias] = pc.cast(v, pa.int64()) if op == "count" else v
    return pa.table(cols)


def merge_partials(g: pa.Table, keys: list[str],
                   aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Merge any union of ``partial_aggregate`` outputs (same spec) into
    final (keys, alias) rows: sum/count partials re-sum, min/max re-
    min/max, mean divides its sum partial by its count partial."""
    return finalize_partials(merge_partials_keep(g, keys, aggs),
                             keys, aggs)


def merge_partial_dataset(ds, keys: list[str],
                          aggs: list[tuple[str, str, str]],
                          partitions: int = 64):
    """Distributed merge of a Dataset that ALREADY holds
    ``partial_aggregate`` rows: one coarse exchange on the key hash,
    one vectorized ``merge_partials`` per partition. This is the back
    half of ``coarse_groupby``, exposed for consumers whose partials
    were computed elsewhere (the lake's incremental aggregate views)."""
    _validate_aggs(aggs)

    def add_pk(t: pa.Table) -> pa.Table:
        pk = (_hash_key_columns(t, keys)
              % np.uint64(partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    return (ds.map_batches(add_pk, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(lambda g: merge_partials(g, keys, aggs),
                        batch_format="pyarrow"))


def coarse_groupby(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                   partitions: int = 64):
    """Groupby-aggregate for HIGH-cardinality keys.

    ``aggs`` is a list of ``(column, op, alias)`` with op in
    ``{"count", "sum", "min", "max", "mean", "var", "std"}`` (var/std
    are population variants). Returns a Dataset with
    the key columns plus one column per alias. ``count`` counts all rows
    of the group (including nulls in ``column``), matching SQL
    ``count(*)``.

    Use Ray's native ``groupby().aggregate()`` when groups are few; use
    this when group count is large enough that per-group Python overhead
    dominates (≳10⁴ groups)."""
    _validate_aggs(aggs)

    def partial(t: pa.Table) -> pa.Table:
        out = partial_aggregate(t, keys, aggs)
        pk = (_hash_key_columns(out, keys)
              % np.uint64(partitions)).astype(np.int32)
        return out.append_column("_pk", pa.array(pk))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(lambda g: merge_partials(g, keys, aggs),
                        batch_format="pyarrow"))


def topk_per_group(ds, group_col: str, order_col: str, k: int,
                   tiebreak_col: str, descending: bool = True,
                   partitions: int = 64):
    """Top-k rows per group (heavy hitters): rows ranked by
    ``order_col`` (desc by default) with ``tiebreak_col`` ascending for
    determinism.

    Scale shape: a per-batch LOCAL top-k combiner first (each batch
    contributes at most k rows per group it contains — the shuffle
    moves O(k · groups-per-batch), not every row), then one
    coarse-partition exchange and a final vectorized top-k per
    partition. Python runs once per batch/partition, never per group."""

    def _local_topk(t: pa.Table, with_pk: bool) -> pa.Table:
        require_nonnull(t, (group_col, order_col, tiebreak_col),
                        "topk_per_group")
        g_col = t[group_col].combine_chunks()
        if pa.types.is_string(g_col.type) or pa.types.is_large_string(
                g_col.type):
            # group key is only an EQUALITY key for the lexsort runs —
            # dictionary codes are enough (string doc ids arrive here
            # from tfidf_top_terms)
            g = pc.dictionary_encode(g_col).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            g = g_col.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        tb = tiebreak_codes(t[tiebreak_col])
        vkey = desc_key(v) if descending else v
        order = np.lexsort((tb, vkey, g))
        gs = g[order]
        first = np.r_[True, gs[1:] != gs[:-1]]
        # rank within group = position - position of group's first row
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, len(gs)])
        rank = np.arange(len(gs)) - np.repeat(starts, sizes)
        keep = order[rank < k]
        out = t.take(pa.array(np.sort(keep)))
        if with_pk:
            out = add_coarse_pk(out, group_col, partitions)
        return out

    pre = ds.map_batches(lambda t: _local_topk(t, True), batch_format="pyarrow")
    return pre.groupby("_pk").map_groups(
        lambda gr: _local_topk(gr.drop_columns(["_pk"]), False),
        batch_format="pyarrow",
    )


def distinct_count(ds, keys: list[str], value_col: str,
                   alias: str = "n_distinct", partitions: int = 64):
    """Exact ``COUNT(DISTINCT value)`` per key group.

    Scale shape: each batch first collapses to its distinct
    (keys, value) combinations with one vectorized Arrow groupby — the
    exchange then moves one row per distinct combination per batch, not
    every input row; each coarse partition re-dedupes across batches
    and counts, so a group's cost is bounded by its distinct-value
    count, never its row count. Null values are not counted (SQL
    semantics); null keys form their own group (SQL GROUP BY)."""
    sel = keys + [value_col]

    def partial(t: pa.Table) -> pa.Table:
        u = pa.TableGroupBy(t.select(sel), sel).aggregate([])
        u = u.rename_columns(sel)
        pk = (_hash_key_columns(u, keys)
              % np.uint64(partitions)).astype(np.int32)
        return u.append_column("_pk", pa.array(pk))

    def combine(g: pa.Table) -> pa.Table:
        u = pa.TableGroupBy(g.select(sel), sel).aggregate([])
        u = u.rename_columns(sel)
        out = pa.TableGroupBy(u, keys).aggregate([(value_col, "count")])
        return out.rename_columns(keys + [alias])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(combine, batch_format="pyarrow"))


def exact_quantiles(ds, col: str, qs, bins: int = 8192,
                    refine_limit: int = 5_000_000) -> pa.Table:
    """EXACT discrete quantiles of a numeric column at any scale, in
    three streaming passes — no global sort, no full materialization.

    Convention matches DuckDB ``quantile_disc``: the element at rank
    ``max(ceil(n * q) - 1, 0)`` (0-indexed) over the non-null values
    (probed empirically: n=10, q=0.95 -> index 9, which floor((n-1)q)
    would put at 8).

    Pass 1 reduces (count, min, max). Pass 2 histograms every batch
    into ``bins`` uniform buckets carrying (count, min, max) per bucket
    and merges them through ``coarse_groupby`` — ≤ ``bins`` rows ever
    reach the driver. The driver locates each target rank's bucket;
    buckets where min == max resolve immediately (heavy duplicates cost
    nothing). Pass 3 collects ONLY the values inside still-unresolved
    buckets (expected n/bins rows each, ``refine_limit`` guard) and
    selects the exact rank with one ``np.partition``.

    Returns a pyarrow Table (q: float64, value: float64).
    """
    qs = [float(q) for q in qs]
    if not qs or any(q < 0 or q > 1 for q in qs):
        raise ValueError("qs must be non-empty fractions in [0, 1]")

    def stats(t: pa.Table) -> pa.Table:
        c = pc.cast(t[col], pa.float64())
        # Arrow min/max SKIP NaN while drop_null keeps it — NaN rows
        # are counted separately and occupy the TOP ranks (SQL/DuckDB
        # total order puts NaN above everything); binning them would
        # silently poison bin 0 (NaN casts to INT64_MIN -> clip 0)
        return pa.table({
            "n": pa.array([t.num_rows - t[col].null_count], pa.int64()),
            "nnan": pa.array([int(pc.sum(pc.is_nan(c)).as_py() or 0)],
                             pa.int64()),
            "mn": pa.array([pc.min(c).as_py()], pa.float64()),
            "mx": pa.array([pc.max(c).as_py()], pa.float64()),
        })

    st_batches = list(ds.map_batches(stats, batch_format="pyarrow")
                      .iter_batches(batch_size=None, batch_format="pyarrow"))
    st = pa.concat_tables(st_batches) if st_batches else None
    n = int(pc.sum(st["n"]).as_py() or 0) if st is not None else 0
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), pa.float64())})
    n_nan = int(pc.sum(st["nnan"]).as_py() or 0)
    n_finite = n - n_nan  # "finite" = non-NaN (infinities keep binning)
    ranks = {q: max(int(np.ceil(n * q)) - 1, 0) for q in qs}
    out_nan = {q: float("nan") for q, r in ranks.items() if r >= n_finite}
    ranks = {q: r for q, r in ranks.items() if r < n_finite}
    if not ranks:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array([out_nan[q] for q in qs],
                                           pa.float64())})
    mn = float(pc.min(st["mn"]).as_py())
    mx = float(pc.max(st["mx"]).as_py())
    if mn == mx:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.array(
                             [out_nan.get(q, mn) for q in qs],
                             pa.float64())})
    width = (mx - mn) / bins

    def bin_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - mn) / width).astype(np.int64), 0, bins - 1)

    def hist(t: pa.Table) -> pa.Table:
        c = pc.cast(t[col], pa.float64()).combine_chunks()
        v = c.drop_null().to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]  # NaN ranks are resolved analytically above
        if len(v) == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64()),
                             "bmn": pa.array([], pa.float64()),
                             "bmx": pa.array([], pa.float64())})
        b = bin_of(v)
        order = np.argsort(b, kind="stable")
        bs, vs = b[order], v[order]
        first = np.r_[True, bs[1:] != bs[:-1]]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(bs)])
        return pa.table({"bin": pa.array(bs[starts]),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "bmn": pa.array(np.minimum.reduceat(vs, starts)),
                         "bmx": pa.array(np.maximum.reduceat(vs, starts))})

    hb = coarse_groupby(
        ds.map_batches(hist, batch_format="pyarrow"), ["bin"],
        [("cnt", "sum", "cnt"), ("bmn", "min", "bmn"), ("bmx", "max", "bmx")],
        partitions=min(64, bins),
    )
    ht = pa.concat_tables(hb.iter_batches(batch_size=None,
                                          batch_format="pyarrow"))
    order = pc.sort_indices(ht, sort_keys=[("bin", "ascending")])
    ht = ht.take(order)
    hbin = ht["bin"].to_numpy(zero_copy_only=False)
    hcnt = ht["cnt"].to_numpy(zero_copy_only=False)
    hmn = ht["bmn"].to_numpy(zero_copy_only=False)
    hmx = ht["bmx"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(hcnt)

    out: dict[float, float] = {}
    need: dict[int, list[tuple[float, int]]] = {}  # bin -> [(q, local rank)]
    for q, r in ranks.items():
        i = int(np.searchsorted(cum, r + 1))
        before = int(cum[i - 1]) if i else 0
        if hmn[i] == hmx[i]:
            out[q] = float(hmn[i])
        else:
            need.setdefault(int(hbin[i]), []).append((q, r - before))
    if need:
        need_bins = np.array(sorted(need), np.int64)
        total_need = int(hcnt[np.isin(hbin, need_bins)].sum())
        if total_need > refine_limit:
            raise ValueError(
                f"quantile refinement would collect {total_need} rows "
                f"(> refine_limit={refine_limit}); raise bins= or "
                "refine_limit=")

        def pick(t: pa.Table) -> pa.Table:
            c = pc.cast(t[col], pa.float64()).combine_chunks()
            v = c.drop_null().to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            if len(v) == 0:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            b = bin_of(v)
            m = np.isin(b, need_bins)
            return pa.table({"bin": pa.array(b[m]), "v": pa.array(v[m])})

        got = pa.concat_tables(
            ds.map_batches(pick, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        gb = got["bin"].to_numpy(zero_copy_only=False)
        gv = got["v"].to_numpy(zero_copy_only=False)
        for b, wants in need.items():
            vals = gv[gb == b]
            for q, lr in wants:
                out[q] = float(np.partition(vals, lr)[lr])
    out.update(out_nan)
    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array([out[q] for q in qs], pa.float64())})


# ---------------------------------------------------- approximate distinct


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (no float round-trip — a
    float64 conversion rounds values near powers of two across the
    boundary and shifts the HLL rank by one)."""
    bl = np.zeros(len(w), np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        w[big] >>= np.uint64(shift)
    return bl + (w > 0)


def _hll_ranks(h: np.ndarray, p: int):
    """(register index, rank) per hash: index = top p bits, rank =
    1 + leading zeros of the remaining 64-p bits (capped at 64-p+1)."""
    q = 64 - p
    idx = (h >> np.uint64(q)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(q)) - np.uint64(1))
    rank = (q + 1 - _bit_length_u64(w)).astype(np.uint8)
    return idx, rank


def _hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Bias-corrected HLL estimate per row of a (groups, m) register
    matrix, with the standard small-range (linear counting) correction."""
    m = regs.shape[1]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, est)


def _hash_value_column(col) -> np.ndarray:
    """uint64 content hash of one column (string or castable-to-int64),
    null-safe (nulls get an arbitrary value; callers mask them out)."""
    t = pa.table({"v": col})
    return _hash_key_columns(t, ["v"])


def approx_distinct_count(ds, keys: list[str] | None, value_col: str,
                          alias: str = "n_distinct_approx",
                          precision: int = 12, partitions: int = 64):
    """Approximate ``COUNT(DISTINCT value)`` per key group (HyperLogLog,
    standard error ≈ 1.04/√2^precision — ~1.6% at the default p=12).

    This is the 100-TB sibling of the exact ``distinct_count``: the
    exact operator's exchange grows with the number of distinct
    (key, value) pairs, while this one moves a FIXED 2^precision-byte
    register blob per (group, batch) regardless of value cardinality —
    the sketch is the partial, and register-wise ``max`` is the
    associative merge. ``keys=None`` computes one corpus-wide count.
    Null values are not counted (SQL); null keys group together (SQL
    GROUP BY). Returns keys + ``alias`` (float64 estimate) —
    rows-only verifiable by nature; the exact operator is the oracle-
    checked sibling."""
    if not 4 <= precision <= 16:
        raise ValueError("precision must be in [4, 16]")
    m = 1 << precision
    keys = list(keys or [])

    def partial(t: pa.Table) -> pa.Table:
        val = t[value_col]
        ok = pc.is_valid(val).to_numpy(zero_copy_only=False)
        # group set over ALL rows (not just valid-value rows): a group
        # whose values are entirely null must still emit a partial so
        # the estimate is 0, matching the exact sibling's (key, 0) row
        if keys:
            gh_all = _hash_key_columns(t, keys)
        else:
            gh_all = np.zeros(t.num_rows, np.uint64)
        ug, first, ginv_all = np.unique(gh_all, return_index=True,
                                        return_inverse=True)
        regs = np.zeros((len(ug), m), np.uint8)
        h = _hash_value_column(val)[ok]
        if len(h):
            idx, rank = _hll_ranks(h, precision)
            np.maximum.at(regs, (ginv_all[ok], idx), rank)
        cols = {}
        kt = t.take(pa.array(first))
        for k in keys:
            cols[k] = kt[k]
        # ONE serialization of the register matrix, sliced per group —
        # tobytes inside the per-group loop was O(G^2 * m) per batch
        buf = regs.tobytes(order="C")
        cols["__hll"] = pa.array(
            [buf[i * m:(i + 1) * m] for i in range(len(ug))], pa.binary())
        cols["_pk"] = pa.array((ug % np.uint64(partitions)).astype(np.int32))
        return pa.table(cols)

    def combine(g: pa.Table) -> pa.Table:
        n = g.num_rows
        blob = g["__hll"].combine_chunks()
        mat = np.frombuffer(b"".join(blob.to_pylist()), np.uint8) \
            .reshape(n, m)
        if keys:
            gh = _hash_key_columns(g, keys)
        else:
            gh = np.zeros(n, np.uint64)
        order = np.argsort(gh, kind="stable")
        gs = gh[order]
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        merged = np.maximum.reduceat(mat[order], starts, axis=0)
        est = _hll_estimate(merged)
        rows = order[starts]
        cols = {}
        kt = g.take(pa.array(rows))
        for k in keys:
            cols[k] = kt[k]
        cols[alias] = pa.array(est, pa.float64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(combine, batch_format="pyarrow"))


def quantiles_per_group(ds, group_col: str, value_col: str, qs,
                        partitions: int = 64, out_col: str = "value"):
    """EXACT discrete quantiles PER GROUP — SQL
    ``quantile_disc(value, q) GROUP BY key`` in long form (one output
    row per (group, q)). Same rank convention as ``exact_quantiles``:
    element at 0-indexed rank ``max(ceil(n_g · q) − 1, 0)`` over the
    group's non-null values.

    Scale shape: the standard ONE coarse exchange on the group key
    (unlike the global ``exact_quantiles``' histogram passes, a group's
    values fit one partition task — the usual contract), then one
    lexsort + one gather per partition, Python once per partition.
    Null values are dropped first (SQL aggregate semantics); groups
    whose values are ALL null are therefore absent — mirror with
    ``WHERE value IS NOT NULL`` in the oracle. Null group keys raise.
    String or integer group keys both work (dictionary-encoded)."""
    qs = [float(q) for q in qs]
    if not qs or any(q < 0 or q > 1 for q in qs):
        raise ValueError("qs must be non-empty fractions in [0, 1]")
    qv = np.array(sorted(qs), np.float64)

    def pick(group: pa.Table) -> pa.Table:
        g0 = group.drop_columns(["_pk"])
        g0 = g0.filter(pc.is_valid(g0[value_col]))
        require_nonnull(g0, (group_col,), "quantiles_per_group")
        if g0.num_rows == 0:
            return pa.table({
                group_col: pa.array([], group.schema.field(group_col).type),
                "q": pa.array([], pa.float64()),
                out_col: pa.array([], pa.float64()),
            })
        karr = g0[group_col].combine_chunks()
        g = pc.dictionary_encode(karr).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = pc.cast(g0[value_col], pa.float64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        gs = g[order]
        first = np.r_[True, gs[1:] != gs[:-1]]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.r_[starts, len(gs)])
        # rank matrix: groups × qs, gathered in one shot
        ranks = np.maximum(np.ceil(sizes[:, None] * qv[None, :]) - 1,
                           0).astype(np.int64)
        idx = order[starts[:, None] + ranks]
        keys = karr.take(pa.array(np.repeat(order[starts], len(qv))))
        return pa.table({
            group_col: keys,
            "q": pa.array(np.tile(qv, len(starts))),
            out_col: pa.array(v[idx.ravel()]),
        })

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(pick, batch_format="pyarrow"))


def histogram(ds, col: str, lo: float, hi: float, bins: int = 100,
              closed_last: bool = True):
    """Fixed-bin histogram of a numeric column: counts per
    ``[lo + i·w, lo + (i+1)·w)`` bucket (``w = (hi−lo)/bins``), last
    bucket closed on the right when ``closed_last``. Rows outside
    [lo, hi] and nulls are dropped (SQL WHERE semantics).

    Scale shape: one ``np.bincount`` per batch (a fixed ``bins``-length
    partial row each), summed on the driver — ≤ ``bins`` ints ever
    leave a task, no exchange at all. Returns a pyarrow Table
    (bin: int64, lo: float64, hi: float64, count: int64), empty bins
    included."""
    if bins < 1 or not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        raise ValueError("need bins >= 1 and finite lo < hi")
    w = (hi - lo) / bins

    def part(t: pa.Table) -> pa.Table:
        c = pc.cast(t[col], pa.float64())
        v = pc.drop_null(c).to_numpy(zero_copy_only=False)
        if closed_last:
            inside = (v >= lo) & (v <= hi)
        else:
            inside = (v >= lo) & (v < hi)
        v = v[inside]
        # clamp BOTH paths: fp division can put v = hi−ε at index ==
        # bins, which would emit a bins+1-length partial and break the
        # driver reshape
        b = np.minimum(((v - lo) / w).astype(np.int64), bins - 1)
        return pa.table({"h": pa.array(
            np.bincount(b, minlength=bins).astype(np.int64))})

    parts = list(ds.map_batches(part, batch_format="pyarrow")
                 .iter_batches(batch_size=None, batch_format="pyarrow"))
    total = np.zeros(bins, np.int64)
    for p in parts:
        # a block may hold several concatenated bins-length partials
        total += p["h"].to_numpy(zero_copy_only=False) \
            .reshape(-1, bins).sum(axis=0)
    i = np.arange(bins)
    return pa.table({
        "bin": pa.array(i),
        "lo": pa.array(lo + i * w),
        "hi": pa.array(lo + (i + 1) * w),
        "count": pa.array(total),
    })


def _grouping_sets_impl(ds, keys: list[str],
                        aggs: list[tuple[str, str, str]],
                        subsets: list[tuple[int, ...]],
                        partitions: int, gid_col: str):
    """Shared core of ``rollup`` / ``cube`` / ``grouping_sets``: the
    aggregate at every requested key SUBSET in one pass over the data.
    Rolled-up key columns are NULL and ``gid_col`` carries DuckDB's
    ``grouping_id`` (bit per key in declaration order, MSB first, set
    when rolled up), which disambiguates rollup NULLs from data NULLs
    exactly as in SQL.

    Scale shape: the input is reduced ONCE by per-batch
    ``partial_aggregate`` on the full key set and merged ONCE at the
    finest level (the only exchange that sees O(batch-partials) rows);
    the collapsed finest-level partials — O(distinct full-key combos) —
    then FAN OUT once (one tagged copy per coarser subset, partition
    key = hash(level, subset keys)) through ONE more exchange, and each
    partition task merges every level slice it holds (the partial
    algebra is associative — re-aggregating finalized values would be
    wrong for ``mean``). TWO exchanges total regardless of how many
    subsets; rows exchanged: O(batch-partials + subsets × distinct),
    not the naive O(subsets × batch-partials)."""
    _validate_aggs(aggs)
    n = len(keys)
    if n == 0:
        raise ValueError("grouping sets need at least one key")
    seen = set()
    for s in subsets:
        if tuple(s) in seen:
            raise ValueError(f"duplicate grouping set {s}")
        seen.add(tuple(s))
        if (any(i < 0 or i >= n for i in s) or list(s) != sorted(s)
                or len(set(s)) != len(s)):
            raise ValueError(
                f"grouping set {s} must be sorted UNIQUE indices into keys")
    key_fields = {f.name: f.type for f in
                  (ds.schema().base_schema
                   if hasattr(ds.schema(), "base_schema")
                   else ds.schema())}
    aliases = [a for _, _, a in aggs]

    part = ds.map_batches(lambda t: partial_aggregate(t, keys, aggs),
                          batch_format="pyarrow")

    def _merge_keep(src, lkeys: list[str], nparts: int):
        def add_pk(t: pa.Table, lk=tuple(lkeys), np_=nparts) -> pa.Table:
            pk = (_hash_key_columns(t, list(lk))
                  % np.uint64(np_)).astype(np.int32)
            return t.append_column("_pk", pa.array(pk))

        return (src.map_batches(add_pk, batch_format="pyarrow")
                .groupby("_pk")
                .map_groups(
                    lambda g, lk=tuple(lkeys): merge_partials_keep(
                        g.drop_columns(["_pk"]), list(lk), aggs),
                    batch_format="pyarrow"))

    # the one big exchange + barrier: collapsed partials per full key
    full = tuple(range(n))
    subs = [tuple(s) for s in subsets]
    levels = {li: s for li, s in enumerate(subs)}

    def _finish(t: pa.Table, sub: tuple[int, ...]) -> pa.Table:
        gid = sum(1 << (n - 1 - i) for i in range(n) if i not in sub)
        skeys = [keys[i] for i in sub]
        t = finalize_partials(t, skeys, aggs)
        for i, k in enumerate(keys):
            if i not in sub:
                t = t.append_column(k, pa.nulls(t.num_rows, key_fields[k]))
        t = t.append_column(
            gid_col, pa.array(np.full(t.num_rows, gid, np.int64)))
        return t.select(keys + [gid_col] + aliases)

    finest = _merge_keep(part, keys, partitions)
    coarser = [(li, s) for li, s in levels.items() if s != full]
    if not coarser:
        return finest.map_batches(lambda t: _finish(t, full),
                                  batch_format="pyarrow")
    finest = finest.materialize()

    # ONE fan-out exchange for every coarser subset: tag each collapsed
    # finest partial with (level, hash(level, subset keys)) — the level
    # id is mixed into the partition key, so the grand total's single
    # group and every other level co-schedule in the same sort
    def fan(t: pa.Table) -> pa.Table:
        outs = []
        for li, s in coarser:
            skeys = [keys[i] for i in s]
            h = _hash_key_columns(t, skeys) if skeys \
                else np.zeros(t.num_rows, np.uint64)
            with np.errstate(over="ignore"):
                h = splitmix64(h ^ (np.uint64(li + 1) * _GOLDEN))
            pk = (h % np.uint64(partitions * max(len(coarser), 1))) \
                .astype(np.int32)
            outs.append(t.append_column(
                "_lvl", pa.array(np.full(t.num_rows, li, np.int16)))
                .append_column("_pk", pa.array(pk)))
        return pa.concat_tables(outs)

    def combine(g: pa.Table) -> pa.Table:
        lv = g["_lvl"].to_numpy(zero_copy_only=False)
        outs = []
        for li in np.unique(lv):
            s = levels[int(li)]
            skeys = [keys[i] for i in s]
            rows = g.filter(pa.array(lv == li)).drop_columns(
                ["_lvl", "_pk"])
            if skeys:
                merged = merge_partials_keep(rows, skeys, aggs)
            else:
                rows = rows.append_column(
                    "_all", pa.array(np.zeros(rows.num_rows, np.int8)))
                merged = merge_partials_keep(rows, ["_all"], aggs) \
                    .drop_columns(["_all"])
            outs.append(_finish(merged, s))
        return pa.concat_tables(outs)

    fanned = (finest.map_batches(fan, batch_format="pyarrow")
              .groupby("_pk")
              .map_groups(combine, batch_format="pyarrow"))
    if full in subs:
        return fanned.union(finest.map_batches(
            lambda t: _finish(t, full), batch_format="pyarrow"))
    return fanned


def rollup(ds, keys: list[str], aggs: list[tuple[str, str, str]],
           partitions: int = 64, gid_col: str = "gid"):
    """``GROUP BY ROLLUP(keys...)``: every key-PREFIX level, finest
    (all keys) up to the grand total. See ``_grouping_sets_impl`` for
    the one-reduce scale shape and gid semantics."""
    n = len(keys)
    return _grouping_sets_impl(
        ds, keys, aggs, [tuple(range(L)) for L in range(n, -1, -1)],
        partitions, gid_col)


def cube(ds, keys: list[str], aggs: list[tuple[str, str, str]],
         partitions: int = 64, gid_col: str = "gid"):
    """``GROUP BY CUBE(keys...)``: every SUBSET of the keys — 2^n
    levels, all fanned off the ONE collapsed finest-level partial set
    (the input is still read and reduced exactly once). Capped at 5
    keys (32 levels) — beyond that the union fan-out itself is the
    bottleneck and an explicit ``grouping_sets`` choice is saner."""
    n = len(keys)
    if n > 5:
        raise ValueError("cube supports at most 5 keys (2^n levels); "
                         "use grouping_sets for a curated subset list")
    subs = [tuple(i for i in range(n) if not (mask >> (n - 1 - i)) & 1)
            for mask in range(1 << n)]
    return _grouping_sets_impl(ds, keys, aggs, subs, partitions, gid_col)


def grouping_sets(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                  sets: list[list[str]], partitions: int = 64,
                  gid_col: str = "gid"):
    """``GROUP BY GROUPING SETS ((...), ...)``: explicit subset list,
    each named by key columns (subset of ``keys``, any order)."""
    pos = {k: i for i, k in enumerate(keys)}
    subs = []
    for s in sets:
        unknown = [k for k in s if k not in pos]
        if unknown:
            raise ValueError(f"grouping set {s} names non-keys {unknown}")
        subs.append(tuple(sorted(pos[k] for k in s)))
    return _grouping_sets_impl(ds, keys, aggs, subs, partitions, gid_col)


def describe(ds, cols: list[str]):
    """One-pass per-column summary (count / mean / std / min / max) —
    the dataframe ``describe()`` of the partial algebra: every batch
    collapses to ONE partial row (five partials per column), the tiny
    partial stream merges in a single task, and the result is one row
    per column. count is count(*) including nulls (row count); mean/
    std ignore nulls (SQL semantics); std is the POPULATION std via
    the pinned-op-order identity (see ``finalize_partials``), so a SQL
    oracle writing the same arithmetic matches bit-exactly on integer
    inputs. No exchange: the only movement is one partial row per
    batch."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = ([(c, "count", f"__n_{c}") for c in cols]
            + [(c, "mean", f"__mean_{c}") for c in cols]
            + [(c, "std", f"__std_{c}") for c in cols]
            + [(c, "min", f"__min_{c}") for c in cols]
            + [(c, "max", f"__max_{c}") for c in cols])

    def part(t: pa.Table) -> pa.Table:
        t = t.select(cols).append_column(
            "_all", pa.array(np.zeros(t.num_rows, np.int8)))
        return partial_aggregate(t, ["_all"], aggs)

    def finish(g: pa.Table) -> pa.Table:
        f = merge_partials(g, ["_all"], aggs)
        rows = {"column": pa.array(cols, pa.string())}
        for stat in ("n", "mean", "std", "min", "max"):
            rows[stat] = pa.array(
                [pc.cast(f[f"__{stat}_{c}"], pa.float64())[0].as_py()
                 for c in cols],
                pa.float64())
        return pa.table(rows)

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("_all")
            .map_groups(finish, batch_format="pyarrow"))


def corr_per_group(ds, keys: list[str], x_col: str, y_col: str,
                   alias: str = "corr", partitions: int = 64):
    """Pearson correlation per group via the one-pass sums identity
    ``(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx·Σx) · √(n·Σy² − Σy·Σy))`` —
    the sample/population normalizations cancel, so this equals SQL
    ``corr(x, y)``. Rows where EITHER side is NULL are dropped first
    (SQL pairwise semantics). Constant x or y within a group → NULL.

    The five sums are exact integers while inputs are integers and the
    sums stay ≤ 2^53 (use cents); every later float64 op follows this
    exact expression-tree order, so an oracle writing the same
    arithmetic is bit-identical. Scale shape: per-batch sums collapse
    each batch to one row per (group, batch) BEFORE the one coarse
    exchange — identical to ``coarse_groupby``."""

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t[x_col]), pc.is_valid(t[y_col]))
        t = t.filter(m)
        x = pc.cast(t[x_col], pa.float64())
        y = pc.cast(t[y_col], pa.float64())
        d = t.select(keys)
        d = d.append_column("__x", x).append_column("__y", y)
        d = d.append_column("__xx", pc.multiply(x, x))
        d = d.append_column("__yy", pc.multiply(y, y))
        d = d.append_column("__xy", pc.multiply(x, y))
        g = pa.TableGroupBy(d, keys).aggregate(
            [("__x", "count", pc.CountOptions(mode="all")),
             ("__x", "sum"), ("__y", "sum"), ("__xx", "sum"),
             ("__yy", "sum"), ("__xy", "sum")])
        g = g.rename_columns(keys + ["__n", "__sx", "__sy", "__sxx",
                                     "__syy", "__sxy"])
        pk = (_hash_key_columns(g, keys)
              % np.uint64(partitions)).astype(np.int32)
        return g.append_column("_pk", pa.array(pk))

    def combine(g: pa.Table) -> pa.Table:
        m = pa.TableGroupBy(g.drop_columns(["_pk"]), keys).aggregate(
            [(c, "sum") for c in ("__n", "__sx", "__sy", "__sxx",
                                  "__syy", "__sxy")])
        m = m.rename_columns(keys + ["__n", "__sx", "__sy", "__sxx",
                                     "__syy", "__sxy"])
        n = pc.cast(m["__n"], pa.float64())
        sx, sy = m["__sx"], m["__sy"]
        num = pc.subtract(pc.multiply(n, m["__sxy"]),
                          pc.multiply(sx, sy))
        dx = pc.sqrt(pc.subtract(pc.multiply(n, m["__sxx"]),
                                 pc.multiply(sx, sx)))
        dy = pc.sqrt(pc.subtract(pc.multiply(n, m["__syy"]),
                                 pc.multiply(sy, sy)))
        den = pc.multiply(dx, dy)
        out = pc.if_else(pc.equal(den, 0.0),
                         pa.nulls(m.num_rows, pa.float64()),
                         pc.divide(num, den))
        return pa.table({**{k: m[k] for k in keys}, alias: out})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(combine, batch_format="pyarrow"))


def explode(ds, list_col: str, keep_cols: list[str] | None = None,
            pos_col: str | None = None, value_col: str | None = None):
    """UNNEST a list column: one output row per list element, kept
    columns repeated by gather. NULL and empty lists emit nothing
    (SQL ``UNNEST`` semantics). With ``pos_col``, adds the 0-based
    element index. Pure vectorized reshape — ``list_flatten`` +
    ``list_parent_indices`` on Arrow buffers, zero exchange, streams
    at any scale."""
    value_col = value_col or list_col

    def f(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        vals = pc.list_flatten(col)
        parents = pc.list_parent_indices(col)
        keep = keep_cols if keep_cols is not None \
            else [c for c in t.column_names if c != list_col]
        cols = {c: t[c].combine_chunks().take(parents) for c in keep}
        if pos_col is not None:
            # element index = arange minus each row's start offset,
            # gathered per parent
            starts = np.zeros(len(parents), np.int64)
            if len(parents):
                p = parents.to_numpy(zero_copy_only=False)
                first = np.r_[True, p[1:] != p[:-1]]
                idx = np.arange(len(p), dtype=np.int64)
                starts = idx - np.maximum.accumulate(
                    np.where(first, idx, 0))
            cols[pos_col] = pa.array(starts)
        cols[value_col] = vals
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def melt(ds, id_cols: list[str], value_cols: list[str],
         name_col: str = "name", value_col: str = "value"):
    """UNPIVOT / melt: turn ``value_cols`` into (name, value) long-form
    rows — one output row per (input row × value column). Pure
    vectorized ``map_batches`` (concat of column slices + a tiled
    dictionary name column), zero exchange, streams at any scale.
    Value columns are cast to a common float64; SQL UNPIVOT's
    null-dropping variant is NOT applied (every pair emitted, matching
    ``UNPIVOT INCLUDE NULLS``)."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def m(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = {c: pa.concat_arrays(
            [t[c].combine_chunks()] * len(value_cols))
            if n else pa.array([], t.schema.field(c).type)
            for c in id_cols}
        names = pa.array(np.repeat(np.array(value_cols, object), n)
                         if n else np.array([], object), pa.string())
        vals = (pa.concat_arrays(
            [pc.cast(t[c].combine_chunks(), pa.float64())
             for c in value_cols]) if n
            else pa.array([], pa.float64()))
        return pa.table({**ids, name_col: names, value_col: vals})

    return ds.select_columns(id_cols + value_cols) \
        .map_batches(m, batch_format="pyarrow")


def pivot(ds, key_col: str, name_col: str, value_col: str,
          names: list[str], agg: str = "sum", partitions: int = 64):
    """PIVOT long (name, value) rows to wide — one output column per
    entry in ``names`` holding ``agg`` of ``value_col`` where
    ``name_col`` matches (SQL's conditional-aggregation form:
    ``sum(CASE WHEN name = 'a' THEN value END) AS a``). ``names`` is
    explicit (no discovery pass) so the output schema is static, as a
    distributed engine needs. Unlisted names are ignored; a key with no
    rows for some name gets NULL there, matching SQL.

    Scale shape: each batch masks value columns per name (vectorized
    ``if_else``) and pre-aggregates via the shared ``coarse_groupby``
    — the exchange moves one partial row per (key, batch)."""
    if agg not in ("sum", "min", "max", "count", "mean"):
        raise ValueError(f"unsupported pivot agg {agg!r}")
    if not names:
        raise ValueError("names must be non-empty")
    safe = [f"__pv_{i}" for i in range(len(names))]

    # coarse_groupby's "count" is count(*) (mode="all", nulls included),
    # so conditional COUNT pivots as the SUM of a 0/1 match indicator —
    # SQL count(CASE WHEN ... THEN v END) counts matched non-null v
    eff_agg = "sum" if agg == "count" else agg

    def widen(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        v = t[value_col]
        for s, nm in zip(safe, names):
            m = pc.fill_null(pc.equal(t[name_col], pa.scalar(nm)), False)
            if agg == "count":
                m = pc.and_(m, pc.is_valid(v))
                cols[s] = pc.cast(m, pa.int64())
            else:
                cols[s] = pc.if_else(m, v, pa.nulls(t.num_rows, v.type))
        return pa.table(cols)

    wide = ds.select_columns([key_col, name_col, value_col]) \
        .map_batches(widen, batch_format="pyarrow")
    out = coarse_groupby(wide, [key_col],
                         [(s, eff_agg, s) for s in safe],
                         partitions=partitions)

    def rename(t: pa.Table) -> pa.Table:
        # merge_partials emits [key] + aliases in agg order — static
        return t.select([key_col] + safe).rename_columns(
            [key_col] + list(names))

    return out.map_batches(rename, batch_format="pyarrow")


def approx_topk(ds, value_col: str, k: int = 10, capacity: int = 4096):
    """Approximate global top-k heavy hitters in ONE streaming pass
    with ZERO exchange — the Misra–Gries summary (mergeable-summaries
    form, Agarwal et al. 2012): each batch collapses to its exact value
    counts and truncates to an MG summary of ``capacity`` counters
    (subtract the (capacity+1)-th largest count, drop non-positive);
    summaries merge once on the driver by summed counts + one more MG
    truncation. num_blocks × capacity rows ever move — no shuffle at
    all, unlike the exact path (``coarse_groupby`` + top-k), which pays
    one all-to-all on the value hash. This is the sketch sibling of the
    exact heavy-hitter path, the way ``approx_distinct_count`` (HLL)
    siblings ``distinct_count``.

    Guarantee: every returned ``count`` is a LOWER bound of the true
    count, undercounting by at most the returned ``err`` (the summed
    truncation decrements). A value NOT returned has true count at
    most ``err`` + the smallest returned count (it may have survived
    truncation but ranked below k). With ``capacity`` ≥ the
    distinct-value count nothing truncates, ``err`` is 0 and counts
    are exact. Ties in the final top-k break by value ascending
    (deterministic in exact mode).

    Returns a pyarrow Table (value_col, count, err), top-k by
    (count desc, value asc). Null values are not counted (SQL
    count(value) semantics)."""
    if k <= 0 or capacity <= 0:
        raise ValueError("approx_topk: k and capacity must be positive")
    if value_col in ("count", "err", "_cnt"):
        # the output dict would silently swallow the value column
        raise ValueError("approx_topk: value_col may not be named "
                         "'count', 'err' or '_cnt' — rename it upstream")

    def _truncate(vals: pa.Array, cnts: np.ndarray):
        """MG truncation to ``capacity`` counters: subtract the
        (capacity+1)-th largest count from every counter, drop the
        non-positive. Returns (vals, cnts, threshold)."""
        if len(cnts) <= capacity:
            return vals, cnts, 0
        thr = int(np.partition(cnts, len(cnts) - capacity - 1)
                  [len(cnts) - capacity - 1])
        dec = cnts - thr
        keep = dec > 0
        return vals.filter(pa.array(keep)), dec[keep], thr

    def summarize(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select([value_col]).drop_null(),
                            [value_col]).aggregate([([], "count_all")])
        vals = g.column(0).combine_chunks()
        cnts = g.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts, thr = _truncate(vals, cnts)
        # one SENTINEL row (null value) carries this summary's
        # truncation decrement — driver batches may coalesce many
        # summaries, so the bound must ride in-band, not per-batch
        sent = pa.table({value_col: pa.nulls(1, vals.type),
                         "_cnt": pa.array([thr], pa.int64())})
        body = pa.table({value_col: vals,
                         "_cnt": pa.array(cnts, pa.int64())})
        return pa.concat_tables([body, sent])

    parts = [bt for bt in ds.map_batches(
        summarize, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow")]
    if not parts:
        rs = ds.schema()
        vt = (dict(zip(rs.names, rs.types)).get(value_col, pa.string())
              if rs is not None else pa.string())
        return pa.table({value_col: pa.array([], vt),
                         "count": pa.array([], pa.int64()),
                         "err": pa.array([], pa.int64())})
    allp = pa.concat_tables(parts, promote_options="default")
    null_mask = pc.is_null(allp[value_col])
    err = int(pc.sum(allp.filter(null_mask)["_cnt"]).as_py() or 0)
    merged = pa.TableGroupBy(allp.filter(pc.invert(null_mask)),
                             [value_col]).aggregate([("_cnt", "sum")])
    vals = merged.column(0).combine_chunks()
    cnts = merged.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    vals, cnts, thr2 = _truncate(vals, cnts)
    err += int(thr2)
    fin = pa.table({value_col: vals, "count": pa.array(cnts, pa.int64())})
    fin = fin.sort_by([("count", "descending"),
                       (value_col, "ascending")]).slice(0, k)
    return fin.append_column(
        "err", pa.array(np.full(fin.num_rows, err, np.int64)))


def topk_global(ds, order_col: str, k: int, tiebreak_col: str,
                descending: bool = True):
    """EXACT global top-k rows by ``order_col`` — ``topk_per_group``
    with a constant group key: each batch's local combiner bounds the
    exchange to k rows per batch, the single merge partition finishes.
    The exact sibling of ``approx_topk`` (which trades the exchange
    for a bounded undercount)."""

    def add_g(t: pa.Table) -> pa.Table:
        # in-batch name check (a driver-side ds.schema() probe would
        # EXECUTE the upstream pipeline once just for the guard)
        if "_g" in t.column_names:
            raise ValueError("topk_global: input already has a '_g' "
                             "column (internal constant-group key) — "
                             "rename it")
        return t.append_column("_g", pa.array(
            np.zeros(t.num_rows, np.int8)))

    out = topk_per_group(ds.map_batches(add_g, batch_format="pyarrow"),
                         "_g", order_col, k, tiebreak_col,
                         descending=descending, partitions=1)
    return out.map_batches(lambda t: t.drop_columns(["_g"]),
                           batch_format="pyarrow")
