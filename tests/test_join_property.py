"""Property tests for the temporal-join merge core (pure numpy — no
Ray): the segment-cummax as-of match must equal a brute-force reference
on arbitrary key/ts/side layouts, including negative timestamps, heavy
ties, empty sides, and invalid left rows."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dcpray.functions.join import _asof_merge_arrays


def _brute_asof(k, ts, side, ok):
    """O(n²) reference: for each left row, the right row of the same key
    with max ts ≤ left ts; among equal (key, ts) rights, the LAST in
    (key, ts, stable-input) order wins — mirror the lexsort's stable
    tie-breaking by taking the highest input index among max-ts rights."""
    out = {}
    for i in range(len(k)):
        if side[i] != 1:
            continue
        if not ok[i]:
            out[i] = None
            continue
        best = None
        for j in range(len(k)):
            if side[j] == 0 and k[j] == k[i] and ts[j] <= ts[i]:
                if best is None or ts[j] > ts[best] or (
                    ts[j] == ts[best] and j > best
                ):
                    best = j
        out[i] = best
    return out


rows = st.integers(0, 24)


@given(
    n=rows,
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_asof_merge_matches_brute_force(n, data):
    keys = data.draw(st.lists(st.integers(-2, 2), min_size=n, max_size=n))
    tss = data.draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    sides = data.draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    oks = data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    k = np.array(keys, np.int64)
    ts = np.array(tss, np.int64)
    side = np.array(sides, np.int8)
    ok = np.array(oks, bool)
    ok[side == 0] = True  # right rows are always valid by construction

    if n == 0 or (side == 1).sum() == 0:
        return  # merge core is only invoked on non-empty unions

    left_orig, right_orig, valid = _asof_merge_arrays(k, ts, side, ok)
    got = {}
    for li, ri, v in zip(left_orig, right_orig, valid):
        got[int(li)] = int(ri) if v else None

    want = _brute_asof(k, ts, side, ok)
    assert set(got) == set(want)
    for li in want:
        if want[li] is None:
            assert got[li] is None, f"left {li}: expected no match"
        else:
            # any right row with the same (key, ts) as the expected one
            # is an equally correct match (ties are value-identical)
            ri = got[li]
            assert ri is not None, f"left {li}: expected a match"
            assert side[ri] == 0
            assert k[ri] == k[li] and ts[ri] == ts[want[li]]


def test_asof_forward_matches_brute_force_and_flips_backward():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dcpray.functions.join import asof_join

    rng = np.random.RandomState(4)
    n = 3000
    lt = pa.table({"k": pa.array(rng.randint(0, 25, n), pa.int64()),
                   "ts": pa.array(rng.randint(0, 500, n), pa.int64()),
                   "lid": pa.array(np.arange(n, dtype=np.int64))})
    rt = pa.table({"k": pa.array(rng.randint(0, 25, 800), pa.int64()),
                   "ts": pa.array(rng.randint(0, 500, 800), pa.int64())})
    out = asof_join(rd.from_arrow(lt).repartition(4),
                    rd.from_arrow(rt).repartition(3),
                    key_col="k", ts_col="ts",
                    right_cols={"ts": "next_ts"},
                    direction="forward").to_pandas()
    ora = duckdb.sql("""
SELECT l.k, l.ts, l.lid,
       (SELECT min(r.ts) FROM rt r
        WHERE r.k = l.k AND r.ts >= l.ts) AS next_ts
FROM lt l""").df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(["lid"]).reset_index(drop=True)
    b = ora[cols].sort_values(["lid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    with pytest.raises(ValueError, match="direction"):
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), key_col="k",
                  ts_col="ts", right_cols={"ts": "x"}, direction="up")
