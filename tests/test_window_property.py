"""Property tests for the pure trailing-window kernel (no Ray): the
prefix-sum / shifted-pass rolling aggregates must equal a brute-force
reference on arbitrary key layouts — singleton groups, all-one-group,
windows larger than every group, negative values, heavy duplicates."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dcpray.functions.window import _rolling_arrays


def _brute(gs, vs, window):
    n = len(gs)
    out = {k: np.zeros(n) for k in ("sum", "mean", "min", "max")}
    out["count"] = np.zeros(n, np.int64)
    for i in range(n):
        w = [vs[j] for j in range(max(0, i - window + 1), i + 1)
             if gs[j] == gs[i]
             and all(gs[m] == gs[i] for m in range(j, i + 1))]
        out["sum"][i] = sum(w)
        out["count"][i] = len(w)
        out["mean"][i] = sum(w) / len(w)
        out["min"][i] = min(w)
        out["max"][i] = max(w)
    return out


@given(
    n=st.integers(0, 40),
    window=st.integers(1, 12),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_rolling_kernel_matches_brute_force(n, window, data):
    # keys drawn non-decreasing => "already sorted by key" precondition
    key_steps = data.draw(st.lists(st.integers(0, 2), min_size=n,
                                   max_size=n))
    gs = np.cumsum(np.array(key_steps, np.int64)) if n else \
        np.zeros(0, np.int64)
    vals = data.draw(st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
        min_size=n, max_size=n))
    vs = np.array(vals, np.float64)
    res = _rolling_arrays(gs, vs, window,
                          ("sum", "mean", "count", "min", "max"))
    ref = _brute(gs, vs, window)
    assert np.array_equal(res["count"], ref["count"])
    for k in ("sum", "mean"):
        np.testing.assert_allclose(res[k], ref[k], rtol=1e-9, atol=1e-6)
    for k in ("min", "max"):
        np.testing.assert_array_equal(res[k], ref[k])
