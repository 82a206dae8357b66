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


# --------------------------------------------- RANGE-frame kernel


def test_rolling_range_kernel_vs_brute_force():
    from dcpray.functions.window import _rolling_range_arrays

    for seed in range(8):
        r = np.random.RandomState(seed)
        m = r.randint(1, 400)
        g = np.sort(r.randint(0, 5, m))
        tt = r.randint(0, 60, m)
        o = np.lexsort((tt, g))
        g, tt = g[o], tt[o]
        v = r.randint(0, 100, m).astype(np.float64)
        delta = int(r.randint(0, 20))
        res = _rolling_range_arrays(
            g, tt, v, delta, ("sum", "mean", "count", "min", "max"))
        for i in range(m):
            mask = (g == g[i]) & (tt >= tt[i] - delta) & (tt <= tt[i])
            assert res["count"][i] == mask.sum()
            assert abs(res["sum"][i] - v[mask].sum()) < 1e-9
            assert abs(res["mean"][i] - v[mask].mean()) < 1e-9
            assert res["min"][i] == v[mask].min()
            assert res["max"][i] == v[mask].max()


def test_rolling_agg_range_vs_duckdb_interval_frame():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from dcpray.functions.window import rolling_agg_range

    rng = np.random.RandomState(9)
    n = 4000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.randint(0, 3600 * 3, n).astype(
        "timedelta64[s]").astype("timedelta64[us]")
    t = pa.table({
        "k": pa.array(rng.randint(0, 20, n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "v": pa.array(rng.randint(0, 1000, n).astype(np.float64)),
    })
    out = rolling_agg_range(
        rd.from_arrow(t).repartition(4), "k", "ts", "v",
        interval_s=900, aggs=("sum", "mean", "count", "min", "max"),
        partitions=8).to_pandas()
    ora = duckdb.sql("""
SELECT k, ts, v, sum(v) OVER w AS rolling_sum, avg(v) OVER w AS rolling_mean,
       CAST(count(v) OVER w AS BIGINT) AS rolling_count,
       min(v) OVER w AS rolling_min, max(v) OVER w AS rolling_max
FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
    RANGE BETWEEN INTERVAL 900 SECONDS PRECEDING AND CURRENT ROW)""").df()
    cols = ["k", "ts", "v", "rolling_sum", "rolling_mean",
            "rolling_count", "rolling_min", "rolling_max"]
    a = out[cols].sort_values(["k", "ts", "v"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "ts", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rank_family_vs_duckdb_with_ties():
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dcpray.functions.window import rank_in_group

    rng = np.random.RandomState(12)
    n = 5000
    t = pa.table({"k": pa.array(rng.randint(0, 20, n), pa.int64()),
                  "v": pa.array(rng.randint(0, 8, n), pa.int64()),  # ties
                  "tb": pa.array(np.arange(n, dtype=np.int64))})
    out = rank_in_group(rd.from_arrow(t).repartition(4), "k", "v",
                        tiebreak_col="tb", out_col="row_number",
                        ranks=("rank", "dense_rank", "percent_rank",
                               "cume_dist")).to_pandas()
    ora = duckdb.sql("""
SELECT k, v, tb,
       row_number() OVER (PARTITION BY k ORDER BY v, tb) AS row_number,
       rank() OVER w AS rank, dense_rank() OVER w AS dense_rank,
       percent_rank() OVER w AS percent_rank,
       cume_dist() OVER w AS cume_dist
FROM t WINDOW w AS (PARTITION BY k ORDER BY v)""").df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(["k", "tb"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "tb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    with pytest.raises(ValueError, match="collides"):
        rank_in_group(rd.from_arrow(t), "k", "v", tiebreak_col="tb",
                      ranks=("rank",))


def test_rank_in_group_output_name_collision_raises():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from dcpray.functions.window import rank_in_group

    t = pa.table({"k": pa.array([1], "int64"), "v": pa.array([1], "int64"),
                  "tb": pa.array([1], "int64"),
                  "dense_rank": pa.array([9], "int64")})
    with pytest.raises(ValueError, match="already exist"):
        rank_in_group(rd.from_arrow(t), "k", "v", tiebreak_col="tb",
                      out_col="row_number", ranks=("dense_rank",))
