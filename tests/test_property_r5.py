"""Property tests for the round-5 kernels (pure numpy/DuckDB — no Ray):

- ``desc_key``'s ascending order must equal the SQL total order DESC
  for every supported dtype, including NaN/±inf floats, unsigned
  extremes, int64 min, and datetimes;
- ``float_total_order`` must rank exactly like DuckDB ``ORDER BY``;
- the FULL/RIGHT outer local join semantics (the per-partition kernel
  is Acero's) must match SQL under arbitrary key multisets with nulls.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dcpray.functions.agg import desc_key, float_total_order

floats = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.sampled_from([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, -1e-300]),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(floats, min_size=1, max_size=30))
def test_float_total_order_matches_duckdb_order_by(vals):
    v = np.array(vals, np.float64)
    key = float_total_order(v)
    got = np.argsort(key, kind="stable")
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": np.arange(len(v)), "v": v}))
    # DuckDB total order ASC: NaN greatest; ties broken by input index
    # to make the expected permutation deterministic
    exp = con.execute("SELECT i FROM t ORDER BY v, i").df()["i"].to_numpy()
    # compare the VALUE sequence (equal values may permute freely)
    a = v[got]
    b = v[exp]
    assert np.array_equal(a, b, equal_nan=True)


@settings(max_examples=200, deadline=None)
@given(st.lists(floats, min_size=1, max_size=30))
def test_desc_key_floats_reverse_of_total_order(vals):
    v = np.array(vals, np.float64)
    asc = v[np.argsort(float_total_order(v), kind="stable")]
    desc = v[np.argsort(desc_key(v), kind="stable")]
    assert np.array_equal(asc[::-1], desc, equal_nan=True)


ints64 = st.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max)
uints64 = st.integers(0, np.iinfo(np.uint64).max)


@settings(max_examples=200, deadline=None)
@given(st.lists(ints64, min_size=1, max_size=30))
def test_desc_key_int64(vals):
    v = np.array(vals, np.int64)
    got = v[np.argsort(desc_key(v), kind="stable")]
    assert np.array_equal(got, np.sort(v)[::-1])


@settings(max_examples=200, deadline=None)
@given(st.lists(uints64, min_size=1, max_size=30))
def test_desc_key_uint64(vals):
    v = np.array(vals, np.uint64)
    got = v[np.argsort(desc_key(v), kind="stable")]
    assert np.array_equal(got, np.sort(v)[::-1])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=20))
def test_desc_key_datetime(vals):
    v = np.array(vals, "datetime64[us]")
    got = v[np.argsort(desc_key(v), kind="stable")]
    assert np.array_equal(got, np.sort(v)[::-1])


keys = st.lists(st.one_of(st.none(), st.integers(0, 6)),
                min_size=0, max_size=12)


@settings(max_examples=150, deadline=None)
@given(lk=keys, rk=keys, how=st.sampled_from(["full outer", "right outer"]))
def test_local_outer_join_kernel_matches_sql(lk, rk, how):
    """The per-partition kernel hash_join delegates to (Acero
    Table.join) must match SQL FULL/RIGHT OUTER on arbitrary key
    multisets with nulls — nulls never match, preserved sides keep
    them, every multiplicity combination correct."""
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lv": pa.array(range(len(lk)), pa.int64())})
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "rv": pa.array(range(len(rk)), pa.int64())})
    out = lt.join(rt, keys=["k"], join_type=how,
                  coalesce_keys=True).to_pandas()
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    sql_how = "FULL OUTER" if how == "full outer" else "RIGHT OUTER"
    ora = con.execute(f"""
        SELECT COALESCE(l.k, r.k) AS k, l.lv, r.rv
        FROM l {sql_how} JOIN r ON l.k = r.k""").df()
    cols = ["k", "lv", "rv"]

    def canon(df):
        d = df[cols].astype("float64")
        return d.sort_values(cols, kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(out), canon(ora))
