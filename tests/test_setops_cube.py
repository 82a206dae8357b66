"""cube / grouping_sets and INTERSECT/EXCEPT/UNION-distinct tests."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.functions.agg import cube, grouping_sets, rollup
from dcpray.functions.setops import (
    except_distinct,
    intersect_distinct,
    union_distinct,
)


@pytest.fixture(scope="module")
def facts():
    rng = np.random.RandomState(11)
    n = 20000
    return pa.table({
        "a": pa.array([f"x{rng.randint(0, 4)}" for _ in range(n)]),
        "b": pa.array(rng.randint(0, 6, n), pa.int64()),
        "c": pa.array([None if rng.rand() < 0.2 else f"y{rng.randint(0, 3)}"
                       for _ in range(n)]),
        "v": pa.array(rng.randint(0, 1000, n), pa.int64()),
    })


def _cmp(out: pd.DataFrame, ora: pd.DataFrame):
    cols = sorted(out.columns)
    assert cols == sorted(ora.columns)
    x = out[cols].sort_values(cols).reset_index(drop=True)
    y = ora[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(x.astype(str), y.astype(str))


def test_cube_three_keys_with_nulls_vs_duckdb(facts):
    t = facts
    out = cube(rd.from_arrow(t).repartition(6), ["a", "b", "c"],
               [("v", "count", "n"), ("v", "sum", "s"),
                ("v", "mean", "m")]).to_pandas()
    ora = duckdb.sql("""
SELECT a, b, c, grouping_id(a, b, c) AS gid, count(v) AS n,
       CAST(sum(v) AS BIGINT) AS s, avg(v) AS m
FROM t GROUP BY CUBE(a, b, c)""").df()
    _cmp(out, ora)


def test_grouping_sets_vs_duckdb(facts):
    t = facts
    out = grouping_sets(rd.from_arrow(t).repartition(6), ["a", "b"],
                        [("v", "sum", "s")],
                        sets=[["a"], ["b"], []]).to_pandas()
    ora = duckdb.sql("""
SELECT a, b, grouping_id(a, b) AS gid, CAST(sum(v) AS BIGINT) AS s
FROM t GROUP BY GROUPING SETS ((a), (b), ())""").df()
    _cmp(out, ora)


def test_rollup_still_matches_after_refactor(facts):
    t = facts
    out = rollup(rd.from_arrow(t).repartition(6), ["a", "b"],
                 [("v", "mean", "m")]).to_pandas()
    ora = duckdb.sql("""
SELECT a, b, grouping_id(a, b) AS gid, avg(v) AS m
FROM t GROUP BY ROLLUP(a, b)""").df()
    _cmp(out, ora)


def test_cube_guards():
    t = pa.table({"a": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="at most 5"):
        cube(rd.from_arrow(t), ["a"] * 6, [("v", "sum", "s")])
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets(rd.from_arrow(t), ["a"], [("v", "sum", "s")],
                      sets=[["a"], ["a"]])
    with pytest.raises(ValueError, match="non-keys"):
        grouping_sets(rd.from_arrow(t), ["a"], [("v", "sum", "s")],
                      sets=[["zz"]])


@pytest.mark.parametrize("op,sql", [
    (intersect_distinct, "SELECT k FROM ta INTERSECT SELECT k FROM tb"),
    (except_distinct, "SELECT k FROM ta EXCEPT SELECT k FROM tb"),
    (union_distinct, "SELECT k FROM ta UNION SELECT k FROM tb"),
])
def test_set_ops_vs_duckdb_nulls_equal(op, sql):
    rng = np.random.RandomState(3)
    # NULL on both sides: SQL set ops treat NULLs as EQUAL (unlike joins)
    ta = pa.table({"k": pa.array(
        list(rng.randint(0, 50, 300)) + [None, None], pa.int64())})
    tb = pa.table({"k": pa.array(
        list(rng.randint(25, 80, 300)) + [None], pa.int64())})
    out = op(rd.from_arrow(ta).repartition(3),
             rd.from_arrow(tb).repartition(3), ["k"]).to_pandas()
    ora = duckdb.sql(sql).df()
    a = out.sort_values("k").reset_index(drop=True)
    b = ora.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_set_ops_date32_key():
    """Regression: date32 has no direct int64 cast — _hash_key_columns
    must route through int32."""
    import datetime as dt

    days = [dt.date(2024, 1, d) for d in (1, 2, 3)]
    ta = pa.table({"d": pa.array(days * 2, pa.date32())})
    tb = pa.table({"d": pa.array(days[1:], pa.date32())})
    out = except_distinct(rd.from_arrow(ta), rd.from_arrow(tb),
                          ["d"]).to_pandas()
    assert out["d"].tolist() == [dt.date(2024, 1, 1)]


def test_set_ops_multi_column_string_keys():
    ta = pa.table({"x": pa.array(["p", "p", "q", None]),
                   "y": pa.array([1, 2, 1, 3], pa.int64())})
    tb = pa.table({"x": pa.array(["p", "q", None]),
                   "y": pa.array([2, 9, 3], pa.int64())})
    out = intersect_distinct(rd.from_arrow(ta), rd.from_arrow(tb),
                             ["x", "y"]).to_pandas()
    ora = duckdb.sql(
        "SELECT x, y FROM ta INTERSECT SELECT x, y FROM tb").df()
    a = out.sort_values(["x", "y"]).reset_index(drop=True)
    b = ora.sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))


def test_grouping_set_duplicate_index_raises():
    t = pa.table({"a": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="UNIQUE"):
        grouping_sets(rd.from_arrow(t), ["a", "v"], [("v", "sum", "s")],
                      sets=[["a", "a"]])
