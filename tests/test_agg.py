"""coarse_groupby: the library pre-aggregate + coarse-partition merge
must equal a naive pandas groupby for every supported op, across block
layouts and key types."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.functions.agg import coarse_groupby


def _input(n=5000, seed=1):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k_str": rng.choice([f"u{i}" for i in range(300)], n),
        "k_int": rng.randint(0, 7, n).astype(np.int64),
        "v": rng.randn(n).round(3),
    })


@pytest.mark.parametrize("blocks", [1, 9])
def test_coarse_groupby_matches_pandas(blocks):
    df = _input()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = coarse_groupby(
        ds, keys=["k_str", "k_int"],
        aggs=[("v", "count", "n"), ("v", "sum", "s"), ("v", "min", "lo"),
              ("v", "max", "hi"), ("v", "mean", "m")],
        partitions=8,
    ).to_pandas().sort_values(["k_str", "k_int"]).reset_index(drop=True)

    exp = df.groupby(["k_str", "k_int"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum"), lo=("v", "min"),
        hi=("v", "max"), m=("v", "mean"),
    ).sort_values(["k_str", "k_int"]).reset_index(drop=True)

    assert len(out) == len(exp)
    assert (out["n"].to_numpy() == exp["n"].to_numpy()).all()
    for c in ("s", "lo", "hi", "m"):
        np.testing.assert_allclose(out[c].to_numpy(), exp[c].to_numpy(),
                                   rtol=1e-9, atol=1e-9)


def test_coarse_groupby_agg_on_key_column():
    """count-rows-per-key expressed as an aggregate OF the key column —
    the selection must not duplicate the column."""
    ds = rd.from_arrow(pa.table({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]}))
    out = coarse_groupby(ds, ["k"], [("k", "count", "n")], partitions=4) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["n"].tolist() == [2, 1]


def test_coarse_groupby_rejects_bad_op():
    ds = rd.from_arrow(pa.table({"k": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="unsupported op"):
        coarse_groupby(ds, ["k"], [("v", "median", "x")])


def test_coarse_groupby_timestamp_key():
    ts = pd.to_datetime(["2024-01-01 03:00", "2024-01-01 03:00",
                         "2024-01-02 07:00"])
    df = pd.DataFrame({"h": ts, "v": [1.0, 2.0, 5.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = coarse_groupby(ds, ["h"], [("v", "sum", "s")], partitions=4) \
        .to_pandas().sort_values("h").reset_index(drop=True)
    assert out["s"].tolist() == [3.0, 5.0]


@pytest.mark.parametrize("blocks", [1, 8])
def test_topk_per_group_matches_pandas(blocks):
    from dcpray.functions.agg import topk_per_group

    rng = np.random.RandomState(9)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 50, n).astype(np.int64),
        "value": rng.randn(n).round(3),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = topk_per_group(ds, "user_id", "value", k=3,
                         tiebreak_col="event_id").to_pandas() \
        .sort_values(["user_id", "value", "event_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    exp = df.sort_values(["user_id", "value", "event_id"],
                         ascending=[True, False, True]) \
        .groupby("user_id").head(3) \
        .sort_values(["user_id", "value", "event_id"],
                     ascending=[True, False, True]).reset_index(drop=True)
    assert (out["event_id"].to_numpy() == exp["event_id"].to_numpy()).all()


def test_topk_per_group_duplicate_values_deterministic():
    from dcpray.functions.agg import topk_per_group

    df = pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                       "user_id": np.zeros(5, np.int64),
                       "value": np.array([1.0, 1.0, 1.0, 1.0, 2.0])})
    out = topk_per_group(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
                         "user_id", "value", k=3, tiebreak_col="event_id") \
        .to_pandas().sort_values("event_id")
    # 2.0 first, then the two smallest event_ids among the 1.0 ties
    assert sorted(out["event_id"].tolist()) == [0, 1, 4]


# ------------------------------------------------ approximate distinct


def _hll_fixture():
    rng = np.random.RandomState(7)
    cards = {0: 10, 1: 1000, 2: 20000, 3: 1}
    gs, vs = [], []
    for g, c in cards.items():
        vals = rng.choice(c * 10, size=c, replace=False)
        reps = np.repeat(vals, rng.randint(1, 4, size=c))
        gs += [g] * len(reps)
        vs += reps.tolist()
    return cards, pa.table({"g": pa.array(gs, pa.int64()),
                            "v": pa.array(vs, pa.int64())})


def test_approx_distinct_within_error_bound():
    from dcpray.functions.agg import approx_distinct_count

    cards, t = _hll_fixture()
    out = approx_distinct_count(rd.from_arrow(t).repartition(9), ["g"], "v",
                                precision=12).to_pandas()
    for g, c in cards.items():
        est = float(out.loc[out["g"] == g, "n_distinct_approx"].iloc[0])
        assert abs(est - c) / c < 0.05, (g, c, est)


def test_approx_distinct_partition_invariant():
    """The sketch merge is associative: the estimate must not depend on
    how rows were split into batches."""
    from dcpray.functions.agg import approx_distinct_count

    _, t = _hll_fixture()
    a = approx_distinct_count(rd.from_arrow(t).repartition(1), ["g"], "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    b = approx_distinct_count(rd.from_arrow(t).repartition(16), ["g"], "v") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    assert np.allclose(a["n_distinct_approx"], b["n_distinct_approx"])


def test_approx_distinct_global_strings_nulls():
    from dcpray.functions.agg import approx_distinct_count

    t = pa.table({"v": pa.array([f"s{i % 777}" for i in range(5000)]
                                + [None] * 50)})
    got = approx_distinct_count(rd.from_arrow(t).repartition(4), None, "v",
                                precision=14).to_pandas()
    est = float(got["n_distinct_approx"].iloc[0])
    assert abs(est - 777) / 777 < 0.03  # nulls not counted


def test_bit_length_u64_exact_near_boundaries():
    """float64 would round 2^53+ values across power-of-two boundaries;
    the vectorized bit_length must not."""
    from dcpray.functions.agg import _bit_length_u64

    vals = [0, 1, 2, 3, (1 << 60) - 1, 1 << 60, (1 << 63) - 1,
            (1 << 64) - 1, (1 << 53) + 1]
    got = _bit_length_u64(np.array(vals, np.uint64))
    exp = [v.bit_length() for v in vals]
    assert got.tolist() == exp


# ------------------------------------------------- var/std/corr/explode


def test_var_std_bit_exact_vs_formula_and_close_to_var_pop():
    import duckdb

    from dcpray.functions.agg import coarse_groupby as cgb

    rng = np.random.RandomState(5)
    n = 30000
    t = pa.table({
        "k": pa.array(rng.randint(0, 40, n), pa.int64()),
        "y": pa.array([None if rng.rand() < 0.1 else int(v)
                       for v in rng.randint(0, 10000, n)], pa.int64()),
    })
    out = cgb(rd.from_arrow(t).repartition(6), ["k"],
              [("y", "var", "v"), ("y", "std", "s")],
              partitions=8).to_pandas()
    ora = duckdb.sql("""
SELECT k,
  CAST(sum(y*y) AS DOUBLE)/count(y)
    - (CAST(sum(y) AS DOUBLE)/count(y))*(CAST(sum(y) AS DOUBLE)/count(y)) AS v,
  sqrt(CAST(sum(y*y) AS DOUBLE)/count(y)
    - (CAST(sum(y) AS DOUBLE)/count(y))*(CAST(sum(y) AS DOUBLE)/count(y))) AS s
FROM t GROUP BY k""").df()
    a = out.sort_values("k").reset_index(drop=True)[["k", "v", "s"]]
    b = ora.sort_values("k").reset_index(drop=True)[["k", "v", "s"]]
    pd.testing.assert_frame_equal(a, b)  # EXACT: same float64 op order
    native = duckdb.sql(
        "SELECT k, var_pop(y) AS v FROM t GROUP BY k"
    ).df().sort_values("k").reset_index(drop=True)
    assert np.allclose(a["v"], native["v"], rtol=1e-9)


def test_corr_per_group_vs_duckdb_corr():
    import duckdb

    from dcpray.functions.agg import corr_per_group

    rng = np.random.RandomState(6)
    n = 20000
    t = pa.table({
        "k": pa.array(rng.randint(0, 10, n), pa.int64()),
        "x": pa.array(rng.randint(0, 10000, n), pa.int64()),
        "y": pa.array([None if rng.rand() < 0.1 else int(v)
                       for v in rng.randint(0, 100, n)], pa.int64()),
    })
    out = corr_per_group(rd.from_arrow(t).repartition(4), ["k"],
                         "x", "y", alias="c", partitions=4).to_pandas()
    native = duckdb.sql(
        "SELECT k, corr(x, y) AS c FROM t GROUP BY k"
    ).df().sort_values("k").reset_index(drop=True)
    a = out.sort_values("k").reset_index(drop=True)
    assert np.allclose(a["c"], native["c"], rtol=1e-9)


def test_corr_constant_column_is_null():
    from dcpray.functions.agg import corr_per_group

    t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "x": pa.array([5, 5, 5], pa.int64()),
                  "y": pa.array([1, 2, 3], pa.int64())})
    out = corr_per_group(rd.from_arrow(t), ["k"], "x", "y",
                         alias="c").to_pandas()
    assert out["c"].isna().all()


def test_explode_positions_and_empty_lists():
    from dcpray.functions.agg import explode

    lt = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([[1.5, 2.5], [], [7.0], None],
                      pa.list_(pa.float64())),
    })
    out = explode(rd.from_arrow(lt), "v", pos_col="pos",
                  value_col="val").to_pandas()
    out = out.sort_values(["id", "pos"]).reset_index(drop=True)
    assert out["id"].tolist() == [1, 1, 3]
    assert out["pos"].tolist() == [0, 1, 0]
    assert out["val"].tolist() == [1.5, 2.5, 7.0]


def test_describe_bit_exact_vs_sql_formula():
    import duckdb

    from dcpray.functions.agg import describe

    rng = np.random.RandomState(3)
    t = pa.table({
        "a": pa.array(rng.randint(0, 1000, 5000), pa.int64()),
        "b": pa.array([None if rng.rand() < 0.1 else int(v)
                       for v in rng.randint(0, 500, 5000)], pa.int64()),
    })
    out = describe(rd.from_arrow(t).repartition(5),
                   ["a", "b"]).to_pandas()
    ora = duckdb.sql("""
SELECT 'a' AS column, CAST(count(*) AS DOUBLE) AS n, avg(a) AS mean,
  sqrt(CAST(sum(a*a) AS DOUBLE)/count(a)
       - (CAST(sum(a) AS DOUBLE)/count(a))*(CAST(sum(a) AS DOUBLE)/count(a)))
    AS std,
  CAST(min(a) AS DOUBLE) AS min, CAST(max(a) AS DOUBLE) AS max FROM t
UNION ALL
SELECT 'b', CAST(count(*) AS DOUBLE), avg(b),
  sqrt(CAST(sum(b*b) AS DOUBLE)/count(b)
       - (CAST(sum(b) AS DOUBLE)/count(b))*(CAST(sum(b) AS DOUBLE)/count(b))),
  CAST(min(b) AS DOUBLE), CAST(max(b) AS DOUBLE) FROM t""").df()
    cols = ["column", "n", "mean", "std", "min", "max"]
    a = out[cols].sort_values("column").reset_index(drop=True)
    b = ora[cols].sort_values("column").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
