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
