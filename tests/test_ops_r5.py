"""Round-5 operator tests: FULL/RIGHT OUTER distributed hash_join
(r4 verdict #4) and hash_join_skew's auto-materialize of derived
inputs (r4 verdict #3)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd


def _mk_sides(seed=7, n_left=4000, n_right=900):
    """Skewed overlap + null keys on BOTH sides (SQL: nulls never
    match but preserved sides keep them)."""
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, 1200, n_left).astype(float)
    lk[rng.random(n_left) < 0.02] = np.nan
    rk = rng.integers(600, 1800, n_right).astype(float)
    rk[rng.random(n_right) < 0.03] = np.nan
    left = pa.table({
        "k": pa.array([None if np.isnan(x) else int(x) for x in lk],
                      pa.int64()),
        "lv": pa.array(rng.integers(0, 10**6, n_left), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([None if np.isnan(x) else int(x) for x in rk],
                       pa.int64()),
        "rv": pa.array(rng.integers(0, 10**6, n_right), pa.int64()),
    })
    return left, right


def _sql_join(left, right, how_sql):
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    return con.execute(f"""
        SELECT COALESCE(l.k, r.rk) AS k, l.lv, r.rv
        FROM l {how_sql} JOIN r ON l.k = r.rk""").df()


def _canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].astype("float64")  # nullable ints -> comparable
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("how,how_sql", [("full", "FULL OUTER"),
                                         ("right", "RIGHT OUTER")])
def test_hash_join_full_right_outer_vs_sql(how, how_sql):
    from dcpray.functions.join import hash_join

    left, right = _mk_sides()
    out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", right_on="rk", how=how,
                    partitions=16).to_pandas()
    ora = _sql_join(left, right, how_sql)
    a, b = _canon(out), _canon(ora)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)
    if how == "full":
        # null-key rows survive on BOTH sides, unmatched
        nleft_null = left.filter(pc.is_null(left["k"])).num_rows
        nright_null = right.filter(pc.is_null(right["rk"])).num_rows
        nulls = out[out["k"].isna()]
        assert (nulls["rv"].isna().sum() == nleft_null
                and nulls["lv"].isna().sum() == nright_null)
    else:
        # right outer: left null-key rows are NOT preserved
        assert (out["k"].isna()).sum() == \
            right.filter(pc.is_null(right["rk"])).num_rows


def test_hash_join_full_outer_composite_and_cast_keys():
    """FULL OUTER across a type-mismatched key (int32 right vs int64
    left) — the right key must cast into the left slot and coalesce."""
    from dcpray.functions.join import hash_join

    left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "lv": ["a", "b", "c"]})
    right = pa.table({"rk": pa.array([2, 3, 4], pa.int32()),
                      "rv": ["x", "y", "z"]})
    out = hash_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="k", right_on="rk", how="full",
                    partitions=4).to_pandas()
    got = {(r.k, r.lv if isinstance(r.lv, str) else None,
            r.rv if isinstance(r.rv, str) else None)
           for r in out.itertuples()}
    assert got == {(1, "a", None), (2, "b", "x"), (3, "c", "y"),
                   (4, None, "z")}


def test_is_cheap_rescan_classification(tmp_path):
    from dcpray.functions.join import _is_cheap_rescan

    t = pa.table({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0]})
    import pyarrow.parquet as pq

    pq.write_table(t, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    assert _is_cheap_rescan(ds)
    assert _is_cheap_rescan(ds.select_columns(["a"]))
    assert _is_cheap_rescan(rd.from_arrow(t))
    assert _is_cheap_rescan(ds.materialize())
    derived = ds.map_batches(lambda x: x, batch_format="pyarrow")
    assert not _is_cheap_rescan(derived)
    assert _is_cheap_rescan(derived.materialize())


def test_hash_join_skew_auto_materialize_equality():
    """A DERIVED left side through hash_join_skew: auto-materialize
    must not change the result vs materialize=False (and vs plain
    hash_join)."""
    from dcpray.functions.join import hash_join, hash_join_skew

    rng = np.random.default_rng(3)
    n = 6000
    k = rng.integers(0, 50, n)
    k[: n // 2] = 7  # hot key owns half the left side
    left = pa.table({"k": pa.array(k, pa.int64()),
                     "lv": pa.array(rng.integers(0, 100, n), pa.int64())})
    right = pa.table({"k": pa.array(np.arange(50), pa.int64()),
                      "rv": pa.array(np.arange(50) * 10, pa.int64())})

    def derived_left():
        return rd.from_arrow(left).map_batches(
            lambda t: t.filter(pc.less(t["lv"], 90)),
            batch_format="pyarrow")

    kw = dict(on="k", how="inner", partitions=8, hot_threshold=1000)
    outs = []
    for mat in ("auto", False):
        df = hash_join_skew(derived_left(), rd.from_arrow(right),
                            materialize=mat, **kw).to_pandas()
        outs.append(df.sort_values(["k", "lv"]).reset_index(drop=True))
    plain = hash_join(derived_left(), rd.from_arrow(right),
                      on="k", how="inner", partitions=8).to_pandas() \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], plain)


def test_hash_join_skew_still_rejects_outer_modes():
    from dcpray.functions.join import hash_join_skew

    t = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    with pytest.raises(ValueError, match="inner"):
        hash_join_skew(t, t, on="k", how="full")


def test_limit_is_not_cheap_rescan(tmp_path):
    """Self-review r5: with preserve_order unset, limit over a
    multi-block read may keep a DIFFERENT row subset per lineage
    re-execution — a multi-consumer rescan of it is nondeterministic,
    so it must be auto-materialized, not classified transparent."""
    import pyarrow.parquet as pq

    from dcpray.functions.join import _is_cheap_rescan

    t = pa.table({"a": list(range(100))})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"), override_num_blocks=4)
    assert _is_cheap_rescan(ds)
    assert not _is_cheap_rescan(ds.limit(10))


def test_replay_orphan_lease_plumbed(tmp_path):
    """Self-review r5: a crashed-in-the-gap orphan blocks takeover for
    the 30s lease by default; an orchestrator with fast crash-recovery
    reruns lowers ReplayConfig.commit_orphan_lease_s and the rerun
    recovers IMMEDIATELY through the full replay commit path."""
    import os

    from dcpray import Lake, ReplayConfig, replay
    from dcpray.sources.genwal import ensure_fixture
    from dcpray.state.checkpoint import ConcurrentCommitError, Manifest

    fx = ensure_fixture("sf0.001")
    lake_dir = str(tmp_path / "lease_lake")
    lake = Lake(lake_dir)
    # fake the crash: a seq-1 manifest exists (fresh mtime) but CURRENT
    # was never written — the writer died in the publish gap
    orphan = Manifest(run_id="r-crashed", seq=1, parent=None,
                      num_buckets=8, salted=True, watermarks={}, files=[])
    with open(os.path.join(lake.store.manifest_dir,
                           "manifest-000001.json"), "w") as f:
        f.write(orphan.to_json())
    cfg_default = ReplayConfig(num_buckets=8)
    with pytest.raises(ConcurrentCommitError, match="presumed live"):
        replay(lake, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
               config=cfg_default)
    cfg_fast = ReplayConfig(num_buckets=8, commit_orphan_lease_s=0.0)
    res = replay(lake, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
                 config=cfg_fast)
    assert res.committed and lake.store.load_current().run_id == res.run_id
