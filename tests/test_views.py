"""Incrementally-maintained aggregate views: sidecar partials per
bucket file, refresh cost bounded by rewritten buckets, merged result
equal to a brute-force recompute of the committed table."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray import (
    IncrementalView,
    Lake,
    ReplayConfig,
    ViewSpec,
    gc,
    replay,
)

SPEC = ViewSpec("role_stats", keys=("role",),
                aggs=(("turn_idx", "count", "n_turns"),
                      ("turn_idx", "mean", "mean_turn_idx"),
                      ("ts", "max", "last_ts")))


def _brute(df: pd.DataFrame) -> pd.DataFrame:
    out = (df.groupby("role", dropna=False)
           .agg(n_turns=("turn_idx", "size"),
                mean_turn_idx=("turn_idx", "mean"),
                last_ts=("ts", "max"))
           .reset_index().sort_values("role").reset_index(drop=True))
    out["n_turns"] = out["n_turns"].astype("int64")
    return out


def _got(view: IncrementalView, at=None) -> pd.DataFrame:
    g = view.read_table(at=at).to_pandas().sort_values("role") \
        .reset_index(drop=True)
    return g[["role", "n_turns", "mean_turn_idx", "last_ts"]]


def _assert_view_equals(view, df, at=None):
    got, exp = _got(view, at), _brute(df)
    assert got["role"].tolist() == exp["role"].tolist()
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()
    assert np.allclose(got["mean_turn_idx"], exp["mean_turn_idx"])
    assert (pd.to_datetime(got["last_ts"]).values
            == pd.to_datetime(exp["last_ts"]).values).all()


def _delta_row(tiny_fixture, tmp_path):
    """One-row delta for a known conv (same shape as the copy-forward
    test) — rewrites exactly one bucket."""
    from dcpray.hashing import vb_of_conv

    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    vb = int(vb_of_conv(np.array(["conv-00000000"], dtype=object),
                        meta["spec"]["num_vbuckets"])[0])
    new_seq = meta["watermarks"][str(vb)] + 1
    delta_dir = tmp_path / "delta" / f"vb_{vb:04d}"
    delta_dir.mkdir(parents=True)
    row = pa.table({
        "vb": pa.array([vb], pa.uint16()),
        "seqno": pa.array([new_seq], pa.uint64()),
        "cas": pa.array([1], pa.uint64()),
        "rev_no": pa.array([99], pa.uint64()),
        "op": pa.array(["mutation"]),
        "collection": pa.array(["_default"]),
        "event_time": pa.array([0], pa.timestamp("us")),
        "conv_id": pa.array(["conv-00000000"]),
        "turn_idx": pa.array([1], pa.int32()),
        "role": pa.array(["user"]),
        "text": pa.array(["UPDATED"]),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([1], pa.timestamp("us")),
    })
    pq.write_table(row, str(delta_dir / "part-000.parquet"))
    return str(tmp_path / "delta")


def test_view_incremental_refresh_and_correctness(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=16)
    replay(lake, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    view = IncrementalView(lake, SPEC)
    m1 = view.refresh()
    assert m1["buckets_computed"] == m1["buckets_total"] > 0
    _assert_view_equals(view, lake.to_pandas_sorted())
    state1 = lake.to_pandas_sorted()

    # delta rewrites ONE bucket -> refresh computes ONE sidecar
    res = replay(lake, _delta_row(tiny_fixture, tmp_path), config=cfg)
    assert res.committed and res.metrics["buckets_written"] == 1
    m2 = view.refresh()
    assert m2["buckets_computed"] == 1, m2
    assert m2["buckets_total"] == m1["buckets_total"]
    _assert_view_equals(view, lake.to_pandas_sorted())

    # idempotent: nothing to do on a re-refresh
    m3 = view.refresh()
    assert m3["buckets_computed"] == 0

    # time travel: the view AS OF commit 1 equals the old table's agg
    _assert_view_equals(view, state1, at=1)

    # distributed read agrees with the driver merge
    dd = view.read().to_pandas().sort_values("role").reset_index(drop=True)
    got = _got(view)
    assert dd["n_turns"].tolist() == got["n_turns"].tolist()
    assert np.allclose(dd["mean_turn_idx"], got["mean_turn_idx"])


def test_view_stale_read_raises_and_rerefresh_heals(tiny_fixture, tmp_path):
    from dcpray.state.views import _part_name

    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=8)
    replay(lake, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    view = IncrementalView(lake, SPEC)
    view.refresh()
    cur = lake.store.load_current()
    os.remove(os.path.join(view.view_dir, _part_name(cur.files[0]["path"])))
    with pytest.raises(RuntimeError, match="stale"):
        view.read_table()
    m = view.refresh()
    assert m["buckets_computed"] == 1
    _assert_view_equals(view, lake.to_pandas_sorted())


def test_view_spec_mismatch_raises(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    replay(lake, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"),
           config=ReplayConfig(num_buckets=4))
    IncrementalView(lake, SPEC).refresh()
    other = ViewSpec("role_stats", keys=("tool",),
                     aggs=(("turn_idx", "count", "n"),))
    with pytest.raises(ValueError, match="different"):
        IncrementalView(lake, other).refresh()


def test_view_gc_prunes_dead_sidecars(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=8)
    replay(lake, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    view = IncrementalView(lake, SPEC)
    view.refresh()
    replay(lake, _delta_row(tiny_fixture, tmp_path), config=cfg)
    view.refresh()
    # drop history, gc the superseded bucket file, re-refresh: the dead
    # sidecar goes away and the view still reads correctly
    gc(lake, keep_manifests=1, grace_s=0.0)
    m = view.refresh()
    assert m["parts_pruned"] >= 1, m
    _assert_view_equals(view, lake.to_pandas_sorted())


def test_view_tombstones_excluded(tiny_fixture, tmp_path):
    """mutation_only=True (default) must aggregate the LIVE table only
    — a deletion arriving in a later run shrinks the view counts."""
    from dcpray.hashing import vb_of_conv

    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=8)
    replay(lake, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    view = IncrementalView(lake, SPEC)
    view.refresh()
    n_before = int(_got(view)["n_turns"].sum())

    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    vb = int(vb_of_conv(np.array(["conv-00000000"], dtype=object),
                        meta["spec"]["num_vbuckets"])[0])
    new_seq = meta["watermarks"][str(vb)] + 1
    delta_dir = tmp_path / "del" / f"vb_{vb:04d}"
    delta_dir.mkdir(parents=True)
    row = pa.table({
        "vb": pa.array([vb], pa.uint16()),
        "seqno": pa.array([new_seq], pa.uint64()),
        "cas": pa.array([1], pa.uint64()),
        "rev_no": pa.array([99], pa.uint64()),
        "op": pa.array(["deletion"]),
        "collection": pa.array(["_default"]),
        "event_time": pa.array([0], pa.timestamp("us")),
        "conv_id": pa.array(["conv-00000000"]),
        "turn_idx": pa.array([1], pa.int32()),
        "role": pa.array([None], pa.string()),
        "text": pa.array([None], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([None], pa.timestamp("us")),
    })
    pq.write_table(row, str(delta_dir / "part-000.parquet"))
    assert replay(lake, str(tmp_path / "del"), config=cfg).committed
    view.refresh()
    assert int(_got(view)["n_turns"].sum()) == n_before - 1
    _assert_view_equals(view, lake.to_pandas_sorted())


def test_builder_attached_view_auto_refreshes(tiny_fixture, tmp_path):
    """attach_view: every committed run (phase 1 with max_files, then
    the rest) leaves the view fresh without a manual refresh, and the
    second commit's refresh is incremental."""
    from dcpray import PipelineBuilder

    lakedir = str(tmp_path / "lake")
    pipe = (PipelineBuilder(lakedir, ReplayConfig(num_buckets=8))
            .attach_view(SPEC).build())
    r1 = pipe.run(os.path.join(tiny_fixture, "wal"),
                  base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                  max_files=2)
    assert r1.committed
    view = IncrementalView(pipe.lake, SPEC)
    _assert_view_equals(view, pipe.lake.to_pandas_sorted())  # fresh

    r2 = pipe.run(os.path.join(tiny_fixture, "wal"),
                  base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert r2.committed
    _assert_view_equals(view, pipe.lake.to_pandas_sorted())  # still fresh
    # and a no-op on an idempotent rerun
    assert view.refresh()["buckets_computed"] == 0
