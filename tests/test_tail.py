"""Continuous tail mode + manifest lineage."""

import glob
import os
import shutil

from dcpray import Lake, PipelineBuilder, ReplayConfig
from tests.util import assert_final_state_equal


def test_tail_picks_up_arrivals(tiny_fixture, tmp_path):
    """Segments arriving between polls are ingested incrementally; the
    final state equals a one-shot replay of everything."""
    wal_src = os.path.join(tiny_fixture, "wal")
    files = sorted(glob.glob(os.path.join(wal_src, "**", "*.parquet"), recursive=True))
    live_wal = tmp_path / "wal_live"

    half = len(files) // 2

    def land(paths):
        for p in paths:
            rel = os.path.relpath(p, wal_src)
            dst = live_wal / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(p, dst)

    land(files[:half])
    # early arrivals cover only some vbuckets: the stream's vb modulus is
    # a known constant and must be pinned for the base bootstrap (the
    # engine refuses to continue if a later vb contradicts it)
    cfg = ReplayConfig(num_buckets=16, num_vbuckets=8)
    pipe = PipelineBuilder(str(tmp_path / "lake"), cfg).build()
    r1 = pipe.tail(str(live_wal), base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                   poll_interval_s=0.01, max_polls=1)
    assert len(r1) == 1 and r1[0].committed

    land(files[half:])
    r2 = pipe.tail(str(live_wal), poll_interval_s=0.01, idle_polls_to_stop=2)
    assert len(r2) == 1 and r2[0].committed
    assert r2[0].manifest.parent == r1[0].run_id

    ref = PipelineBuilder(str(tmp_path / "ref"), ReplayConfig(num_buckets=16)).build()
    ref.run(wal_src, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert_final_state_equal(
        Lake(str(tmp_path / "lake")).to_pandas_sorted(),
        Lake(str(tmp_path / "ref")).to_pandas_sorted(),
    )

    # lineage: manifests chain oldest -> newest through parent run_ids
    hist = Lake(str(tmp_path / "lake")).store.history()
    assert [m.seq for m in hist] == [1, 2]
    assert hist[1].parent == hist[0].run_id
    # live metrics (X2): one stream.jsonl line per committed run, in
    # commit order, each carrying that run's gauges
    import json

    stream = tmp_path / "lake" / "metrics" / "stream.jsonl"
    lines = [json.loads(ln) for ln in stream.read_text().splitlines()]
    assert [ln["run_id"] for ln in lines] == [r1[0].run_id, r2[0].run_id]
    assert lines[0]["rows_out"] == r1[0].metrics["rows_out"]
    # processed coverage strictly grows (floors never regress, and the
    # new segment advanced at least one vb's floor)
    f0, f1 = hist[0].processed_floor, hist[1].processed_floor
    assert all(f1.get(vb, 0) >= s for vb, s in f0.items())
    assert sum(f1.values()) > sum(f0.values())


def test_metrics_handler_fires_per_commit(tiny_fixture, tmp_path):
    """The builder's metrics callback (live-gauge hook) fires once per
    committed run with that run's RunResult — and not for no-op polls."""
    seen = []
    pipe = (PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16))
            .set_metrics_handler(lambda res: seen.append(res.run_id))
            .build())
    r = pipe.run(os.path.join(tiny_fixture, "wal"),
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    noop = pipe.run(os.path.join(tiny_fixture, "wal"))
    assert not noop.committed
    assert seen == [r.run_id]


def test_wrong_vb_modulus_detected(tiny_fixture, tmp_path):
    """Bootstrapping off a partial-vb delta without pinning the modulus
    must fail loudly once a later vb contradicts the inferred value
    (silent continuation would duplicate keys across buckets)."""
    import pytest

    wal_src = os.path.join(tiny_fixture, "wal")
    files = sorted(glob.glob(os.path.join(wal_src, "**", "*.parquet"), recursive=True))
    live_wal = tmp_path / "wal_live"
    for p in files[: len(files) // 2]:
        dst = live_wal / os.path.relpath(p, wal_src)
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(p, dst)
    pipe = PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16)).build()
    pipe.run(str(live_wal), base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    for p in files[len(files) // 2:]:
        dst = live_wal / os.path.relpath(p, wal_src)
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(p, dst)
    with pytest.raises(ValueError, match="num_vbuckets"):
        pipe.run(str(live_wal))


def test_tail_with_merge_actor_pool(tiny_fixture, tmp_path):
    """Stateful merge-applier pool: identical final state, and the second
    delta batch merges against the actors' cached bucket tables (cache
    hits reported in metrics) instead of re-reading lake files."""
    from dcpray import ReplayConfig

    wal_src = os.path.join(tiny_fixture, "wal")
    files = sorted(glob.glob(os.path.join(wal_src, "**", "*.parquet"), recursive=True))
    live_wal = tmp_path / "wal_live"
    half = len(files) // 2

    def land(paths):
        for p in paths:
            dst = live_wal / os.path.relpath(p, wal_src)
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(p, dst)

    cfg = ReplayConfig(num_buckets=16, num_vbuckets=8, merge_actor_pool=True,
                       merge_concurrency=(2, 4))
    pipe = PipelineBuilder(str(tmp_path / "lake"), cfg).build()
    land(files[:half])
    r1 = pipe.tail(str(live_wal), base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                   poll_interval_s=0.01, max_polls=1)
    assert r1[0].metrics.get("base_cache_hits") == 0  # bootstrap: nothing cached
    land(files[half:])
    r2 = pipe.tail(str(live_wal), poll_interval_s=0.01, idle_polls_to_stop=2)
    assert r2[0].metrics["base_cache_hits"] == r2[0].metrics["buckets_written"]
    pipe.close()

    ref = PipelineBuilder(str(tmp_path / "ref"),
                          ReplayConfig(num_buckets=16, num_vbuckets=8)).build()
    ref.run(wal_src, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert_final_state_equal(
        Lake(str(tmp_path / "lake")).to_pandas_sorted(),
        Lake(str(tmp_path / "ref")).to_pandas_sorted(),
    )


def test_long_tail_chain(tiny_fixture, tmp_path):
    """Eight incremental arrival batches through the actor pool: every
    batch commits, lineage chains through parents, final state equals
    one-shot."""
    from dcpray import ReplayConfig

    wal_src = os.path.join(tiny_fixture, "wal")
    files = sorted(glob.glob(os.path.join(wal_src, "**", "*.parquet"), recursive=True))
    live_wal = tmp_path / "wal_live"
    cfg = ReplayConfig(num_buckets=16, num_vbuckets=8, merge_actor_pool=True,
                       merge_concurrency=(2, 3))
    pipe = PipelineBuilder(str(tmp_path / "lake"), cfg).build()
    step = max(1, len(files) // 8)
    committed = 0
    for i in range(0, len(files), step):
        for p in files[i:i + step]:
            dst = live_wal / os.path.relpath(p, wal_src)
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(p, dst)
        r = pipe.tail(str(live_wal),
                      base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                      poll_interval_s=0.01, max_polls=1)
        committed += len(r)
    pipe.close()
    assert committed >= 8
    hist = Lake(str(tmp_path / "lake")).store.history()
    assert [m.seq for m in hist] == list(range(1, committed + 1))
    for a, b in zip(hist, hist[1:]):
        assert b.parent == a.run_id

    ref = PipelineBuilder(str(tmp_path / "ref"),
                          ReplayConfig(num_buckets=16, num_vbuckets=8)).build()
    ref.run(wal_src, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert_final_state_equal(Lake(str(tmp_path / "lake")).to_pandas_sorted(),
                             Lake(str(tmp_path / "ref")).to_pandas_sorted())
