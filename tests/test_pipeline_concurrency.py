"""Pipeline-level optimistic concurrency (r4 verdict #5): two replay()
writers racing one CAS-backed lake through the FULL commit path.

Store-level CAS contention is covered in test_manifest_backends; here
the contention is driven through replay() itself: both writers build
their entire run (bucket files written, manifest prepared) and race the
commit. Exactly one must ack; the loser fails loudly, its rerun
converges the lake to the serial result, and gc() collects the loser's
orphaned first-attempt bucket files.
"""
import glob
import os
import threading

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.sources.genwal import ensure_fixture
from dcpray.state.checkpoint import (
    CasManifestStore,
    ConcurrentCommitError,
)


class _BarrierStore:
    """CasManifestStore whose commit() waits for BOTH writers to reach
    the commit point before either publishes — deterministically forces
    the both-loaded-the-same-parent race a timing-based test could only
    hope for."""

    def __init__(self, inner: CasManifestStore, barrier: threading.Barrier):
        self._inner = inner
        self._barrier = barrier

    def commit(self, manifest):
        try:
            self._barrier.wait(timeout=180)
        except threading.BrokenBarrierError:
            # the other writer crashed before its commit — proceed solo
            pass
        return self._inner.commit(manifest)

    def __getattr__(self, name):
        return getattr(self._inner, name)


@pytest.fixture(scope="module")
def split_wal(tmp_path_factory):
    """sf0.001 WAL split on a seqno cutoff into two valid stream
    prefixes (same construction as test_history.two_commit_lake)."""
    fx = ensure_fixture("sf0.001")
    root = str(tmp_path_factory.mktemp("concwal"))
    C = 250
    for f in glob.glob(f"{fx}/wal/*/*.parquet"):
        t = pq.read_table(f)
        rel = os.path.relpath(f, f"{fx}/wal")
        for name, tt in (("wal_a", t.filter(pc.less_equal(t["seqno"], C))),
                         ("wal_b", t.filter(pc.greater(t["seqno"], C)))):
            if tt.num_rows:
                dst = os.path.join(root, name, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                pq.write_table(tt, dst)
    return root, fx


def test_two_concurrent_replays_exactly_one_acks(split_wal, tmp_path):
    root, fx = split_wal
    lake_dir = str(tmp_path / "racelake")
    barrier = threading.Barrier(2)
    cfg = ReplayConfig(num_buckets=8)

    results: dict[str, object] = {}

    def writer(name: str, wal: str):
        lake = Lake(lake_dir,
                    store=_BarrierStore(CasManifestStore(lake_dir), barrier))
        try:
            # both writers pass the base snapshot: it is applied only
            # by whichever bootstraps the empty lake (prev is None) —
            # the loser's rerun sees the winner's manifest and skips it
            results[name] = replay(lake, wal,
                                   base_snapshot_dir=f"{fx}/base",
                                   config=cfg)
        except BaseException as exc:  # noqa: BLE001 — recorded for asserts
            results[name] = exc

    ta = threading.Thread(target=writer, args=("a", f"{root}/wal_a"))
    tb = threading.Thread(target=writer, args=("b", f"{root}/wal_b"))
    ta.start(); tb.start()
    ta.join(300); tb.join(300)
    assert not ta.is_alive() and not tb.is_alive()

    outcomes = {k: type(v).__name__ for k, v in results.items()}
    winners = [k for k, v in results.items()
               if not isinstance(v, BaseException)]
    losers = [k for k, v in results.items()
              if isinstance(v, ConcurrentCommitError)]
    # exactly one writer acks seq 1; the other fails LOUDLY with the
    # concurrency error (never a silent double-ack, never a crash of a
    # different type)
    assert len(winners) == 1 and len(losers) == 1, outcomes
    assert results[winners[0]].committed

    lake = Lake(lake_dir, store=CasManifestStore(lake_dir))
    assert lake.store.load_current().seq == 1

    # the loser's rerun converges: reloads the winner's manifest and
    # processes only what remains
    loser_wal = f"{root}/wal_{losers[0]}"
    res2 = replay(lake, loser_wal, base_snapshot_dir=f"{fx}/base",
                  config=cfg)
    assert res2.committed and lake.store.load_current().seq == 2

    # lake state == a SERIAL execution of both writers
    serial_dir = str(tmp_path / "seriallake")
    serial = Lake(serial_dir, store=CasManifestStore(serial_dir))
    r1 = replay(serial, f"{root}/wal_a", base_snapshot_dir=f"{fx}/base",
                config=cfg)
    r2 = replay(serial, f"{root}/wal_b", config=cfg)
    assert r1.committed and r2.committed
    a = lake.to_pandas_sorted()
    b = serial.to_pandas_sorted()
    pd.testing.assert_frame_equal(a, b)

    # the loser's first attempt left orphaned bucket files — invisible
    # (no manifest references them) and collected by gc
    live_runs = {os.path.basename(os.path.dirname(f["path"]))
                 for m in lake.store.history() for f in m.files}
    all_runs = set(os.listdir(os.path.join(lake_dir, "data")))
    orphans = all_runs - live_runs
    assert orphans, "expected the loser's uncommitted run dir on disk"
    from dcpray.pipelines.compact import gc

    stats = gc(lake, keep_manifests=5, grace_s=0.0)
    assert stats["removed_run_dirs"] >= len(orphans)
    assert set(os.listdir(os.path.join(lake_dir, "data"))) == live_runs
    # and the table still reads back intact after collection
    pd.testing.assert_frame_equal(lake.to_pandas_sorted(), b)
