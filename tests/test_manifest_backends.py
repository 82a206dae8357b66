"""Manifest store backends (reference parity: metadata.type selects the
checkpoint backend, connector.go:173-175): the POSIX ManifestStore and
the object-store-safe CasManifestStore must satisfy the same contract —
commit/load/resume/optimistic concurrency — through the full replay
path. The CAS layout relies only on conditional PUT + list, so it
transfers to S3-style stores where os.link/rename do not exist."""

import os

import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.oracle import naive_final_state
from dcpray.state.checkpoint import (
    CasManifestStore,
    ConcurrentCommitError,
    ManifestStore,
)
from tests.util import assert_final_state_equal

BACKENDS = {
    "posix": lambda d: ManifestStore(d),
    "cas": lambda d: CasManifestStore(d),
}


@pytest.fixture(params=sorted(BACKENDS))
def backend(request):
    return request.param, BACKENDS[request.param]


def _lake(tmp_path, backend, name):
    _, factory = backend
    d = str(tmp_path / name)
    os.makedirs(d, exist_ok=True)
    return Lake(d, store=factory(d))


def test_replay_resume_against_backend(tiny_fixture, tmp_path, backend):
    lake = _lake(tmp_path, backend, "lake")
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16)
    r1 = replay(lake, wal, base_snapshot_dir=base, config=cfg, max_files=7)
    r2 = replay(lake, wal, base_snapshot_dir=base, config=cfg)
    assert r1.committed and r2.committed
    assert r2.manifest.seq == 2 and r2.manifest.parent == r1.run_id
    assert_final_state_equal(
        lake.to_pandas_sorted(), naive_final_state(wal, base)
    )
    # idempotent rerun
    r3 = replay(lake, wal, config=cfg)
    assert not r3.committed and r3.metrics["note"] == "no new WAL files"
    # lineage readable through the backend
    assert [m.seq for m in lake.store.history()] == [1, 2]


def test_concurrent_commit_loses_cleanly(tmp_path, backend):
    from dcpray.state.checkpoint import Manifest

    _, factory = backend
    d = str(tmp_path / "lake")
    os.makedirs(d, exist_ok=True)
    s1, s2 = factory(d), factory(d)

    def m(run, seq):
        return Manifest(run_id=run, seq=seq, parent=None, num_buckets=4,
                        salted=True, watermarks={}, files=[])

    s1.commit(m("r-a", 1))
    with pytest.raises(ConcurrentCommitError):
        s2.commit(m("r-b", 1))  # lost the race for seq 1
    assert s2.load_current().run_id == "r-a"
    s2.commit(m("r-b", 2))
    assert s1.load_current().run_id == "r-b"


def test_builder_metadata_store_swap(tiny_fixture, tmp_path):
    """PipelineBuilder.set_metadata_store parity (connector.go:226-229):
    a pipeline built on the CAS store replays and resumes correctly."""
    from dcpray import PipelineBuilder, ReplayConfig

    d = str(tmp_path / "lake")
    pipe = (PipelineBuilder(d, ReplayConfig(num_buckets=16))
            .set_metadata_store(CasManifestStore(d))
            .build())
    wal = os.path.join(tiny_fixture, "wal")
    res = pipe.run(wal, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert res.committed
    assert isinstance(pipe.lake.store, CasManifestStore)
    assert not os.path.exists(os.path.join(d, "CURRENT"))  # CAS layout: no pointer
    res2 = pipe.run(wal)
    assert not res2.committed and res2.metrics["note"] == "no new WAL files"


def test_clear(tmp_path, backend):
    from dcpray.state.checkpoint import Manifest

    _, factory = backend
    d = str(tmp_path / "lake")
    os.makedirs(d, exist_ok=True)
    s = factory(d)
    s.commit(Manifest(run_id="r-x", seq=1, parent=None, num_buckets=4,
                      salted=True, watermarks={}, files=[]))
    assert s.load_current() is not None
    s.clear()
    assert s.load_current() is None
