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


class FaultyKV:
    """ConditionalKV wrapper that injects object-store failure modes:
    ``fail_next`` raises AFTER the put landed (commit-then-crash: the
    writer sees an error but the manifest is durable — the classic
    ambiguous-PUT), ``dup_next`` re-issues the put (client retry of a
    succeeded request)."""

    def __init__(self, inner):
        self.inner = inner
        self.fail_next = False
        self.dup_next = False

    def put_if_absent(self, key, data):
        ok = self.inner.put_if_absent(key, data)
        if self.dup_next:
            self.dup_next = False
            self.inner.put_if_absent(key, data)  # retry: must be a no-op
        if self.fail_next:
            self.fail_next = False
            raise ConnectionError("injected: response lost after durable put")
        return ok

    def get(self, key):
        return self.inner.get(key)

    def list(self):
        return self.inner.list()

    def delete(self, key):
        self.inner.delete(key)


def test_cas_store_under_faulty_kv(tmp_path):
    """Reader-visible state never regresses under injected faults: an
    ambiguous (durable-but-errored) commit is visible and a writer retry
    collides with ConcurrentCommitError instead of double-publishing;
    duplicated puts change nothing."""
    from dcpray.state.checkpoint import LocalFSKV, Manifest

    d = str(tmp_path / "lake")
    kv = FaultyKV(LocalFSKV(os.path.join(d, "manifests")))
    store = CasManifestStore(d, kv=kv)

    def m(run, seq):
        return Manifest(run_id=run, seq=seq, parent=None, num_buckets=4,
                        salted=True, watermarks={}, files=[])

    store.commit(m("r-1", 1))
    assert store.load_current().run_id == "r-1"

    # ambiguous commit: put lands, response lost
    kv.fail_next = True
    with pytest.raises(ConnectionError):
        store.commit(m("r-2", 2))
    # the manifest IS durable — readers already see it
    assert store.load_current().run_id == "r-2"
    # the writer's blind retry must NOT double-publish or regress
    with pytest.raises(ConcurrentCommitError):
        store.commit(m("r-2-retry", 2))
    assert store.load_current().run_id == "r-2"

    # duplicated put (client-level retry of a success): no state change
    kv.dup_next = True
    store.commit(m("r-3", 3))
    assert store.load_current().run_id == "r-3"
    assert [x.seq for x in store.history()] == [1, 2, 3]

    # reader-visible seq is monotonic across every probe above
    assert store.load_current().seq == 3


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
