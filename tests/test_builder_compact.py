"""Builder API (connector.go:259-312 parity), tombstone compaction
(compacted-topic cleanup analogue) and uncommitted-run GC."""

import logging
import os

import pyarrow.parquet as pq
import pytest

from dcpray import Lake, PipelineBuilder, ReplayConfig, SinkResponseHandler, compact, gc
from tests.util import assert_final_state_equal


class RecordingHandler(SinkResponseHandler):
    def __init__(self):
        self.init_called = 0
        self.successes = []
        self.errors = []

    def on_init(self, lake):
        self.init_called += 1

    def on_success(self, stats):
        self.successes.append(stats)

    def on_error(self, e):
        self.errors.append(e)


def test_builder_runs_and_fans_out(tiny_fixture, tmp_path):
    handler = RecordingHandler()
    completions = []
    pipe = (
        PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16))
        .set_mapper(None)
        .set_sink_response_handler(handler)
        .set_completion_handler(completions.append)
        .set_logger(logging.getLogger("test"))
        .build()
    )
    res = pipe.run(os.path.join(tiny_fixture, "wal"),
                   base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert res.committed
    assert handler.init_called == 1
    assert len(handler.successes) == len(res.manifest.files)
    assert completions and completions[0] is res
    # idempotent rerun still calls completion, no new successes
    res2 = pipe.run(os.path.join(tiny_fixture, "wal"))
    assert not res2.committed
    assert len(completions) == 2


def test_compact_drops_tombstones_only(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    pipe = PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16)).build()
    pipe.run(wal, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    before = lake.to_pandas_sorted()
    m0 = lake.store.load_current()
    raw_rows = sum(
        pq.ParquetFile(lake.abspath(f["path"])).metadata.num_rows for f in m0.files
    )
    assert raw_rows > len(before)  # tombstones persisted pre-compaction

    metrics = compact(lake, wal)
    assert metrics["dropped_tombstones"] == raw_rows - len(before)
    after = lake.to_pandas_sorted()
    assert_final_state_equal(before, after)
    m1 = lake.store.load_current()
    assert m1.seq == m0.seq + 1 and m1.parent == m0.run_id
    raw_after = sum(
        pq.ParquetFile(lake.abspath(f["path"])).metadata.num_rows for f in m1.files
    )
    assert raw_after == len(after)


def test_compact_refuses_with_unprocessed_wal(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    pipe = PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16)).build()
    pipe.run(wal, base_snapshot_dir=os.path.join(tiny_fixture, "base"), max_files=5)
    with pytest.raises(ValueError, match="not yet processed"):
        compact(lake, wal)
    compact(lake, wal, force=True)  # explicit override allowed


def test_gc_removes_uncommitted_runs(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    pipe = PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16)).build()
    pipe.run(wal, base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    before = lake.to_pandas_sorted()
    # fake an orphaned (crashed, uncommitted) run directory
    orphan = os.path.join(str(tmp_path / "lake"), "data", "r-deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "bucket-00000.parquet"), "w") as f:
        f.write("junk")
    stats = gc(lake)
    assert stats["removed_run_dirs"] == 1
    assert not os.path.exists(orphan)
    assert_final_state_equal(before, lake.to_pandas_sorted())
