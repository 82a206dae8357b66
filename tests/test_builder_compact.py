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


def test_incremental_replay_after_compact(tiny_fixture, tmp_path):
    """Compaction must not break subsequent incremental ingestion: a
    delta replayed onto a compacted lake merges against the rewritten
    bucket files and converges to the same state as the uncompacted
    path."""
    import numpy as np
    import pyarrow as pa

    from dcpray.hashing import vb_of_conv

    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16)

    lakes = {}
    for name, do_compact in (("plain", False), ("compacted", True)):
        lake = Lake(str(tmp_path / name))
        pipe = PipelineBuilder(str(tmp_path / name), cfg).build()
        pipe.run(wal, base_snapshot_dir=base)
        if do_compact:
            compact(lake, wal)
        # delta: overwrite one known key past the committed watermark
        conv = "conv-00000001"
        vb = int(vb_of_conv(__import__("numpy").array([conv], dtype=object),
                            lake.store.load_current().num_vbuckets)[0])
        wm = lake.store.load_current().watermarks
        delta_dir = tmp_path / f"delta_{name}" / f"vb_{vb:04d}"
        delta_dir.mkdir(parents=True)
        row = pa.table({
            "vb": pa.array([vb], pa.uint16()),
            "seqno": pa.array([wm.get(vb, 0) + 1], pa.uint64()),
            "cas": pa.array([1], pa.uint64()),
            "rev_no": pa.array([9], pa.uint64()),
            "op": pa.array(["mutation"]),
            "collection": pa.array(["_default"]),
            "event_time": pa.array([0], pa.timestamp("us")),
            "conv_id": pa.array([conv]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["system"]),
            "text": pa.array(["post-compact delta"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([5], pa.timestamp("us")),
        })
        pq.write_table(row, str(delta_dir / "part-000.parquet"))
        pipe.run(str(tmp_path / f"delta_{name}"))
        lakes[name] = lake.to_pandas_sorted()

    assert_final_state_equal(lakes["plain"], lakes["compacted"])
    hit = lakes["compacted"].query("conv_id == 'conv-00000001' and turn_idx == 0")
    assert list(hit["text"]) == ["post-compact delta"]


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
    # a FRESH orphan dir could be an in-flight replay's output — the
    # default grace period must leave it alone
    stats = gc(lake)
    assert stats["removed_run_dirs"] == 0
    assert os.path.exists(orphan)
    stats = gc(lake, grace_s=0.0)
    assert stats["removed_run_dirs"] == 1
    assert not os.path.exists(orphan)
    assert_final_state_equal(before, lake.to_pandas_sorted())


def test_failing_mapper_leaves_lake_untouched(tiny_fixture, tmp_path):
    """A poison mapper fails the run (after Ray task retries); on_error
    fires, no manifest commits, and a rerun with a good mapper converges
    — the crash-and-replay contract (reference producer_batch.go:117-121
    panic path)."""
    import pytest

    def bad_mapper(batch):
        raise RuntimeError("poison mapper")

    handler = RecordingHandler()
    pipe = (
        PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16))
        .set_mapper(bad_mapper)
        .set_sink_response_handler(handler)
        .build()
    )
    with pytest.raises(Exception):
        pipe.run(os.path.join(tiny_fixture, "wal"),
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert len(handler.errors) == 1
    lake = Lake(str(tmp_path / "lake"))
    assert lake.store.load_current() is None  # nothing committed

    good = (
        PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16))
        .build()
    )
    res = good.run(os.path.join(tiny_fixture, "wal"),
                   base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert res.committed
