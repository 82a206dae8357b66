"""Checkpoint / resume / incremental-merge semantics (SURVEY §3, §7 step 5)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.oracle import naive_final_state
from tests.util import assert_final_state_equal


def test_incremental_arrival_equals_full(tiny_fixture, tmp_path):
    """Ingesting the WAL in three partial runs (arbitrary file subsets —
    seqnos interleave across files!) converges to the uninterrupted
    result."""
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16)
    r1 = replay(lake, wal, base_snapshot_dir=base, config=cfg, max_files=3)
    r2 = replay(lake, wal, base_snapshot_dir=base, config=cfg, max_files=7)
    r3 = replay(lake, wal, base_snapshot_dir=base, config=cfg)
    assert r1.committed and r2.committed and r3.committed
    assert r3.manifest.seq == 3
    oracle = naive_final_state(wal, base)
    assert_final_state_equal(lake.to_pandas_sorted(), oracle)
    # each file was processed exactly once...
    import glob

    total = r1.metrics["wal_files"] + r2.metrics["wal_files"] + r3.metrics["wal_files"]
    assert total == len(glob.glob(os.path.join(wal, "**", "*.parquet"), recursive=True))
    # ...and once the backlog drains, the exact processed set compacts
    # away into per-vb floors equal to the watermarks (manifest stays
    # O(#vb), not O(#segments))
    assert r3.manifest.processed_wal == []
    assert r3.manifest.processed_floor == r3.manifest.watermarks


def test_processed_set_compacts_at_many_segments(tmp_path):
    """SURVEY §8 checkpoint-size bound: after committing a 1,280-segment
    WAL the manifest must stay O(#vb) — per-vb floors, empty residual —
    not O(#segments); a partial ingest keeps exact paths only for the
    straggler tail, and resume stays exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dcpray.schema import WAL_SCHEMA

    wal = tmp_path / "wal"
    n_vb, per_vb = 16, 80  # 1,280 segments
    ts = pa.scalar(0, pa.timestamp("us"))
    for vb in range(n_vb):
        d = wal / f"vb_{vb:04d}"
        os.makedirs(d)
        for f in range(per_vb):
            seq = f + 1
            t = pa.table({
                "vb": pa.array([vb], pa.uint16()),
                "seqno": pa.array([seq], pa.uint64()),
                "cas": pa.array([0], pa.uint64()),
                "rev_no": pa.array([0], pa.uint64()),
                "op": pa.array(["mutation"]),
                "collection": pa.array(["_default"]),
                "event_time": pa.array([0], pa.timestamp("us")),
                "conv_id": pa.array([f"conv-{vb}"]),
                "turn_idx": pa.array([f], pa.int32()),
                "role": pa.array(["user"]),
                "text": pa.array([f"t{vb}-{f}"]),
                "tool": pa.array([None], pa.string()),
                "ts": pa.array([0], pa.timestamp("us")),
            }, schema=WAL_SCHEMA)
            pq.write_table(t, str(d / f"part-{f:05d}.parquet"))

    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=8)
    r1 = replay(lake, str(wal), config=cfg, max_files=1000)
    m1 = lake.store.load_current()
    # residual exact set holds only stragglers, far below #segments
    assert len(m1.processed_wal) < 300, len(m1.processed_wal)

    r2 = replay(lake, str(wal), config=cfg)
    m2 = lake.store.load_current()
    assert m2.processed_wal == []
    assert m2.processed_floor == {vb: per_vb for vb in range(n_vb)}
    assert len(m2.to_json()) < 20_000
    # resume is exact: nothing left to do
    r3 = replay(lake, str(wal), config=cfg)
    assert not r3.committed and r3.metrics["note"] == "no new WAL files"
    assert r1.metrics["events_in"] + r2.metrics["events_in"] == n_vb * per_vb


def _write_seg(wal, vb, name, lo, hi, conv):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dcpray.schema import WAL_SCHEMA

    n = hi - lo + 1
    d = wal / f"vb_{vb:04d}"
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "vb": pa.array([vb] * n, "uint16"),
        "seqno": pa.array(range(lo, hi + 1), "uint64"),
        "cas": pa.array([0] * n, "uint64"),
        "rev_no": pa.array([0] * n, "uint64"),
        "op": pa.array(["mutation"] * n),
        "collection": pa.array(["_default"] * n),
        "event_time": pa.array([0] * n, pa.timestamp("us")),
        "conv_id": pa.array([conv] * n),
        "turn_idx": pa.array(range(n), "int32"),
        "role": pa.array(["user"] * n),
        "text": pa.array([f"{conv}-{s}" for s in range(lo, hi + 1)]),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
    }, schema=WAL_SCHEMA)
    pq.write_table(t, str(d / name))


def test_late_out_of_order_segment_not_skipped(tmp_path):
    """Floor-compaction soundness: after a partial run leaves a high
    floor (low files processed, a high-seqno file unprocessed), a
    segment that becomes VISIBLE later with seqnos under the floor must
    still be applied — the coverage-count check voids the floor and
    replays the vb instead of silently skipping the new file."""
    wal = tmp_path / "wal"
    _write_seg(wal, 0, "seg-a.parquet", 1, 10, "conv-a")
    _write_seg(wal, 0, "seg-b.parquet", 60, 100, "conv-b")
    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=4)
    replay(lake, str(wal), config=cfg, max_files=1)  # processes seg-a only
    m1 = lake.store.load_current()
    assert m1.processed_floor.get(0, 0) >= 50  # high floor over the gap

    # a mid-range segment becomes visible late (out-of-order)
    _write_seg(wal, 0, "seg-c.parquet", 20, 50, "conv-c")
    replay(lake, str(wal), config=cfg)
    df = lake.to_pandas_sorted()
    assert (df["conv_id"] == "conv-c").sum() == 31  # seg-c fully applied
    assert (df["conv_id"] == "conv-a").sum() == 10
    assert (df["conv_id"] == "conv-b").sum() == 41
    # rerun: clean no-op (floor coverage consistent again)
    r3 = replay(lake, str(wal), config=cfg)
    assert not r3.committed and r3.metrics["note"] == "no new WAL files"


def test_crash_before_commit_is_invisible_then_resumes(tiny_fixture, tmp_path, monkeypatch):
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")

    from dcpray.state.checkpoint import ManifestStore

    def boom(self, manifest):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(ManifestStore, "commit", boom)
    with pytest.raises(RuntimeError):
        replay(lake, wal, base_snapshot_dir=base, config=ReplayConfig(num_buckets=16))
    monkeypatch.undo()
    # nothing visible
    assert lake.store.load_current() is None
    assert lake.to_pandas_sorted().empty
    # resume = full redo; idempotent by LWW
    replay(lake, wal, base_snapshot_dir=base, config=ReplayConfig(num_buckets=16))
    assert_final_state_equal(
        lake.to_pandas_sorted(), naive_final_state(wal, base)
    )


def test_rereplay_is_noop(tiny_fixture, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    replay(lake, wal, config=ReplayConfig(num_buckets=16))
    before = lake.store.load_current()
    res = replay(lake, wal, config=ReplayConfig(num_buckets=16))
    assert not res.committed
    assert lake.store.load_current().run_id == before.run_id


def test_copy_forward_incremental(tiny_fixture, tmp_path):
    """A small delta touching one conversation rewrites only its buckets;
    untouched bucket files are carried forward by reference."""
    import json

    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16)
    replay(lake, wal, base_snapshot_dir=base, config=cfg)
    state0 = lake.to_pandas_sorted()

    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    # new event for a known key: overwrite conv 0 / turn 1
    from dcpray.hashing import vb_of_conv

    vb = int(vb_of_conv(np.array(["conv-00000000"], dtype=object),
                        meta["spec"]["num_vbuckets"])[0])
    new_seq = meta["watermarks"][str(vb)] + 1
    delta_dir = tmp_path / "delta" / f"vb_{vb:04d}"
    delta_dir.mkdir(parents=True)
    row = pa.table(
        {
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
            "text": pa.array(["UPDATED by incremental delta"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1], pa.timestamp("us")),
        }
    )
    pq.write_table(row, str(delta_dir / "part-000.parquet"))
    res = replay(lake, str(tmp_path / "delta"), config=cfg)
    assert res.committed
    assert res.metrics["buckets_written"] == 1
    assert res.metrics["buckets_carried"] == 15 or res.metrics["buckets_carried"] > 0
    state1 = lake.to_pandas_sorted()
    # exactly one row changed
    expected = state0.copy()
    m = (expected["conv_id"] == "conv-00000000") & (expected["turn_idx"] == 1)
    assert m.sum() == 1
    expected.loc[m, "text"] = "UPDATED by incremental delta"
    expected.loc[m, "role"] = "user"
    expected.loc[m, "tool"] = None
    expected.loc[m, "ts"] = pa.scalar(1, pa.timestamp("us")).as_py()
    expected.loc[m, "tool_version"] = None
    assert_final_state_equal(state1, expected)


def test_incremental_delete(tiny_fixture, tmp_path):
    """A tombstone arriving in a later run removes a committed key."""
    import json

    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    cfg = ReplayConfig(num_buckets=16)
    replay(lake, wal, config=cfg)
    state0 = lake.to_pandas_sorted()
    victim = state0.iloc[0]
    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    conv_ord = int(victim["conv_id"].split("-")[1])
    from dcpray.hashing import vb_of_conv

    vb = int(vb_of_conv(np.array([f"conv-{conv_ord:08d}"], dtype=object),
                        meta["spec"]["num_vbuckets"])[0])
    new_seq = meta["watermarks"][str(vb)] + 1
    delta_dir = tmp_path / "delta2" / f"vb_{vb:04d}"
    delta_dir.mkdir(parents=True)
    row = pa.table(
        {
            "vb": pa.array([vb], pa.uint16()),
            "seqno": pa.array([new_seq], pa.uint64()),
            "cas": pa.array([1], pa.uint64()),
            "rev_no": pa.array([100], pa.uint64()),
            "op": pa.array(["deletion"]),
            "collection": pa.array(["_default"]),
            "event_time": pa.array([0], pa.timestamp("us")),
            "conv_id": pa.array([victim["conv_id"]]),
            "turn_idx": pa.array([int(victim["turn_idx"])], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([None], pa.timestamp("us")),
        }
    )
    pq.write_table(row, str(delta_dir / "part-000.parquet"))
    replay(lake, str(tmp_path / "delta2"), config=cfg)
    state1 = lake.to_pandas_sorted()
    assert len(state1) == len(state0) - 1
    gone = (state1["conv_id"] == victim["conv_id"]) & (state1["turn_idx"] == victim["turn_idx"])
    assert gone.sum() == 0


def test_concurrent_commit_detected(tmp_path):
    """Two writers that both loaded seq N cannot both commit N+1: the
    second gets ConcurrentCommitError and the winner's CURRENT stands."""
    import pytest

    from dcpray.state.checkpoint import ConcurrentCommitError, Manifest, ManifestStore

    store = ManifestStore(str(tmp_path / "lake"))
    base = dict(parent=None, num_buckets=4, salted=True, watermarks={0: 1},
                files=[], metrics={}, processed_wal=[], strategy="aligned",
                num_vbuckets=4)
    store.commit(Manifest(run_id="r-a", seq=1, **base))
    store.commit(Manifest(run_id="r-b", seq=2, **base))
    with pytest.raises(ConcurrentCommitError):
        store.commit(Manifest(run_id="r-c", seq=2, **base))
    assert store.load_current().run_id == "r-b"


def test_strict_watermark_row_filter(tmp_path):
    """At-least-once redelivery with seqno-contiguous segments: a
    re-delivered segment containing rows at-or-below the committed
    watermark (even with conflicting payloads at the SAME seqno) is
    row-filtered, so the committed state never changes."""
    import pyarrow as pa

    from dcpray.hashing import vb_of_conv

    conv = "conv-strict-0"
    vb = int(vb_of_conv(np.array([conv], dtype=object), 8)[0])

    def wal_file(path, seqnos, texts):
        pq.write_table(pa.table({
            "vb": pa.array([vb] * len(seqnos), pa.uint16()),
            "seqno": pa.array(seqnos, pa.uint64()),
            "cas": pa.array([1] * len(seqnos), pa.uint64()),
            "rev_no": pa.array([1] * len(seqnos), pa.uint64()),
            "op": pa.array(["mutation"] * len(seqnos)),
            "collection": pa.array(["_default"] * len(seqnos)),
            "event_time": pa.array([0] * len(seqnos), pa.timestamp("us")),
            "conv_id": pa.array([conv] * len(seqnos)),
            "turn_idx": pa.array(list(range(len(seqnos))), pa.int32()),
            "role": pa.array(["user"] * len(seqnos)),
            "text": pa.array(texts),
            "tool": pa.array([None] * len(seqnos), pa.string()),
            "ts": pa.array([1] * len(seqnos), pa.timestamp("us")),
        }), path)

    wal = tmp_path / "wal" / f"vb_{vb:04d}"
    wal.mkdir(parents=True)
    wal_file(str(wal / "part-000.parquet"), [1, 2], ["one", "two"])
    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=8, num_vbuckets=8)
    replay(lake, str(tmp_path / "wal"), config=cfg, strict_watermark_rows=True)
    assert lake.store.load_current().watermarks[vb] == 2

    # redelivery: same seqnos, CONFLICTING payloads, plus one new row
    wal_file(str(wal / "part-001.parquet"), [1, 2, 3],
             ["one-CORRUPT", "two-CORRUPT", "three"])
    replay(lake, str(tmp_path / "wal"), config=cfg, strict_watermark_rows=True)
    df = lake.to_pandas_sorted()
    assert list(df["text"]) == ["one", "two", "three"]


def test_time_travel_read_at(tiny_fixture, tmp_path):
    """Snapshot reads: read_at(1) returns the table as of the first
    commit even after later commits supersede it; gc() prunes history."""
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16)
    replay(lake, wal, base_snapshot_dir=base, config=cfg, max_files=7)
    state1 = lake.to_pandas_sorted()
    replay(lake, wal, base_snapshot_dir=base, config=cfg)
    state2 = lake.to_pandas_sorted()
    assert not state1.equals(state2)

    import pandas as pd

    at1 = (lake.read_at(1).to_pandas()
           .sort_values(["conv_id", "turn_idx"], kind="mergesort")
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        at1[sorted(at1.columns)],
        state1[sorted(state1.columns)],
        check_dtype=False,
    )
    at2 = (lake.read_at(2).to_pandas()
           .sort_values(["conv_id", "turn_idx"], kind="mergesort")
           .reset_index(drop=True))
    assert len(at2) == len(state2)

    from dcpray import gc as lake_gc

    # gc that RETAINS a historical manifest must keep its data readable
    # (liveness = union of retained manifests, not just CURRENT)
    lake_gc(lake, keep_manifests=5, grace_s=0.0)
    still1 = (lake.read_at(1).to_pandas()
              .sort_values(["conv_id", "turn_idx"], kind="mergesort")
              .reset_index(drop=True))
    assert len(still1) == len(state1)

    lake_gc(lake, keep_manifests=1)
    import pytest

    with pytest.raises(KeyError):
        lake.manifest_at(1)
