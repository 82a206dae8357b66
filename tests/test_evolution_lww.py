"""SURVEY §7 hard parts: schema evolution interacting with LWW, and the
chunked-reduce memory bound.

Races resolved purely by seqno comparison (never arrival order):
- an OLD-schema mutation with higher seqno beats a NEW-schema tombstone,
  and the winner reads with null evolved columns;
- a NEW-schema tombstone with higher seqno kills an old-schema mutation
  even when the mutation's file arrives later.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dcpray import Lake, ReplayConfig, replay
from dcpray.hashing import vb_of_conv


def _wal_file(path, rows, with_tool_version):
    cols = {
        "vb": pa.array([r["vb"] for r in rows], pa.uint16()),
        "seqno": pa.array([r["seqno"] for r in rows], pa.uint64()),
        "cas": pa.array([1] * len(rows), pa.uint64()),
        "rev_no": pa.array([1] * len(rows), pa.uint64()),
        "op": pa.array([r["op"] for r in rows], pa.string()),
        "collection": pa.array(["_default"] * len(rows), pa.string()),
        "event_time": pa.array([0] * len(rows), pa.timestamp("us")),
        "conv_id": pa.array([r["conv"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn"] for r in rows], pa.int32()),
        "role": pa.array([r.get("role") for r in rows], pa.string()),
        "text": pa.array([r.get("text") for r in rows], pa.string()),
        "tool": pa.array([None] * len(rows), pa.string()),
        "ts": pa.array([r.get("ts") for r in rows], pa.timestamp("us")),
    }
    if with_tool_version:
        cols["tool_version"] = pa.array([r.get("tv") for r in rows], pa.string())
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table(cols), path)


def _vb(conv):
    return int(vb_of_conv(np.array([conv], dtype=object), 8)[0])


def _run(tmp_path, strategy):
    wal = tmp_path / f"wal_{strategy}"
    ka, kb = "conv-evo-a", "conv-evo-b"
    va, vb_ = _vb(ka), _vb(kb)
    # file 1 (NEW schema): tombstone for a@seq3; tombstone for b@seq9 (wins)
    _wal_file(str(wal / f"vb_{va:04d}" / "part-000.parquet"),
              [{"vb": va, "seqno": 3, "op": "deletion", "conv": ka, "turn": 0}],
              with_tool_version=True)
    _wal_file(str(wal / f"vb_{vb_:04d}" / "part-000.parquet"),
              [{"vb": vb_, "seqno": 9, "op": "expiration", "conv": kb, "turn": 0}],
              with_tool_version=True)
    # file 2 (OLD schema, arrives "later"): mutation a@seq5 (wins, null tv);
    # mutation b@seq4 (stays dead under the seq9 tombstone)
    _wal_file(str(wal / f"vb_{va:04d}" / "part-001.parquet"),
              [{"vb": va, "seqno": 5, "op": "mutation", "conv": ka, "turn": 0,
                "role": "user", "text": "old-schema winner", "ts": 1}],
              with_tool_version=False)
    _wal_file(str(wal / f"vb_{vb_:04d}" / "part-001.parquet"),
              [{"vb": vb_, "seqno": 4, "op": "mutation", "conv": kb, "turn": 0,
                "role": "user", "text": "should stay dead", "ts": 1}],
              with_tool_version=False)
    lake = Lake(str(tmp_path / f"lake_{strategy}"))
    replay(lake, str(wal),
           config=ReplayConfig(num_buckets=8, num_vbuckets=8, strategy=strategy))
    return lake.to_pandas_sorted()


def test_evolution_lww_races_both_strategies(tmp_path):
    for strategy in ("aligned", "shuffle"):
        df = _run(tmp_path, strategy)
        assert list(df["conv_id"]) == ["conv-evo-a"], strategy
        assert df.iloc[0]["text"] == "old-schema winner"
        import pandas as pd

        assert pd.isna(df.iloc[0]["tool_version"])  # evolved col null on old-schema winner


def test_chunked_reduce_equals_unchunked(tiny_fixture, tmp_path):
    """chunk_rows small enough to force many partial reduces per bucket
    must give the identical result (memory-bound path correctness)."""
    from tests.util import assert_final_state_equal

    one = Lake(str(tmp_path / "one"))
    replay(one, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"),
           config=ReplayConfig(num_buckets=16))

    # r5 review: the old monkeypatch of make_aligned_merger tested
    # NOTHING (replay never called it); merge_chunk_rows is now a real
    # config knob wired into the merge spec
    two = Lake(str(tmp_path / "two"))
    replay(two, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"),
           config=ReplayConfig(num_buckets=16, merge_chunk_rows=64))
    assert_final_state_equal(one.to_pandas_sorted(), two.to_pandas_sorted())


def test_type_widening_across_segments(tmp_path):
    """A later segment widening turn_idx to int64 unifies permissively
    (int32 → int64) instead of failing the scan."""
    conv = "conv-widen-0"
    v = _vb(conv)
    wal = tmp_path / "wal_widen"
    _wal_file(str(wal / f"vb_{v:04d}" / "part-000.parquet"),
              [{"vb": v, "seqno": 1, "op": "mutation", "conv": conv, "turn": 0,
                "role": "system", "text": "narrow", "ts": 1}],
              with_tool_version=False)
    # same key rewritten by a wide-schema segment
    t = pq.read_table(str(wal / f"vb_{v:04d}" / "part-000.parquet"))
    i = t.schema.get_field_index("turn_idx")
    t = t.set_column(i, "turn_idx", t["turn_idx"].cast(pa.int64()))
    i = t.schema.get_field_index("seqno")
    t = t.set_column(i, "seqno", pa.array([2], pa.uint64()))
    i = t.schema.get_field_index("text")
    t = t.set_column(i, "text", pa.array(["wide winner"], pa.string()))
    pq.write_table(t, str(wal / f"vb_{v:04d}" / "part-001.parquet"))

    for strategy in ("aligned", "shuffle"):
        lake = Lake(str(tmp_path / f"lake_widen_{strategy}"))
        replay(lake, str(wal),
               config=ReplayConfig(num_buckets=8, num_vbuckets=8, strategy=strategy))
        df = lake.to_pandas_sorted()
        assert list(df["text"]) == ["wide winner"], strategy
        assert int(df.iloc[0]["turn_idx"]) == 0
