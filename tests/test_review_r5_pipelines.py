"""Regressions for the round-5 review of pipelines (route/replay/
builder) and window string-key support:

- NULL-collection events must never be silently lost by replay_routed
  (raise without a default, route to the default with one);
- rank_in_group / sessionize accept string group keys like every other
  coarse-partition op;
- a type-widening tranche must not brick subsequent incremental replay
  (base schema unify is permissive);
- a metrics-dump failure after a durable commit is non-fatal;
- the sink fan-out acks per-bucket stats of buckets written THIS run,
  not every manifest file (carry-forward buckets are not re-acked);
- sessionize / hopping_window get the output-name collision guard.
"""
import glob
import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from dcpray import Lake, PipelineBuilder, ReplayConfig, replay
from dcpray.sources.genwal import ensure_fixture
from tests.test_evolution_lww import _vb, _wal_file


# ----------------------------------------------------------- routing


def _mini_routed_wal(tmp_path, with_null=True):
    conv_a, conv_b = "conv-route-a", "conv-route-b"
    va, vbb = _vb(conv_a), _vb(conv_b)
    wal = tmp_path / "wal_route"
    rows = [{"vb": va, "seqno": 1, "op": "mutation", "conv": conv_a,
             "turn": 0, "role": "user", "text": "A", "ts": 1}]
    _wal_file(str(wal / f"vb_{va:04d}" / "part-000.parquet"), rows,
              with_tool_version=True)
    rows_b = [{"vb": vbb, "seqno": 1, "op": "mutation", "conv": conv_b,
               "turn": 0, "role": "user", "text": "B", "ts": 1}]
    _wal_file(str(wal / f"vb_{vbb:04d}" / "part-000.parquet"), rows_b,
              with_tool_version=True)
    # attach collections: file A -> "chat", file B -> NULL collection
    for path, coll in [(str(wal / f"vb_{va:04d}" / "part-000.parquet"),
                        "chat"),
                       (str(wal / f"vb_{vbb:04d}" / "part-000.parquet"),
                        None if with_null else "logs")]:
        t = pq.read_table(path)
        col = pa.array([coll] * t.num_rows, pa.string())
        if "collection" in t.column_names:
            t = t.set_column(t.column_names.index("collection"),
                             "collection", col)
        else:
            t = t.append_column("collection", col)
        pq.write_table(t, path)
    return str(wal)


def test_replay_routed_null_collection_raises_without_default(tmp_path):
    from dcpray.pipelines.route import replay_routed

    wal = _mini_routed_wal(tmp_path)
    with pytest.raises(KeyError, match="null collection"):
        replay_routed({"chat": Lake(str(tmp_path / "chat"))}, wal,
                      config=ReplayConfig(num_buckets=4, num_vbuckets=8))


def test_replay_routed_null_collection_goes_to_default(tmp_path):
    """The null-collection row lands in the DEFAULT lake — previously
    it was filtered out of every pass while its WAL file was committed
    as processed: permanent silent loss."""
    from dcpray.pipelines.route import replay_routed

    wal = _mini_routed_wal(tmp_path)
    chat = Lake(str(tmp_path / "chat"))
    other = Lake(str(tmp_path / "other"))
    out = replay_routed({"chat": chat}, wal, default=other,
                        config=ReplayConfig(num_buckets=4, num_vbuckets=8))
    assert "<null>" in out
    assert list(chat.to_pandas_sorted()["text"]) == ["A"]
    assert list(other.to_pandas_sorted()["text"]) == ["B"]


def test_split_wal_rejects_unsafe_and_null_collections(tmp_path):
    from dcpray.pipelines.route import split_wal_by_collection

    wal = _mini_routed_wal(tmp_path)  # has a NULL collection file
    with pytest.raises(Exception, match="NULL collection"):
        split_wal_by_collection(wal, str(tmp_path / "mirror"))
    wal2 = _mini_routed_wal(tmp_path / "w2", with_null=False)
    # poison one file with a traversal collection name
    victim = sorted(glob.glob(os.path.join(wal2, "*", "*.parquet")))[0]
    t = pq.read_table(victim)
    t = t.set_column(t.column_names.index("collection"), "collection",
                     pa.array(["../evil"] * t.num_rows, pa.string()))
    pq.write_table(t, victim)
    with pytest.raises(Exception, match="safe directory"):
        split_wal_by_collection(wal2, str(tmp_path / "mirror2"))


# ----------------------------------------------- window string keys


def test_rank_and_sessionize_accept_string_keys():
    from dcpray.functions.window import rank_in_group, sessionize

    t = pa.table({"u": pa.array(["alice", "bob", "alice", "bob"]),
                  "ts": pa.array([10, 10, 20, 4000], pa.int64()),
                  "eid": pa.array([0, 1, 2, 3], pa.int64())})
    out = (rank_in_group(rd.from_arrow(t), "u", "ts", "eid",
                         out_col="rn").to_pandas()
           .sort_values("eid").reset_index(drop=True))
    assert list(out["rn"]) == [1, 1, 2, 2]
    sess = (sessionize(rd.from_arrow(t), key_col="u", ts_col="ts",
                       gap_s=100, tiebreak_col="eid").to_pandas()
            .sort_values("eid").reset_index(drop=True))
    # bob's second event is 3990s later -> new session
    assert list(sess["session_id"]) == [0, 0, 0, 1]


def test_sessionize_and_hopping_collision_guard():
    from dcpray.functions.window import hopping_window, sessionize

    t = pa.table({"u": [1], "ts": pa.array([1], pa.int64()),
                  "eid": [1], "session_id": [9], "window_start": [9]})
    with pytest.raises(ValueError, match="already exist"):
        sessionize(rd.from_arrow(t), key_col="u", ts_col="ts",
                   tiebreak_col="eid")
    with pytest.raises(ValueError, match="already exist"):
        hopping_window(rd.from_arrow(t), ts_col="ts", size_s=10, hop_s=5)


# ------------------------------------------ replay evolution + acks


def test_incremental_replay_survives_mixed_bucket_schemas(tmp_path):
    """Run 1 commits narrow buckets; run 2's widened tranche rewrites
    ONE bucket wide; run 3 must unify the mixed carried-forward base
    schemas permissively instead of bricking the lake."""
    conv_a, conv_b = "conv-widen-a", "conv-widen-x"
    va, vbb = _vb(conv_a), _vb(conv_b)
    assert va % 8 != vbb % 8 or va != vbb  # distinct buckets preferred
    wal = tmp_path / "wal_mixed"
    _wal_file(str(wal / f"vb_{va:04d}" / "part-000.parquet"),
              [{"vb": va, "seqno": 1, "op": "mutation", "conv": conv_a,
                "turn": 0, "role": "user", "text": "a1", "ts": 1}],
              with_tool_version=False)
    _wal_file(str(wal / f"vb_{vbb:04d}" / "part-000.parquet"),
              [{"vb": vbb, "seqno": 1, "op": "mutation", "conv": conv_b,
                "turn": 0, "role": "user", "text": "b1", "ts": 1}],
              with_tool_version=False)
    lake = Lake(str(tmp_path / "lake_mixed"))
    cfg = ReplayConfig(num_buckets=8, num_vbuckets=8)
    assert replay(lake, str(wal), config=cfg).committed

    # run 2: widened turn_idx segment for conv A only
    src = str(wal / f"vb_{va:04d}" / "part-000.parquet")
    t = pq.read_table(src)
    t = t.set_column(t.schema.get_field_index("turn_idx"), "turn_idx",
                     t["turn_idx"].cast(pa.int64()))
    t = t.set_column(t.schema.get_field_index("seqno"), "seqno",
                     pa.array([2], pa.uint64()))
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(["a2-wide"], pa.string()))
    pq.write_table(t, str(wal / f"vb_{va:04d}" / "part-001.parquet"))
    assert replay(lake, str(wal), config=cfg).committed

    # run 3: another delta; base unify now spans int32 AND int64 buckets
    t = t.set_column(t.schema.get_field_index("seqno"), "seqno",
                     pa.array([3], pa.uint64()))
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(["a3"], pa.string()))
    pq.write_table(t, str(wal / f"vb_{va:04d}" / "part-002.parquet"))
    res = replay(lake, str(wal), config=cfg)
    assert res.committed
    df = lake.to_pandas_sorted()
    assert sorted(df["text"]) == ["a3", "b1"]


def test_metrics_dump_failure_is_nonfatal(tmp_path, monkeypatch):
    fx = ensure_fixture("sf0.001")
    lake = Lake(str(tmp_path / "lake"))

    def boom(run_id, metrics):
        raise OSError("disk quota")

    monkeypatch.setattr(lake, "write_metrics", boom)
    res = replay(lake, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
                 config=ReplayConfig(num_buckets=8))
    assert res.committed  # the manifest IS the durable record
    assert lake.store.load_current().run_id == res.run_id


def test_sink_acks_only_buckets_written_this_run(tmp_path):
    """Incremental commit touching a subset of buckets: on_success
    fires once per WRITTEN bucket with a real stats row — not once per
    manifest file (which would re-ack every carry-forward bucket)."""
    fx = ensure_fixture("sf0.001")

    class H:
        def __init__(self):
            self.acks = []

        def on_init(self, lake):
            pass

        def on_success(self, stats):
            self.acks.append(stats)

        def on_error(self, e):
            raise e

    h = H()
    pipe = (PipelineBuilder(str(tmp_path / "lake"),
                            ReplayConfig(num_buckets=8))
            .set_sink_response_handler(h)
            .set_logger(logging.getLogger("test"))
            .build())
    import dcpray.sources.wal as walmod

    n_files = len(walmod.scan_wal(f"{fx}/wal"))
    r1 = pipe.run(f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
                  max_files=n_files - n_files // 4)
    acked1 = len(h.acks)
    assert acked1 == r1.metrics["buckets_written"]
    assert all("rows_in" in s and "rows_out" in s for s in h.acks)
    r2 = pipe.run(f"{fx}/wal")
    acked2 = len(h.acks) - acked1
    assert acked2 == r2.metrics["buckets_written"]
    # carry-forward buckets exist and were NOT re-acked
    assert r2.metrics["buckets_carried"] > 0
    assert acked2 < r2.metrics["buckets_carried"] + \
        r2.metrics["buckets_written"] or r2.metrics["buckets_carried"] == 0
