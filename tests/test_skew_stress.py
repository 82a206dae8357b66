"""Extreme skew: one conversation receives a 200k-version flood (the
north rule's hot-key case, far beyond the fixture's mild hot convs).
The precombine collapses the flood to ≤1 row per key per chunk, so both
strategies stay bounded and agree with the trivially-computable truth."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dcpray import Lake, ReplayConfig, replay
from dcpray.hashing import vb_of_conv

NUM_VB = 8
HOT = "conv-hot-00000000"
N_FLOOD = 200_000
N_TURNS = 4


def _make_wal(tmp_path):
    wal = tmp_path / "wal_skew"
    v = int(vb_of_conv(np.array([HOT], dtype=object), NUM_VB)[0])
    rng = np.random.RandomState(7)
    turn = rng.randint(0, N_TURNS, N_FLOOD).astype(np.int32)
    seq = np.arange(1, N_FLOOD + 1, dtype=np.uint64)
    perm = rng.permutation(N_FLOOD)  # files NOT in seqno order
    t = pa.table(
        {
            "vb": pa.array(np.full(N_FLOOD, v), pa.uint16()),
            "seqno": pa.array(seq[perm], pa.uint64()),
            "cas": pa.array(np.ones(N_FLOOD), pa.uint64()),
            "rev_no": pa.array(np.ones(N_FLOOD), pa.uint64()),
            "op": pa.array(["mutation"] * N_FLOOD, pa.string()),
            "collection": pa.array(["_default"] * N_FLOOD, pa.string()),
            "event_time": pa.array(np.zeros(N_FLOOD, dtype=np.int64), pa.timestamp("us")),
            "conv_id": pa.array([HOT] * N_FLOOD, pa.string()),
            "turn_idx": pa.array(turn[perm], pa.int32()),
            "role": pa.array(["user"] * N_FLOOD, pa.string()),
            "text": pa.array([f"v{s}" for s in seq[perm]], pa.string()),
            "tool": pa.array([None] * N_FLOOD, pa.string()),
            "ts": pa.array(np.ones(N_FLOOD, dtype=np.int64), pa.timestamp("us")),
        }
    )
    d = wal / f"vb_{v:04d}"
    os.makedirs(d)
    files = 4
    step = N_FLOOD // files
    for f in range(files):
        pq.write_table(t.slice(f * step, step), str(d / f"part-{f:03d}.parquet"))
    # expected winner per turn = the max seqno that drew that turn
    expect = {}
    for tr, s in zip(turn, seq):
        if tr not in expect or s > expect[tr]:
            expect[tr] = int(s)
    return str(wal), expect


def test_hot_key_flood_both_strategies(tmp_path):
    wal, expect = _make_wal(tmp_path)
    for strategy in ("aligned", "shuffle"):
        lake = Lake(str(tmp_path / f"lake_{strategy}"))
        res = replay(
            lake, wal,
            config=ReplayConfig(num_buckets=8, num_vbuckets=NUM_VB, strategy=strategy),
        )
        if strategy == "aligned":
            assert res.metrics["hot_buckets_split"] == 0  # under threshold
        assert res.metrics["events_in"] == N_FLOOD
        df = lake.to_pandas_sorted()
        assert len(df) == len(expect), strategy
        for _, row in df.iterrows():
            assert row["text"] == f"v{expect[int(row['turn_idx'])]}", strategy
        if strategy == "aligned":
            # skew visible in metrics: the flood lands in one vb bucket
            assert res.metrics["bucket_rows_in_max"] == N_FLOOD
        else:
            # salted precombine collapsed the flood BEFORE the shuffle:
            # merge-side rows_in is per-block-reduced (≤ blocks × turns)
            assert res.metrics["bucket_rows_in_max"] < 1000


def test_hot_bucket_split_equals_unsplit(tmp_path):
    """With the threshold forced tiny, the flooded bucket's segments are
    reduced by parallel partial-LWW tasks feeding one merge — identical
    final state to the unsplit path (LWW associativity)."""
    wal, expect = _make_wal(tmp_path)
    plain = Lake(str(tmp_path / "plain"))
    replay(plain, wal, config=ReplayConfig(num_buckets=8, num_vbuckets=NUM_VB))

    split = Lake(str(tmp_path / "split"))
    res = replay(split, wal,
                 config=ReplayConfig(num_buckets=8, num_vbuckets=NUM_VB,
                                     hot_bucket_rows=50_000))
    assert res.metrics["hot_buckets_split"] == 1
    assert res.metrics["bucket_rows_in_max"] == N_FLOOD  # true delta reported

    a = plain.to_pandas_sorted()
    b = split.to_pandas_sorted()
    assert a.equals(b) and len(a) == len(expect)
