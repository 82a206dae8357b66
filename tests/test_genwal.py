"""Generator invariants (FIXTURES.md) — no Ray needed."""

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq


def _wal_df(d):
    import pandas as pd

    from dcpray.oracle import read_wal_pandas

    return read_wal_pandas(os.path.join(d, "wal"))


def test_deterministic(tmp_path):
    from dcpray.sources.genwal import FixtureSpec, generate_fixture

    spec = FixtureSpec(num_vbuckets=4, num_convs=30)
    m1 = generate_fixture(str(tmp_path / "a"), spec)
    m2 = generate_fixture(str(tmp_path / "b"), spec)
    assert m1 == m2
    t1 = _wal_df(str(tmp_path / "a")).sort_values(["vb", "seqno"]).reset_index(drop=True)
    t2 = _wal_df(str(tmp_path / "b")).sort_values(["vb", "seqno"]).reset_index(drop=True)
    assert t1.equals(t2)


def test_invariants(tiny_fixture):
    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    wal = _wal_df(tiny_fixture)
    assert len(wal) == meta["n_events"] + meta["n_poison"]

    # per-vb seqnos are unique and dense from 1
    for vb, g in wal.groupby("vb"):
        s = np.sort(g["seqno"].to_numpy())
        assert s[0] == 1 and s[-1] == len(s) and len(np.unique(s)) == len(s)
        assert meta["watermarks"][str(vb)] == int(s[-1])

    # per-key seqno order matches version order (LWW = replay order)
    live = wal[wal["conv_id"].notna()]
    muts = live[live["op"] == "mutation"]
    v = muts["text"].str.extract(r"-v(\d+) ")[0].astype(float)
    chk = muts.assign(v=v).sort_values("seqno").groupby(["conv_id", "turn_idx"])["v"]
    assert (chk.apply(lambda s: s.is_monotonic_increasing)).all()

    # tombstones have null payloads (NewDeleteEvent/NewExpireEvent parity)
    tombs = live[live["op"] != "mutation"]
    assert len(tombs) > 0
    assert tombs[["role", "text", "tool", "ts"]].isna().all().all()

    # out-of-order files: at least one vb dir has a file whose min seqno is
    # above another file's max (arrival order != seqno order)
    shuffled = False
    for vb_dir in glob.glob(os.path.join(tiny_fixture, "wal", "vb_*")):
        files = sorted(glob.glob(os.path.join(vb_dir, "*.parquet")))
        ranges = []
        for fp in files:
            t = pq.read_table(fp, columns=["seqno"])
            s = t["seqno"].to_numpy()
            ranges.append((s.min(), s.max()))
        for i in range(len(ranges) - 1):
            if ranges[i][1] > ranges[i + 1][0]:
                shuffled = True
    assert shuffled

    # schema evolution: some files lack tool_version, the last per vb has it
    names = [pq.read_schema(f).names for f in glob.glob(os.path.join(tiny_fixture, "wal", "*", "*.parquet"))]
    assert any("tool_version" in n for n in names)
    assert any("tool_version" not in n for n in names)

    # skew: hot conversations hold a noticeable share
    hot = set(meta["hot_convs"])
    share = live["conv_id"].isin(hot).mean()
    assert share > 0.10

    # poison rows present
    assert (wal["conv_id"].isna()).sum() == meta["n_poison"]


def test_base_snapshot(tiny_fixture):
    import pyarrow as pa

    base = pa.concat_tables(
        pq.read_table(p)
        for p in sorted(glob.glob(os.path.join(tiny_fixture, "base", "*.parquet")))
    )
    assert base.num_rows > 0
    assert base.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # base-only conversations exist (never touched by the WAL)
    wal = _wal_df(tiny_fixture)
    wal_convs = set(wal["conv_id"].dropna())
    base_convs = set(base["conv_id"].to_pylist())
    assert base_convs - wal_convs
