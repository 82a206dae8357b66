"""Regressions for the round-5 review of the CDC core (wal/aligned/
reject/merge/mapper):

- empty WAL segments (a producer's zero-event flush) must not brick
  aligned replay or wedge compact's safety check;
- all-null routing columns in a segment dead-letter instead of killing
  the footer scan;
- negative vb rows dead-letter instead of being silently dropped
  against the wrong vb's watermark;
- a mapper emitting null merge keys fails loudly (null-key rows would
  accumulate in the lake forever);
- empty base-snapshot part files bootstrap cleanly;
- scan_wal tolerates a segment deleted between glob and stat.
"""
import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.sources import wal as walmod
from dcpray.sources.genwal import ensure_fixture


def _fresh_lake_dirs(tmp_path, fx):
    import shutil

    wal = str(tmp_path / "wal")
    shutil.copytree(os.path.join(fx, "wal"), wal)
    return wal, str(tmp_path / "lake")


def test_empty_wal_segment_ignored_everywhere(tmp_path):
    """An empty flush file: replay proceeds on the ALIGNED strategy,
    result equals the no-empty-file run, and compact is not wedged by a
    perpetually-'unprocessed' zero-row file."""
    from dcpray.pipelines.compact import compact

    fx = ensure_fixture("sf0.001")
    wal, lake_dir = _fresh_lake_dirs(tmp_path, fx)
    # land an empty segment in one vb dir (schema matches the stream)
    some_vb_dir = sorted(glob.glob(os.path.join(wal, "*")))[0]
    schema = pq.read_schema(
        sorted(glob.glob(os.path.join(some_vb_dir, "*.parquet")))[0])
    pq.write_table(schema.empty_table(),
                   os.path.join(some_vb_dir, "part-empty.parquet"))

    infos = walmod.scan_wal(wal)
    assert all(i.rows > 0 for i in infos)  # empty file not in the log

    lake = Lake(lake_dir)
    res = replay(lake, wal, base_snapshot_dir=f"{fx}/base",
                 config=ReplayConfig(num_buckets=8))
    assert res.committed
    assert lake.store.load_current().strategy == "aligned"

    ref = Lake(str(tmp_path / "ref"))
    replay(ref, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
           config=ReplayConfig(num_buckets=8))
    pd.testing.assert_frame_equal(lake.to_pandas_sorted(),
                                  ref.to_pandas_sorted())
    # compact's safety check must not see the empty file as unprocessed
    out = compact(lake, wal)
    assert out["op"] == "compact"


def test_all_null_routing_columns_dead_letter(tmp_path):
    """A corrupt segment whose vb/seqno are entirely null (and without
    parquet stats): scan_wal survives, shuffle replay dead-letters the
    rows, the good rows still commit."""
    fx = ensure_fixture("sf0.001")
    wal, lake_dir = _fresh_lake_dirs(tmp_path, fx)
    some_vb_dir = sorted(glob.glob(os.path.join(wal, "*")))[0]
    ref_file = sorted(glob.glob(os.path.join(some_vb_dir, "*.parquet")))[0]
    t = pq.read_table(ref_file).slice(0, 3)
    n = t.num_rows
    t = t.set_column(t.schema.get_field_index("vb"), "vb",
                     pa.nulls(n, t.schema.field("vb").type))
    t = t.set_column(t.schema.get_field_index("seqno"), "seqno",
                     pa.nulls(n, t.schema.field("seqno").type))
    pq.write_table(t, os.path.join(some_vb_dir, "part-corrupt.parquet"),
                   write_statistics=False)

    infos = walmod.scan_wal(wal)
    corrupt = [i for i in infos if i.path.endswith("part-corrupt.parquet")]
    assert len(corrupt) == 1 and corrupt[0].vb == -1

    lake = Lake(lake_dir)
    res = replay(lake, wal, base_snapshot_dir=f"{fx}/base",
                 config=ReplayConfig(num_buckets=8, strategy="shuffle"))
    assert res.committed
    assert lake.rejected_count(res.run_id) >= n  # corrupt rows in DLQ
    ref = Lake(str(tmp_path / "ref"))
    replay(ref, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
           config=ReplayConfig(num_buckets=8, strategy="shuffle"))
    pd.testing.assert_frame_equal(lake.to_pandas_sorted(),
                                  ref.to_pandas_sorted())


def test_negative_vb_dead_letters_not_silent_drop(tmp_path):
    from dcpray.stages.reject import make_reject_filter

    wm = np.array([100, 200, 999], np.uint64)
    rejected = str(tmp_path / "rej")
    os.makedirs(rejected)
    f = make_reject_filter(wm, rejected)
    batch = pa.table({
        "vb": pa.array([-1, 1], pa.int64()),
        "seqno": pa.array([500, 500], pa.uint64()),
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "op": pa.array(["mutation", "mutation"]),
    })
    out = f(batch)
    # vb=-1, seqno=500: previously wm_arr[-1]=999 made it 'not live' and
    # it vanished; now it dead-letters and the good row passes
    assert out.num_rows == 1 and out["vb"][0].as_py() == 1
    rej = pq.read_table(glob.glob(os.path.join(rejected, "*.parquet"))[0])
    assert rej.num_rows == 1
    assert rej["error"][0].as_py() == "negative vb"


def test_mapper_null_key_output_raises():
    from dcpray.stages.mapper import validate_mapper_output

    t = pa.table({
        "vb": pa.array([1], pa.int64()),
        "seqno": pa.array([1], pa.uint64()),
        "conv_id": pa.array([None], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "op": pa.array(["mutation"]),
    })
    with pytest.raises(ValueError, match="null 'conv_id'"):
        validate_mapper_output(t)


def test_empty_snapshot_part_file_bootstraps(tmp_path):
    import shutil

    fx = ensure_fixture("sf0.001")
    base = str(tmp_path / "base")
    shutil.copytree(os.path.join(fx, "base"), base)
    schema = pq.read_schema(sorted(glob.glob(f"{base}/*.parquet"))[0])
    pq.write_table(schema.empty_table(),
                   os.path.join(base, "part-empty.parquet"))
    lake = Lake(str(tmp_path / "lake"))
    res = replay(lake, f"{fx}/wal", base_snapshot_dir=base,
                 config=ReplayConfig(num_buckets=8))
    assert res.committed
    ref = Lake(str(tmp_path / "ref"))
    replay(ref, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
           config=ReplayConfig(num_buckets=8))
    pd.testing.assert_frame_equal(lake.to_pandas_sorted(),
                                  ref.to_pandas_sorted())


def test_scan_wal_tolerates_concurrent_deletion(tmp_path, monkeypatch):
    """A retention job deleting a segment between glob and stat must not
    kill the scan (external deletion is a supported operation)."""
    import shutil

    fx = ensure_fixture("sf0.001")
    wal = str(tmp_path / "wal")
    shutil.copytree(os.path.join(fx, "wal"), wal)
    victim = sorted(glob.glob(os.path.join(wal, "*", "*.parquet")))[0]

    real_stat = os.stat
    fired = {"done": False}

    def racing_stat(path, *a, **kw):
        # one-shot: monkeypatching walmod.os.stat patches the SHARED os
        # module, so any os.path call in here would recurse
        if path == victim and not fired["done"]:
            fired["done"] = True
            os.remove(victim)  # the "external retention job"
            raise FileNotFoundError(path)
        return real_stat(path, *a, **kw)

    monkeypatch.setattr(walmod.os, "stat", racing_stat)
    infos = walmod.scan_wal(wal)
    assert victim not in {i.path for i in infos}
    assert len(infos) > 0


def test_reject_predicates_fire_independently(tmp_path):
    """r5 review: the fixture's poison rows carry BOTH defects (null
    conv_id AND turn_idx=-1) on the same rows, so fixture-level checks
    cannot catch a regression that drops only ONE predicate — pin each
    rejection predicate separately here."""
    from dcpray.sources.wal import watermark_array
    from dcpray.stages.reject import make_reject_filter

    rej = str(tmp_path / "rej")
    os.makedirs(rej)
    f = make_reject_filter(watermark_array({}, 4), rej)
    batch = pa.table({
        "vb": pa.array([0, 1, 2, 3], pa.int64()),
        "seqno": pa.array([1, 2, 3, 4], pa.uint64()),
        "conv_id": pa.array([None, "ok-conv", "ok-conv", "ok-conv"]),
        "turn_idx": pa.array([0, -1, 0, 0], pa.int32()),
        "op": pa.array(["mutation", "mutation", "bogus-op", "mutation"]),
    })
    out = f(batch)
    assert out.num_rows == 1 and out["vb"][0].as_py() == 3
    rejs = pa.concat_tables(
        [pq.read_table(p) for p in glob.glob(os.path.join(rej, "*.parquet"))])
    by_vb = {r["vb"]: r["error"] for r in rejs.to_pylist()}
    assert by_vb[0] == "null conv_id"      # only-null-conv defect
    assert by_vb[1] == "invalid turn_idx"  # only-negative-turn defect
    assert by_vb[2] == "unknown op"


def test_all_null_seqno_never_poisons_watermarks(tmp_path):
    """Second-order r5 fix: a valid-vb segment whose SEQNO column is
    all-null must not feed its 2^62 unprunable sentinel into the
    committed watermark/floor for that vb — it is marked multi-vb
    (path-exact tracking) so file_watermarks skips it."""
    import shutil

    fx = ensure_fixture("sf0.001")
    wal = str(tmp_path / "wal")
    shutil.copytree(os.path.join(fx, "wal"), wal)
    some_vb_dir = sorted(glob.glob(os.path.join(wal, "*")))[0]
    ref_file = sorted(glob.glob(os.path.join(some_vb_dir, "*.parquet")))[0]
    t = pq.read_table(ref_file).slice(0, 3)
    t = t.set_column(t.schema.get_field_index("seqno"), "seqno",
                     pa.nulls(t.num_rows, t.schema.field("seqno").type))
    pq.write_table(t, os.path.join(some_vb_dir, "part-nullseq.parquet"),
                   write_statistics=False)
    infos = walmod.scan_wal(wal)
    bad = [i for i in infos if i.path.endswith("part-nullseq.parquet")]
    assert bad and bad[0].vb == -1  # never a real vb with the sentinel
    wm = walmod.file_watermarks(infos)
    assert all(v < (1 << 62) for v in wm.values())


def test_cas_store_accepts_orphan_lease_config(tmp_path):
    """Second-order r5 fix: ReplayConfig.commit_orphan_lease_s with a
    CasManifestStore lake must not TypeError at the commit — the CAS
    path has no orphan window and ignores the knob."""
    from dcpray.state.checkpoint import CasManifestStore

    fx = ensure_fixture("sf0.001")
    d = str(tmp_path / "lake")
    lake = Lake(d, store=CasManifestStore(d))
    res = replay(lake, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
                 config=ReplayConfig(num_buckets=8,
                                     commit_orphan_lease_s=5.0))
    assert res.committed


def test_rank_float_tiebreak_and_zero_peers():
    """Second-order r5 fix: rank_in_group's tiebreak shares topk's
    dtype coercion (float 0.2 vs 0.9 decides deterministically), and
    -0.0 / +0.0 order values are PEERS under DESC like SQL."""
    import ray.data as rd

    from dcpray.functions.window import rank_in_group

    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "o": pa.array([5.0, 5.0]),
                  "tb": pa.array([0.9, 0.2])})
    out = (rank_in_group(rd.from_arrow(t), "k", "o", "tb", out_col="rn")
           .to_pandas())
    assert out.loc[out["tb"] == 0.2, "rn"].iloc[0] == 1

    t2 = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "o": pa.array([0.0, -0.0, 1.0]),
                   "tb": pa.array([0, 1, 2], pa.int64())})
    out2 = (rank_in_group(rd.from_arrow(t2), "k", "o", "tb",
                          descending=True, out_col="rn", ranks=("rank",))
            .to_pandas().sort_values("tb").reset_index(drop=True))
    assert list(out2["rank"]) == [2, 2, 1]  # zeros are peers, 1.0 first
