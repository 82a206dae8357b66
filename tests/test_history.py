"""version_history (SCD2) and lake_diff (change data feed) tests."""
import glob
import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from dcpray import Lake, ReplayConfig, replay
from dcpray.functions.history import lake_diff, version_history
from dcpray.sources.genwal import ensure_fixture


def _rand_versions(n=5000, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table({
        "cid": pa.array([f"c{rng.randint(0, 300)}" for _ in range(n)]),
        "tix": pa.array(rng.randint(0, 5, n).astype(np.int32)),
        # a permutation -> unique (cid, tix, seqno) triples guaranteed
        "seqno": pa.array(np.random.RandomState(8).permutation(n)
                          .astype(np.uint64)),
        "payload": pa.array(rng.randint(0, 100, n)),
    })


def test_version_history_vs_duckdb_lead():
    t = _rand_versions()
    out = version_history(rd.from_arrow(t).repartition(4),
                          ["cid", "tix"], "seqno").to_pandas()
    out["seqno"] = out["seqno"].astype("int64")
    out["valid_to"] = out["valid_to"].astype("float64")
    ora = duckdb.sql("""
SELECT cid, tix, CAST(seqno AS BIGINT) AS seqno, payload,
       CAST(LEAD(seqno) OVER (PARTITION BY cid, tix ORDER BY seqno)
            AS DOUBLE) AS valid_to,
       (LEAD(seqno) OVER (PARTITION BY cid, tix ORDER BY seqno) IS NULL)
           AS is_current
FROM t""").df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(["cid", "tix", "seqno"]).reset_index(drop=True)
    b = ora[cols].sort_values(["cid", "tix", "seqno"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_version_history_single_version_is_current():
    t = pa.table({"k": pa.array(["a", "b"]),
                  "v": pa.array([1, 2], pa.int64())})
    out = version_history(rd.from_arrow(t), ["k"], "v").to_pandas()
    assert out["is_current"].all()
    assert out["valid_to"].isna().all()


def test_version_history_null_key_raises():
    t = pa.table({"k": pa.array(["a", None]),
                  "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="non-null"):
        version_history(rd.from_arrow(t), ["k"], "v").to_pandas()


# ----------------------------------------------------------- lake_diff


@pytest.fixture(scope="module")
def two_commit_lake(tmp_path_factory):
    """sf0.001 WAL split on a seqno cutoff into two incremental replays
    (seqno is per-vb monotonic, so ``seqno <= C`` is a valid stream
    prefix of every vb)."""
    fx = ensure_fixture("sf0.001")
    root = str(tmp_path_factory.mktemp("difflake"))
    C = 250
    for f in glob.glob(f"{fx}/wal/*/*.parquet"):
        t = pq.read_table(f)
        rel = os.path.relpath(f, f"{fx}/wal")
        for name, tt in (("wal_a", t.filter(pc.less_equal(t["seqno"], C))),
                         ("wal_b", t.filter(pc.greater(t["seqno"], C)))):
            if tt.num_rows:
                dst = os.path.join(root, name, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                pq.write_table(tt, dst)
    lake = Lake(os.path.join(root, "lake"))
    r1 = replay(lake, f"{root}/wal_a", base_snapshot_dir=f"{fx}/base",
                config=ReplayConfig(num_buckets=16))
    r2 = replay(lake, f"{root}/wal_b", config=ReplayConfig(num_buckets=16))
    assert r1.committed and r2.committed
    return lake, fx, C


def _lww_sql(fx: str, extra_where: str = "") -> str:
    return f"""
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY seqno DESC) rn
    FROM (
      SELECT conv_id, turn_idx, role, text, tool, ts, tool_version,
             seqno, op
      FROM read_parquet('{fx}/wal/*/*.parquet', union_by_name=true)
      WHERE conv_id IS NOT NULL AND turn_idx >= 0
        AND op IN ('mutation','deletion','expiration') {extra_where}
      UNION ALL BY NAME
      SELECT conv_id, turn_idx, role, text, tool, ts,
             CAST(NULL AS VARCHAR) tool_version,
             CAST(0 AS UBIGINT) seqno, 'mutation' op
      FROM read_parquet('{fx}/base/*.parquet')))
  WHERE rn = 1 AND op = 'mutation'"""


def test_lake_diff_matches_sql_full_outer(two_commit_lake):
    lake, fx, C = two_commit_lake
    out = lake_diff(lake, 1, 2).to_pandas()
    ora = duckdb.sql(f"""
WITH sa AS ({_lww_sql(fx, f"AND seqno <= {C}")}),
     sb AS ({_lww_sql(fx)})
SELECT coalesce(a.conv_id, b.conv_id) AS conv_id,
       coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
       CASE WHEN a.conv_id IS NULL THEN 'insert'
            WHEN b.conv_id IS NULL THEN 'delete'
            ELSE 'update' END AS _change_type,
       CASE WHEN b.conv_id IS NULL THEN a.role ELSE b.role END AS role,
       CASE WHEN b.conv_id IS NULL THEN a.text ELSE b.text END AS text,
       CASE WHEN b.conv_id IS NULL THEN a.tool ELSE b.tool END AS tool,
       CASE WHEN b.conv_id IS NULL THEN a.ts ELSE b.ts END AS ts,
       CASE WHEN b.conv_id IS NULL THEN a.tool_version
            ELSE b.tool_version END AS tool_version
FROM sa a FULL OUTER JOIN sb b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
WHERE a.conv_id IS NULL OR b.conv_id IS NULL
   OR a.role IS DISTINCT FROM b.role
   OR a.text IS DISTINCT FROM b.text
   OR a.tool IS DISTINCT FROM b.tool
   OR a.ts IS DISTINCT FROM b.ts
   OR a.tool_version IS DISTINCT FROM b.tool_version""").df()
    assert len(out) == len(ora) and len(out) > 0
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))
    assert set(out["_change_type"]) <= {"insert", "update", "delete"}


def test_lake_diff_self_is_empty_with_schema(two_commit_lake):
    lake, _, _ = two_commit_lake
    ds = lake_diff(lake, 2, 2)
    names = ds.schema().names  # explicit schema even with zero rows
    assert "_change_type" in names and "conv_id" in names
    assert ds.count() == 0


def test_lake_diff_unknown_seq_raises(two_commit_lake):
    lake, _, _ = two_commit_lake
    with pytest.raises(ValueError, match="no manifest"):
        lake_diff(lake, 1, 99)


def test_wal_version_history_equals_generic():
    """The zero-exchange vb-aligned path must equal the generic
    exchange path on the same WAL."""
    import os

    from dcpray.functions.history import (
        version_history,
        wal_version_history,
    )
    from dcpray.sources import wal as walmod
    from dcpray.sources.io import read_parquet_fast
    from dcpray.stages.reject import make_reject_filter

    fx = ensure_fixture("sf0.001")
    wal = os.path.join(fx, "wal")
    cols = ["conv_id", "turn_idx", "seqno", "op"]
    a = wal_version_history(wal, columns=cols).to_pandas()

    infos = walmod.scan_wal(wal)
    ds = read_parquet_fast(
        [i.path for i in infos],
        columns=["vb", "seqno", "conv_id", "turn_idx", "op"])
    ds = ds.map_batches(
        make_reject_filter(walmod.watermark_array({}, 1), None),
        batch_format="pyarrow")
    b = version_history(ds, ["conv_id", "turn_idx"], "seqno").to_pandas()

    ka = a[["conv_id", "turn_idx", "seqno", "valid_to", "is_current"]]
    kb = b[["conv_id", "turn_idx", "seqno", "valid_to", "is_current"]]
    sa = ka.sort_values(["conv_id", "turn_idx", "seqno"]).reset_index(
        drop=True)
    sb = kb.sort_values(["conv_id", "turn_idx", "seqno"]).reset_index(
        drop=True)
    pd.testing.assert_frame_equal(sa, sb, check_dtype=False)
    assert len(sa) > 0


def test_table_diff_generic_vs_duckdb():
    from dcpray.functions.history import table_diff

    rng = np.random.RandomState(3)
    kk = np.arange(2000)
    old = pa.table({"k": pa.array(kk, pa.int64()),
                    "v": pa.array(rng.randint(0, 50, 2000), pa.int64())})
    keep = kk % 13 != 0
    vv = old["v"].to_numpy().copy()
    vv[kk % 7 == 0] += 1000
    new = pa.table({
        "k": pa.array(np.r_[kk[keep], np.arange(2000, 2100)]),
        "v": pa.array(np.r_[vv[keep], np.zeros(100, np.int64)])})
    out = table_diff(rd.from_arrow(old).repartition(4),
                     rd.from_arrow(new).repartition(3),
                     keys=["k"]).to_pandas()
    ora = duckdb.sql("""
SELECT coalesce(o.k, nw.k) AS k,
       CASE WHEN o.k IS NULL THEN 'insert'
            WHEN nw.k IS NULL THEN 'delete' ELSE 'update' END
         AS _change_type,
       CASE WHEN nw.k IS NULL THEN o.v ELSE nw.v END AS v
FROM old o FULL OUTER JOIN new nw ON o.k = nw.k
WHERE o.k IS NULL OR nw.k IS NULL
   OR o.v IS DISTINCT FROM nw.v""").df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))
    assert set(out["_change_type"]) == {"insert", "update", "delete"}


def test_changefeed_persisted_roundtrip(two_commit_lake):
    from dcpray.functions.history import (
        read_changefeed,
        write_changefeed,
    )

    lake, _, _ = two_commit_lake
    m1 = write_changefeed(lake, 1)
    m2 = write_changefeed(lake, 2)
    assert not m1["skipped"] and not m2["skipped"]
    boot = read_changefeed(lake, 0, 1).to_pandas()
    assert len(boot) > 0 and (boot["_change_type"] == "insert").all()
    feed2 = read_changefeed(lake, 1, 2).to_pandas()
    ref = lake_diff(lake, 1, 2).to_pandas()
    cols = sorted(ref.columns)
    a = feed2[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype(str), b.astype(str))
    # idempotent: second write skips; unknown seq raises
    assert write_changefeed(lake, 2)["skipped"]
    with pytest.raises(ValueError, match="no manifest"):
        write_changefeed(lake, 99)
    from dcpray.functions.history import ChangefeedGapError

    with pytest.raises(ChangefeedGapError, match="missing seq=1"):
        shutil.rmtree(os.path.join(lake.lake_dir, "changefeed", "seq=1"))
        read_changefeed(lake, 0, 1)


def _clone_lake(lake, tmp_path, name="clone"):
    """Private mutable copy of the shared two-commit lake fixture (these
    tests prune manifests / write feeds destructively)."""
    import shutil as _sh

    dst = os.path.join(str(tmp_path), name)
    _sh.copytree(lake.lake_dir, dst)
    # drop any feeds a sibling test already persisted on the original
    _sh.rmtree(os.path.join(dst, "changefeed"), ignore_errors=True)
    from dcpray.state.checkpoint import Lake

    return Lake(dst)


def test_changefeed_gap_contract(two_commit_lake, tmp_path):
    """Verdict r4 #6 + ADVICE r4 (medium): a consumer behind a gc-ed /
    unwritten feed must get a LOUD gap error naming the earliest
    contiguous start — never a silently partial feed — and a backfill
    write for a commit whose parent manifest was pruned must refuse to
    fabricate a full-state insert feed."""
    from dcpray.functions.history import (
        ChangefeedGapError,
        read_changefeed,
        write_changefeed,
    )

    lake, _, _ = two_commit_lake
    lake = _clone_lake(lake, tmp_path)
    # only seq=2's feed exists; a consumer at seq 0 asking for (0, 2]
    # has a gap at seq=1
    write_changefeed(lake, 2)
    with pytest.raises(ChangefeedGapError) as ei:
        read_changefeed(lake, 0, 2)
    assert "missing seq=1" in str(ei.value)
    assert "from_seq=1" in str(ei.value)  # earliest contiguous start
    # the named recovery point works
    assert len(read_changefeed(lake, 1, 2).to_pandas()) >= 0
    # beyond-current and empty ranges are loud too
    with pytest.raises(ValueError, match="beyond"):
        read_changefeed(lake, 0, 99)
    with pytest.raises(ValueError, match="no committed seqs"):
        read_changefeed(lake, 2, 2)


def test_changefeed_backfill_refuses_gced_parent(two_commit_lake, tmp_path):
    """ADVICE r4 (medium): after gc prunes seq 1, a backfill
    write_changefeed(2) must raise — seq 2's true delta is underivable
    and an insert-everything feed would corrupt incremental consumers.
    Bootstrap is keyed on manifest.parent is None, not oldest-retained."""
    from dcpray.functions.history import write_changefeed

    lake, _, _ = two_commit_lake
    lake = _clone_lake(lake, tmp_path)
    lake.store.prune_manifests(keep=1)  # drops seq 1, keeps current (2)
    with pytest.raises(ValueError, match="gc-ed"):
        write_changefeed(lake, 2)


def test_diff_pair_property_vs_brute_force():
    """_diff_pair (the kernel under lake_diff AND table_diff) vs a
    pandas brute force across random overlaps, null payloads, and an
    evolution column present on one side only."""
    from dcpray.functions.history import _conform, _diff_pair

    for seed in range(6):
        rng = np.random.RandomState(seed)
        n_old, n_new = rng.randint(0, 120, 2)
        ko = rng.choice(np.arange(150), size=n_old, replace=False)
        kn = rng.choice(np.arange(150), size=n_new, replace=False)

        def payload(k, with_extra):
            cols = {
                "k": pa.array(k.astype(np.int64)),
                "v": pa.array([None if rng.rand() < 0.2 else int(x)
                               for x in rng.randint(0, 5, len(k))],
                              pa.int64()),
            }
            cols["x"] = pa.array(
                [None if rng.rand() < 0.5 else float(x)
                 for x in rng.randint(0, 3, len(k))], pa.float64()) \
                if with_extra else pa.nulls(len(k), pa.float64())
            return pa.table(cols)

        schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                            ("x", pa.float64())])
        old_t = _conform(payload(ko, with_extra=False), schema)
        new_t = _conform(payload(kn, with_extra=True), schema)
        out = _diff_pair(old_t, new_t, ["k"], ["v", "x"]).to_pandas()

        om = old_t.to_pandas().set_index("k")
        nm = new_t.to_pandas().set_index("k")
        expect = {}
        for k in set(om.index) | set(nm.index):
            if k not in om.index:
                expect[k] = ("insert", nm.loc[k])
            elif k not in nm.index:
                expect[k] = ("delete", om.loc[k])
            else:
                a, b = om.loc[k], nm.loc[k]
                differs = any(
                    not ((pd.isna(a[c]) and pd.isna(b[c]))
                         or (not pd.isna(a[c]) and not pd.isna(b[c])
                             and a[c] == b[c]))
                    for c in ("v", "x"))
                if differs:
                    expect[k] = ("update", b)
        assert len(out) == len(expect), seed
        for _, row in out.iterrows():
            ct, vals = expect[row["k"]]
            assert row["_change_type"] == ct, (seed, row["k"])
            for c in ("v", "x"):
                same = (pd.isna(row[c]) and pd.isna(vals[c])) or \
                       (not pd.isna(row[c]) and row[c] == vals[c])
                assert same, (seed, row["k"], c)


def test_lake_diff_across_compact_is_empty(two_commit_lake):
    """compact() rewrites every bucket (drops persisted tombstones) but
    the TABLE STATE is unchanged — the change feed across the compact
    commit must be empty even though every file path changed (payload
    compare, not file/seqno compare)."""
    from dcpray.pipelines.compact import compact

    lake, _, _ = two_commit_lake
    compact(lake, force=True)
    seqs = sorted(m.seq for m in lake.store.history())
    assert len(seqs) >= 3
    ds = lake_diff(lake, seqs[-2], seqs[-1])
    assert ds.count() == 0
    # and every bucket file path really did change (nothing was
    # copy-forward-skipped; the zero rows came from payload equality)
    m_prev = next(m for m in lake.store.history() if m.seq == seqs[-2])
    m_cur = next(m for m in lake.store.history() if m.seq == seqs[-1])
    assert {f["path"] for f in m_prev.files}.isdisjoint(
        {f["path"] for f in m_cur.files})


def test_changefeed_on_cas_store(tmp_path):
    """The changefeed machinery must work against the CAS manifest
    store (no CURRENT pointer) exactly as against the POSIX store."""
    from dcpray.functions.history import read_changefeed, write_changefeed
    from dcpray.state.checkpoint import CasManifestStore

    fx = ensure_fixture("tiny")
    d = str(tmp_path / "caslake")
    lake = Lake(d, store=CasManifestStore(d))
    replay(lake, os.path.join(fx, "wal"),
           base_snapshot_dir=os.path.join(fx, "base"),
           config=ReplayConfig(num_buckets=8))
    assert not os.path.exists(os.path.join(d, "CURRENT"))
    m = write_changefeed(lake, lake.store.load_current().seq)
    assert not m["skipped"]
    feed = read_changefeed(lake, 0, lake.store.load_current().seq)
    assert feed.count() > 0
    assert set(feed.to_pandas()["_change_type"]) == {"insert"}


# -------------------------------------------- code-review regressions


def test_changefeed_empty_feed_roundtrip(two_commit_lake):
    """Review fix: a no-change commit (compact) has an EMPTY feed —
    write must still create the seq dir (Ray writes no file for 0
    rows) and read must return an empty, schema-bearing dataset."""
    from dcpray.functions.history import read_changefeed, write_changefeed
    from dcpray.pipelines.compact import compact

    lake, _, _ = two_commit_lake
    compact(lake, force=True)
    seqs = sorted(m.seq for m in lake.store.history())
    m = write_changefeed(lake, seqs[-1])
    assert m.get("skipped") in (False, True)  # idempotent either way
    feed = read_changefeed(lake, seqs[-2], seqs[-1])
    assert feed.count() == 0
    assert "_change_type" in feed.schema().names


def test_version_history_string_version_orders_by_value():
    """Review fix: a STRING version column (ISO timestamps) must order
    by VALUE, not dictionary first-appearance order."""
    import duckdb as _dd

    t = pa.table({
        "k": pa.array(["a"] * 3 + ["b"] * 2),
        # deliberately out of order within the table
        "ver": pa.array(["2024-03-01", "2024-01-01", "2024-02-01",
                         "2024-09-09", "2024-05-05"]),
    })
    out = version_history(rd.from_arrow(t), ["k"], "ver").to_pandas()
    ora = _dd.sql("""
SELECT k, ver, LEAD(ver) OVER (PARTITION BY k ORDER BY ver) AS valid_to,
       (LEAD(ver) OVER (PARTITION BY k ORDER BY ver) IS NULL) AS is_current
FROM t""").df()
    cols = sorted(out.columns)
    a = out[cols].sort_values(["k", "ver"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "ver"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_wal_version_history_pruned_columns_keep_filter_contract():
    """Review fix: explicit `columns` must not prune out the reject
    filter's fixed inputs (vb/seqno/conv_id/turn_idx/op)."""
    from dcpray.functions.history import wal_version_history

    fx = ensure_fixture("tiny")
    out = wal_version_history(os.path.join(fx, "wal"),
                              columns=["role"]).to_pandas()
    assert len(out) > 0 and "role" in out.columns


def test_table_diff_nan_payload_is_not_an_update():
    """Review fix: NaN == NaN must compare EQUAL (SQL IS DISTINCT FROM
    semantics) — a NaN-carrying no-op diff emits nothing."""
    from dcpray.functions.history import table_diff

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([float("nan"), 1.5], pa.float64())})
    out = table_diff(rd.from_arrow(t), rd.from_arrow(t),
                     keys=["k"]).to_pandas()
    assert len(out) == 0


def test_example_resume_or_rebootstrap(two_commit_lake, tmp_path):
    """The documented consumer recovery contract (examples/
    incremental_sync.resume_or_rebootstrap): contiguous feed -> applied
    incrementally; gc-ed feed gap -> full re-bootstrap; both end states
    equal the lake's committed table."""
    import sys

    sys.path.insert(0, "/root/repo")
    from examples.incremental_sync import resume_or_rebootstrap
    from dcpray.functions.history import write_changefeed

    lake, _, _ = two_commit_lake
    lake = _clone_lake(lake, tmp_path)
    # sibling tests may have committed more (e.g. a compact) on the
    # shared fixture — write a feed for every retained commit
    seqs = sorted(m.seq for m in lake.store.history())
    for s in seqs:
        write_changefeed(lake, s)
    cur = seqs[-1]
    final = lake.read_current().to_pandas()
    keys = ["conv_id", "turn_idx"]

    def canon(df):
        cols = sorted(set(df.columns) & set(final.columns))
        return (df[cols].sort_values(keys).reset_index(drop=True)
                .fillna("~").astype(str))

    # a consumer at the first commit with a mirror of its state resumes
    mirror1 = lake.read_at(seqs[0]).to_pandas()
    m, seq, mode = resume_or_rebootstrap(lake, mirror1, seqs[0])
    assert mode == "incremental" and seq == cur
    pd.testing.assert_frame_equal(canon(m), canon(final))

    # up-to-date consumer is a no-op
    m2, seq2, mode2 = resume_or_rebootstrap(lake, m, cur)
    assert mode2 == "up_to_date" and seq2 == cur

    # gc the newest feed: the consumer behind it hits the gap and must
    # re-bootstrap, never apply a partial range
    shutil.rmtree(os.path.join(lake.lake_dir, "changefeed", f"seq={cur}"))
    m3, seq3, mode3 = resume_or_rebootstrap(lake, mirror1, seqs[0])
    assert mode3 == "rebootstrapped" and seq3 == cur
    pd.testing.assert_frame_equal(canon(m3), canon(final))
