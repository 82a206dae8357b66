"""Sessionization and deterministic hash sampling."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.functions.sample import hash_sample, hash_split, md5_lower64
from dcpray.functions.window import session_stats, sessionize


def _events(n=2000, users=40, seed=5):
    rng = np.random.RandomState(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.randint(0, 7 * 86400, n)), unit="s"
    )
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, users, n).astype(np.int64),
        "ts": ts,
        "value": rng.randn(n).round(3),
    })


def _naive_sessions(df, gap_s):
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    sid = []
    for _, g in df.groupby("user_id", sort=True):
        gaps = g["ts"].diff().dt.total_seconds()
        new = (gaps > gap_s) | gaps.isna()
        sid.append(new.cumsum() - 1)
    df["session_id"] = pd.concat(sid).astype(np.int64)
    return df


@pytest.mark.parametrize("blocks", [1, 7])
def test_sessionize_matches_naive(blocks):
    df = _events()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = sessionize(ds, gap_s=3600.0).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp = _naive_sessions(df, 3600.0)
    assert (out["session_id"].to_numpy()
            == exp["session_id"].to_numpy()).all()
    # all original columns survive
    assert set(df.columns) <= set(out.columns)


def test_sessionize_exact_gap_stays_in_session():
    """Gap EXACTLY equal to the threshold does not start a new session
    (strict >, matching SQL '> INTERVAL')."""
    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                         "2024-01-01 01:00:01"])
    df = pd.DataFrame({"event_id": [0, 1, 2], "user_id": [1, 1, 1],
                       "ts": ts, "value": [1.0, 1.0, 1.0]})
    out = sessionize(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
                     gap_s=1800.0).to_pandas().sort_values("event_id")
    assert out["session_id"].tolist() == [0, 0, 1]


def test_session_stats_matches_naive():
    df = _events()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = session_stats(ds, gap_s=3600.0).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    exp_rows = _naive_sessions(df, 3600.0).groupby(
        ["user_id", "session_id"], as_index=False
    ).agg(n_events=("ts", "size"), session_start=("ts", "min"),
          session_end=("ts", "max"), sum_value=("value", "sum"))
    assert len(out) == len(exp_rows)
    assert (out["n_events"].to_numpy() == exp_rows["n_events"].to_numpy()).all()
    assert (out["session_start"].to_numpy()
            == exp_rows["session_start"].to_numpy()).all()
    np.testing.assert_allclose(out["sum_value"], exp_rows["sum_value"],
                               atol=1e-9)


def test_md5_lower64_duckdb_parity():
    texts = ["hello", "", "ümlaut ß", "a" * 1000]
    ours = md5_lower64(pa.array(texts))
    theirs = [duckdb.sql(f"select md5_number_lower(?)", params=[t]).fetchone()[0]
              for t in texts]
    assert ours.tolist() == theirs


def test_hash_sample_deterministic_and_null_safe():
    tab = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(["aa", None, "bb", "cc"])})
    a = hash_sample(rd.from_arrow(tab), mod=2, keep=0).to_pandas()
    b = hash_sample(rd.from_arrow(tab), mod=2, keep=1).to_pandas()
    # null row appears in NEITHER slice; others in exactly one
    assert len(a) + len(b) == 3
    assert 2 not in set(a["doc_id"]) | set(b["doc_id"])


def test_fast_hash_sample_rate_and_determinism():
    """The vectorized hash="fast" mode: same RATE and the same
    content-pure determinism contract as md5 (partition-invariant,
    disjoint complete cover of the valid rows), different set."""
    from dcpray.functions.sample import hash_sample

    n = 3000
    tab = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array([f"doc number {i}" for i in range(n)])})
    slices = [
        set(hash_sample(rd.from_arrow(tab), mod=10, keep=k,
                        hash="fast").to_pandas()["doc_id"])
        for k in range(10)
    ]
    sizes = sorted(len(s) for s in slices)
    assert sum(sizes) == n                      # disjoint complete cover
    assert sizes[0] > n / 10 * 0.6 and sizes[-1] < n / 10 * 1.5  # ~uniform
    # partition-invariant and salt-sensitive
    again = set(hash_sample(rd.from_arrow(tab).repartition(7), mod=10,
                            keep=3, hash="fast").to_pandas()["doc_id"])
    assert again == slices[3]
    salted = set(hash_sample(rd.from_arrow(tab), mod=10, keep=3, salt="s1",
                             hash="fast").to_pandas()["doc_id"])
    assert salted != slices[3]
    # null rows dropped, exactly as in md5 mode
    tab2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["x", None])})
    covered = set()
    for k in range(10):
        df = hash_sample(rd.from_arrow(tab2), mod=10, keep=k,
                         hash="fast").to_pandas()
        covered |= set(df["doc_id"]) if "doc_id" in df else set()
    assert covered == {1}


def test_hash_split_fast_mode_weights():
    from dcpray.functions.sample import hash_split

    n = 3000
    tab = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array([f"doc number {i}" for i in range(n)])})
    out = hash_split(rd.from_arrow(tab), weights=(8, 1, 1),
                     hash="fast").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15
    out2 = hash_split(rd.from_arrow(tab).repartition(6), weights=(8, 1, 1),
                      hash="fast").to_pandas().sort_values("doc_id")
    assert (out.sort_values("doc_id")["split"].to_numpy()
            == out2["split"].to_numpy()).all()


def test_hash_split_partitions_and_weights():
    n = 3000
    tab = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array([f"doc number {i}" for i in range(n)])})
    out = hash_split(rd.from_arrow(tab), weights=(8, 1, 1)).to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15
    # stable under re-execution / different blocks
    out2 = hash_split(rd.from_arrow(tab).repartition(6),
                      weights=(8, 1, 1)).to_pandas().sort_values("doc_id")
    assert (out.sort_values("doc_id")["split"].to_numpy()
            == out2["split"].to_numpy()).all()


def test_hash_split_multichunk_nulls_valid_arrow():
    """Regression: pc.if_else with a multi-chunk condition + flat string
    values emits corrupt offsets on pyarrow 16.1 (chunk 1's offsets ran
    past its data buffer), which intermittently killed output-block
    serialization. The split column must be fully valid Arrow on
    multi-chunk, null-bearing batches, and nulls must stay null."""
    c = pa.chunked_array([
        pa.array(["alpha", "beta", None, "gamma"]),
        pa.array(["delta", None, "epsilon", "zeta", "eta"]),
    ])
    tab = pa.Table.from_arrays(
        [pa.array(range(9), pa.int64()), c], names=["doc_id", "text"])
    for mode in ("md5", "fast"):
        out_ds = hash_split(rd.from_arrow(tab), weights=(8, 1, 1), hash=mode)
        for b in out_ds.iter_batches(batch_format="pyarrow"):
            b.validate(full=True)
        out = out_ds.to_pandas().sort_values("doc_id")
        assert out["split"].isna().tolist() == [
            False, False, True, False, False, True, False, False, False]
        assert set(out["split"].dropna()) <= {"train", "val", "test"}


# ------------------------------------------------------------ as-of join


@pytest.mark.parametrize("blocks", [1, 6])
def test_asof_join_matches_pandas(blocks):
    from dcpray.functions.join import asof_join

    rng = np.random.RandomState(11)
    nl, nr = 800, 200
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 20, nl).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nl), unit="s"),
    })
    right = pd.DataFrame({
        "user_id": rng.randint(0, 20, nr).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nr), unit="s"),
        "mark": rng.randint(0, 1000, nr).astype(np.int64),
    })
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    if blocks > 1:
        lds, rds = lds.repartition(blocks), rds.repartition(3)
    out = asof_join(lds, rds, key_col="user_id", ts_col="ts",
                    right_cols={"ts": "right_ts"}).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    # merge_asof reports the LEFT ts; carry the right ts as a payload col
    exp2 = pd.merge_asof(
        left.sort_values("ts"),
        right[["user_id", "ts"]].assign(right_ts=lambda d: d["ts"]).sort_values("ts"),
        on="ts", by="user_id", direction="backward", allow_exact_matches=True,
    ).sort_values("event_id").reset_index(drop=True)
    assert len(out) == nl
    got = out["right_ts"]
    want = exp2["right_ts"]
    assert got.isna().equals(want.isna())
    assert (got.dropna().to_numpy() == want.dropna().to_numpy()).all()


def test_asof_join_exact_tie_and_no_match():
    from dcpray.functions.join import asof_join

    ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00"])
    left = pd.DataFrame({"event_id": [0, 1], "user_id": [1, 2], "ts": ts})
    right = pd.DataFrame({"user_id": [1], "ts": [ts[0]],
                          "mark": np.array([7], np.int64)})
    out = asof_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        key_col="user_id", ts_col="ts", right_cols={"mark": "mark"},
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert out["mark"].tolist()[0] == 7      # equal ts matches (>=)
    assert pd.isna(out["mark"].tolist()[1])  # other user: no match


def test_asof_join_mixed_units_and_nulls():
    """Different timestamp units must normalize before comparing (a ns
    left vs us right would otherwise match FUTURE right rows), and SQL
    null semantics hold: null-key/ts left rows are emitted unmatched,
    null right rows never match."""
    from dcpray.functions.join import asof_join

    left = pa.table({
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "user_id": pa.array([1, 1, None], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01 10:00").value,
                        None,
                        pd.Timestamp("2024-01-01 12:00").value],
                       pa.timestamp("ns")),
    })
    right = pa.table({
        "user_id": pa.array([1, 1, None], pa.int64()),
        "ts": pa.array([int(pd.Timestamp("2024-01-01 10:30").value // 1000),
                        int(pd.Timestamp("2024-01-01 09:00").value // 1000),
                        int(pd.Timestamp("2024-01-01 08:00").value // 1000)],
                       pa.timestamp("us")),
        "mark": pa.array([7, 8, 9], pa.int64()),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    key_col="user_id", ts_col="ts",
                    right_cols={"mark": "mark"}).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # event 0 at 10:00 matches the 09:00 row (8), NOT the future 10:30
    assert out["mark"].tolist()[0] == 8
    # null left ts and null left key: emitted, unmatched
    assert pd.isna(out["mark"].tolist()[1])
    assert pd.isna(out["mark"].tolist()[2])


def test_asof_join_rejects_mismatched_ts_kinds():
    from dcpray.functions.join import asof_join

    left = rd.from_arrow(pa.table({"user_id": pa.array([1], pa.int64()),
                                   "ts": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({"user_id": pa.array([1], pa.int64()),
                                    "ts": pa.array([pd.Timestamp("2024-01-01").value],
                                                   pa.timestamp("ns"))}))
    with pytest.raises(TypeError, match="disagree"):
        asof_join(left, right, key_col="user_id", ts_col="ts",
                  right_cols={"ts": "r_ts"})


def test_ivf_rebuild_failure_leaves_old_index_intact(tmp_path):
    """A rebuild that crashes mid-build must leave the previous index
    fully usable (tmp-dir build + swap, not delete-first)."""
    import glob as _g

    from dcpray.functions.ann import build_ivf_index, ivf_query

    rng = np.random.RandomState(1)
    tab = pa.table({
        "vec_id": pa.array(np.arange(100), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rng.randn(100, 8)],
                              pa.list_(pa.float64())),
    })
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(tab), idx, nlist=2)
    before = sorted(os.path.basename(p) for p in _g.glob(os.path.join(idx, "*")))

    bad = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                    "embedding": pa.array([[1.0, 2.0], [1.0, 2.0, 3.0]],
                                          pa.list_(pa.float64()))})  # ragged
    with pytest.raises(Exception):
        build_ivf_index(rd.from_arrow(bad), idx, nlist=2)
    after = sorted(os.path.basename(p) for p in _g.glob(os.path.join(idx, "*"))
                   if not os.path.basename(p).startswith("ivf.building"))
    assert after == before
    out = ivf_query(idx, rng.randn(1, 8), np.array([0]), k=3, nprobe=2)
    assert out.count() == 3


def test_asof_join_broadcast_equals_distributed():
    """The zero-exchange broadcast variant must produce the identical
    join as the distributed one (including null left rows), with output
    preserving batch row order."""
    from dcpray.functions.join import asof_join, asof_join_broadcast

    rng = np.random.RandomState(21)
    nl, nr = 500, 60
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 12, nl).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nl), unit="s"),
    })
    left.loc[3, "user_id"] = None
    right = pa.Table.from_pandas(pd.DataFrame({
        "user_id": rng.randint(0, 12, nr).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nr), unit="s"),
        "mark": rng.randint(0, 100, nr).astype(np.int64),
    }), preserve_index=False)
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)) \
        .repartition(4)

    bc = asof_join_broadcast(lds, right, key_col="user_id", ts_col="ts",
                             right_cols={"ts": "r_ts", "mark": "mark"}) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    dist = asof_join(lds, rd.from_arrow(right), key_col="user_id",
                     ts_col="ts", right_cols={"ts": "r_ts", "mark": "mark"}) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(bc) == len(dist) == nl
    for c in ("r_ts", "mark"):
        assert bc[c].isna().equals(dist[c].isna())
        assert (bc[c].dropna().to_numpy() == dist[c].dropna().to_numpy()).all()


def test_ivf_build_trailing_slash_and_tmp_cleanup(tmp_path):
    """index_dir with a trailing slash must still swap correctly, and a
    failed build must not leak its .building temp dir."""
    import glob as _g

    from dcpray.functions.ann import build_ivf_index

    rng = np.random.RandomState(2)
    tab = pa.table({
        "vec_id": pa.array(np.arange(50), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rng.randn(50, 4)],
                              pa.list_(pa.float64())),
    })
    idx = str(tmp_path / "ivf") + "/"  # trailing slash
    meta = build_ivf_index(rd.from_arrow(tab), idx, nlist=2)
    assert meta["num_vectors"] == 50
    assert os.path.exists(os.path.join(str(tmp_path / "ivf"), "meta.json"))

    bad = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                    "embedding": pa.array([[1.0], [1.0, 2.0]],
                                          pa.list_(pa.float64()))})
    with pytest.raises(Exception):
        build_ivf_index(rd.from_arrow(bad), str(tmp_path / "ivf"), nlist=2)
    leaks = _g.glob(str(tmp_path / "ivf.building-*")) \
        + _g.glob(str(tmp_path / "ivf" / "*.building-*"))
    assert leaks == []


@pytest.mark.parametrize("blocks", [1, 5])
def test_range_join_matches_pandas(blocks):
    """Trailing-window range join vs a naive pandas cross-merge filter."""
    from dcpray.functions.join import range_join

    rng = np.random.RandomState(17)
    nl, nr = 400, 150
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 10, nl).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nl), unit="s"),
    })
    right = pd.DataFrame({
        "user_id": rng.randint(0, 10, nr).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nr), unit="s"),
        "mark": np.arange(nr, dtype=np.int64),
    })
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    if blocks > 1:
        lds, rds = lds.repartition(blocks), rds.repartition(3)
    w = 3600.0
    out = range_join(lds, rds, key_col="user_id", ts_col="ts",
                     right_cols={"mark": "mark"}, window_s=w).to_pandas()
    got = sorted(zip(out["event_id"], out["mark"]))

    naive = left.merge(right, on="user_id", suffixes=("", "_r"))
    naive = naive[(naive["ts_r"] > naive["ts"] - pd.Timedelta(seconds=w))
                  & (naive["ts_r"] <= naive["ts"])]
    want = sorted(zip(naive["event_id"], naive["mark"]))
    assert got == want
    assert len(got) > 0


def test_range_join_broadcast_equals_distributed():
    """The zero-exchange broadcast variant must produce the identical
    pair set as the coarse-partition range_join on a random fixture,
    including null-key/ts rows on both sides (inner-join drops)."""
    from dcpray.functions.join import range_join, range_join_broadcast

    rng = np.random.RandomState(23)
    nl, nr = 300, 120
    lt = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64),
        "user_id": rng.randint(0, 8, nl).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nl), unit="s"),
    })
    rt = pd.DataFrame({
        "user_id": rng.randint(0, 8, nr).astype(np.int64),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 86400, nr), unit="s"),
        "mark": np.arange(nr, dtype=np.int64),
    })
    ltab = pa.Table.from_pandas(lt, preserve_index=False)
    rtab = pa.Table.from_pandas(rt, preserve_index=False)
    # inject nulls: one null-ts left (dropped), one null-key right (never matches)
    ltab = ltab.set_column(2, "ts", pa.concat_arrays(
        [ltab["ts"].combine_chunks().slice(0, nl - 1),
         pa.nulls(1, ltab.schema.field("ts").type)]))
    rtab = rtab.set_column(0, "user_id", pa.concat_arrays(
        [rtab["user_id"].combine_chunks().slice(0, nr - 1),
         pa.nulls(1, pa.int64())]))
    lds = rd.from_arrow(ltab).repartition(5)
    rds = rd.from_arrow(rtab).repartition(3)
    w = 5400.0
    dist = range_join(lds, rds, key_col="user_id", ts_col="ts",
                      right_cols={"mark": "mark"}, window_s=w).to_pandas()
    bcast = range_join_broadcast(lds, rds, key_col="user_id", ts_col="ts",
                                 right_cols={"mark": "mark"},
                                 window_s=w).to_pandas()
    key = lambda df: sorted(zip(df["event_id"], df["mark"]))
    assert key(bcast) == key(dist)
    assert len(bcast) > 0
    assert nl - 1 not in set(bcast["event_id"])  # null-ts left dropped

    # pa.Table right side accepted directly; window validation shared
    bcast2 = range_join_broadcast(lds, rtab, key_col="user_id", ts_col="ts",
                                  right_cols={"mark": "mark"},
                                  window_s=w).to_pandas()
    assert key(bcast2) == key(dist)
    with pytest.raises(ValueError, match="window_s"):
        range_join_broadcast(lds, rtab, key_col="user_id", ts_col="ts",
                             right_cols={"mark": "mark"}, window_s=0.0)


def test_range_join_bounds_exclusive_inclusive():
    """Lower bound strict (> t-w), upper inclusive (<= t)."""
    from dcpray.functions.join import range_join

    base = pd.Timestamp("2024-01-01 10:00:00")
    left = pd.DataFrame({"event_id": [0], "user_id": [1], "ts": [base]})
    right = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "ts": [base - pd.Timedelta(seconds=60),   # == t-w: EXCLUDED
               base - pd.Timedelta(seconds=59),   # inside
               base,                              # == t: INCLUDED
               base + pd.Timedelta(seconds=1)],   # future: excluded
        "mark": np.array([0, 1, 2, 3], np.int64),
    })
    out = range_join(
        rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
        rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
        key_col="user_id", ts_col="ts", right_cols={"mark": "mark"},
        window_s=60.0,
    ).to_pandas()
    assert sorted(out["mark"].tolist()) == [1, 2]


def test_range_join_rejects_nonpositive_window_and_saturates():
    from dcpray.functions.join import range_join

    left = rd.from_arrow(pa.table({
        "event_id": pa.array([0], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([0], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([0], pa.int64()),
        "mark": pa.array([5], pa.int64()),
    }))
    with pytest.raises(ValueError, match="window_s"):
        range_join(left, right, key_col="user_id", ts_col="ts",
                   right_cols={"mark": "mark"}, window_s=-60.0)

    # saturation: a left ts within one window of int64.min must still
    # match its in-window rights instead of wrapping positive
    lo_ts = np.iinfo(np.int64).min + 5
    left2 = rd.from_arrow(pa.table({
        "event_id": pa.array([0], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([int(lo_ts)], pa.int64()),
    }))
    right2 = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([int(lo_ts) - 2, int(lo_ts) + 1], pa.int64()),
        "mark": pa.array([7, 8], pa.int64()),
    }))
    out = range_join(left2, right2, key_col="user_id", ts_col="ts",
                     right_cols={"mark": "mark"}, window_s=10.0).to_pandas()
    assert sorted(out["mark"].tolist()) == [7]


def test_range_join_fractional_window_and_min_edge():
    """A sub-resolution window keeps equal-resolution rights (ceil, not
    round), and an underflowed lower bound means -infinity: a right row
    at exactly int64.min still matches."""
    from dcpray.functions.join import range_join

    # fractional window at integer (seconds-like) resolution: rights at
    # t and t-1 satisfy r.ts > t - 1.4; t-2 does not
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([0], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([100], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([98, 99, 100], pa.int64()),
        "mark": pa.array([0, 1, 2], pa.int64()),
    }))
    out = range_join(left, right, key_col="user_id", ts_col="ts",
                     right_cols={"mark": "mark"}, window_s=1.4).to_pandas()
    assert sorted(out["mark"].tolist()) == [1, 2]

    # window_s=0.5 at integer resolution: only the equal-ts right
    out05 = range_join(left, right, key_col="user_id", ts_col="ts",
                       right_cols={"mark": "mark"}, window_s=0.5).to_pandas()
    assert sorted(out05["mark"].tolist()) == [2]

    # underflow: right at exactly int64.min matches a left within window
    tsmin = np.iinfo(np.int64).min
    left2 = rd.from_arrow(pa.table({
        "event_id": pa.array([0], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([int(tsmin) + 5], pa.int64()),
    }))
    right2 = rd.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([int(tsmin)], pa.int64()),
        "mark": pa.array([9], pa.int64()),
    }))
    out2 = range_join(left2, right2, key_col="user_id", ts_col="ts",
                      right_cols={"mark": "mark"}, window_s=10.0).to_pandas()
    assert out2["mark"].tolist() == [9]


def test_rank_in_group_matches_duckdb():
    """row_number + running sum vs SQL window functions, incl. ties on
    the order column, descending mode, and the segment reset."""
    import duckdb

    from dcpray.functions.window import rank_in_group

    rng = np.random.RandomState(13)
    n = 800
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.randint(0, 12, n).astype(np.int64)),
        "o": pa.array(rng.randint(0, 40, n).astype(np.int64)),  # many ties
        "v": pa.array(rng.randint(0, 1000, n).astype(np.int64)),
    })
    for desc in (False, True):
        out = rank_in_group(rd.from_arrow(t).repartition(5), "g", "o",
                            tiebreak_col="id", descending=desc,
                            cumsum_col="v", partitions=4).to_pandas()
        direction = "DESC" if desc else "ASC"
        exp = duckdb.sql(f"""
            SELECT id, g, o, v,
                   CAST(row_number() OVER w AS BIGINT) rank,
                   CAST(sum(v) OVER (PARTITION BY g ORDER BY o {direction},
                        id ROWS UNBOUNDED PRECEDING) AS DOUBLE) running_sum
            FROM t WINDOW w AS (PARTITION BY g ORDER BY o {direction}, id)
            """).df()
        cols = ["id", "g", "o", "v", "rank", "running_sum"]
        a = out[cols].sort_values("id").reset_index(drop=True)
        b = exp[cols].sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a.astype("float64"), b.astype("float64"),
                                      obj=f"desc={desc}")
