"""Collection → table routing (reference topic router, connector.go:125-140)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig
from dcpray.pipelines.route import replay_routed, split_wal_by_collection, wal_collections
from dcpray.oracle import naive_final_state
from tests.util import assert_final_state_equal


@pytest.fixture(scope="module")
def two_collection_wal(tiny_fixture, tmp_path_factory):
    """tiny WAL with collection rewritten to conv-parity: conversations
    with even ordinal → 'convs_a', odd → 'convs_b' (deterministic, so a
    per-collection oracle is just a filter)."""
    src = os.path.join(tiny_fixture, "wal")
    dst = str(tmp_path_factory.mktemp("wal2c"))
    for p in sorted(glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)):
        t = pq.read_table(p)
        import pandas as pd

        conv = t["conv_id"].to_pandas()
        ordinal = pd.to_numeric(conv.str.removeprefix("conv-"), errors="coerce")
        par = np.nan_to_num(ordinal.to_numpy(dtype=float), nan=0.0) % 2
        coll = np.where(par == 0, "convs_a", "convs_b")
        i = t.schema.get_field_index("collection")
        t = t.set_column(i, "collection", pa.array(coll.astype(object), pa.string()))
        out = os.path.join(dst, os.path.relpath(p, src))
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pq.write_table(t, out)
    return dst


def _oracle_for(wal_dir, parity):
    import pandas as pd

    df = naive_final_state(wal_dir, None)
    ordinal = pd.to_numeric(df["conv_id"].str.removeprefix("conv-"), errors="coerce")
    return df[ordinal % 2 == parity].reset_index(drop=True)


def test_replay_routed(two_collection_wal, tmp_path):
    lakes = {"convs_a": Lake(str(tmp_path / "a")), "convs_b": Lake(str(tmp_path / "b"))}
    res = replay_routed(lakes, two_collection_wal,
                        config=ReplayConfig(num_buckets=16))
    assert set(res) == {"convs_a", "convs_b"}
    assert all(r.committed for r in res.values())
    assert_final_state_equal(lakes["convs_a"].to_pandas_sorted(),
                             _oracle_for(two_collection_wal, 0))
    assert_final_state_equal(lakes["convs_b"].to_pandas_sorted(),
                             _oracle_for(two_collection_wal, 1))


def test_unmapped_collection_raises(two_collection_wal, tmp_path):
    with pytest.raises(KeyError, match="convs_b"):
        replay_routed({"convs_a": Lake(str(tmp_path / "a"))}, two_collection_wal,
                      config=ReplayConfig(num_buckets=16))


def test_unmapped_goes_to_default(two_collection_wal, tmp_path):
    default = Lake(str(tmp_path / "default"))
    res = replay_routed({"convs_a": Lake(str(tmp_path / "a"))}, two_collection_wal,
                        config=ReplayConfig(num_buckets=16), default=default)
    assert res["convs_b"].committed
    assert_final_state_equal(default.to_pandas_sorted(),
                             _oracle_for(two_collection_wal, 1))


def test_collections_sharing_one_lake(two_collection_wal, tmp_path):
    """Many-to-one mapping (reference allows several collections → one
    topic): both collections routed to the SAME lake must both land —
    one replay per destination lake, not per collection (a second replay
    into the same lake would see 'no new WAL files' and drop events)."""
    shared = Lake(str(tmp_path / "shared"))
    res = replay_routed(
        {"convs_a": shared, "convs_b": shared}, two_collection_wal,
        config=ReplayConfig(num_buckets=16),
    )
    assert res["convs_a"].committed and res["convs_b"].committed
    assert_final_state_equal(
        shared.to_pandas_sorted(), naive_final_state(two_collection_wal, None)
    )


def test_unmapped_collections_share_default(two_collection_wal, tmp_path):
    """≥2 unmapped collections routed to the shared default lake: every
    collection's events must survive (the reported silent-drop bug)."""
    default = Lake(str(tmp_path / "default"))
    res = replay_routed({}, two_collection_wal,
                        config=ReplayConfig(num_buckets=16), default=default)
    assert set(res) == {"convs_a", "convs_b"}
    assert_final_state_equal(
        default.to_pandas_sorted(), naive_final_state(two_collection_wal, None)
    )


def test_filter_only_mapper_keeps_copy_forward(two_collection_wal, tmp_path):
    """A mapper marked filter-only (the routing filter is) must not
    disable incremental copy-forward: a one-file delta leaves untouched
    buckets carried, instead of rewriting the whole lake."""
    from dcpray import replay
    from dcpray.pipelines.route import _collection_filter
    from dcpray.sources import wal as walmod

    filt = _collection_filter(["convs_a", "convs_b"])
    assert getattr(filt, "filter_only", False)

    lake = Lake(str(tmp_path / "lake"))
    cfg = ReplayConfig(num_buckets=64, strategy="shuffle", salted=False)
    n = len(walmod.scan_wal(two_collection_wal))
    replay(lake, two_collection_wal, config=cfg, mapper=filt, max_files=n - 1)
    r2 = replay(lake, two_collection_wal, config=cfg, mapper=filt)
    assert r2.committed
    assert r2.metrics["buckets_carried"] > 0
    assert_final_state_equal(
        lake.to_pandas_sorted(), naive_final_state(two_collection_wal, None)
    )


def test_split_wal_by_collection(two_collection_wal, tmp_path):
    """Scale path: one distributed split pass, then per-slice replay
    equals the filtered-replay result."""
    from dcpray import replay

    mirrors = split_wal_by_collection(two_collection_wal, str(tmp_path / "split"))
    assert set(mirrors) == {"convs_a", "convs_b"}
    assert wal_collections(mirrors["convs_a"]) == {"convs_a"}
    lake = Lake(str(tmp_path / "lake_a"))
    replay(lake, mirrors["convs_a"], config=ReplayConfig(num_buckets=16))
    assert_final_state_equal(lake.to_pandas_sorted(),
                             _oracle_for(two_collection_wal, 0))
