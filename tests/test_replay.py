"""End-to-end replay correctness vs the naive single-threaded applier —
the table analogue of the reference integration test
(/root/reference/test/integration/integration_test.go:34-116)."""

import json
import os

import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.oracle import naive_final_state
from tests.util import assert_final_state_equal


@pytest.fixture(scope="module")
def replayed(tiny_fixture, tmp_path_factory):
    lake_dir = str(tmp_path_factory.mktemp("lake"))
    lake = Lake(lake_dir)
    res = replay(
        lake,
        os.path.join(tiny_fixture, "wal"),
        base_snapshot_dir=os.path.join(tiny_fixture, "base"),
        config=ReplayConfig(num_buckets=16),
    )
    return lake, res


def test_final_state_equals_oracle(replayed, tiny_fixture):
    lake, res = replayed
    assert res.committed
    oracle = naive_final_state(
        os.path.join(tiny_fixture, "wal"), os.path.join(tiny_fixture, "base")
    )
    assert_final_state_equal(lake.to_pandas_sorted(), oracle)


def test_counts(replayed, tiny_fixture):
    lake, res = replayed
    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    # every event entered; poison rows dead-lettered exactly
    assert res.metrics["events_in"] == meta["n_events"] + meta["n_poison"]
    assert res.metrics["rejected_rows"] == meta["n_poison"]
    assert lake.rejected_count(res.run_id) == meta["n_poison"]


def test_schema_evolution(replayed, tiny_fixture):
    """Pre-tranche rows read as null tool_version; winners from evolved
    files carry it (unification at source and sink)."""
    lake, _ = replayed
    df = lake.to_pandas_sorted()
    assert "tool_version" in df.columns
    assert df["tool_version"].notna().sum() > 0
    assert df["tool_version"].isna().sum() > 0


def test_watermarks_match_meta(replayed, tiny_fixture):
    lake, res = replayed
    with open(os.path.join(tiny_fixture, "meta.json")) as f:
        meta = json.load(f)
    assert {str(k): v for k, v in res.manifest.watermarks.items()} == meta["watermarks"]


def test_metrics_json_written(replayed):
    """X2 parity: each committed run dumps its metrics block to
    <lake>/metrics/<run_id>.json (the standalone scrape surface)."""
    lake, res = replayed
    p = os.path.join(lake.lake_dir, "metrics", f"{res.run_id}.json")
    assert os.path.exists(p)
    with open(p) as f:
        m = json.load(f)
    assert m["events_in"] == res.metrics["events_in"]
    assert m["events_per_s"] > 0


def test_salted_equals_unsalted(tiny_fixture, tmp_path):
    """Skew handling must not change results: bucket-by-(conv,turn)
    (salted) and bucket-by-conv produce identical final tables."""
    a, b = Lake(str(tmp_path / "a")), Lake(str(tmp_path / "b"))
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    replay(a, wal, base_snapshot_dir=base, config=ReplayConfig(num_buckets=16, salted=True))
    replay(b, wal, base_snapshot_dir=base, config=ReplayConfig(num_buckets=16, salted=False))
    assert_final_state_equal(a.to_pandas_sorted(), b.to_pandas_sorted())


def test_uncommitted_invisible(tiny_fixture, tmp_path):
    """Exactly-once visibility: before the manifest commit, readers see
    nothing, even if data files exist on disk."""
    lake = Lake(str(tmp_path / "lake"))
    assert lake.to_pandas_sorted().empty
    assert lake.current_files() == []
