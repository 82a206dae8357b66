"""The aligned (shuffle-free) strategy vs the generic shuffle strategy.

Both must produce byte-identical final state — the aligned path relies on
vb being a pure function of conv_id (couchbase/event.go:16: vb =
hash(key) % 1024), which the shuffle path never assumes."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig, replay
from tests.util import assert_final_state_equal


@pytest.fixture(scope="module")
def both(tiny_fixture, tmp_path_factory):
    out = {}
    for strategy in ("aligned", "shuffle"):
        lake = Lake(str(tmp_path_factory.mktemp(f"lake_{strategy}")))
        res = replay(
            lake,
            os.path.join(tiny_fixture, "wal"),
            base_snapshot_dir=os.path.join(tiny_fixture, "base"),
            config=ReplayConfig(num_buckets=16, strategy=strategy),
        )
        out[strategy] = (lake, res)
    return out


def test_strategies_equal(both):
    a, ra = both["aligned"]
    s, rs = both["shuffle"]
    assert ra.metrics["strategy"] == "aligned"
    assert rs.metrics["strategy"] == "shuffle"
    assert_final_state_equal(a.to_pandas_sorted(), s.to_pandas_sorted())
    assert ra.metrics["rejected_rows"] == rs.metrics["rejected_rows"]


def test_aligned_bucket_is_vb_mod(both):
    """Every row of an aligned bucket file hashes (via vb) to that bucket
    — the invariant incremental runs and readers rely on."""
    from dcpray.hashing import vb_of_conv

    lake, res = both["aligned"]
    m = lake.store.load_current()
    assert m.strategy == "aligned" and m.num_vbuckets > 0
    for f in m.files:
        t = pq.read_table(lake.abspath(f["path"]), columns=["conv_id"])
        if not t.num_rows:
            continue
        vb = vb_of_conv(t["conv_id"], m.num_vbuckets)
        assert (vb.astype(np.int64) % m.num_buckets == f["bucket"]).all()


def test_aligned_resume_incremental(tiny_fixture, tmp_path):
    """Two-phase aligned ingest (partial then rest) equals one-shot."""
    cfg = ReplayConfig(num_buckets=16)
    one = Lake(str(tmp_path / "one"))
    replay(one, os.path.join(tiny_fixture, "wal"),
           base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    two = Lake(str(tmp_path / "two"))
    r1 = replay(two, os.path.join(tiny_fixture, "wal"),
                base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                config=cfg, max_files=7)
    r2 = replay(two, os.path.join(tiny_fixture, "wal"),
                base_snapshot_dir=os.path.join(tiny_fixture, "base"), config=cfg)
    assert r1.committed and r2.committed
    assert r2.manifest.strategy == "aligned"
    # the vb modulus must have been inferred from the FULL scan, not the
    # truncated first delta (regression: bootstrap partitioned with wrong
    # modulus duplicates keys across buckets)
    assert r1.manifest.num_vbuckets == r2.manifest.num_vbuckets
    assert_final_state_equal(one.to_pandas_sorted(), two.to_pandas_sorted())


def test_multi_vb_file_falls_back_to_shuffle(tiny_fixture, tmp_path):
    """A WAL file mixing vbuckets breaks the alignment invariant; replay
    must detect it from footers and fall back to the shuffle strategy."""
    wal_src = os.path.join(tiny_fixture, "wal")
    mixed_dir = tmp_path / "wal_mixed"
    mixed_dir.mkdir()
    paths = sorted(glob.glob(os.path.join(wal_src, "**", "*.parquet"), recursive=True))
    vb_dirs = sorted({os.path.dirname(p) for p in paths})
    mix = [sorted(glob.glob(os.path.join(d, "*.parquet")))[0] for d in vb_dirs[:2]]
    t = pa.concat_tables([pq.read_table(p) for p in mix],
                         promote_options="permissive")
    pq.write_table(t, str(mixed_dir / "mixed-000.parquet"))
    for i, p in enumerate(p for p in paths if p not in mix):
        pq.write_table(pq.read_table(p), str(mixed_dir / f"part-{i:03d}.parquet"))

    lake = Lake(str(tmp_path / "lake"))
    res = replay(lake, str(mixed_dir),
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                 config=ReplayConfig(num_buckets=16, strategy="aligned"))
    assert res.committed
    assert res.metrics["strategy"] == "shuffle"

    ref = Lake(str(tmp_path / "ref"))
    replay(ref, wal_src, base_snapshot_dir=os.path.join(tiny_fixture, "base"),
           config=ReplayConfig(num_buckets=16, strategy="shuffle"))
    assert_final_state_equal(lake.to_pandas_sorted(), ref.to_pandas_sorted())
