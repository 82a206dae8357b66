"""Regression tests for round-1 advisory findings:

- multi-vb delta vs an EXISTING aligned lake must refuse (mixed bucket
  layouts would duplicate keys), while a FRESH lake may fall back to the
  shuffle strategy;
- a WAL consisting ONLY of multi-vb segments must replay (the empty
  watermark-array IndexError);
- a fan-out mapper emitting keys absent from the raw delta must stay
  correct on INCREMENTAL shuffle runs (copy-forward vs mapper output);
- the aligned strategy guards against mappers that tamper with vb.
"""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from dcpray import Lake, ReplayConfig, replay
from dcpray.oracle import naive_final_state
from tests.util import assert_final_state_equal


def _make_multivb_wal(src_wal: str, dst: str, files_per_merge: int = 4) -> None:
    """Concatenate per-vb WAL files round-robin into multi-vb segments."""
    paths = sorted(glob.glob(os.path.join(src_wal, "**", "*.parquet"), recursive=True))
    os.makedirs(dst, exist_ok=True)
    schemas = [pq.read_schema(p) for p in paths]
    schema = pa.unify_schemas(schemas, promote_options="permissive")
    for g in range(0, len(paths), files_per_merge):
        tabs = []
        for p in paths[g : g + files_per_merge]:
            t = pq.read_table(p)
            for name in schema.names:
                if name not in t.schema.names:
                    t = t.append_column(name, pa.nulls(t.num_rows, schema.field(name).type))
            tabs.append(t.select(schema.names).cast(schema))
        pq.write_table(
            pa.concat_tables(tabs), os.path.join(dst, f"seg-{g:05d}.parquet")
        )


@pytest.fixture(scope="module")
def multivb_wal(tiny_fixture, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("multivb_wal"))
    _make_multivb_wal(os.path.join(tiny_fixture, "wal"), dst)
    return dst


def test_multivb_only_wal_replays(multivb_wal, tiny_fixture, tmp_path):
    """Fresh lake + WAL of only multi-vb segments: aligned config falls
    back to shuffle and the replay completes correctly (this used to
    crash with an IndexError on the empty watermark array)."""
    lake = Lake(str(tmp_path / "lake"))
    res = replay(lake, multivb_wal,
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                 config=ReplayConfig(num_buckets=16, strategy="aligned"))
    assert res.committed
    assert res.manifest.strategy == "shuffle"
    oracle = naive_final_state(
        os.path.join(tiny_fixture, "wal"), os.path.join(tiny_fixture, "base")
    )
    assert_final_state_equal(lake.to_pandas_sorted(), oracle)
    # incremental rerun over the same files: clean no-op
    res2 = replay(lake, multivb_wal, config=ReplayConfig(num_buckets=16))
    assert not res2.committed and res2.metrics["note"] == "no new WAL files"


def test_aligned_lake_rejects_multivb_delta(multivb_wal, tiny_fixture, tmp_path):
    """An EXISTING aligned lake must refuse a multi-vb delta instead of
    silently flipping to hash buckets over vb-bucketed base files."""
    lake = Lake(str(tmp_path / "lake"))
    res = replay(lake, os.path.join(tiny_fixture, "wal"),
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                 config=ReplayConfig(num_buckets=16, strategy="aligned"))
    assert res.committed and res.manifest.strategy == "aligned"
    # new delta dir = processed per-vb files + one unprocessed multi-vb file
    wal2 = str(tmp_path / "wal2")
    os.makedirs(wal2)
    for p in sorted(glob.glob(os.path.join(tiny_fixture, "wal", "**", "*.parquet"),
                              recursive=True)):
        rel = os.path.relpath(p, os.path.join(tiny_fixture, "wal"))
        dst = os.path.join(wal2, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(p, dst)
    # pretend the processed set covers the linked copies
    m = lake.store.load_current()
    m.processed_wal = sorted(
        glob.glob(os.path.join(wal2, "**", "*.parquet"), recursive=True)
    )
    m.seq += 1
    lake.store.commit(m)
    os.link(sorted(glob.glob(os.path.join(multivb_wal, "*.parquet")))[0],
            os.path.join(wal2, "mixed-000.parquet"))
    with pytest.raises(ValueError, match="aligned"):
        replay(lake, wal2, config=ReplayConfig(num_buckets=16))


def _make_fanout_mapper():
    """Flat-map emitting, per input row, an extra row under a NEW conv_id
    absent from the raw delta (keeps vb — derived keys inherit their
    source conversation's partition). Built as a closure so cloudpickle
    ships it by value (the tests module is not importable on workers)."""

    def _fanout_mapper(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("conv_id")
        clone = batch.set_column(
            i, "conv_id",
            pc.binary_join_element_wise(
                pa.array(["mapped"] * batch.num_rows, pa.string()),
                pc.cast(batch["conv_id"], pa.string()), "-",
            ),
        )
        return pa.concat_tables([batch, clone], promote_options="none")

    return _fanout_mapper


def test_fanout_mapper_incremental_equals_full(tiny_fixture, tmp_path):
    """Shuffle strategy, fan-out mapper, two-phase incremental ingest:
    final state must equal the single full replay (the copy-forward
    pre-pass cannot see mapper-emitted keys, so incremental runs with a
    mapper must not carry buckets forward)."""
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16, strategy="shuffle")
    _fanout_mapper = _make_fanout_mapper()

    full = Lake(str(tmp_path / "full"))
    replay(full, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper)

    incr = Lake(str(tmp_path / "incr"))
    replay(incr, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper,
           max_files=7)
    replay(incr, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper)

    assert_final_state_equal(incr.to_pandas_sorted(), full.to_pandas_sorted())
    assert incr.to_pandas_sorted()["conv_id"].str.startswith("mapped-").sum() > 0


def test_fanout_mapper_incremental_aligned(tiny_fixture, tmp_path):
    """Aligned strategy: a vb-preserving fan-out mapper stays correct on
    incremental runs (derived keys inherit the source row's vb, so they
    land in the merged bucket; carried buckets have no delta rows)."""
    wal = os.path.join(tiny_fixture, "wal")
    base = os.path.join(tiny_fixture, "base")
    cfg = ReplayConfig(num_buckets=16, strategy="aligned")
    _fanout_mapper = _make_fanout_mapper()

    full = Lake(str(tmp_path / "full"))
    replay(full, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper)

    incr = Lake(str(tmp_path / "incr"))
    replay(incr, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper,
           max_files=7)
    replay(incr, wal, base_snapshot_dir=base, config=cfg, mapper=_fanout_mapper)

    assert_final_state_equal(incr.to_pandas_sorted(), full.to_pandas_sorted())


def test_missing_wal_dir_fails_loudly(tmp_path):
    """Startup validation (reference CheckTopics parity): a nonexistent
    WAL path raises instead of silently committing nothing."""
    lake = Lake(str(tmp_path / "lake"))
    with pytest.raises(FileNotFoundError, match="WAL directory"):
        replay(lake, str(tmp_path / "no_such_wal"),
               config=ReplayConfig(num_buckets=8))


def test_aligned_guards_vb_tampering(tiny_fixture, tmp_path):
    """A mapper that rewrites vb breaks the aligned co-location invariant
    and must be refused."""

    def vb_shift(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("vb")
        return batch.set_column(
            i, "vb", pc.cast(pc.add(pc.cast(batch["vb"], pa.int32()), 1), pa.uint16())
        )

    lake = Lake(str(tmp_path / "lake"))
    with pytest.raises((ValueError, RuntimeError), match="vb"):
        replay(lake, os.path.join(tiny_fixture, "wal"),
               base_snapshot_dir=os.path.join(tiny_fixture, "base"),
               config=ReplayConfig(num_buckets=16, strategy="aligned"),
               mapper=vb_shift)
