"""Regressions for the round-4 self-review findings on the core engine
(manifest-store wedge, DLQ null routing columns, footer-scan crashes,
fixture meta counts)."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dcpray.state.checkpoint import (
    CasManifestStore,
    Lake,
    Manifest,
    ManifestStore,
)


def _manifest(seq: int, run_id: str) -> Manifest:
    return Manifest(run_id=run_id, seq=seq, parent=None, num_buckets=4,
                    salted=False, watermarks={}, files=[])


def test_manifest_store_recovers_from_crashed_gap(tmp_path):
    """Review fix: a writer that died between the manifest link and the
    CURRENT write used to wedge the store forever (EEXIST on every
    future seq-N commit). The orphan was never visible, so replacing it
    is safe."""
    d = str(tmp_path)
    store = ManifestStore(d)
    store.commit(_manifest(1, "r-one"))
    # simulate the crash: manifest-000002.json exists, CURRENT still
    # points at seq 1
    orphan = os.path.join(store.manifest_dir, "manifest-000002.json")
    with open(orphan, "w") as f:
        f.write(_manifest(2, "r-crashed").to_json())
    # the crash happened long ago: age the orphan past the takeover lease
    os.utime(orphan, (0, 0))
    assert store.load_current().seq == 1
    name = store.commit(_manifest(2, "r-recovered"))
    assert name == "manifest-000002.json"
    assert store.load_current().run_id == "r-recovered"


def test_fresh_unpublished_manifest_is_presumed_live(tmp_path):
    """ADVICE r4 (high): a same-seq manifest younger than the lease must
    NOT be taken over — its writer may be alive between link and the
    CURRENT write; clobbering it loses that writer's commit while both
    ack. The late-comer gets ConcurrentCommitError instead."""
    from dcpray.state.checkpoint import ConcurrentCommitError

    store = ManifestStore(str(tmp_path))
    store.commit(_manifest(1, "r-one"))
    orphan = os.path.join(store.manifest_dir, "manifest-000002.json")
    with open(orphan, "w") as f:
        f.write(_manifest(2, "r-mid-publish").to_json())
    with pytest.raises(ConcurrentCommitError, match="presumed live"):
        store.commit(_manifest(2, "r-impatient"))
    # the live writer's file survived untouched
    with open(orphan) as f:
        assert Manifest.from_json(f.read()).run_id == "r-mid-publish"
    # ...and once its writer is provably dead (lease expired) the seq is
    # recoverable as before
    os.utime(orphan, (0, 0))
    assert store.commit(_manifest(2, "r-recovered")) == "manifest-000002.json"


def test_link_winner_detects_orphan_recovery_clobber(tmp_path):
    """ADVICE r4 (high): writer A wins the link for seq N; racer B
    (mis)judges A crashed, replaces A's manifest and publishes. A must
    NOT also ack — the post-publish read-back on the link-winner path
    sees B's run_id and raises, so exactly one writer acks seq N."""
    from dcpray.state import checkpoint as cp

    store = ManifestStore(str(tmp_path))
    store.commit(_manifest(1, "r-one"))
    final = os.path.join(store.manifest_dir, "manifest-000002.json")

    real_unlink = os.unlink
    clobbered = {"done": False}

    def unlink_then_clobber(path, *a, **kw):
        real_unlink(path, *a, **kw)
        # simulate racer B firing in the gap between A's link and A's
        # CURRENT write: B replaces the manifest and publishes CURRENT
        if not clobbered["done"] and path.startswith(final + ".tmp"):
            clobbered["done"] = True
            # the racer writes its own tmp and os.replace's it in —
            # exactly what the orphan-recovery branch does (a replace
            # installs a NEW inode, which is what the winner detects)
            racer_tmp = final + ".tmp-racer"
            with open(racer_tmp, "w") as f:
                f.write(_manifest(2, "r-racer").to_json())
            os.replace(racer_tmp, final)
            cp._atomic_write(store.current_path, "manifest-000002.json")

    import unittest.mock as mock

    with mock.patch.object(cp.os, "unlink", unlink_then_clobber):
        with pytest.raises(cp.ConcurrentCommitError, match="racer"):
            store.commit(_manifest(2, "r-victim"))
    # the racer's commit stands
    assert store.load_current().run_id == "r-racer"


def test_manifest_store_still_rejects_true_concurrent_commit(tmp_path):
    from dcpray.state.checkpoint import ConcurrentCommitError

    store = ManifestStore(str(tmp_path))
    store.commit(_manifest(1, "r-one"))
    store.commit(_manifest(2, "r-two"))
    with pytest.raises(ConcurrentCommitError):
        store.commit(_manifest(2, "r-late"))  # CURRENT already at 2


@pytest.mark.parametrize("mk", [ManifestStore,
                                lambda d: CasManifestStore(d)])
def test_clear_accepts_fresh_seq1_commit(tmp_path, mk):
    """Review fix: POSIX clear() left old manifest files, so the next
    seq-1 commit wedged on the name collision."""
    store = mk(str(tmp_path))
    store.commit(_manifest(1, "r-a"))
    store.commit(_manifest(2, "r-b"))
    store.clear()
    assert store.load_current() is None
    store.commit(_manifest(1, "r-fresh"))
    assert store.load_current().run_id == "r-fresh"


def test_reject_filter_dead_letters_null_vb_seqno(tmp_path):
    """Review fix: a null vb used to crash the merge task with
    IndexError instead of routing the row to the DLQ."""
    from dcpray.sources.wal import watermark_array
    from dcpray.stages.reject import make_reject_filter

    rej_dir = str(tmp_path / "rejected")
    os.makedirs(rej_dir)
    batch = pa.table({
        "vb": pa.array([0, None, 1], pa.int64()),
        "seqno": pa.array([5, 6, None], pa.uint64()),
        "conv_id": pa.array(["a", "b", "c"]),
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "op": pa.array(["mutation"] * 3),
    })
    f = make_reject_filter(watermark_array({}, 4), rej_dir)
    out = f(batch)
    assert out.num_rows == 1 and out["conv_id"][0].as_py() == "a"
    import glob

    rej = pa.concat_tables([pq.read_table(p) for p in
                            glob.glob(os.path.join(rej_dir, "*.parquet"))])
    assert rej.num_rows == 2
    assert set(rej["error"].to_pylist()) == {"null vb/seqno"}


def test_scan_footer_tolerates_empty_and_statless_segments(tmp_path):
    """Review fix: a zero-row segment (empty producer flush) or a file
    written without column statistics crashed every subsequent scan."""
    from dcpray.sources.wal import _scan_footer

    sch = pa.schema([("vb", pa.int32()), ("seqno", pa.uint64()),
                     ("conv_id", pa.string())])
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(sch.empty_table(), empty)
    info = _scan_footer(empty)
    assert info.rows == 0 and info.max_seqno < info.min_seqno

    nostats = str(tmp_path / "nostats.parquet")
    t = pa.table({"vb": pa.array([3, 3], pa.int32()),
                  "seqno": pa.array([7, 9], pa.uint64()),
                  "conv_id": pa.array(["x", "y"])})
    pq.write_table(t, nostats, write_statistics=False)
    info = _scan_footer(nostats)
    assert (info.vb, info.min_seqno, info.max_seqno, info.rows) == (3, 7, 9, 2)


def test_genwal_meta_op_counts_sum_to_n_events(tmp_path):
    """Review fix: mutation count was taken from the PERMUTED
    events+poison array, so sum(op_counts) exceeded n_events."""
    from dcpray.sources.genwal import FixtureSpec, generate_fixture

    spec = FixtureSpec(num_vbuckets=8, num_convs=120, files_per_vb=2)
    meta = generate_fixture(str(tmp_path / "fx"), spec)
    assert sum(meta["op_counts"].values()) == meta["n_events"]


def test_gc_preserves_stream_jsonl(tmp_path):
    """Review fix: gc()'s metrics cleanup matched every non-.json file
    (stream.jsonl included) via removesuffix no-op."""
    import time

    from dcpray.pipelines.compact import gc
    from dcpray.sources.genwal import ensure_fixture
    from dcpray import ReplayConfig, replay

    fx = ensure_fixture("tiny")
    lake = Lake(str(tmp_path / "lake"))
    replay(lake, os.path.join(fx, "wal"),
           base_snapshot_dir=os.path.join(fx, "base"),
           config=ReplayConfig(num_buckets=8))
    stream = os.path.join(lake.lake_dir, "metrics", "stream.jsonl")
    with open(stream, "w") as f:
        f.write('{"x":1}\n')
    old = 0
    os.utime(stream, (old, old))  # far past any grace window
    gc(lake, grace_s=0)
    assert os.path.exists(stream)


def test_simhash_huge_identical_bucket_emits_star_pairs():
    """Review fix: buckets with > 512 distinct ids were silently
    dropped — 600 identical docs produced zero dup pairs."""
    import ray.data as rd

    from dcpray.functions.dedup import simhash_dup_pairs

    n = 600
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["the exact same document text here"] * n),
    })
    pairs = simhash_dup_pairs(rd.from_arrow(t).repartition(3)).to_pandas()
    # star connectivity: every doc appears in at least one pair
    touched = set(pairs["a"]) | set(pairs["b"])
    assert touched == set(range(n))


def test_replay_routed_missing_wal_raises(tmp_path):
    from dcpray.pipelines.route import replay_routed

    with pytest.raises(FileNotFoundError, match="WAL directory"):
        replay_routed({"c": Lake(str(tmp_path / "l"))},
                      str(tmp_path / "no_such_wal"))


def test_topk_cosine_tolerates_empty_block():
    import ray.data as rd

    from dcpray.functions.ann import topk_cosine

    rng = np.random.RandomState(0)
    t = pa.table({
        "vec_id": pa.array(np.arange(20, dtype=np.int64)),
        "embedding": pa.array([rng.randn(8).tolist() for _ in range(20)],
                              pa.list_(pa.float64())),
    })
    empty = t.schema.empty_table()
    import ray.data
    ds = ray.data.from_arrow([t, empty])  # one empty block in the corpus
    q = rng.randn(2, 8)
    out = topk_cosine(ds, q, np.array([0, 1]), k=3).to_pandas()
    assert len(out) == 6


def test_fingerprint_null_text_distinct_from_literal_none():
    from dcpray.functions.textstats import fingerprint

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([None, "None", ""])})
    out = fingerprint(t).to_pandas()
    # null normalizes to "" — same as the empty doc, distinct from "None"
    assert out["fingerprint"][0] == out["fingerprint"][2]
    assert out["fingerprint"][0] != out["fingerprint"][1]
