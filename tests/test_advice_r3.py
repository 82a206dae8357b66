"""Regression tests for round-2 advisory findings:

- the IVF training sample must be invariant to block partitioning
  (unsigned-local vs signed-global ordering mix);
- the distributed verify join and label propagation must survive doc
  ids >= 2^53 (nullable int64 -> float64 to_numpy corruption), and a
  missing routed text is a verification FAILURE, not an empty doc;
- ivf_query over an index whose probed lists are all empty returns an
  empty result instead of raising;
- batch and single-doc SimHash agree on non-ASCII whitespace;
- manifest stores order seqs NUMERICALLY past the 6-digit padding.
"""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.hashing import splitmix64


def _emb_table(ids: np.ndarray, dim: int = 8) -> pa.Table:
    """Embeddings whose first component encodes the vec_id (identifiable
    after sampling)."""
    emb = np.zeros((len(ids), dim))
    emb[:, 0] = ids % 1000
    emb[:, 1] = 1.0
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float64())),
    })


def test_training_sample_block_invariant():
    """The sample must be a pure function of corpus content: the same
    rows survive whether the corpus arrives as 1 block or 7."""
    from dcpray.functions.ann import _training_sample

    ids = np.arange(1, 41, dtype=np.int64)
    tab = _emb_table(ids)
    sample_size = 8
    # expected: the sample_size smallest hashes in the SAME (signed
    # int64) order the implementation sorts by
    h = splitmix64(ids.view(np.uint64)).view(np.int64)
    assert (h < 0).any() and (h > 0).any()  # both sign classes present
    expect = set((ids % 1000)[np.argsort(h)[:sample_size]].astype(float))

    for blocks in (1, 7):
        ds = rd.from_arrow(tab)
        if blocks > 1:
            ds = ds.repartition(blocks)
        got = _training_sample(ds, sample_size)
        assert set(got[:, 0]) == expect, f"blocks={blocks}"


def test_verify_join_big_doc_ids():
    """Doc ids >= 2^53: the join path must keep exact int64 identity end
    to end (float64 round-trip would corrupt ids and fabricate pairs)."""
    from dcpray.functions.dedup import minhash_dup_pairs

    big = 1 << 60
    dup_text = "the quick brown fox jumps over the lazy dog " * 20
    docs = pa.table({
        "doc_id": pa.array([big + 1, big + 3, big + 5, big + 7], pa.int64()),
        "text": pa.array([dup_text, dup_text,
                          "completely different content here alpha beta " * 20,
                          "another unrelated document gamma delta " * 20]),
    })
    out = minhash_dup_pairs(rd.from_arrow(docs), threshold=0.7,
                            verify="join").to_pandas()
    assert set(zip(out["a"], out["b"])) == {(big + 1, big + 3)}
    assert out["jaccard"].iloc[0] == 1.0


def test_verify_join_missing_text_fails_pair():
    """A candidate pair whose text never arrives must NOT verify as a
    duplicate (jaccard('','') == 1.0 was a false positive)."""
    from dcpray.functions.dedup import verified_pairs_join

    cand = rd.from_arrow(pa.table({
        "a": pa.array([10], pa.int64()), "b": pa.array([99], pa.int64()),
    }))
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([10], pa.int64()),  # 99 is absent
        "text": pa.array(["some document text " * 10]),
    }))
    for mode in ("broadcast", "shuffle"):
        out = verified_pairs_join(cand, corpus, threshold=0.1,
                                  requests=mode).to_pandas()
        assert len(out) == 0, mode


def test_cluster_distributed_big_ids():
    from dcpray.functions.dedup import cluster_pairs_distributed

    big = 1 << 60
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([big + 1, big + 3], pa.int64()),
        "b": pa.array([big + 3, big + 9], pa.int64()),
    }))
    out = cluster_pairs_distributed(pairs, parts=4).to_pandas()
    got = dict(zip(out["doc_id"], out["rep_id"]))
    assert got == {big + 1: big + 1, big + 3: big + 1, big + 9: big + 1}


def test_ivf_query_empty_probed_lists(tmp_path):
    """A degenerate index with no list files for the probed lists must
    return an empty result, not crash in read_parquet([])."""
    import pyarrow.parquet as pq

    from dcpray.functions.ann import ivf_query

    idx = str(tmp_path / "ivf")
    os.makedirs(idx)
    cents = np.eye(2, 4)
    pq.write_table(
        pa.table({"list_id": pa.array([0, 1], pa.int32()),
                  "centroid": pa.array([list(map(float, c)) for c in cents],
                                       pa.list_(pa.float64()))}),
        os.path.join(idx, "centroids.parquet"))
    with open(os.path.join(idx, "meta.json"), "w") as f:
        json.dump({"nlist": 2, "dim": 4, "num_vectors": 0, "lists": {}}, f)
    out = ivf_query(idx, np.array([[1.0, 0, 0, 0]]), np.array([0]),
                    k=5, nprobe=2)
    assert out.schema().names == ["query_id", "vec_id", "score"]
    assert out.count() == 0


def test_simhash_unicode_whitespace_parity():
    from dcpray.functions.dedup import SimHasher, simhash_batch

    texts = ["a b", "a b", "a　b c", "x\x1cy", "a\x0bb"]
    batch = simhash_batch(pa.array(texts))
    single = [SimHasher().simhash(t) for t in texts]
    assert list(batch) == single
    assert batch[0] == batch[1]  # NBSP splits like ASCII space


def test_ivf_build_part_cap(tmp_path):
    """A deliberately flooded list splits into part files bounded by the
    row cap, and the full-probe query still matches brute force."""
    from dcpray.functions.ann import build_ivf_index, ivf_query, topk_cosine

    rng = np.random.RandomState(3)
    n, dim = 600, 8
    # distinct random vectors (unique scores — rounding ties would make
    # top-k ill-defined); nlist=2 floods both lists past the cap
    emb = rng.randn(n, dim)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float64())),
    })
    idx = str(tmp_path / "ivf")
    cap = 100
    meta = build_ivf_index(rd.from_arrow(tab).repartition(4), idx,
                           nlist=2, part_rows=cap)
    files = sorted(glob.glob(os.path.join(idx, "list-*-part*.parquet")))
    assert len(files) >= n // cap  # the flooded list actually split
    import pyarrow.parquet as pq

    for f in files:
        # hash split concentrates binomially around cap; 2x is far
        # beyond any plausible deviation at these sizes
        assert pq.ParquetFile(f).metadata.num_rows <= 2 * cap
    assert meta["num_vectors"] == n

    q = emb[:2]
    approx = ivf_query(idx, q, np.array([0, 1]), k=5,
                       nprobe=meta["nlist"]).to_pandas()
    exact = topk_cosine(rd.from_arrow(tab), q, np.array([0, 1]),
                        k=5).to_pandas()
    key = lambda df: sorted(zip(df["query_id"], df["vec_id"]))
    assert key(approx) == key(exact)

    # rebuild IN PLACE on a smaller corpus: stale part files from the
    # first build must not survive to feed phantom vectors into queries
    small = tab.slice(0, 40)
    meta2 = build_ivf_index(rd.from_arrow(small), idx, nlist=2, part_rows=cap)
    assert meta2["num_vectors"] == 40
    total_rows = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(idx, "list-*.parquet"))
    )
    assert total_rows == 40
    approx2 = ivf_query(idx, q, np.array([0, 1]), k=5,
                        nprobe=meta2["nlist"]).to_pandas()
    exact2 = topk_cosine(rd.from_arrow(small), q, np.array([0, 1]),
                         k=5).to_pandas()
    assert key(approx2) == key(exact2)


@pytest.mark.parametrize("store_kind", ["posix", "cas"])
def test_manifest_seq_numeric_order(tmp_path, store_kind):
    """Seqs past 999999 outgrow the zero padding; stores must pick the
    current manifest by NUMERIC seq, not lexicographic name order."""
    from dcpray.state.checkpoint import CasManifestStore, Manifest, ManifestStore

    d = str(tmp_path / store_kind)
    store = (ManifestStore(d) if store_kind == "posix"
             else CasManifestStore(d))

    def mk(seq):
        return Manifest(run_id=f"r{seq}", seq=seq, parent=None,
                        num_buckets=4, salted=True, watermarks={}, files=[])

    for seq in (999_999, 1_000_000, 1_000_001):
        store.commit(mk(seq))
    assert store.load_current().seq == 1_000_001
    assert [m.seq for m in store.history()] == [999_999, 1_000_000, 1_000_001]
    store.prune_manifests(keep=1)
    assert store.load_current().seq == 1_000_001
