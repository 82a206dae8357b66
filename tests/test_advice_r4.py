"""Regression tests for round-3 advisory findings:

- coarse_groupby key hashing must not route the same key to two coarse
  partitions when a batch contains nulls (nullable int64 -> float64
  to_numpy corrupted keys >= 2^53, duplicating groups in the output);
- sessionize / session_stats / topk_per_group must fail loudly on null
  key/ts/order rows instead of silently mis-assigning them;
- ngram_jaccard_exact_pairs must compute intersections sparsely (the
  dense (n_docs x vocab) incidence matrix OOMed workers long before the
  max_vocab guard fired) and still match a brute-force oracle;
- a raising user metrics_handler must not turn a durably committed run
  into an apparent failure or suppress sink acks.
"""

import logging
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_coarse_groupby_null_batches_big_keys():
    """The SAME key >= 2^53 split across a null-bearing and a null-free
    block must aggregate to ONE output row (the float64 round-trip gave
    it two different hashes -> two partitions -> duplicate rows)."""
    from dcpray.functions.agg import coarse_groupby

    big = (1 << 60) + 12345
    t1 = pa.table({"k": pa.array([big, None, big + 2], pa.int64()),
                   "v": pa.array([1.0, 2.0, 3.0])})
    t2 = pa.table({"k": pa.array([big, big + 2], pa.int64()),
                   "v": pa.array([10.0, 30.0])})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    # collect as Arrow — pandas would itself round-trip the nullable
    # int64 key through float64 and corrupt it in the ASSERTION
    out = pa.concat_tables(
        coarse_groupby(ds, keys=["k"],
                       aggs=[("v", "count", "n"), ("v", "sum", "s")],
                       partitions=8).iter_batches(batch_format="pyarrow")
    )
    assert out.num_rows == 3  # big, big+2, null — each exactly once
    by_key = {(-1 if k is None else k): (n, s)
              for k, n, s in zip(out["k"].to_pylist(), out["n"].to_pylist(),
                                 out["s"].to_pylist())}
    assert by_key[big] == (2, 11.0)
    assert by_key[big + 2] == (2, 33.0)
    assert by_key[-1] == (1, 2.0)


def test_hash_key_columns_null_free_vs_null_bearing_consistent():
    """Direct unit check: a key's hash must be identical whether its
    batch carries nulls or not (partition routing determinism)."""
    from dcpray.functions.agg import _hash_key_columns

    big = (1 << 60) + 12345
    clean = pa.table({"k": pa.array([big], pa.int64())})
    dirty = pa.table({"k": pa.array([big, None], pa.int64())})
    h_clean = _hash_key_columns(clean, ["k"])
    h_dirty = _hash_key_columns(dirty, ["k"])
    assert h_clean[0] == h_dirty[0]


def test_sessionize_null_ts_raises():
    from dcpray.functions.window import session_stats, sessionize

    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([100, None, 200], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    with pytest.raises(Exception, match="non-null"):
        sessionize(rd.from_arrow(t)).to_pandas()
    with pytest.raises(Exception, match="non-null"):
        session_stats(rd.from_arrow(t)).to_pandas()


def test_topk_per_group_null_order_raises():
    from dcpray.functions.agg import topk_per_group

    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "value": pa.array([1.0, None, 3.0]),
        "event_id": pa.array([1, 2, 3], pa.int64()),
    })
    with pytest.raises(Exception, match="non-null"):
        topk_per_group(rd.from_arrow(t), group_col="user_id",
                       order_col="value", k=2,
                       tiebreak_col="event_id").to_pandas()


def test_ngram_jaccard_sparse_matches_bruteforce():
    """The sparse posting-list intersection must reproduce the exact
    per-pair Jaccard of a naive Python set implementation."""
    from dcpray.functions.dedup import ngram_jaccard_exact_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog again today",
        "the quick brown fox jumps over the lazy dog again tomorrow",
        "completely different words in this unrelated document here now",
        "the quick brown fox jumps over the lazy dog again today",  # exact dup of 0
        "short one",  # < n words: empty n-gram set
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })).repartition(3)
    out = ngram_jaccard_exact_pairs(ds, threshold=0.3, n=3).to_pandas()
    got = {(int(a), int(b)): j
           for a, b, j in zip(out["a"], out["b"], out["jaccard"])}

    def grams(t):
        w = [x for x in t.split(" ") if x]
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            gi, gj = grams(texts[i]), grams(texts[j])
            u = len(gi | gj)
            if u and len(gi & gj) / u >= 0.3:
                want[(i, j)] = round(len(gi & gj) / u, 6)
    assert got == want
    assert got[(0, 3)] == 1.0


def test_metrics_handler_raise_keeps_commit_and_acks(tiny_fixture, tmp_path):
    from dcpray import PipelineBuilder, ReplayConfig, SinkResponseHandler

    acks = []

    class H(SinkResponseHandler):
        def on_success(self, stats):
            acks.append(stats)

    def bad_handler(res):
        raise RuntimeError("observability exploded")

    completions = []
    pipe = (
        PipelineBuilder(str(tmp_path / "lake"), ReplayConfig(num_buckets=16))
        .set_sink_response_handler(H())
        .set_metrics_handler(bad_handler)
        .set_completion_handler(completions.append)
        .set_logger(logging.getLogger("test"))
        .build()
    )
    res = pipe.run(os.path.join(tiny_fixture, "wal"),
                   base_snapshot_dir=os.path.join(tiny_fixture, "base"))
    assert res.committed
    assert len(acks) == len(res.manifest.files)  # sink acks not suppressed
    assert completions and completions[0] is res
