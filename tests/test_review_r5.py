"""Regressions for the round-5 self-review of agg.py / views.py:

- exact_quantiles silently corrupted every quantile when NaN was
  present (NaN binned to bin 0, min/max skipped it);
- topk_per_group crashed on string group columns (reachable from
  tfidf_top_terms), crashed on timestamp DESC order columns, mis-ranked
  uint64 DESC via wrap-around, and truncated float tiebreaks to int64;
- approx_distinct_count dropped groups whose values were all null and
  serialized the whole register matrix once per group;
- add_coarse_pk crashed on date32 keys;
- IncrementalView.read/read_table crashed on a zero-file manifest.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_exact_quantiles_nan_total_order():
    """NaN previously poisoned EVERY quantile (binned to bin 0, skipped
    by min/max). Semantics now: IEEE total order, NaN greatest — same
    as SQL ORDER BY. (DuckDB 1.0.0's quantile_disc itself returns
    input-order-DEPENDENT results with NaN — selection with NaN-unsafe
    comparisons — so the oracle here is a brute-force total-order
    sort, not DuckDB.)"""
    from dcpray.functions.agg import exact_quantiles

    rng = np.random.default_rng(11)
    vals = rng.normal(0, 100, 5000)
    vals[rng.random(5000) < 0.05] = np.nan
    t = pa.table({"v": pa.array(vals, pa.float64())})
    qs = [0.0, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0]
    out = exact_quantiles(rd.from_arrow(t).repartition(4), "v", qs,
                          bins=256).to_pandas()
    srt = np.sort(vals)  # numpy sorts NaN last = total order
    n = len(srt)
    for q, got in zip(qs, out["value"]):
        exp = srt[max(int(np.ceil(n * q)) - 1, 0)]
        assert (np.isnan(got) and np.isnan(exp)) or got == exp
    # the top quantile lands in the NaN region
    assert np.isnan(out["value"].iloc[-1])


def test_exact_quantiles_all_nan():
    from dcpray.functions.agg import exact_quantiles

    t = pa.table({"v": pa.array([float("nan")] * 10, pa.float64())})
    out = exact_quantiles(rd.from_arrow(t), "v", [0.5]).to_pandas()
    assert np.isnan(out["value"].iloc[0])


def _topk(t, **kw):
    from dcpray.functions.agg import topk_per_group

    return topk_per_group(rd.from_arrow(t), **kw).to_pandas()


def test_topk_per_group_string_group():
    """Reachable from tfidf_top_terms with string doc ids."""
    t = pa.table({"doc": pa.array(["a", "a", "a", "b", "b"]),
                  "score": pa.array([3.0, 1.0, 2.0, 9.0, 8.0]),
                  "id": pa.array([0, 1, 2, 3, 4], pa.int64())})
    out = _topk(t, group_col="doc", order_col="score", k=2,
                tiebreak_col="id", partitions=4)
    kept = {(r.doc, r.score) for r in out.itertuples()}
    assert kept == {("a", 3.0), ("a", 2.0), ("b", 9.0), ("b", 8.0)}


def test_topk_per_group_desc_timestamp_and_uint64():
    ts = pd.to_datetime(["2024-01-01", "2024-03-01", "2024-02-01"])
    t = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                  "o": pa.array(ts, pa.timestamp("us")),
                  "tb": pa.array([0, 1, 2], pa.int64())})
    out = _topk(t, group_col="g", order_col="o", k=1, tiebreak_col="tb",
                partitions=2)
    assert pd.to_datetime(out["o"].iloc[0]) == ts[1]  # newest first

    t2 = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                   "o": pa.array([0, 5, 3], pa.uint64()),
                   "tb": pa.array([0, 1, 2], pa.int64())})
    out2 = _topk(t2, group_col="g", order_col="o", k=1,
                 tiebreak_col="tb", partitions=2)
    assert out2["o"].iloc[0] == 5  # 0 must NOT win via wrap-around


def test_topk_per_group_float_tiebreak_not_truncated():
    """Ties on the order column: the float tiebreak 0.2 vs 0.9 decides
    deterministically (int64 truncation collapsed both to 0)."""
    t = pa.table({"g": pa.array([1, 1], pa.int64()),
                  "o": pa.array([5.0, 5.0]),
                  "tb": pa.array([0.9, 0.2])})
    out = _topk(t, group_col="g", order_col="o", k=1, tiebreak_col="tb",
                partitions=2)
    assert out["tb"].iloc[0] == 0.2  # ascending tiebreak


def test_approx_distinct_all_null_group_emits_zero():
    from dcpray.functions.agg import approx_distinct_count, distinct_count

    t = pa.table({"k": pa.array(["x", "x", "y", "y"]),
                  "v": pa.array([1, 2, None, None], pa.int64())})
    exact = distinct_count(rd.from_arrow(t), ["k"], "v").to_pandas() \
        .set_index("k")["n_distinct"].to_dict()
    approx = approx_distinct_count(rd.from_arrow(t), ["k"], "v") \
        .to_pandas().set_index("k")["n_distinct_approx"].to_dict()
    assert set(approx) == set(exact) == {"x", "y"}
    assert approx["y"] == 0.0 and exact["y"] == 0
    assert round(approx["x"]) == 2


def test_window_ops_accept_date32_keys():
    """add_coarse_pk routes date32 through the int32 hop (a daily
    partition date is a natural group key)."""
    from dcpray.functions.window import rank_in_group

    days = pa.array([19000, 19000, 19001], pa.date32())
    t = pa.table({"d": days,
                  "o": pa.array([2, 1, 5], pa.int64()),
                  "tb": pa.array([0, 1, 2], pa.int64())})
    out = (rank_in_group(rd.from_arrow(t), "d", "o", "tb", out_col="rn")
           .to_pandas().sort_values("tb").reset_index(drop=True))
    assert list(out["rn"]) == [2, 1, 1]


def test_view_zero_file_manifest(tmp_path):
    """A retained manifest with files == [] must read as an EMPTY
    aggregate (once any sidecar defines the schema), not crash in
    concat_tables([]); a view with no sidecars at all raises the
    stale-view error."""
    from dcpray import IncrementalView, Lake, ReplayConfig, ViewSpec, replay
    from dcpray.sources.genwal import ensure_fixture
    from dcpray.state.checkpoint import Manifest

    fx = ensure_fixture("sf0.001")
    lake = Lake(str(tmp_path / "lake"))
    replay(lake, f"{fx}/wal", base_snapshot_dir=f"{fx}/base",
           config=ReplayConfig(num_buckets=8))
    spec = ViewSpec("rs", keys=("role",),
                    aggs=(("turn_idx", "count", "n"),))
    view = IncrementalView(lake, spec)
    view.refresh()
    assert len(view.read_table()) > 0
    prev = lake.store.load_current()
    lake.store.commit(Manifest(
        run_id="r-empty", seq=prev.seq + 1, parent=prev.run_id,
        num_buckets=prev.num_buckets, salted=prev.salted,
        watermarks=prev.watermarks, files=[], strategy=prev.strategy,
        num_vbuckets=prev.num_vbuckets))
    empty = view.read_table(at=prev.seq + 1)
    assert empty.num_rows == 0
    assert set(empty.column_names) >= {"role", "n"}
    assert view.read(at=prev.seq + 1).count() == 0

    # a NEVER-refreshed view over an empty manifest: loud, named error
    view2 = IncrementalView(lake, ViewSpec(
        "rs2", keys=("role",), aggs=(("turn_idx", "count", "n"),)))
    with pytest.raises(RuntimeError, match="no sidecars"):
        view2.read_table(at=prev.seq + 1)


# ---- second review pass: dedup / ann / kmeans ----


def test_minhash_join_verifier_null_text_no_false_dup():
    """Null-text docs share one MinHash signature (LSH candidates) but
    must NOT verify as jaccard-1.0 duplicates on the join path — the
    broadcast verifier already dropped them; the join path used
    `text_of[i] or ""` and diverged."""
    from dcpray.functions.dedup import minhash_dup_pairs

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array([None, None, "the same text here " * 10,
                                    "the same text here " * 10])})
    for verify in ("join", "broadcast"):
        out = minhash_dup_pairs(rd.from_arrow(t), threshold=0.5,
                                verify=verify, concurrency=2).to_pandas()
        got = {(int(r.a), int(r.b)) for r in out.itertuples()}
        assert got == {(3, 4)}, (verify, got)


def test_embedding_flooded_bucket_emits_star_not_silence():
    """>2048 near-identical embeddings in one LSH bucket: the old code
    returned ZERO pairs (silently keeping every copy); now a min-id
    star keeps the pile connected for clustering."""
    from dcpray.functions.dedup import embedding_dup_pairs

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, 8)
    n = 2100
    emb = np.tile(base, (n, 1)) + rng.normal(0, 1e-4, (n, 8))
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(emb.astype(np.float32)))})
    out = embedding_dup_pairs(rd.from_arrow(t), threshold=0.99,
                              dim=8, concurrency=2).to_pandas()
    assert len(out) >= n - 1  # at least the star from the min id
    assert (out["a"] == 0).sum() >= n - 1


def test_kmeans_assign_validates_and_normalizes():
    from dcpray.functions.kmeans import kmeans_assign

    t = pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array(
                      [np.array([1.0, 0.0], np.float32),
                       np.array([0.0, 1.0], np.float32)])})
    with pytest.raises(ValueError, match="metric"):
        kmeans_assign(rd.from_arrow(t), np.eye(2), metric="Cosine")
    # unnormalized centroids: [10, 1] has the larger norm but vector
    # (0,1) must still pick direction (0,1) = centroid 1
    cents = np.array([[10.0, 1.0], [0.0, 0.5]])
    out = kmeans_assign(rd.from_arrow(t), cents,
                        metric="cosine").to_pandas() \
        .sort_values("vec_id")
    assert list(out["cluster"]) == [0, 1]


def test_ann_empty_corpus_clear_error():
    from dcpray.functions.ann import ivf_topk
    from dcpray.functions.kmeans import kmeans_fit

    t = pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="EMPTY corpus"):
        kmeans_fit(rd.from_arrow(t), k=2)


# ---- third review pass: textstats / textprep / decontam / multimodal ----


def test_tfidf_n_docs_stable_under_block_splits():
    """n_docs (the N in idf) must be the EXACT distinct doc count no
    matter how explode output blocks split — the per-batch distinct-sum
    double-counted straddling docs once blocks split at scale."""
    import ray
    from ray.data import DataContext

    from dcpray.functions.textprep import tfidf_top_terms

    texts = [f"alpha beta gamma doc{i} token{i % 7} extra words here"
             for i in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts)})
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 1024  # force aggressive splits
        split = tfidf_top_terms(rd.from_arrow(t), k=2).to_pandas()
    finally:
        ctx.target_max_block_size = old
    normal = tfidf_top_terms(rd.from_arrow(t), k=2).to_pandas()
    cols = ["doc_id", "term", "tfidf"]
    a = split[cols].sort_values(["doc_id", "term"]).reset_index(drop=True)
    b = normal[cols].sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_top_terms_zero_token_corpus():
    from dcpray.functions.textprep import top_terms

    t = pa.table({"text": pa.array([None, "日本語テキスト", "...."])})
    out = top_terms(rd.from_arrow(t), k=5)
    assert out.num_rows == 0
    assert out.column_names == ["term", "cnt"]


def test_text_stats_null_text_stays_null():
    from dcpray.functions.textstats import text_stats

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, "Hi!"])})
    out = text_stats(t)
    assert out["punct_ratio"].null_count == 1
    assert out["upper_ratio"].null_count == 1
    assert out["n_chars"].null_count == 1


def test_fingerprint_md5_null_is_null():
    from dcpray.functions.textstats import fingerprint_md5

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, ""])})
    out = fingerprint_md5(t)
    # null doc -> NULL (oracle md5(NULL) IS NULL); empty doc -> md5("")
    assert out["fingerprint_md5"][0].as_py() is None
    assert out["fingerprint_md5"][1].as_py() == \
        "d41d8cd98f00b204e9800998ecf8427e"


def test_bmp_stages_tolerate_null_payload():
    from dcpray.functions.multimodal import (
        ImageFeatureExtractor,
        bmp_pixel_stats,
        decode_bmp,
        encode_bmp,
    )

    pix = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    good = encode_bmp(pix)
    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([good, None], pa.binary())})
    out = bmp_pixel_stats(t)
    assert out["width"][0].as_py() == 8 and out["width"][1].as_py() is None
    assert out["pixel_mean"].null_count == 1
    feats = ImageFeatureExtractor(fake=False)(t)
    assert feats["features"][1].as_py() is None
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(None)


def test_decontam_swapped_args_guard_fires_in_loop():
    from dcpray.functions.decontam import _collect_bench_hashes

    texts = [f"unique text number {i}" for i in range(500)]
    big = rd.from_arrow(pa.table({"text": pa.array(texts)}))
    with pytest.raises(ValueError, match="swap the arguments"):
        _collect_bench_hashes(big, "text", None, " ", max_ngrams=100)
