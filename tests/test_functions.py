"""Training-data operators: dedup, ANN, text stats, multimodal stubs."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


# ------------------------------------------------------------ textstats


def test_token_count_matches_duckdb(docs_ds):
    import duckdb

    from dcpray.functions.textstats import token_count

    out = (
        docs_ds.map_batches(token_count, batch_format="pyarrow")
        .select_columns(["doc_id", "n_tokens"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT doc_id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) n_tokens "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).df()
    assert out.equals(exp)


def test_text_stats_matches_duckdb(docs_ds):
    import duckdb

    from dcpray.functions.textstats import text_stats

    out = (
        docs_ds.map_batches(text_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) n_chars,
               CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) n_tokens,
               round(length(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / greatest(length(text), 1), 6) punct_ratio,
               round(length(regexp_extract_all(text, '[A-Z]')) / greatest(length(text), 1), 6) upper_ratio
        FROM '{SF}/documents.parquet' ORDER BY doc_id
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_langid_and_fingerprint_deterministic(docs_ds):
    from dcpray.functions.textstats import LangId, fingerprint

    p1 = docs_ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    p2 = docs_ds.map_batches(LangId, batch_format="pyarrow", concurrency=2).to_pandas()
    p1, p2 = (x.sort_values("doc_id").reset_index(drop=True) for x in (p1, p2))
    assert p1.equals(p2)
    assert set(p1["lang_pred"]) <= {"en", "de", "fr", "es", "zh", "und"}

    f1 = docs_ds.map_batches(fingerprint, batch_format="pyarrow").to_pandas()
    f2 = docs_ds.map_batches(fingerprint, batch_format="pyarrow").to_pandas()
    f1, f2 = (x.sort_values("doc_id").reset_index(drop=True) for x in (f1, f2))
    assert f1.equals(f2)
    assert f1["fingerprint"].str.len().eq(16).all()
    # distinct texts → distinct fingerprints at this scale
    assert f1["fingerprint"].nunique() == len(f1)


# ---------------------------------------------------------------- dedup


def _corpus_with_dups():
    import ray.data as rd

    base = [
        "the quick brown fox jumps over the lazy dog and keeps running far away",
        "data pipelines shuffle rows between workers while actors keep local state",
        "completely unrelated sentence about cooking pasta with garlic and olive oil",
        "streaming execution with backpressure keeps memory bounded during big scans",
    ]
    rows = []
    doc_id = 0
    for t in base:
        rows.append({"doc_id": doc_id, "text": t}); doc_id += 1
        rows.append({"doc_id": doc_id, "text": t}); doc_id += 1  # exact dup
        rows.append({"doc_id": doc_id, "text": t.replace("the", "a") + " extra"}); doc_id += 1  # near dup
    for i in range(20):  # distinct filler
        rows.append({"doc_id": doc_id, "text": f"unique filler document number {i} with its own words {i*7}"})
        doc_id += 1
    return rd.from_pandas(__import__("pandas").DataFrame(rows)), base


def test_exact_dedup():
    from dcpray.functions.dedup import exact_dedup

    ds, base = _corpus_with_dups()
    out = exact_dedup(ds).to_pandas().sort_values("doc_id")
    # exact dups (ids 1, 4, 7, 10) removed, everything else kept
    removed = set(range(1, 12, 3))
    assert set(out["doc_id"]) == set(range(ds.count())) - removed
    assert out["text"].is_unique


@pytest.mark.parametrize("cluster", ["driver", "distributed"])
def test_minhash_near_dedup(cluster):
    """The one-call dedup op end-to-end in BOTH clustering modes — the
    distributed mode must produce the identical labels and survivors
    while never collecting the pair set on the driver."""
    from dcpray.functions.dedup import minhash_dedup

    ds, base = _corpus_with_dups()
    labels, survivors = minhash_dedup(ds, threshold=0.5, concurrency=2,
                                      cluster=cluster)
    lab = labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # each base text's trio {orig, exact-dup, near-dup} clusters to the orig
    for trio_start in range(0, 12, 3):
        grp = lab[lab["doc_id"].isin([trio_start, trio_start + 1, trio_start + 2])]
        assert len(grp) == 3
        assert (grp["rep_id"] == trio_start).all()
    surv = survivors.to_pandas()
    assert set(surv["doc_id"]) == set(range(ds.count())) - {
        d for d in lab["doc_id"] if d not in set(lab["rep_id"])
    }


def test_minhash_dedup_rejects_bad_cluster():
    import pytest as _pytest

    from dcpray.functions.dedup import minhash_dedup

    ds, _ = _corpus_with_dups()
    with _pytest.raises(ValueError, match="cluster"):
        minhash_dedup(ds, cluster="nope")


def test_cluster_pairs_distributed_equals_union_find():
    """The distributed min-label-propagation components must equal the
    driver union-find on random edge sets (chains, stars, cliques)."""
    import pandas as pd
    import ray.data as rd

    from dcpray.functions.dedup import cluster_pairs, cluster_pairs_distributed

    rng = np.random.RandomState(3)
    # one combined edge set: a chain, a star, a clique and a random
    # bipartite blob as disjoint components (single distributed run —
    # each propagation round costs a fixed Ray overhead, so testing one
    # multi-component graph beats four sequential runs)
    parts = [
        pd.DataFrame({"a": [0, 1, 2], "b": [1, 2, 3]}),            # chain
        pd.DataFrame({"a": [10, 10, 10], "b": [11, 12, 13]}),      # star
        pd.DataFrame({"a": [5, 5, 6], "b": [6, 7, 7]}),            # clique
        pd.DataFrame({"a": rng.randint(20, 40, 25),
                      "b": rng.randint(40, 60, 25)}),              # random bipartite
    ]
    df = pd.concat(parts, ignore_index=True)
    df = df[df["a"] != df["b"]]
    lo, hi = np.minimum(df["a"], df["b"]), np.maximum(df["a"], df["b"])
    df = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates().reset_index(drop=True)
    want = cluster_pairs(df)
    got = cluster_pairs_distributed(rd.from_pandas(df), parts=8).to_pandas()
    got_map = dict(zip(got["doc_id"], got["rep_id"]))
    assert got_map == want, (got_map, want)

    # a LONG chain: pointer jumping must converge in O(log n) rounds,
    # far under max_rounds (plain propagation would need 120 rounds)
    chain = pd.DataFrame({"a": np.arange(1000, 1120),
                          "b": np.arange(1001, 1121)})
    got = cluster_pairs_distributed(rd.from_pandas(chain), parts=8,
                                    max_rounds=15).to_pandas()
    assert (got["rep_id"] == 1000).all() and len(got) == 121

    # empty edge set
    empty = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                         "b": pd.Series(dtype="int64")}))
    assert len(cluster_pairs_distributed(empty).to_pandas()) == 0


def test_simhash_pairs():
    from dcpray.functions.dedup import simhash_dup_pairs

    ds, _ = _corpus_with_dups()
    pairs = simhash_dup_pairs(ds, max_hamming=3, concurrency=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    for trio_start in range(0, 12, 3):
        assert (trio_start, trio_start + 1) in got  # identical text → hamming 0


def test_minhash_signature_batch_equals_single_doc():
    """The vectorized flat-buffer signature path must equal the per-doc
    reference implementation, including short/empty/unicode docs."""
    import pyarrow.parquet as pq

    from dcpray.functions.dedup import MinHasher, minhash_signatures

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    texts += ["", "ab", "    ", "ümlaut ÄÖÜ tabs\tand\nnewlines", "x" * 4, "x" * 6, None]
    col = pa.array(texts, pa.string())
    mh = MinHasher()
    sigs = minhash_signatures(col, mh.seeds, mh.k)
    for i, t in enumerate(texts):
        assert np.array_equal(sigs[i], mh.signature(t or "")), f"doc {i}"


def test_simhash_batch_equals_single_doc():
    import pyarrow.parquet as pq

    from dcpray.functions.dedup import SimHasher, simhash_batch

    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    texts += ["", "  leading space", "one", None]
    col = pa.array(texts, pa.string())
    s = SimHasher()
    sh = simhash_batch(col)
    for i, t in enumerate(texts):
        assert sh[i] == s.simhash(t or ""), f"doc {i}"


def test_minhash_verify_join_equals_broadcast():
    """The distributed hash-join verification (scale path, no driver
    corpus dict) must produce the identical verified pair set as the
    broadcast path — on the synthetic dup corpus and on a 10× fixture
    (5k docs, sf0.01) where the driver never materializes text."""
    import ray.data as rd

    from dcpray.functions.dedup import minhash_dup_pairs

    def run(ds_factory, threshold):
        out = {}
        for mode, kw in (("join-bcast", dict(verify="join", requests="broadcast")),
                         ("join-shuffle", dict(verify="join", requests="shuffle")),
                         ("broadcast", dict(verify="broadcast"))):
            df = (minhash_dup_pairs(ds_factory(), threshold=threshold,
                                    concurrency=2, **kw)
                  .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
            out[mode] = df
        assert out["join-bcast"].equals(out["broadcast"]), (
            out["join-bcast"].head(), out["broadcast"].head())
        assert out["join-shuffle"].equals(out["broadcast"]), (
            out["join-shuffle"].head(), out["broadcast"].head())
        return out["join-bcast"]

    run(lambda: _corpus_with_dups()[0], 0.5)
    big = run(lambda: rd.read_parquet("/root/testdata/sf0.01/documents.parquet"), 0.6)
    assert len(big) > 0


def test_ngram_jaccard_consistency():
    from dcpray.functions.dedup import char_shingle_hashes, jaccard, word_ngram_hashes

    a = char_shingle_hashes("hello world this is a test", 5)
    b = char_shingle_hashes("hello world this is a test", 5)
    assert jaccard(a, b) == 1.0
    c = char_shingle_hashes("totally different content here", 5)
    assert jaccard(a, c) < 0.1
    w = word_ngram_hashes("one two three four five", 3)
    assert len(w) == 3


def test_embedding_neardup():
    import ray.data as rd

    from dcpray.functions.dedup import embedding_dup_pairs

    rng = np.random.RandomState(0)
    vecs = rng.randn(40, 64)
    vecs[1] = vecs[0] + 0.01 * rng.randn(64)  # near-dup of 0
    vecs[5] = vecs[4]  # exact dup of 4
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_dup_pairs(rd.from_arrow(tab), threshold=0.95, dim=64).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    assert (0, 1) in got and (4, 5) in got


# ------------------------------------------------------------------ ANN


def test_topk_cosine_exact():
    import ray.data as rd

    from dcpray.functions.ann import topk_cosine

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    import pandas as pd
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.stack(full["embedding"].to_pylist()).astype(np.float64)
    ids = full["vec_id"].to_numpy()
    q = mat[:5]
    out = topk_cosine(ds, q, ids[:5], k=10, concurrency=2).to_pandas()

    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = qn @ normed.T
    for qi in range(5):
        exp = set(ids[np.argsort(-scores[qi])[:10]])
        got = set(out[out["query_id"] == ids[qi]]["vec_id"])
        assert got == exp, f"query {qi}: {got ^ exp}"


def test_ivf_topk_recall():
    import ray.data as rd

    from dcpray.functions.ann import ivf_topk, topk_cosine

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.stack(full["embedding"].to_pylist()).astype(np.float64)
    ids = full["vec_id"].to_numpy()
    q = mat[:5]
    exact = topk_cosine(ds, q, ids[:5], k=10, concurrency=2).to_pandas()
    approx = ivf_topk(ds, q, ids[:5], k=10, nlist=16, nprobe=8, concurrency=2).to_pandas()
    recalls = []
    for qid in ids[:5]:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6  # nprobe=8/16 on 500 vecs
    # full probe = exact
    exact2 = ivf_topk(ds, q, ids[:5], k=10, nlist=8, nprobe=8, concurrency=2).to_pandas()
    for qid in ids[:5]:
        assert set(exact2[exact2["query_id"] == qid]["vec_id"]) == set(
            exact[exact["query_id"] == qid]["vec_id"]
        )


def test_ivf_persistent_index(tmp_path):
    """Build-once/query-many IVF: full-probe queries over the persisted
    index equal brute force; sub-probe queries read ONLY the probed
    lists' files (file-level pruning) and keep recall."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from dcpray.functions.ann import build_ivf_index, ivf_query, topk_cosine

    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(rd.read_parquet(f"{SF}/embeddings.parquet"), idx,
                           nlist=16, concurrency=2)
    assert meta["num_vectors"] == 500 and meta["nlist"] == 16
    files = [f for f in os.listdir(idx) if f.startswith("list-")]
    assert 1 < len(files) <= 16
    # index is complete: every vector landed in exactly one list
    assert sum(pq.ParquetFile(os.path.join(idx, f)).metadata.num_rows
               for f in files) == 500

    full = pq.read_table(f"{SF}/embeddings.parquet")
    mat = np.stack(full["embedding"].to_pylist()).astype(np.float64)
    ids = full["vec_id"].to_numpy()
    q = mat[:5]
    exact = topk_cosine(rd.read_parquet(f"{SF}/embeddings.parquet"),
                        q, ids[:5], k=10, concurrency=2).to_pandas()
    fullprobe = ivf_query(idx, q, ids[:5], k=10, nprobe=16).to_pandas()
    for qid in ids[:5]:
        assert set(fullprobe[fullprobe["query_id"] == qid]["vec_id"]) == set(
            exact[exact["query_id"] == qid]["vec_id"])

    approx = ivf_query(idx, q, ids[:5], k=10, nprobe=8).to_pandas()
    recalls = []
    for qid in ids[:5]:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6

    # strict probe semantics: the persisted-index sub-probe result equals
    # the in-memory ivf_topk with identical centroids/nprobe — block
    # bundling of small list files must not widen any query's candidate
    # set beyond its probed lists
    from dcpray.functions.ann import ivf_topk

    mem = ivf_topk(rd.read_parquet(f"{SF}/embeddings.parquet"), q, ids[:5],
                   k=10, nlist=16, nprobe=8, concurrency=2).to_pandas()
    for qid in ids[:5]:
        assert set(approx[approx["query_id"] == qid]["vec_id"]) == set(
            mem[mem["query_id"] == qid]["vec_id"]), qid


# ----------------------------------------------------------- multimodal


def test_multimodal_pipeline(docs_ds):
    from dcpray.functions.multimodal import (
        FrameSampler,
        ImageFeatureExtractor,
        ImageResizer,
        synthesize_media,
    )

    media = docs_ds.map_batches(synthesize_media, batch_format="pyarrow")
    feats = media.map_batches(
        ImageFeatureExtractor, batch_format="pyarrow", concurrency=2, batch_size=128
    ).to_pandas()
    assert len(feats) == docs_ds.count()
    assert all(len(f) == 16 for f in feats["features"])
    assert all(abs(sum(f) - 1.0) < 1e-9 for f in feats["features"] if sum(f) > 0)

    resized = media.map_batches(
        ImageResizer, fn_constructor_args=(32, 32), batch_format="pyarrow", concurrency=2
    ).take_batch(5, batch_format="pyarrow")
    assert set(resized["width"].to_pylist()) == {32}

    frames = media.map_batches(
        FrameSampler, fn_constructor_args=(4,), batch_format="pyarrow", concurrency=2
    ).to_pandas()
    n_videos = media.map_batches(
        lambda t: t.filter(__import__("pyarrow.compute", fromlist=["equal"]).equal(t["kind"], "video")),
        batch_format="pyarrow",
    ).count()
    assert len(frames) == 4 * n_videos  # flat-map 1→N

    # image feature-extraction and resize have REAL BMP decode paths now
    # (tests/test_multimodal_codec.py); video frame-seek lights up only
    # when PyAV is importable, else an honest stub names the library
    from dcpray.functions.multimodal import _load_pyav

    if _load_pyav() is None:
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            FrameSampler(fake=False)


@pytest.mark.skipif(
    __import__("dcpray.functions.multimodal",
               fromlist=["_load_pyav"])._load_pyav() is None,
    reason="PyAV/ffmpeg not installed in this container",
)
def test_frame_sampler_real_decode():
    """Real-path parity (runs only where PyAV exists): a synthetic
    one-color-per-frame video must sample n evenly spaced frames whose
    decoded BMPs round-trip the frame colors."""
    import io

    import numpy as np

    from dcpray.functions.multimodal import FrameSampler, decode_bmp

    av = __import__("av")
    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as c:
        stream = c.add_stream("mpeg4", rate=4)
        stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
        for lum in (0, 85, 170, 255):
            img = np.full((16, 16, 3), lum, np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            c.mux(stream.encode(frame))
        c.mux(stream.encode())
    payload = buf.getvalue()
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "kind": pa.array(["video"]),
    })
    out = FrameSampler(num_frames=2, fake=False)(t)
    assert out.num_rows == 2
    first = decode_bmp(out["frame"][0].as_py())
    assert first.shape == (16, 16, 3)


def test_ngram_jaccard_exact_pairs(docs_ds):
    """Exact 3-gram Jaccard baseline: symmetric, thresholded, and every
    MinHash-verified near-dup pair at a STRICTER char-shingle threshold
    appears among the word-3-gram exact pairs at a looser one (the
    baseline anchors the LSH path)."""
    import numpy as np

    from dcpray.functions.dedup import minhash_dup_pairs, ngram_jaccard_exact_pairs

    exact = ngram_jaccard_exact_pairs(docs_ds, threshold=0.5, n=3).to_pandas()
    assert (exact["a"] < exact["b"]).all()
    assert (exact["jaccard"] >= 0.5).all()
    exact_set = set(zip(exact["a"], exact["b"]))

    mh = minhash_dup_pairs(docs_ds, threshold=0.8, concurrency=2).to_pandas()
    mh_set = set(zip(mh["a"], mh["b"]))
    assert mh_set <= exact_set
