"""Round-5 second-wave operator tests: per-document repetition stats
(Gopher-style quality rules), exact kNN self-join, and global exact
percent_rank."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.functions.ann import knn_self_join
from dcpray.functions.textstats import repetition_stats
from dcpray.functions.window import percent_rank_global


# ------------------------------------------------- repetition_stats


def test_repetition_stats_hand_checked():
    t = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b a b c",      # 5 segs, 2 repeats ("a","b"), 2/5 chars
            "xx yy zz",       # no repeats
            "",               # one empty segment, zero chars
            None,             # null text -> null stats
            "aa aa aa",       # 3 segs, 2 repeats, 4/6 chars
        ],
    })
    out = repetition_stats(t, sep=" ")
    assert out.column_names == ["doc_id", "n_segments", "dup_seg_frac",
                                "dup_char_frac"]
    n = out["n_segments"].to_pylist()
    f = out["dup_seg_frac"].to_pylist()
    c = out["dup_char_frac"].to_pylist()
    assert n == [5, 3, 1, None, 3]
    assert f == [0.4, 0.0, 0.0, None, pytest.approx(2 / 3)]
    assert c[0] == pytest.approx(0.4)
    assert c[1] == 0.0
    assert c[2] is None  # zero segment chars -> NULL, like the oracle
    assert c[3] is None
    assert c[4] == pytest.approx(4 / 6)


def test_repetition_stats_line_mode_and_unicode():
    # line flavor (sep="\n"); lengths are CHARS not bytes (müß = 3)
    t = pa.table({"doc_id": [1], "text": ["müß\nok\nmüß"]})
    out = repetition_stats(t, sep="\n")
    assert out["n_segments"].to_pylist() == [3]
    assert out["dup_seg_frac"].to_pylist() == [pytest.approx(1 / 3)]
    assert out["dup_char_frac"].to_pylist() == [pytest.approx(3 / 8)]


def test_repetition_stats_oracle_parity():
    import duckdb

    rng = np.random.default_rng(3)
    words = np.array(["the", "cat", "sat", "on", "mat", "x", "yy"])
    texts = [" ".join(rng.choice(words, rng.integers(1, 12)))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_stats(t, sep=" ").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    ora = con.execute("""
WITH l AS (SELECT doc_id, unnest(string_split(text, ' ')) AS seg
           FROM documents),
g AS (SELECT doc_id, seg, count(*) AS c, length(seg) AS len
      FROM l GROUP BY doc_id, seg)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_segments,
       CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_seg_frac,
       CASE WHEN sum(c * len) = 0 THEN NULL
            ELSE CAST(sum((c - 1) * len) AS DOUBLE)
                 / CAST(sum(c * len) AS DOUBLE) END AS dup_char_frac
FROM g GROUP BY doc_id ORDER BY doc_id""").df()
    # bit-exact: both sides divide the same exact integers in float64
    assert (out["n_segments"] == ora["n_segments"]).all()
    assert (out["dup_seg_frac"] == ora["dup_seg_frac"]).all()
    a, b = out["dup_char_frac"], ora["dup_char_frac"]
    assert ((a == b) | (a.isna() & b.isna())).all()


# ---------------------------------------------------- knn_self_join


def _brute_knn(ids, x, k, dp=4):
    """Reference: rounded-cosine desc, neighbor-id asc."""
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    cos = xn @ xn.T
    s = 10.0 ** dp
    cos = np.where(cos >= 0, np.floor(cos * s + 0.5),
                   np.ceil(cos * s - 0.5)) / s
    rows = []
    for i in range(len(ids)):
        cand = [(-cos[i, j], ids[j]) for j in range(len(ids)) if j != i]
        cand.sort()
        for r, (negc, nid) in enumerate(cand[:k], 1):
            rows.append((ids[i], nid, r, -negc))
    return sorted(rows)


def test_knn_self_join_matches_bruteforce():
    rng = np.random.default_rng(11)
    n, dim = 120, 16
    x = rng.standard_normal((n, dim)).astype(np.float32)
    # plant exact duplicates so cosine ties exercise the id tiebreak
    x[7] = x[3]
    x[55] = x[3]
    ids = rng.permutation(n).astype(np.int64)  # unsorted ids
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(5)
    out = knn_self_join(ds, k=4).to_pandas()
    got = sorted(map(tuple, out[["vec_id", "nbr_id", "rank",
                                 "cosine"]].itertuples(index=False)))
    want = _brute_knn(ids, x.astype(np.float64), 4)
    assert len(got) == n * 4
    assert got == [pytest.approx(w) for w in want]


def test_knn_self_join_k_exceeds_corpus():
    x = np.eye(3, dtype=np.float32)
    t = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    out = knn_self_join(rd.from_arrow(t), k=10).to_pandas()
    # each row gets its 2 OTHER rows, never itself
    assert len(out) == 6
    assert (out["rank"] <= 2).all()
    assert (out["vec_id"] != out["nbr_id"]).all()


def test_knn_self_join_zero_norm_raises():
    t = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                  "embedding": pa.array([[1.0, 0.0], [0.0, 0.0]],
                                        pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="zero-norm"):
        knn_self_join(rd.from_arrow(t), k=1)


# ----------------------------------------------- percent_rank_global


def test_percent_rank_global_matches_sql():
    import duckdb

    rng = np.random.default_rng(5)
    v = np.round(rng.uniform(0, 50, 5000), 2)
    v[::97] = v[0]  # heavy ties
    t = pa.table({"id": pa.array(range(5000), pa.int64()),
                  "value": pa.array(v)})
    out = percent_rank_global(rd.from_arrow(t).repartition(7), "value") \
        .to_pandas().sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ora = con.execute("""SELECT id, percent_rank() OVER (ORDER BY value)
                         AS percent_rank FROM t ORDER BY id""").df()
    assert (out["percent_rank"] == ora["percent_rank"]).all()  # bit-exact


def test_percent_rank_global_edge_cases():
    one = pa.table({"id": [1], "value": [3.5]})
    out = percent_rank_global(rd.from_arrow(one), "value").to_pandas()
    assert out["percent_rank"].tolist() == [0.0]  # n == 1 -> 0, like SQL

    # -0.0 and +0.0 are SQL peers
    z = pa.table({"id": [1, 2, 3], "value": [-0.0, 0.0, 1.0]})
    out = percent_rank_global(rd.from_arrow(z), "value").to_pandas()
    assert out["percent_rank"].tolist() == [0.0, 0.0, 1.0]

    with pytest.raises(Exception, match="percent_rank_global"):
        bad = pa.table({"id": [1, 2], "value": pa.array([1.0, None])})
        percent_rank_global(rd.from_arrow(bad), "value").materialize()

    with pytest.raises(ValueError, match="already exist"):
        t = pa.table({"id": [1, 2], "percent_rank": [0.0, 0.0],
                      "value": [1.0, 2.0]})
        percent_rank_global(rd.from_arrow(t), "value")

    with pytest.raises(ValueError, match="max_distinct"):
        t = pa.table({"id": range(100),
                      "value": [float(i) for i in range(100)]})
        percent_rank_global(rd.from_arrow(t), "value", max_distinct=10)


# --------------------------------------------- ngram_repetition_stats


def test_ngram_repetition_hand_checked():
    from dcpray.functions.textstats import ngram_repetition_stats

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b a b a", "x y z", "q", None]})
    out = ngram_repetition_stats(t, n=2)
    assert out["n_ngrams"].to_pylist() == [4, 2, 0, None]
    assert out["dup_ngram_frac"].to_pylist() == [0.5, 0.0, None, None]
    assert out["dup_ngram_char_frac"].to_pylist() == [0.5, 0.0, None, None]
    out3 = ngram_repetition_stats(t, n=3)
    assert out3["n_ngrams"].to_pylist() == [3, 1, 0, None]
    assert out3["dup_ngram_frac"].to_pylist() == [
        pytest.approx(1 / 3), 0.0, None, None]
    with pytest.raises(ValueError, match="n >= 2"):
        ngram_repetition_stats(t, n=1)


def test_ngram_repetition_no_cross_document_windows():
    from dcpray.functions.textstats import ngram_repetition_stats

    # doc 1 ends with "z", doc 2 starts with "z": the window (z, z)
    # must NOT exist — windows never straddle a document boundary
    t = pa.table({"doc_id": [1, 2], "text": ["y z", "z w"]})
    out = ngram_repetition_stats(t, n=2)
    assert out["n_ngrams"].to_pylist() == [1, 1]
    assert out["dup_ngram_frac"].to_pylist() == [0.0, 0.0]


def test_empty_inputs_keep_output_schema():
    """Empty in -> empty out with the OPERATOR'S schema (not the
    input's) so downstream column selection never crashes."""
    from dcpray.functions.ann import knn_self_join
    from dcpray.functions.window import percent_rank_global

    et = pa.table({"vec_id": pa.array([], pa.int64()),
                   "embedding": pa.array([], pa.list_(pa.float32()))})
    out = knn_self_join(rd.from_arrow(et), k=3)
    assert out.schema().names == ["vec_id", "nbr_id", "rank", "cosine"]
    assert out.count() == 0

    ev = pa.table({"id": pa.array([], pa.int64()),
                   "value": pa.array([], pa.float64())})
    out = percent_rank_global(rd.from_arrow(ev), "value")
    assert out.schema().names == ["id", "value", "percent_rank"]
    assert out.count() == 0


# ------------------------------------------- approx_topk / topk_global


def test_approx_topk_exact_mode_matches_sql():
    import duckdb

    from dcpray.functions.agg import approx_topk

    rng = np.random.default_rng(9)
    v = rng.zipf(1.5, 4000) % 50  # heavy skew, 50 distinct
    t = pa.table({"v": pa.array(v.astype(np.int64))})
    out = approx_topk(rd.from_arrow(t).repartition(6), "v", k=10,
                      capacity=1000).to_pandas()
    assert (out["err"] == 0).all()  # capacity >= distinct: exact
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ora = con.execute("""SELECT v, CAST(count(*) AS BIGINT) AS count
                         FROM t GROUP BY v
                         ORDER BY count DESC, v LIMIT 10""").df()
    assert out["v"].tolist() == ora["v"].tolist()
    assert out["count"].tolist() == ora["count"].tolist()


def test_approx_topk_truncated_bounds_hold():
    from dcpray.functions.agg import approx_topk

    rng = np.random.default_rng(13)
    v = rng.zipf(1.3, 8000) % 500
    t = pa.table({"v": pa.array(v.astype(np.int64))})
    out = approx_topk(rd.from_arrow(t).repartition(8), "v", k=15,
                      capacity=32).to_pandas()
    true = {int(k): int(c) for k, c in
            zip(*np.unique(v, return_counts=True))}
    err = int(out["err"].iloc[0])
    assert err > 0  # capacity 32 << 500 distinct: truncation happened
    for _, row in out.iterrows():
        tc = true[int(row["v"])]
        assert row["count"] <= tc <= row["count"] + err  # MG bound
    # any value NOT returned has true count <= err + min returned count
    returned = set(int(x) for x in out["v"])
    kth = int(out["count"].min())
    for val, tc in true.items():
        if val not in returned:
            assert tc <= err + kth


def test_approx_topk_nulls_and_empty():
    from dcpray.functions.agg import approx_topk

    t = pa.table({"v": pa.array(["a", None, "a", "b", None])})
    out = approx_topk(rd.from_arrow(t), "v", k=5, capacity=10).to_pandas()
    assert out["v"].tolist() == ["a", "b"]  # nulls never counted
    assert out["count"].tolist() == [2, 1]
    with pytest.raises(ValueError, match="positive"):
        approx_topk(rd.from_arrow(t), "v", k=0)


def test_topk_global_matches_sql():
    import duckdb

    from dcpray.functions.agg import topk_global

    rng = np.random.default_rng(21)
    t = pa.table({"id": pa.array(range(3000), pa.int64()),
                  "score": pa.array(rng.integers(0, 40, 3000),
                                    pa.int64())})
    out = topk_global(rd.from_arrow(t).repartition(7), "score", k=25,
                      tiebreak_col="id").to_pandas().sort_values(
        ["score", "id"], ascending=[False, True]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ora = con.execute("""SELECT id, score FROM t
                         ORDER BY score DESC, id LIMIT 25""").df()
    assert out["id"].tolist() == ora["id"].tolist()
    assert out["score"].tolist() == ora["score"].tolist()


# ------------------------------------------- code-review regressions


def test_percent_rank_global_empty_derived_input():
    """Empty input THROUGH map_batches: schema is unknowable (None) —
    must not crash (review finding: AttributeError on rs.names)."""
    et = pa.table({"id": pa.array([], pa.int64()),
                   "value": pa.array([], pa.float64())})
    ds = rd.from_arrow(et).map_batches(lambda t: t,
                                       batch_format="pyarrow")
    out = percent_rank_global(ds, "value")
    assert out.count() == 0


def test_approx_topk_reserved_value_col_raises():
    from dcpray.functions.agg import approx_topk

    t = pa.table({"count": pa.array([1, 1, 2], pa.int64())})
    with pytest.raises(ValueError, match="may not be named"):
        approx_topk(rd.from_arrow(t), "count", k=2)


def test_approx_topk_empty_keeps_value_type():
    from dcpray.functions.agg import approx_topk

    t = pa.table({"v": pa.array([], pa.int64())})
    out = approx_topk(rd.from_arrow(t), "v", k=3)
    assert out.schema.field("v").type == pa.int64()
    assert out.num_rows == 0


def test_topk_global_reserved_g_raises():
    from dcpray.functions.agg import topk_global

    t = pa.table({"_g": pa.array([1], pa.int64()),
                  "s": pa.array([1], pa.int64())})
    # raised IN-BATCH (a driver-side schema probe would execute the
    # upstream pipeline once just for the guard), so it surfaces as a
    # wrapped Ray task error at execution time
    with pytest.raises(Exception, match="_g"):
        topk_global(rd.from_arrow(t), "s", k=1,
                    tiebreak_col="_g").materialize()


def test_knn_self_join_duplicate_ids_never_self_pair():
    """Duplicated vec_ids must mask their WHOLE sorted run (SQL
    a.id <> b.id excludes every same-id pair) — a leftmost-only
    searchsorted probe returned (5, 5, 1.0) self-pairs."""
    x = np.array([[1, 0], [1, 0], [0.6, 0.8], [0, 1]], np.float32)
    t = pa.table({"vec_id": pa.array([5, 5, 2, 9], pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    out = knn_self_join(rd.from_arrow(t), k=3).to_pandas()
    assert (out["vec_id"] != out["nbr_id"]).all()
    # both id-5 rows still rank the OTHER vectors
    five = out[out.vec_id == 5]
    assert set(five["nbr_id"]) == {2, 9}


def test_percent_rank_global_nondeterministic_input_raises():
    """A value in pass 2 that pass 1 never saw must raise, not take a
    neighbor's rank (review finding: silent wrong percent_rank)."""
    # cross-process execution counter via the filesystem: the pipeline
    # re-executes for (1) the schema probe, (2) the CDF pass, (3) the
    # assign pass — emit an UNSEEN value only on the final execution
    import os as _os
    import tempfile

    d = tempfile.mkdtemp()

    def mutate2(t: pa.Table) -> pa.Table:
        n = len(_os.listdir(d))
        open(_os.path.join(d, f"run{n}_{_os.getpid()}"), "w").close()
        if n >= 2:
            return pa.table({"value": pa.array([99.0, 2.0])})
        return pa.table({"value": pa.array([1.0, 2.0])})

    ds = rd.from_arrow(pa.table({"value": [0.0]})).map_batches(
        mutate2, batch_format="pyarrow")
    with pytest.raises(Exception, match="nondeterministic"):
        percent_rank_global(ds, "value").materialize()


# ------------------------------------------------------ encode_tokens


def test_encode_tokens_hand_checked():
    from dcpray.functions.textprep import encode_tokens

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["THE cat, the-hat!", "zzz unseen THE", ""]})
    # corpus counts: the=3, cat=1, hat=1, unseen=1, zzz=1
    # vocab_size=2 -> ids: the=1, cat=2 (cnt desc, term asc)
    out = encode_tokens(rd.from_arrow(t), vocab_size=2).to_pandas() \
        .sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert out[out.doc_id == 1]["term"].tolist() == [
        "the", "cat", "the", "hat"]
    assert out[out.doc_id == 1]["pos"].tolist() == [1, 2, 3, 4]
    assert out[out.doc_id == 1]["token_id"].tolist() == [1, 2, 1, 0]
    assert out[out.doc_id == 2]["token_id"].tolist() == [0, 0, 1]
    assert (out.doc_id != 3).all()  # empty doc yields no rows
    assert out["token_id"].dtype == np.int32


def test_encode_tokens_positions_skip_split_empties():
    from dcpray.functions.textprep import encode_tokens

    # leading/trailing separators produce empty split tokens that must
    # NOT consume positions (oracle's regexp_extract_all never emits
    # empties)
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": ["  a  b  "]})
    out = encode_tokens(rd.from_arrow(t), vocab_size=10).to_pandas()
    assert out["pos"].tolist() == [1, 2]
    assert out["term"].tolist() == ["a", "b"]


# ------------------------------------------------- knn_self_join_ivf


def test_knn_ivf_full_probe_equals_brute():
    """nprobe == nlist: the IVF self-join must be ROW-IDENTICAL to the
    brute path (every pair scored exactly once, same rounded-cosine /
    id-tie ordering) — the scale route's correctness anchor."""
    from dcpray.functions.ann import knn_self_join_ivf

    rng = np.random.default_rng(31)
    n, dim = 200, 12
    x = rng.standard_normal((n, dim)).astype(np.float32)
    x[11] = x[2]  # exact duplicate exercises the id tiebreak
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    brute = knn_self_join(ds, k=4).to_pandas().sort_values(
        ["vec_id", "rank"]).reset_index(drop=True)
    full = knn_self_join_ivf(ds, k=4, nlist=6, nprobe=6).to_pandas() \
        .sort_values(["vec_id", "rank"]).reset_index(drop=True)
    assert brute.equals(full[brute.columns])


def test_knn_ivf_subprobe_recall_reasonable():
    from dcpray.functions.ann import knn_self_join_ivf

    rng = np.random.default_rng(33)
    n, dim = 400, 16
    x = rng.standard_normal((n, dim)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, r)) for r in x],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    brute = knn_self_join(ds, k=5).to_pandas()
    sub = knn_self_join_ivf(ds, k=5, nlist=8, nprobe=3).to_pandas()
    # every vector still gets answers, no self-pairs, recall is sane
    assert (sub["vec_id"] != sub["nbr_id"]).all()
    assert sub.groupby("vec_id").size().min() >= 1
    hits = sub.merge(brute, on=["vec_id", "nbr_id"], how="inner")
    assert len(hits) / len(brute) > 0.5  # random data, 3/8 probes


def test_knn_ivf_empty_corpus_pinned_schema():
    from dcpray.functions.ann import knn_self_join_ivf

    et = pa.table({"vec_id": pa.array([], pa.int64()),
                   "embedding": pa.array([], pa.list_(pa.float32()))})
    out = knn_self_join_ivf(rd.from_arrow(et), k=3)
    assert out.schema().names == ["vec_id", "nbr_id", "rank", "cosine"]
    assert out.count() == 0


def test_knn_ivf_degenerate_and_loud_errors():
    """Review regressions: (a) a single-vector corpus (only candidate
    is self-masked) keeps the pinned output schema; (b) data-integrity
    errors are NOT swallowed into an empty result."""
    from dcpray.functions.ann import knn_self_join_ivf

    one = pa.table({"vec_id": pa.array([7], pa.int64()),
                    "embedding": pa.array([[1.0, 0.0]],
                                          pa.list_(pa.float32()))})
    out = knn_self_join_ivf(rd.from_arrow(one), k=3)
    assert out.schema().names == ["vec_id", "nbr_id", "rank", "cosine"]
    assert out.count() == 0

    ragged = pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                       "embedding": pa.array([[1.0, 0.0], [1.0]],
                                             pa.list_(pa.float32()))})
    with pytest.raises(Exception, match="ragged"):
        knn_self_join_ivf(rd.from_arrow(ragged), k=1).materialize()


# ----------------------------------------------------- bernoulli_sample


def test_bernoulli_sample_threshold_semantics():
    from dcpray.functions.sample import bernoulli_sample
    from dcpray.functions.sample import md5_lower64

    t = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                  "text": pa.array([f"doc {i}" for i in range(300)]
                                   + [None] * 100)})
    out = bernoulli_sample(rd.from_arrow(t).repartition(4),
                           rate=0.25).to_pandas()
    thr = np.uint64(int(0.25 * 2.0 ** 64))
    h = md5_lower64(pa.array([f"doc {i}" for i in range(300)]))
    assert len(out) == int((h < thr).sum())  # exact selected set
    assert out["text"].notna().all()  # nulls dropped
    # rate 0 keeps nothing, rate 1 keeps every non-null row
    assert bernoulli_sample(rd.from_arrow(t), rate=0.0).count() == 0
    assert bernoulli_sample(rd.from_arrow(t), rate=1.0).count() == 300
    with pytest.raises(ValueError, match="rate"):
        bernoulli_sample(rd.from_arrow(t), rate=1.5)
