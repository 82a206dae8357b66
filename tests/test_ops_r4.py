"""Round-4 operators: chunking, PII scrub, vocabulary, broadcast
equi-join, stratified sampling, distinct counts, exact quantiles,
hopping windows, distributed k-means — each against a DuckDB oracle or
a pure-numpy reference."""

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

# ------------------------------------------------------------- chunking


def _naive_chunks(text, chunk, overlap):
    if text is None or len(text) == 0:
        return []
    stride = chunk - overlap
    n = max(len(text) - overlap - 1, 0) // stride + 1
    return [(j, text[j * stride: j * stride + chunk]) for j in range(n)]


@pytest.mark.parametrize("chunk,overlap", [(4, 1), (8, 0), (16, 7)])
def test_chunk_text_matches_naive_utf8(chunk, overlap):
    from dcpray.functions.textprep import chunk_text

    random.seed(9)
    alphabet = "ab déf 東京 🚀 z\n"
    texts = [None, "", "a", "héllo wörld 東京タワー🚀 end"] + [
        "".join(random.choice(alphabet) for _ in range(random.randint(0, 50)))
        for _ in range(150)
    ]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = chunk_text(rd.from_arrow(tab).repartition(5), chunk_chars=chunk,
                     overlap_chars=overlap)
    got = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        b.validate(full=True)
        for r in b.to_pylist():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["chunk_text"]))
    for i, tx in enumerate(texts):
        assert sorted(got.get(i, [])) == _naive_chunks(tx, chunk, overlap), i


def test_chunk_text_rejects_bad_overlap():
    from dcpray.functions.textprep import chunk_batch

    with pytest.raises(ValueError):
        chunk_batch(pa.table({"doc_id": [1], "text": ["x"]}), "text", 4, 4,
                    ["doc_id"])


# ------------------------------------------------------------ PII scrub


def test_scrub_pii_matches_duckdb():
    from dcpray.functions.textprep import DEFAULT_PII_PATTERNS, scrub_pii

    texts = ["mail john.doe+x@ex-ample.co.uk now", "call +1 (555) 123-4567",
             "srv at 10.0.0.1 or 999.12.34.56", None, "", "no pii",
             "two a@b.io c@d.de mails"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = scrub_pii(rd.from_arrow(tab).repartition(3)).to_pandas() \
        .sort_values("doc_id")
    expr = "text"
    for _, pat, rep in DEFAULT_PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    exp = duckdb.sql(
        f"SELECT doc_id, {expr} AS text FROM tab ORDER BY doc_id").df()
    assert out["text"].fillna("~").tolist() == exp["text"].fillna("~").tolist()
    assert "<EMAIL>" in out["text"].iloc[0]


# ------------------------------------------------------------- top terms


def test_top_terms_matches_duckdb():
    from dcpray.functions.textprep import top_terms

    rng = np.random.RandomState(3)
    vocab = [f"w{i:02d}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 30))
                      ) + ", Punct! 42x" for _ in range(400)]
    tab = pa.table({"text": pa.array(texts)})
    got = top_terms(rd.from_arrow(tab).repartition(7), k=25).to_pandas()
    exp = duckdb.sql("""
        SELECT t AS term, count(*) AS cnt FROM (
          SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
          FROM tab) WHERE t <> ''
        GROUP BY t ORDER BY cnt DESC, t LIMIT 25""").df()
    assert got["term"].tolist() == exp["term"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


# -------------------------------------------------------- broadcast join


def _join_fixtures():
    rng = np.random.RandomState(11)
    lt = pa.table({
        "k": pa.array([int(x) for x in rng.randint(0, 12, 300)] + [None, None],
                      pa.int64()),
        "lv": pa.array(np.arange(302, dtype=np.int64)),
    })
    rt = pa.table({
        "k": pa.array([0, 1, 2, 3, 4, 5, None], pa.int64()),
        "rv": pa.array([10, 11, 12, 13, 14, 15, 99], pa.int64()),
    })
    return lt, rt


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_duckdb(how):
    from dcpray.functions.join import broadcast_join

    lt, rt = _join_fixtures()
    out = broadcast_join(rd.from_arrow(lt).repartition(4), rt,
                         on="k", how=how).to_pandas()
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    exp = duckdb.sql(
        f"SELECT l.k AS k, l.lv AS lv, r.rv AS rv FROM lt l {jt} rt r "
        "ON l.k = r.k").df()
    cols = ["k", "lv", "rv"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype("float64"), b.astype("float64"))


def test_broadcast_join_collision_raises():
    from dcpray.functions.join import broadcast_join

    lt, _ = _join_fixtures()
    rt = pa.table({"k": pa.array([1], pa.int64()),
                   "lv": pa.array([7], pa.int64())})
    with pytest.raises(ValueError, match="collides"):
        broadcast_join(rd.from_arrow(lt), rt, on="k")


# --------------------------------------------------- stratified sampling


def test_stratified_sample_matches_duckdb():
    from dcpray.functions.sample import stratified_sample

    rng = np.random.RandomState(21)
    n = 1200
    tab = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.randint(0, 25, n).astype(np.int64)),
        "value": pa.array(rng.rand(n)),
    })
    got = stratified_sample(rd.from_arrow(tab).repartition(5), "user_id", 3,
                            id_col="event_id").to_pandas()
    exp = duckdb.sql("""
        SELECT event_id, user_id, value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY md5_number_lower(cast(event_id AS varchar)), event_id
          ) AS rn FROM tab) WHERE rn <= 3""").df()
    cols = ["event_id", "user_id", "value"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # independent draw under a different salt
    got2 = stratified_sample(rd.from_arrow(tab), "user_id", 3,
                             id_col="event_id", salt="s2").to_pandas()
    assert set(got2["event_id"]) != set(got["event_id"])


# -------------------------------------------------------- distinct count


def test_distinct_count_matches_duckdb():
    from dcpray.functions.agg import distinct_count

    rng = np.random.RandomState(4)
    n = 3000
    day = rng.randint(0, 7, n).astype(np.int64)
    user = rng.randint(0, 40, n).astype(np.int64)
    # null values + a null key group
    tab = pa.table({
        "day": pa.array(np.where(np.arange(n) % 97 == 0, None, day),
                        pa.int64(), from_pandas=True),
        "user_id": pa.array(
            np.where(np.arange(n) % 13 == 0, None, user),
            pa.int64(), from_pandas=True),
    })
    got = distinct_count(rd.from_arrow(tab).repartition(6), ["day"],
                         "user_id", alias="users").to_pandas()
    exp = duckdb.sql("SELECT day, count(DISTINCT user_id) AS users "
                     "FROM tab GROUP BY day").df()
    a = got.sort_values("day").reset_index(drop=True)
    b = exp.sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype("float64"), b.astype("float64"))


# ------------------------------------------------------- exact quantiles


@pytest.mark.parametrize("dist", ["uniform", "heavy_dupes", "lognormal"])
def test_exact_quantiles_match_duckdb(dist):
    from dcpray.functions.agg import exact_quantiles

    rng = np.random.RandomState(8)
    if dist == "uniform":
        v = rng.rand(5000) * 100
    elif dist == "heavy_dupes":
        v = np.repeat([1.0, 2.0, 2.0, 3.0, 50.0], 1000)[rng.permutation(5000)]
    else:
        v = rng.lognormal(0, 2, 5000)
    vals = np.where(np.arange(5000) % 11 == 0, np.nan, v)
    tab = pa.table({"value": pa.array(vals, pa.float64(), from_pandas=True)})
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(rd.from_arrow(tab).repartition(6), "value", qs,
                          bins=256).to_pandas()
    exp = duckdb.sql(
        f"SELECT quantile_disc(value, {qs}) AS v FROM tab").fetchone()[0]
    assert got["value"].tolist() == pytest.approx(list(exp), abs=0)


def test_exact_quantiles_edge_cases():
    from dcpray.functions.agg import exact_quantiles

    empty = pa.table({"value": pa.array([], pa.float64())})
    out = exact_quantiles(rd.from_arrow(empty), "value", [0.5]).to_pandas()
    assert out["value"].isna().all()
    const = pa.table({"value": pa.array([7.0] * 50)})
    out = exact_quantiles(rd.from_arrow(const), "value", [0.1, 0.9]).to_pandas()
    assert out["value"].tolist() == [7.0, 7.0]


# -------------------------------------------------------- hopping window


def test_hopping_window_matches_duckdb():
    from dcpray.functions.window import hopping_window

    rng = np.random.RandomState(14)
    n = 4000
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.randint(0, 3 * 86400, n), unit="s")
    tsv = pd.Series(ts)
    tsv[::173] = pd.NaT  # null ts must drop
    tab = pa.table({"ts": pa.array(tsv, pa.timestamp("us"), from_pandas=True),
                    "value": pa.array(rng.rand(n))})
    got = hopping_window(rd.from_arrow(tab).repartition(5), "ts",
                         size_s=1800, hop_s=600,
                         aggs=[("ts", "count", "n_events"),
                               ("value", "sum", "sum_value")]).to_pandas()
    exp = duckdb.sql("""
        SELECT w AS window_start, count(*) AS n_events,
               sum(value) AS sum_value
        FROM (SELECT make_timestamp(
                  (epoch_us(ts) // 600000000) * 600000000
                  - j * 600000000) AS w, value
              FROM tab CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
              WHERE ts IS NOT NULL)
        GROUP BY w""").df()
    a = got.sort_values("window_start").reset_index(drop=True)
    b = exp.sort_values("window_start").reset_index(drop=True)
    assert a["window_start"].tolist() == b["window_start"].tolist()
    assert a["n_events"].tolist() == b["n_events"].tolist()
    assert a["sum_value"].to_numpy() == pytest.approx(
        b["sum_value"].to_numpy(), rel=1e-12)


def test_hopping_window_rejects_non_multiple():
    from dcpray.functions.window import hopping_window

    tab = pa.table({"ts": pa.array([0, 1], pa.int64())})
    with pytest.raises(Exception, match="multiple"):
        hopping_window(rd.from_arrow(tab), "ts", size_s=7, hop_s=3) \
            .materialize()


# ------------------------------------------------------------- k-means


def _lloyd_reference(x, cents, iters, metric):
    from dcpray.functions.ann import _normalize

    c = cents.copy()
    if metric == "cosine":
        c = _normalize(c)
    for _ in range(iters):
        if metric == "cosine":
            a = (_normalize(x) @ c.T).argmax(axis=1)
        else:
            a = (x @ c.T - 0.5 * (c * c).sum(axis=1)).argmax(axis=1)
        for i in range(len(c)):
            m = a == i
            if m.any():
                c[i] = x[m].mean(axis=0)
        if metric == "cosine":
            c = _normalize(c)
    return c


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_kmeans_matches_numpy_reference(metric):
    from dcpray.functions.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(5)
    k, dim, n = 4, 8, 1000
    centers = rng.randn(k, dim) * 5
    x = (centers[rng.randint(0, k, n)] + rng.randn(n, dim)).astype(np.float64)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(tab).repartition(5)
    init = x[:k].copy()
    got = kmeans_fit(ds, k=k, iters=6, metric=metric, init=init)
    exp = _lloyd_reference(x, init, 6, metric)
    np.testing.assert_allclose(got, exp, atol=1e-8)
    # assignment agrees with the reference assignment
    if metric == "cosine":
        from dcpray.functions.ann import _normalize
        ref_assign = (_normalize(x) @ exp.T).argmax(axis=1)
    else:
        ref_assign = (x @ exp.T - 0.5 * (exp * exp).sum(axis=1)).argmax(axis=1)
    adf = kmeans_assign(ds, got, metric=metric).to_pandas() \
        .sort_values("vec_id")
    assert (adf["cluster"].to_numpy() == ref_assign).all()


def test_kmeans_deterministic_init():
    from dcpray.functions.kmeans import kmeans_fit

    rng = np.random.RandomState(6)
    n = 300
    x = rng.randn(n, 4)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(x), pa.list_(pa.float64())),
    })
    a = kmeans_fit(rd.from_arrow(tab).repartition(3), k=3, iters=2)
    b = kmeans_fit(rd.from_arrow(tab).repartition(7), k=3, iters=2)
    np.testing.assert_allclose(a, b, atol=1e-9)


# ------------------------------------------------- distributed hash join


def _hj_fixtures():
    lt = pa.table({
        "k1": pa.array([1, 1, 2, None, 3, 4, 4, 4], pa.int64()),
        "k2": pa.array(["a", "b", "a", "a", None, "a", "a", "b"]),
        "lv": pa.array(np.arange(8, dtype=np.int64)),
    })
    rt = pa.table({
        "rk1": pa.array([1, 2, None, 3, 4, 4], pa.int32()),  # int32: cast path
        "rk2": pa.array(["a", "a", "a", None, "a", "a"]),
        "rv": pa.array([100.0, 200.0, 300.0, 400.0, 500.0, 501.0]),
    })
    return lt, rt


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT lt.k1, lt.k2, lt.lv, rt.rv FROM lt JOIN rt "
              "ON lt.k1 = rt.rk1 AND lt.k2 = rt.rk2"),
    ("left", "SELECT lt.k1, lt.k2, lt.lv, rt.rv FROM lt LEFT JOIN rt "
             "ON lt.k1 = rt.rk1 AND lt.k2 = rt.rk2"),
    ("semi", "SELECT lt.k1, lt.k2, lt.lv FROM lt WHERE EXISTS "
             "(SELECT 1 FROM rt WHERE lt.k1 = rt.rk1 AND lt.k2 = rt.rk2)"),
    ("anti", "SELECT lt.k1, lt.k2, lt.lv FROM lt WHERE NOT EXISTS "
             "(SELECT 1 FROM rt WHERE lt.k1 = rt.rk1 AND lt.k2 = rt.rk2)"),
])
def test_hash_join_matches_duckdb(how, sql):
    """Multi-column keys, SQL null-key semantics (anti KEEPS null-key
    left rows), one-to-many fanout, int32 -> int64 right-key cast."""
    from dcpray.functions.join import hash_join

    lt, rt = _hj_fixtures()
    out = hash_join(rd.from_arrow(lt).repartition(3),
                    rd.from_arrow(rt).repartition(2),
                    on=["k1", "k2"], right_on=["rk1", "rk2"], how=how,
                    partitions=4).to_pandas()
    exp = duckdb.sql(sql).df()
    cols = sorted(exp.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype("object").fillna("~"),
                                  b.astype("object").fillna("~"))


def test_hash_join_agrees_with_broadcast_join():
    from dcpray.functions.join import broadcast_join, hash_join

    lt, rt0 = _join_fixtures()
    a = hash_join(rd.from_arrow(lt).repartition(4),
                  rd.from_arrow(rt0).repartition(2), on="k",
                  how="left", partitions=4).to_pandas()
    b = broadcast_join(rd.from_arrow(lt).repartition(4), rt0,
                       on="k", how="left").to_pandas()
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True).astype("float64"),
        b[cols].sort_values(cols).reset_index(drop=True).astype("float64"))


def test_hash_join_validates():
    from dcpray.functions.join import hash_join

    lt, rt = _hj_fixtures()
    # "full" became a supported mode in round 5; "cross" stays invalid
    with pytest.raises(ValueError, match="how"):
        hash_join(rd.from_arrow(lt), rd.from_arrow(rt), on="k1",
                  right_on="rk1", how="cross")
    rt_bad = pa.table({"k1": pa.array([1], pa.int64()),
                       "lv": pa.array([7], pa.int64())})
    with pytest.raises(ValueError, match="collides"):
        hash_join(rd.from_arrow(lt), rd.from_arrow(rt_bad), on="k1")


# -------------------------------------------------- text normalization


def test_normalize_text_matches_duckdb_unicode():
    from dcpray.functions.textprep import normalize_text

    texts = ["Héllo   World\t x", "éclair  ", "ＡＢＣ ｄｅｆ", None, "",
             "MiXeD\n\nCase\r\n end", "ﬁn ﬂight", "ΣΊΣΥΦΟΣ"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = normalize_text(rd.from_arrow(tab).repartition(3), "text",
                         out_col="norm").to_pandas().sort_values("doc_id")
    exp = duckdb.sql(r"""
        SELECT doc_id,
               trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ',
                                   'g')) AS norm
        FROM tab ORDER BY doc_id""").df()
    assert out["norm"].fillna("~").tolist() == exp["norm"].fillna("~").tolist()
    # combining accent actually composed, fullwidth preserved by NFC
    assert out["norm"].iloc[1] == "éclair"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hash_join_randomized_property(seed):
    """Randomized fixtures (duplicate keys both sides, nulls, skewed
    key 7) across all four modes vs DuckDB."""
    from dcpray.functions.join import hash_join

    rng = np.random.RandomState(seed)
    nl, nr = 400, 150
    lk = rng.randint(0, 20, nl).astype("float64")
    lk[rng.rand(nl) < 0.05] = np.nan
    lk[rng.rand(nl) < 0.15] = 7  # hot key
    rk = rng.randint(0, 25, nr).astype("float64")
    rk[rng.rand(nr) < 0.05] = np.nan
    lt = pa.table({"k": pa.array([None if np.isnan(x) else int(x) for x in lk],
                                 pa.int64()),
                   "lv": pa.array(np.arange(nl, dtype=np.int64))})
    rt = pa.table({"k": pa.array([None if np.isnan(x) else int(x) for x in rk],
                                 pa.int64()),
                   "rv": pa.array(rng.rand(nr))})
    sqls = {
        "inner": "SELECT lt.k, lt.lv, rt.rv AS rv FROM lt JOIN rt ON lt.k = rt.k",
        "left": "SELECT lt.k, lt.lv, rt.rv AS rv FROM lt LEFT JOIN rt ON lt.k = rt.k",
        "semi": "SELECT lt.k, lt.lv FROM lt WHERE EXISTS "
                "(SELECT 1 FROM rt WHERE lt.k = rt.k)",
        "anti": "SELECT lt.k, lt.lv FROM lt WHERE NOT EXISTS "
                "(SELECT 1 FROM rt WHERE lt.k = rt.k)",
    }
    for how, sql in sqls.items():
        out = hash_join(rd.from_arrow(lt).repartition(5),
                        rd.from_arrow(rt).repartition(3),
                        on="k", right_cols={"rv": "rv"} if how in
                        ("inner", "left") else None,
                        how=how, partitions=7).to_pandas()
        exp = duckdb.sql(sql).df()
        cols = sorted(exp.columns)
        a = out[cols].sort_values(cols).reset_index(drop=True)
        b = exp[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a.astype("float64"), b.astype("float64"),
            check_exact=False, rtol=0, atol=0, obj=how)


# --------------------------------------------------------------- tf-idf


def test_tfidf_top_terms_matches_duckdb_bit_exact():
    """Full pipeline (explode -> df coarse_groupby -> idf hash_join ->
    topk) vs SQL, INCLUDING exact float equality: the score uses only
    IEEE division/multiplication, so both engines produce identical
    bits and near-tie ranks cannot flip."""
    from dcpray.functions.textprep import tfidf_top_terms

    rng = np.random.RandomState(5)
    vocab = [f"w{i:02d}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 25)).tolist())
             + " Punct!" for _ in range(200)] + [None, "", "   ", "zz zz zz"]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    out = tfidf_top_terms(rd.from_arrow(tab).repartition(6), k=3,
                          partitions=8).to_pandas()
    out = out.sort_values(["doc_id", "tfidf", "term"],
                          ascending=[True, False, True]).reset_index(drop=True)
    exp = duckdb.sql(r"""
WITH toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) t
    FROM tab) WHERE t <> ''
), counts AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) cnt FROM toks GROUP BY 1, 2
), dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) doc_len FROM toks GROUP BY 1),
df AS (SELECT term, CAST(count(*) AS BIGINT) df FROM counts GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) n_docs FROM toks),
scored AS (
  SELECT c.doc_id, c.term, c.cnt, dl.doc_len, df.df,
         (c.cnt / dl.doc_len) * ((n.n_docs + 1) / (df.df + 1)) tfidf
  FROM counts c JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n)
SELECT doc_id, term, cnt, doc_len, df, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY tfidf DESC, term) rn FROM scored) WHERE rn <= 3
ORDER BY doc_id, tfidf DESC, term""").df()
    cols = ["doc_id", "term", "cnt", "doc_len", "df"]
    for c in cols:
        assert (out[c].astype(str).values == exp[c].astype(str).values).all(), c
    assert (out["tfidf"].values == exp["tfidf"].values).all()


def test_hash_join_bloom_prefilter_equivalent_and_prunes():
    """bloom_prefilter must not change results (false positives only
    waste shuffle), and the bitset itself must prune non-matching keys."""
    from dcpray.functions.agg import _hash_key_columns
    from dcpray.functions.join import (_bloom_contains, build_key_bloom,
                                       hash_join)

    rng = np.random.RandomState(3)
    lt = pa.table({"k": pa.array(rng.randint(0, 10_000, 3000), pa.int64()),
                   "lv": pa.array(np.arange(3000, dtype=np.int64))})
    rt = pa.table({"k": pa.array(rng.randint(0, 100, 200), pa.int64()),
                   "rv": pa.array(rng.rand(200))})
    for how in ("inner", "semi"):
        a = hash_join(rd.from_arrow(lt).repartition(4),
                      rd.from_arrow(rt).repartition(2), on="k", how=how,
                      partitions=4).to_pandas()
        b = hash_join(rd.from_arrow(lt).repartition(4),
                      rd.from_arrow(rt).repartition(2), on="k", how=how,
                      partitions=4, bloom_prefilter=True,
                      bloom_bits=1 << 14).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True), obj=how)
    # direct bitset check: keys >= 100 are absent from the right side —
    # the filter keeps all 100 present keys and drops almost all others
    bloom = build_key_bloom(rd.from_arrow(rt).repartition(2), ["k"],
                            nbits=1 << 14)
    probe = pa.table({"k": pa.array(np.arange(10_000, dtype=np.int64))})
    ok = _bloom_contains(bloom, _hash_key_columns(probe, ["k"]), 1 << 14)
    present = set(rt["k"].to_pylist())
    assert all(ok[k] for k in present)
    fpr = (ok.sum() - len(present)) / (10_000 - len(present))
    assert fpr < 0.02, fpr


def test_hash_join_bloom_rejects_outer_modes():
    from dcpray.functions.join import hash_join

    lt = pa.table({"k": pa.array([1], pa.int64())})
    rt = pa.table({"k": pa.array([1], pa.int64()), "rv": pa.array([1.0])})
    with pytest.raises(ValueError, match="bloom"):
        hash_join(rd.from_arrow(lt), rd.from_arrow(rt), on="k", how="left",
                  bloom_prefilter=True)


def test_hash_join_skew_equals_plain_and_duckdb():
    """Skewed fixture (key 7 is ~half the left side): the hot/cold
    split must produce exactly the plain hash_join / SQL result, for
    inner and left, including null keys routed to the cold path."""
    from dcpray.functions.join import hash_join, hash_join_skew

    rng = np.random.RandomState(9)
    nl = 4000
    keys = rng.randint(0, 50, nl)
    keys[: nl // 2] = 7  # hot key
    lk = [None if rng.rand() < 0.02 else int(x) for x in keys]
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lv": pa.array(np.arange(nl, dtype=np.int64))})
    rt = pa.table({"k": pa.array(list(range(0, 40)) + [7, 7], pa.int64()),
                   "rv": pa.array(rng.rand(42))})
    for how in ("inner", "left"):
        a = hash_join_skew(rd.from_arrow(lt).repartition(5),
                           rd.from_arrow(rt).repartition(2), on="k",
                           how=how, partitions=4,
                           hot_threshold=500).to_pandas()
        b = hash_join(rd.from_arrow(lt).repartition(5),
                      rd.from_arrow(rt).repartition(2), on="k",
                      how=how, partitions=4).to_pandas()
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True)
            .astype("float64"),
            b[cols].sort_values(cols).reset_index(drop=True)
            .astype("float64"), obj=how)
    # no hot keys above threshold -> same result via the plain path
    c = hash_join_skew(rd.from_arrow(lt).repartition(5),
                       rd.from_arrow(rt).repartition(2), on="k",
                       how="inner", partitions=4,
                       hot_threshold=10**9).to_pandas()
    assert len(c) == len(duckdb.sql(
        "SELECT * FROM lt JOIN rt ON lt.k = rt.k").df())


def test_hash_join_skew_guards():
    from dcpray.functions.join import hash_join_skew

    lt = pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                   "lv": pa.array(np.arange(100, dtype=np.int64))})
    rt = pa.table({"k": pa.array([1], pa.int64()), "rv": pa.array([1.0])})
    with pytest.raises(ValueError, match="uniformly heavy"):
        hash_join_skew(rd.from_arrow(lt), rd.from_arrow(rt), on="k",
                       hot_threshold=1, max_hot_keys=5)
    with pytest.raises(ValueError, match="single join key"):
        hash_join_skew(rd.from_arrow(lt), rd.from_arrow(rt),
                       on=["k", "lv"], right_on=["k", "rv"])


def test_rolling_agg_vs_duckdb_windows():
    """Moving sum/mean/count/min/max over trailing N rows per key must
    match SQL ROWS BETWEEN N-1 PRECEDING AND CURRENT ROW, including
    groups shorter than the window and duplicate order values broken
    by the tiebreak."""
    from dcpray.functions.window import rolling_agg

    rng = np.random.RandomState(11)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.randint(0, 40, n), pa.int64()),
        "o": pa.array(rng.randint(0, 500, n), pa.int64()),  # dup orders
        "tb": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.randint(-100, 100, n).astype(np.float64)),
    })
    out = rolling_agg(rd.from_arrow(t).repartition(5), "k", "o", "v",
                      window=7, tiebreak_col="tb",
                      aggs=("sum", "mean", "count", "min", "max"),
                      partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT k, o, tb, v,
               SUM(v)   OVER w AS rolling_sum,
               AVG(v)   OVER w AS rolling_mean,
               COUNT(v) OVER w AS rolling_count,
               MIN(v)   OVER w AS rolling_min,
               MAX(v)   OVER w AS rolling_max
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o, tb
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """).df()
    cols = ["k", "o", "tb", "v", "rolling_sum", "rolling_mean",
            "rolling_count", "rolling_min", "rolling_max"]
    a = out[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a.astype("float64"), b.astype("float64"))


def test_rolling_agg_window_one_and_guards():
    from dcpray.functions.window import rolling_agg

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "o": pa.array([1, 2, 1], pa.int64()),
                  "v": pa.array([5.0, 7.0, 9.0])})
    out = rolling_agg(rd.from_arrow(t), "k", "o", "v", window=1,
                      tiebreak_col="o").to_pandas().sort_values(["k", "o"])
    assert (out["rolling_sum"].to_numpy() == [5.0, 7.0, 9.0]).all()
    with pytest.raises(ValueError, match="window"):
        rolling_agg(rd.from_arrow(t), "k", "o", "v", window=0,
                    tiebreak_col="o")
    with pytest.raises(ValueError, match="unsupported"):
        rolling_agg(rd.from_arrow(t), "k", "o", "v", window=2,
                    tiebreak_col="o", aggs=("median",))


def test_assemble_groups_vs_duckdb_string_agg():
    """Ordered per-group assembly must equal SQL string_agg(... ORDER
    BY), including dropped null texts, all-null groups yielding NULL,
    and the label prefix form."""
    from dcpray.functions.textprep import assemble_groups

    rng = np.random.RandomState(13)
    n = 1200
    texts = [None if rng.rand() < 0.08 else f"msg{i}" for i in range(n)]
    t = pa.table({
        "conv": pa.array(rng.randint(0, 60, n), pa.int64()),
        "turn": pa.array(np.arange(n, dtype=np.int64)),
        "role": pa.array(["user" if i % 2 else "assistant"
                          for i in range(n)]),
        "text": pa.array(texts, pa.string()),
    })
    # one all-null conversation
    t = pa.concat_tables([t, pa.table({
        "conv": pa.array([999, 999], pa.int64()),
        "turn": pa.array([0, 1], pa.int64()),
        "role": pa.array(["user", "assistant"]),
        "text": pa.array([None, None], pa.string()),
    })])
    out = assemble_groups(rd.from_arrow(t).repartition(6), "conv", "turn",
                          "text", sep="\n", label_col="role",
                          partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT conv,
               string_agg(role || ': ' || text, chr(10) ORDER BY turn)
                 AS assembled,
               count(role || ': ' || text) AS n_items,
               coalesce(length(string_agg(role || ': ' || text, chr(10)
                 ORDER BY turn)), 0) AS n_chars
        FROM t GROUP BY conv
    """).df()
    cols = ["conv", "assembled", "n_items", "n_chars"]
    a = out[cols].sort_values("conv").reset_index(drop=True)
    b = ora[cols].sort_values("conv").reset_index(drop=True)
    assert a["assembled"].isna().equals(b["assembled"].isna())
    pd.testing.assert_frame_equal(a.fillna(""), b.fillna(""),
                                  check_dtype=False)
    # plain (no label) form
    out2 = assemble_groups(rd.from_arrow(t), "conv", "turn", "text",
                           sep="|").to_pandas()
    ora2 = duckdb.sql("""
        SELECT conv, string_agg(text, '|' ORDER BY turn) AS assembled
        FROM t GROUP BY conv""").df()
    m = out2.merge(ora2, on="conv", suffixes=("", "_o"))
    assert len(m) == len(ora2)
    assert m["assembled"].fillna("").equals(m["assembled_o"].fillna(""))


def test_quantiles_per_group_vs_duckdb():
    """Per-group exact quantiles must equal quantile_disc GROUP BY for
    int and string keys, with null values dropped first (groups of all
    nulls absent, matching WHERE v IS NOT NULL)."""
    from dcpray.functions.agg import quantiles_per_group

    rng = np.random.RandomState(17)
    n = 5000
    vals = rng.randn(n) * 100
    vals[rng.rand(n) < 0.05] = np.nan
    t = pa.table({
        "k": pa.array([f"g{x}" for x in rng.randint(0, 30, n)]),
        "v": pa.array([None if np.isnan(x) else float(x) for x in vals],
                      pa.float64()),
    })
    out = quantiles_per_group(rd.from_arrow(t).repartition(4), "k", "v",
                              qs=[0.0, 0.25, 0.5, 0.9, 1.0],
                              partitions=8).to_pandas()
    ora = duckdb.sql(" UNION ALL ".join(
        f"SELECT k, {q} AS q, quantile_disc(v, {q}) AS value "
        "FROM t WHERE v IS NOT NULL GROUP BY k"
        for q in (0.0, 0.25, 0.5, 0.9, 1.0))).df()
    a = out.sort_values(["k", "q"]).reset_index(drop=True)
    b = ora.sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    with pytest.raises(ValueError, match="fractions"):
        quantiles_per_group(rd.from_arrow(t), "k", "v", qs=[1.5])


def _contam_fixture():
    rng = np.random.RandomState(23)
    base = ["the quick brown fox jumps over the lazy dog again and again",
            "a completely different sentence about ray data pipelines",
            "benchmark question: what is the capital of france exactly",
            "numbers and symbols 1 2 3 4 5 6 7 8 9 10 11 12"]
    corpus = []
    for i in range(300):
        b = base[i % len(base)]
        if i % 7 == 0:
            corpus.append(b)                       # verbatim copy
        elif i % 7 == 1:
            corpus.append("prefix words " + b)     # contains the 8-grams
        elif i == 5:
            corpus.append(None)                    # null corpus text
        else:
            corpus.append(f"unique doc {i} " + " ".join(
                rng.choice(list("abcdefgh"), 12)))
    bench = pa.table({
        "doc_id": pa.array(np.arange(len(base) + 1, dtype=np.int64)),
        "text": pa.array(base + [None], pa.string()),  # null bench text
    })
    corp = pa.table({"doc_id": pa.array(np.arange(len(corpus), dtype=np.int64)),
                     "text": pa.array(corpus)})
    return corp, bench


def test_exact_contamination_vs_join():
    from dcpray.functions.decontam import exact_contamination

    corp, bench = _contam_fixture()
    out = exact_contamination(rd.from_arrow(corp).repartition(4),
                              rd.from_arrow(bench)).to_pandas()
    ora = duckdb.sql("""
        SELECT c.* FROM corp c
        WHERE c.text IN (SELECT text FROM bench)""").df()
    assert sorted(out["doc_id"]) == sorted(ora["doc_id"])


def test_ngram_contamination_vs_duckdb():
    from dcpray.functions.decontam import ngram_contamination

    corp, bench = _contam_fixture()
    out = ngram_contamination(rd.from_arrow(corp).repartition(4),
                              rd.from_arrow(bench), n=8).to_pandas()
    ora = duckdb.sql("""
        WITH sc AS (
          SELECT doc_id, list_distinct(list_transform(
            generate_series(1, greatest(len(w) - 7, 0)),
            i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                 w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7])) g
          FROM (SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '') w
                FROM corp)),
        sb AS (
          SELECT DISTINCT unnest(list_transform(
            generate_series(1, greatest(len(w) - 7, 0)),
            i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||
                 w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7])) ng
          FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') w
                FROM bench))
        SELECT c.doc_id, count(*) AS n_shared
        FROM (SELECT doc_id, unnest(g) AS ng FROM sc) c
        JOIN sb ON c.ng = sb.ng
        GROUP BY c.doc_id""").df()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = ora.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # min_shared raises the bar
    strict = ngram_contamination(rd.from_arrow(corp), rd.from_arrow(bench),
                                 n=8, min_shared=4).to_pandas()
    assert set(strict["doc_id"]) == set(b[b["n_shared"] >= 4]["doc_id"])


def test_contamination_guards():
    from dcpray.functions.decontam import ngram_contamination

    corp, bench = _contam_fixture()
    with pytest.raises(ValueError, match="small side"):
        ngram_contamination(rd.from_arrow(bench), rd.from_arrow(corp),
                            n=2, max_bench_ngrams=10)
    with pytest.raises(ValueError, match="min_shared"):
        ngram_contamination(rd.from_arrow(corp), rd.from_arrow(bench),
                            min_shared=0)


def test_lag_lead_vs_duckdb():
    from dcpray.functions.window import lag_lead

    rng = np.random.RandomState(29)
    n = 2500
    t = pa.table({
        "k": pa.array(rng.randint(0, 35, n), pa.int64()),
        "o": pa.array(rng.randint(0, 400, n), pa.int64()),
        "tb": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array([None if rng.rand() < 0.05 else float(x)
                       for x in rng.randn(n)], pa.float64()),
    })
    out = lag_lead(rd.from_arrow(t).repartition(5), "k", "o", "v",
                   tiebreak_col="tb", lags=(1, 3), leads=(2,),
                   partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT k, o, tb, v,
               LAG(v, 1)  OVER w AS lag_1,
               LAG(v, 3)  OVER w AS lag_3,
               LEAD(v, 2) OVER w AS lead_2
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o, tb)""").df()
    cols = ["k", "o", "tb", "v", "lag_1", "lag_3", "lead_2"]
    a = out[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="offsets"):
        lag_lead(rd.from_arrow(t), "k", "o", "v", tiebreak_col="tb",
                 lags=(0,))


def test_ntile_vs_duckdb():
    from dcpray.functions.window import ntile_in_group

    rng = np.random.RandomState(31)
    n = 2600
    t = pa.table({
        "k": pa.array(rng.randint(0, 50, n), pa.int64()),  # uneven groups
        "o": pa.array(rng.randint(0, 300, n), pa.int64()),
        "tb": pa.array(np.arange(n, dtype=np.int64)),
    })
    for nt, desc in ((4, False), (7, True), (1, False)):
        out = ntile_in_group(rd.from_arrow(t).repartition(5), "k", "o",
                             tiebreak_col="tb", n=nt, descending=desc,
                             partitions=8).to_pandas()
        d = "DESC" if desc else "ASC"
        ora = duckdb.sql(f"""
            SELECT k, o, tb, NTILE({nt}) OVER (
              PARTITION BY k ORDER BY o {d}, tb) AS ntile
            FROM t""").df()
        cols = ["k", "o", "tb", "ntile"]
        a = out[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
        b = ora[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()),
                                      obj=f"ntile{nt}-{d}")
    with pytest.raises(ValueError, match=">= 1"):
        ntile_in_group(rd.from_arrow(t), "k", "o", tiebreak_col="tb", n=0)


def test_histogram_vs_duckdb():
    from dcpray.functions.agg import histogram

    rng = np.random.RandomState(37)
    vals = np.r_[rng.randn(4000) * 10, [0.0, 50.0, -50.0, 49.9999]]
    t = pa.table({"v": pa.array(
        [None if rng.rand() < 0.03 else float(x) for x in vals],
        pa.float64())})
    out = histogram(rd.from_arrow(t).repartition(6), "v",
                    lo=-50.0, hi=50.0, bins=20).to_pandas()
    ora = duckdb.sql("""
        SELECT least(CAST(floor((v + 50.0) / 5.0) AS BIGINT), 19) AS bin,
               count(*) AS count
        FROM t WHERE v IS NOT NULL AND v >= -50.0 AND v <= 50.0
        GROUP BY 1""").df()
    m = out.merge(ora, on="bin", how="left", suffixes=("", "_o"))
    m["count_o"] = m["count_o"].fillna(0).astype("int64")
    assert (m["count"] == m["count_o"]).all()
    assert out["count"].sum() == ora["count"].sum()
    assert len(out) == 20 and (out["hi"] - out["lo"]).round(9).nunique() == 1
    with pytest.raises(ValueError, match="finite"):
        histogram(rd.from_arrow(t), "v", lo=5.0, hi=5.0)


def test_pack_sequences_invariants_and_determinism():
    from dcpray.functions.textprep import pack_sequences

    rng = np.random.RandomState(41)
    n = 3000
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "n_tokens": pa.array(np.r_[rng.randint(1, 400, n - 2),
                                   [900, 1]].astype(np.int64)),  # oversize
    })
    out = pack_sequences(rd.from_arrow(t).repartition(7), "n_tokens",
                         budget=512, partitions=8).to_pandas()
    assert len(out) == n and out["doc_id"].nunique() == n
    g = out.groupby("pack_id")["n_tokens"]
    sums, cnts = g.sum(), g.count()
    # a pack exceeds the budget only when it is a single oversize doc
    over = sums[sums > 512]
    assert (cnts[over.index] == 1).all()
    # pack id is the smallest doc id in the pack
    mins = out.groupby("pack_id")["doc_id"].min()
    assert (mins.index == mins.values).all()
    # deterministic under a different input layout
    out2 = pack_sequences(rd.from_arrow(t).repartition(2), "n_tokens",
                          budget=512, partitions=8).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # packing efficiency: most packs close to full on uniform tokens
    norm = sums[sums <= 512]
    assert norm.mean() > 512 * 0.6
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(rd.from_arrow(t), "n_tokens", budget=0)


def test_rollup_vs_duckdb():
    from dcpray.functions.agg import rollup

    rng = np.random.RandomState(43)
    nr = 4000
    t = pa.table({
        "a": pa.array([f"t{x}" for x in rng.randint(0, 5, nr)]),
        "b": pa.array(rng.randint(0, 30, nr), pa.int64()),
        "eid": pa.array(np.arange(nr, dtype=np.int64)),
        "v": pa.array(rng.randint(-50, 50, nr), pa.int64()),
    })
    out = rollup(rd.from_arrow(t).repartition(5), ["a", "b"],
                 [("eid", "count", "n"), ("v", "sum", "sum_v"),
                  ("v", "mean", "mean_v")], partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT a, b, grouping_id(a, b) AS gid, count(eid) AS n,
               CAST(sum(v) AS BIGINT) AS sum_v, avg(v) AS mean_v
        FROM t GROUP BY ROLLUP(a, b)""").df()
    cols = ["a", "b", "gid", "n", "sum_v", "mean_v"]
    a = out[cols].sort_values(["gid", "a", "b"]).reset_index(drop=True)
    b = ora[cols].sort_values(["gid", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    with pytest.raises(ValueError, match="at least one key"):
        rollup(rd.from_arrow(t), [], [("v", "sum", "s")])


def test_melt_vs_duckdb():
    from dcpray.functions.agg import melt

    rng = np.random.RandomState(47)
    n = 800
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "a": pa.array(rng.rand(n)),
        "b": pa.array([None if rng.rand() < 0.1 else float(x)
                       for x in rng.rand(n)], pa.float64()),
        "c": pa.array(rng.randint(0, 9, n), pa.int64()),
    })
    out = melt(rd.from_arrow(t).repartition(4), ["id"],
               ["a", "b", "c"]).to_pandas()
    ora = duckdb.sql("""
        SELECT id, 'a' AS name, a AS value FROM t
        UNION ALL SELECT id, 'b', b FROM t
        UNION ALL SELECT id, 'c', CAST(c AS DOUBLE) FROM t""").df()
    cols = ["id", "name", "value"]
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(out) == 3 * n


def test_pivot_vs_duckdb():
    from dcpray.functions.agg import melt, pivot

    rng = np.random.RandomState(53)
    n = 1500
    t = pa.table({
        "k": pa.array(rng.randint(0, 40, n), pa.int64()),
        "name": pa.array(rng.choice(["a", "b", "c", "zz"], n)),
        "v": pa.array(rng.randint(-9, 9, n).astype(np.float64)),
    })
    out = pivot(rd.from_arrow(t).repartition(5), "k", "name", "v",
                names=["a", "b", "c"], agg="sum", partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT k, sum(CASE WHEN name='a' THEN v END) AS a,
               sum(CASE WHEN name='b' THEN v END) AS b,
               sum(CASE WHEN name='c' THEN v END) AS c
        FROM t GROUP BY k""").df()
    cols = ["k", "a", "b", "c"]
    x = out[cols].sort_values("k").reset_index(drop=True)
    y = ora[cols].sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(x, y)
    # melt(pivot(x)) round-trips the aggregated values
    back = melt(rd.from_arrow(pa.Table.from_pandas(x)), ["k"],
                ["a", "b", "c"]).to_pandas()
    assert len(back) == 3 * len(x)
    # count semantics: matched AND value non-null, like count(CASE ...)
    t2 = t.set_column(2, "v", pa.array(
        [None if i % 5 == 0 else float(i) for i in range(len(t))],
        pa.float64()))
    oc = pivot(rd.from_arrow(t2), "k", "name", "v", names=["a", "b"],
               agg="count").to_pandas()
    oo = duckdb.sql("""
        SELECT k, count(CASE WHEN name='a' THEN v END) AS a,
               count(CASE WHEN name='b' THEN v END) AS b
        FROM t2 GROUP BY k""").df()
    xc = oc.sort_values("k").reset_index(drop=True)
    yc = oo.sort_values("k").reset_index(drop=True).astype(
        xc.dtypes.to_dict())
    pd.testing.assert_frame_equal(xc, yc)
    with pytest.raises(ValueError, match="unsupported"):
        pivot(rd.from_arrow(t), "k", "name", "v", names=["a"], agg="median")


def test_forward_fill_vs_duckdb():
    from dcpray.functions.window import forward_fill

    rng = np.random.RandomState(59)
    n = 2200
    t = pa.table({
        "k": pa.array(rng.randint(0, 45, n), pa.int64()),
        "o": pa.array(rng.randint(0, 300, n), pa.int64()),
        "tb": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array([None if rng.rand() < 0.4 else float(x)
                       for x in rng.randn(n)], pa.float64()),
    })
    out = forward_fill(rd.from_arrow(t).repartition(5), "k", "o", "v",
                       tiebreak_col="tb", out_col="v_ff",
                       partitions=8).to_pandas()
    ora = duckdb.sql("""
        SELECT k, o, tb, v,
               last_value(v IGNORE NULLS) OVER (
                 PARTITION BY k ORDER BY o, tb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        FROM t""").df()
    cols = ["k", "o", "tb", "v", "v_ff"]
    a = out[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    b = ora[cols].sort_values(["k", "o", "tb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # in-place fill (out_col=None) keeps schema, fills the same values
    inp = forward_fill(rd.from_arrow(t), "k", "o", "v",
                       tiebreak_col="tb").to_pandas()
    m = inp.sort_values(["k", "o", "tb"]).reset_index(drop=True)
    assert m["v"].equals(b["v_ff"])


def test_pack_sequences_grouped_never_crosses_groups():
    from dcpray.functions.textprep import pack_sequences

    rng = np.random.RandomState(61)
    n = 2400
    t = pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "n_tokens": pa.array(rng.randint(1, 300, n).astype(np.int64)),
        "split": pa.array(rng.choice(["train", "val", "test"], n)),
    })
    out = pack_sequences(rd.from_arrow(t).repartition(6), "n_tokens",
                         budget=512, group_col="split",
                         partitions=8).to_pandas()
    assert len(out) == n
    g = out.groupby("pack_id")
    # one split per pack, budget bound holds
    assert (g["split"].nunique() == 1).all()
    sums, cnts = g["n_tokens"].sum(), g["n_tokens"].count()
    assert (cnts[sums[sums > 512].index] == 1).all()
    # deterministic under different layout
    out2 = pack_sequences(rd.from_arrow(t).repartition(2), "n_tokens",
                          budget=512, group_col="split",
                          partitions=8).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------ review-fix regressions


def test_pivot_mean_ignores_unmatched_rows():
    """Review fix: mean must divide by the VALID count (avg(CASE WHEN))
    — not count(*), which counts the masked-null unmatched rows."""
    from dcpray.functions.agg import pivot

    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "name": pa.array(["a", "b"]),
                  "v": pa.array([10.0, 20.0])})
    out = pivot(rd.from_arrow(t), "k", "name", "v", names=["a", "b"],
                agg="mean").to_pandas()
    assert out["a"].iloc[0] == 10.0 and out["b"].iloc[0] == 20.0


def test_coarse_mean_nullable_column_vs_duckdb():
    from dcpray.functions.agg import coarse_groupby

    rng = np.random.RandomState(67)
    n = 2000
    t = pa.table({
        "k": pa.array(rng.randint(0, 20, n), pa.int64()),
        "v": pa.array([None if rng.rand() < 0.3 else float(x)
                       for x in rng.randint(0, 100, n)], pa.float64()),
    })
    out = coarse_groupby(rd.from_arrow(t).repartition(4), ["k"],
                         [("v", "mean", "m")], partitions=8).to_pandas()
    ora = duckdb.sql("SELECT k, avg(v) AS m FROM t GROUP BY k").df()
    a = out.sort_values("k").reset_index(drop=True)
    b = ora.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_rolling_agg_rejects_nan_and_accepts_string_keys():
    from dcpray.functions.window import rolling_agg

    t = pa.table({"k": pa.array(["a", "a", "b"]),
                  "o": pa.array([1, 2, 1], pa.int64()),
                  "v": pa.array([1.0, np.nan, 3.0])})
    with pytest.raises(Exception, match="NaN"):
        rolling_agg(rd.from_arrow(t), "k", "o", "v", window=2,
                    tiebreak_col="o").to_pandas()
    t2 = pa.table({"k": pa.array(["a", "a", "b"]),
                   "o": pa.array([1, 2, 1], pa.int64()),
                   "v": pa.array([1.0, 2.0, 3.0])})
    out = rolling_agg(rd.from_arrow(t2), "k", "o", "v", window=2,
                      tiebreak_col="o").to_pandas().sort_values(["k", "o"])
    assert out["rolling_sum"].tolist() == [1.0, 3.0, 3.0]


def test_histogram_open_last_fp_edge():
    """Review fix: fp division can put v = hi−ε at index == bins on the
    closed_last=False path; must clamp, not crash."""
    from dcpray.functions.agg import histogram

    lo, hi, bins = -21.44304077983405, 62.18122769754997, 9
    v = float(np.nextafter(hi, -np.inf))
    t = pa.table({"v": pa.array([v, lo])})
    out = histogram(rd.from_arrow(t), "v", lo=lo, hi=hi, bins=bins,
                    closed_last=False).to_pandas()
    assert out["count"].sum() == 2 and len(out) == bins


def test_hash_join_skew_right_rows_guard():
    from dcpray.functions.join import hash_join_skew

    lt = pa.table({"k": pa.array(np.zeros(500, np.int64)),
                   "lv": pa.array(np.arange(500, dtype=np.int64))})
    rt = pa.table({"k": pa.array(np.zeros(50, np.int64)),
                   "rv": pa.array(np.arange(50, dtype=np.int64))})
    with pytest.raises(ValueError, match="dimension-like"):
        hash_join_skew(rd.from_arrow(lt), rd.from_arrow(rt), on="k",
                       hot_threshold=100, max_hot_right_rows=10)


def test_broadcast_join_semi_anti_match_hash_join_and_keep_null_anti():
    from dcpray.functions.join import broadcast_join, hash_join

    rng = np.random.RandomState(2)
    lt = pa.table({
        "k": pa.array([None if rng.rand() < 0.05 else int(v)
                       for v in rng.randint(0, 100, 3000)], pa.int64()),
        "lv": pa.array(np.arange(3000, dtype=np.int64)),
    })
    rt = pa.table({"k": pa.array(rng.randint(50, 150, 300), pa.int64()),
                   "rv": pa.array(np.arange(300, dtype=np.int64))})
    for how in ("semi", "anti"):
        out = broadcast_join(rd.from_arrow(lt).repartition(4), rt,
                             on="k", how=how).to_pandas()
        ref = hash_join(rd.from_arrow(lt).repartition(4),
                        rd.from_arrow(rt), on="k", how=how).to_pandas()
        a = out.sort_values(["k", "lv"]).reset_index(drop=True)
        b = ref[a.columns].sort_values(["k", "lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    anti = broadcast_join(rd.from_arrow(lt), rt, on="k",
                          how="anti").to_pandas()
    assert anti["k"].isna().sum() == lt.to_pandas()["k"].isna().sum()
    semi = broadcast_join(rd.from_arrow(lt), rt, on="k",
                          how="semi").to_pandas()
    assert semi["k"].notna().all()


def test_extract_json_field_int_str_missing_null():
    from dcpray.functions.textprep import extract_json_field

    t = pa.table({"p": pa.array(['{"k": 42, "s": "hi"}', '{"s": "x"}',
                                 None, '{"k": -7}'])})
    out = extract_json_field(rd.from_arrow(t), "p", "k",
                             kind="int").to_pandas()
    assert out["k"].tolist()[0] == 42 and out["k"].tolist()[3] == -7
    assert pd.isna(out["k"][1]) and pd.isna(out["k"][2])
    out2 = extract_json_field(rd.from_arrow(t), "p", "s", out_col="sv",
                              kind="str").to_pandas()
    assert out2["sv"].tolist()[:2] == ["hi", "x"]
    with pytest.raises(ValueError, match="kind"):
        extract_json_field(rd.from_arrow(t), "p", "k", kind="float")
