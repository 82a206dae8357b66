"""Property test for the round-5 second-wave batch kernel: the
``repetition_stats`` per-document math must equal the SQL oracle for
ARBITRARY documents — unicode segments, empty segments, all-duplicate
documents, single-segment documents (pure Arrow/numpy + DuckDB, no
Ray)."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dcpray.functions.textstats import repetition_stats

# segments drawn from a small alphabet so duplicates are common; ''
# and unicode (multi-byte chars — length() counts CHARS) included
segment = st.sampled_from(["", "a", "bb", "ccc", "müß", "日本", "x y"])
doc = st.lists(segment, min_size=1, max_size=12).map("\n".join)


@settings(max_examples=150, deadline=None)
@given(st.lists(doc, min_size=1, max_size=20))
def test_repetition_stats_matches_sql_oracle(texts):
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = repetition_stats(t, sep="\n").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    ora = con.execute("""
WITH l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS seg
           FROM documents),
g AS (SELECT doc_id, seg, count(*) AS c, length(seg) AS len
      FROM l GROUP BY doc_id, seg)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_segments,
       CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_seg_frac,
       CASE WHEN sum(c * len) = 0 THEN NULL
            ELSE CAST(sum((c - 1) * len) AS DOUBLE)
                 / CAST(sum(c * len) AS DOUBLE) END AS dup_char_frac
FROM g GROUP BY doc_id ORDER BY doc_id""").df()
    assert (out["n_segments"].to_numpy()
            == ora["n_segments"].to_numpy()).all()
    # divisions of identical exact integers -> bit-exact
    assert (out["dup_seg_frac"].to_numpy()
            == ora["dup_seg_frac"].to_numpy()).all()
    a = out["dup_char_frac"].to_numpy()
    b = ora["dup_char_frac"].to_numpy()
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    min_size=1, max_size=40))
def test_percent_rank_cdf_math_matches_duckdb(vals):
    """The CDF arithmetic percent_rank_global broadcasts (count_less /
    (n-1) on +0.0-normalized float64) must equal SQL percent_rank()
    bit-for-bit — checked here kernel-level without Ray."""
    import pandas as pd

    v = np.asarray(vals, np.float64) + 0.0
    uniq, cnt = np.unique(v, return_counts=True)
    count_less = np.cumsum(cnt) - cnt
    n = len(v)
    idx = np.searchsorted(uniq, v)
    pr = (count_less[idx].astype(np.float64) / np.float64(n - 1)
          if n > 1 else np.zeros(n))
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": np.arange(n), "v": v}))
    exp = con.execute("""SELECT percent_rank() OVER (ORDER BY v) AS pr
                         FROM t ORDER BY i""").df()["pr"].to_numpy()
    assert (pr == exp).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["", "a", "bb", "müß", "x"]),
                         min_size=1, max_size=10).map(" ".join),
                min_size=1, max_size=15))
def test_ngram_repetition_matches_sql_oracle(texts):
    import pandas as pd

    from dcpray.functions.textstats import ngram_repetition_stats

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = ngram_repetition_stats(t, n=2, sep=" ").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    ora = con.execute("""
WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM l WHERE len(toks) > 1),
g AS (SELECT doc_id, w1, w2, count(*) AS c,
             length(w1) + length(w2) AS bl
      FROM b GROUP BY doc_id, w1, w2),
d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
             CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                 AS dup_ngram_frac,
             CASE WHEN sum(c * bl) = 0 THEN NULL
                  ELSE CAST(sum((c - 1) * bl) AS DOUBLE)
                       / CAST(sum(c * bl) AS DOUBLE) END
                 AS dup_ngram_char_frac
      FROM g GROUP BY doc_id)
SELECT doc.doc_id, coalesce(d.n_ngrams, 0) AS n_ngrams,
       d.dup_ngram_frac, d.dup_ngram_char_frac
FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id
ORDER BY doc.doc_id""").df()
    assert (out["n_ngrams"].to_numpy()
            == ora["n_ngrams"].to_numpy()).all()
    for col in ("dup_ngram_frac", "dup_ngram_char_frac"):
        a = out[col].to_numpy(dtype=float, na_value=np.nan)
        b = ora[col].to_numpy(dtype=float, na_value=np.nan)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()
