"""Regression tests for round-4 advisory findings:

- ManifestStore.commit lost-update race (covered in test_review_r4.py:
  lease on orphan takeover + read-back on the link-winner path);
- write_changefeed bootstrap keyed on parent is None, read_changefeed
  gap contract (covered in test_history.py);
- chunk_batch must read large_string (int64) offsets correctly;
- lag_lead / ntile_in_group / forward_fill output-name collision guard;
- rank_in_group descending=True on datetime64 / unsigned order columns.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _chunk_strings(texts, chunk_chars, overlap_chars, large=False):
    from dcpray.functions.textprep import chunk_batch

    typ = pa.large_string() if large else pa.string()
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, typ)})
    out = chunk_batch(t, "text", chunk_chars, overlap_chars, ["doc_id"])
    return out.to_pylist()


def test_chunk_batch_large_string_offsets():
    """ADVICE r4 (medium): a large_string text column carries int64
    offsets; reading them as int32 silently misparsed every chunk
    boundary. large_string must chunk identically to string."""
    texts = ["abcdefghij" * 3, "héllo wörld ünïcode" * 2, "x", "", "short"]
    small = _chunk_strings(texts, 8, 2, large=False)
    big = _chunk_strings(texts, 8, 2, large=True)
    assert big == small
    # and the chunks reassemble the documents (stride coverage)
    for i, txt in enumerate(texts):
        chunks = [r["chunk_text"] for r in big if r["doc_id"] == i]
        if txt:
            assert chunks[0] == txt[:8]
            recon = chunks[0] + "".join(c[2:] for c in chunks[1:])
            assert recon == txt
        else:
            assert chunks == []


def test_chunk_batch_non_string_raises():
    from dcpray.functions.textprep import chunk_batch

    t = pa.table({"doc_id": [1], "text": pa.array([b"bytes"], pa.binary())})
    with pytest.raises(TypeError, match="string"):
        chunk_batch(t, "text", 8, 2, ["doc_id"])


@pytest.mark.parametrize("op", ["lag_lead", "ntile", "ffill"])
def test_window_output_name_collision_guard(op):
    """ADVICE r4 (low): pyarrow allows duplicate column names, so an
    output column shadowing an input one silently produced a two-column
    table; every window op must raise upfront like rank_in_group."""
    from dcpray.functions.window import forward_fill, lag_lead, ntile_in_group

    t = pa.table({"k": [1, 1, 2], "o": [1, 2, 1], "tb": [0, 1, 2],
                  "v": [1.0, None, 3.0],
                  "lag_1": [0, 0, 0], "ntile": [0, 0, 0],
                  "filled": [0, 0, 0]})
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="already exist"):
        if op == "lag_lead":
            lag_lead(ds, "k", "o", "v", "tb", lags=(1,), leads=())
        elif op == "ntile":
            ntile_in_group(ds, "k", "o", "tb", 2)
        else:
            forward_fill(ds, "k", "o", "v", "tb", out_col="filled")


def _rank_desc(order_values, arrow_type):
    from dcpray.functions.window import rank_in_group

    t = pa.table({"k": pa.array([1] * len(order_values), pa.int64()),
                  "o": pa.array(order_values, arrow_type),
                  "tb": pa.array(range(len(order_values)), pa.int64())})
    out = rank_in_group(rd.from_arrow(t), "k", "o", "tb",
                        descending=True, out_col="rn",
                        ranks=("rank",)).to_pandas()
    return out.sort_values("tb").reset_index(drop=True)


def test_rank_in_group_descending_datetime():
    """ADVICE r4 (low): descending=True negated the raw numpy array —
    TypeError on datetime64. Must order newest-first like SQL DESC."""
    ts = pd.to_datetime(["2024-01-01", "2024-03-01", "2024-02-01"])
    out = _rank_desc(ts, pa.timestamp("ns"))
    assert list(out["rn"]) == [3, 1, 2]
    assert list(out["rank"]) == [3, 1, 2]


def test_rank_in_group_descending_unsigned_zero_sorts_last():
    """ADVICE r4 (low): for unsigned order columns -v wraps modulo 2^w,
    silently sorting 0 FIRST under DESC instead of last."""
    out = _rank_desc([0, 5, 3], pa.uint64())
    assert list(out["rn"]) == [3, 1, 2]


def test_rank_in_group_descending_int64_min_safe():
    """int64 minimum negates to itself under two's complement; the
    biased-uint64 descending key must still sort it LAST."""
    lo = np.iinfo(np.int64).min
    out = _rank_desc([lo, 7, -3], pa.int64())
    assert list(out["rn"]) == [3, 1, 2]


def test_ntile_descending_uint_matches_ascending_reversed():
    from dcpray.functions.window import ntile_in_group

    vals = [0, 1, 2, 3, 4, 5]
    t = pa.table({"k": pa.array([1] * 6, pa.int64()),
                  "o": pa.array(vals, pa.uint32()),
                  "tb": pa.array(range(6), pa.int64())})
    out = (ntile_in_group(rd.from_arrow(t), "k", "o", "tb", 3,
                          descending=True)
           .to_pandas().sort_values("tb").reset_index(drop=True))
    # DESC over 0..5 in 3 tiles: 5,4 -> 1; 3,2 -> 2; 1,0 -> 3
    assert list(out["ntile"]) == [3, 3, 2, 2, 1, 1]


def test_rank_in_group_descending_nan_first_like_sql():
    """Self-review r5: -v leaves NaN sorted LAST under numpy lexsort,
    but SQL DESC puts NaN FIRST (NaN ranks above everything in
    DuckDB's total order); two NaNs are peers."""
    import duckdb

    vals = [1.0, float("nan"), 3.0, float("nan")]
    out = _rank_desc(vals, pa.float64())
    ora = duckdb.sql("""
        SELECT tb, row_number() OVER (ORDER BY o DESC, tb) rn,
               rank() OVER (ORDER BY o DESC) rk
        FROM (SELECT unnest([1.0, 'NaN'::DOUBLE, 3.0, 'NaN'::DOUBLE]) o,
                     unnest([0, 1, 2, 3]) tb)
        ORDER BY tb""").df()
    assert list(out["rn"]) == list(ora["rn"])
    assert list(out["rank"]) == list(ora["rk"])


def test_rank_in_group_ascending_nan_last_like_sql():
    from dcpray.functions.window import rank_in_group

    t = pa.table({"k": pa.array([1] * 3, pa.int64()),
                  "o": pa.array([float("nan"), 1.0, 2.0], pa.float64()),
                  "tb": pa.array([0, 1, 2], pa.int64())})
    out = (rank_in_group(rd.from_arrow(t), "k", "o", "tb", out_col="rn")
           .to_pandas().sort_values("tb").reset_index(drop=True))
    assert list(out["rn"]) == [3, 1, 2]  # ASC: NaN greatest, so last
