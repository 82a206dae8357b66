"""Repeated-paragraph (boilerplate) removal."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dcpray.functions.boilerplate import remove_repeated_paragraphs


def _docs():
    footer = "(c) example corp - all rights reserved"
    nav = "home | products | contact"
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            f"unique article one\n{footer}\n{nav}",
            f"{nav}\nsecond piece of content\n{footer}",
            f"{footer}\nthird thing entirely\n{nav}",
            footer,                       # fully boilerplate
            "standalone document",        # untouched
        ]),
        "lang": pa.array(["en"] * 5),
    })


@pytest.mark.parametrize("blocks", [1, 4])
@pytest.mark.parametrize("hash_mode", ["md5", "fast"])
def test_removes_hot_paragraphs_preserves_order(blocks, hash_mode):
    ds = rd.from_arrow(_docs())
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = remove_repeated_paragraphs(ds, min_repeats=3,
                                     hash=hash_mode).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "unique article one",
        "second piece of content",
        "third thing entirely",
        "",                     # fully-boilerplate doc keeps empty text
        "standalone document",
    ]
    assert out["lang"].tolist() == ["en"] * 5  # other columns untouched


def test_below_threshold_untouched():
    # footer occurs 4x, nav 3x: threshold 5 leaves everything in place
    ds = rd.from_arrow(_docs())
    out = remove_repeated_paragraphs(ds, min_repeats=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == _docs()["text"].to_pylist()


def test_max_hot_guard():
    n = 50
    tab = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        # every doc shares every paragraph: the whole vocabulary is hot
        "text": pa.array(["a\nb\nc"] * n),
    })
    with pytest.raises(ValueError, match="max_hot"):
        remove_repeated_paragraphs(rd.from_arrow(tab), min_repeats=2,
                                   max_hot=2)


def test_null_text_sql_parity():
    """Null documents contribute NO paragraphs to the counts (SQL
    unnest(string_split(NULL)) is empty) and clean to ''."""
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([None, None, None, "x  y"]),
    })
    out = remove_repeated_paragraphs(rd.from_arrow(tab), min_repeats=3,
                                     sep=" ").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # nulls did NOT make '' hot, so the double space survives
    assert out["text"].tolist() == ["", "", "", "x  y"]
