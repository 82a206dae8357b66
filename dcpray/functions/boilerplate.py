"""Repeated-paragraph (boilerplate) removal — the C4-style line-level
cleanup every web-scale text corpus needs: paragraphs that occur in
many documents (headers, footers, cookie banners, nav text) are
removed from every document, preserving the order of what remains.

Scale shape (two passes, no corpus all-to-all):

1. COUNT: each batch splits its documents and emits one (md5, n) row
   per distinct paragraph per batch (local pre-agg); a coarse-partition
   ``coarse_groupby`` sums them. Only paragraph DIGESTS move — never
   paragraph text.
2. FILTER: the hot digest set (count ≥ ``min_repeats``) is collected —
   it is small by construction (boilerplate is the repeated tail;
   ``max_hot`` guards the assumption loudly) — broadcast via
   ``ray.put``, and each batch drops hot paragraphs locally with a
   vectorized sorted-membership test and an Arrow list rebuild. The
   corpus streams; nothing shuffles.

Paragraph identity is md5 of the exact paragraph text — bit-compatible
with DuckDB ``md5()``, so the oracle checks the cleaned text
value-for-value (both sides group by the digest, so behavior is
identical even under a collision).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _split_paragraphs(t: pa.Table, text_col: str, sep: str):
    """(list_array, flat_paragraphs, offsets) for a batch — matches SQL
    ``string_split`` (an empty document yields one empty paragraph)."""
    filled = pc.fill_null(t[text_col], "")
    toks = pc.split_pattern(filled, sep)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return toks, flat, offs


def _md5_digests(flat: pa.Array) -> np.ndarray:
    """Hex md5 per paragraph (inherently per-item, like
    ``fingerprint_md5``; everything around it is vectorized)."""
    return np.array(
        [hashlib.md5((s or "").encode("utf-8")).hexdigest()
         for s in flat.to_pylist()],
        dtype=object,
    )


def _digests(flat: pa.Array, mode: str):
    """(values, arrow_type) of the per-paragraph identity under the
    chosen hash mode: hex md5 strings (SQL-oracle parity) or vectorized
    64-bit splitmix hashes (the production default at scale — ~50× the
    md5 loop; both sides of the operator group by the digest, so the
    cleaned output is identical as long as paragraphs don't collide)."""
    from dcpray.hashing import hash_strings

    if mode == "md5":
        return _md5_digests(flat), pa.string()
    if mode == "fast":
        return hash_strings(flat).view(np.int64), pa.int64()
    raise ValueError(f"hash must be 'md5' or 'fast', got {mode!r}")


def remove_repeated_paragraphs(ds, min_repeats: int = 3,
                               text_col: str = "text", sep: str = "\n",
                               partitions: int = 64,
                               max_hot: int = 5_000_000, hash: str = "md5"):
    """Return ``ds`` with ``text_col`` replaced by the cleaned text:
    every paragraph whose corpus-wide occurrence count is ≥
    ``min_repeats`` is removed from every document (other columns pass
    through; a fully-boilerplate document keeps an empty string).

    Raises if the hot set exceeds ``max_hot`` digests — that means
    ``min_repeats`` is too low for this corpus, not that the operator
    should silently ship an unbounded broadcast.

    ``hash="fast"`` swaps the per-paragraph md5 loop for the vectorized
    splitmix hash (the production default at scale; md5 stays the
    SQL-oracle-checked variant — see ``_digests``)."""
    import ray

    from dcpray.functions.agg import coarse_groupby

    hash_mode = hash
    _digests(pa.array([], pa.string()), hash_mode)  # validate mode early

    def count_partial(t: pa.Table) -> pa.Table:
        # SQL parity: unnest(string_split(NULL)) yields ZERO rows — a
        # null document contributes no paragraphs to the counts (the
        # fill_null in the split is for the CLEAN pass, whose output for
        # null docs is '' either way, matching the oracle's coalesce)
        t = t.filter(pc.is_valid(t[text_col]))
        _, flat, _ = _split_paragraphs(t, text_col, sep)
        h, h_type = _digests(flat, hash_mode)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table({
            "h": pa.array(uniq, h_type),
            "n_part": pa.array(counts.astype(np.int64)),
        })

    counted = coarse_groupby(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        keys=["h"], aggs=[("n_part", "sum", "n")], partitions=partitions,
    )
    # filter to HOT rows distributed-side BEFORE the driver collects:
    # the driver must only ever see the (small) hot set, never the full
    # distinct-paragraph digest stream
    hot_ds = counted.map_batches(
        lambda t: t.select(["h"]).filter(
            pc.greater_equal(t["n"], pa.scalar(min_repeats, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    hot_parts = []
    for bt in hot_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        hot_parts.append(bt["h"].to_numpy(zero_copy_only=False))
        if sum(len(p) for p in hot_parts) > max_hot:
            raise ValueError(
                f"hot paragraph set exceeds max_hot={max_hot}; raise "
                "min_repeats (this corpus repeats too many distinct "
                "paragraphs for a broadcast hot set)"
            )
    hot = np.sort(np.concatenate(hot_parts)) if hot_parts else \
        np.empty(0, object if hash_mode == "md5" else np.int64)
    hot_ref = ray.put(hot)

    def clean(t: pa.Table, href) -> pa.Table:
        from dcpray.rayutil import worker_memo

        hot_sorted = worker_memo(("boilerplate_hot", href.hex()),
                                 lambda: ray.get(href))
        toks, flat, offs = _split_paragraphs(t, text_col, sep)
        if len(hot_sorted) and len(flat):
            h, _ = _digests(flat, hash_mode)
            pos = np.searchsorted(hot_sorted, h)
            pos = np.minimum(pos, len(hot_sorted) - 1)
            keep = hot_sorted[pos] != h
        else:
            keep = np.ones(len(flat), bool)
        cum = np.r_[0, np.cumsum(keep.astype(np.int64))]
        new_offs = cum[offs]  # kept-paragraph count before each boundary
        kept_list = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
        )
        cleaned = pc.binary_join(kept_list, sep)
        idx = t.schema.get_field_index(text_col)
        return t.set_column(idx, text_col, cleaned)

    return ds.map_batches(clean, fn_args=(hot_ref,), batch_format="pyarrow")
