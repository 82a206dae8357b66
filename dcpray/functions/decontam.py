"""Benchmark decontamination — train/test overlap detection.

A training corpus must not contain the evaluation benchmark. Two
detectors, both with the same scale shape: the BENCHMARK side is small
by nature (eval sets are thousands of docs, not billions), so its
fingerprints are collected once, sorted, and broadcast via ``ray.put``;
the CORPUS side then streams through one ``map_batches`` filter with
ZERO exchange — per-batch cost is a vectorized hash + one
``searchsorted`` against the broadcast array, independent of corpus
size. (The reference engine has no analogue; this is a first-class
training-data operator like dedup.py's, same broadcast-small-side
discipline as ``boilerplate.py``.)

- ``exact_contamination``: corpus docs whose FULL text equals any
  benchmark text (byte-exact) — the SQL-oracle-checkable baseline.
- ``ngram_contamination``: corpus docs sharing at least
  ``min_shared`` distinct word-n-grams with the benchmark union set
  (n=8–13 is the published decontamination range) — catches partial
  copies and quoted excerpts that exact matching misses; oracle uses
  the same generate_series n-gram SQL as ``text_jaccard_exact``.

Membership is tested on 64-bit siphashes of the n-gram strings
(``hash_strings``) rather than the strings themselves, so the broadcast
is 8 bytes per distinct benchmark n-gram and the corpus-side test is
pure numpy; a false positive needs a 64-bit collision between a corpus
n-gram and a benchmark n-gram (~(n_corpus·n_bench)/2^64 — negligible,
and the driver oracle cross-checks string-exactly at test scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dcpray.hashing import hash_strings


# ONE tokenization source of truth: decontamination must fingerprint
# n-grams exactly like dedup (and the shared
# list_distinct(list_transform(...)) oracle) — a drifted copy would
# silently desynchronize the two (r5 review)
from dcpray.functions.dedup import _doc_ngram_sets as _doc_ngrams


def _collect_bench_hashes(benchmark_ds, text_col: str, n: int | None,
                          sep: str, max_ngrams: int) -> np.ndarray:
    """Sorted distinct uint64 hashes of the benchmark's fingerprints
    (full texts when n is None, word-n-grams otherwise). Runs the
    hashing distributed (one small array per benchmark batch reaches
    the driver); loudly guarded by ``max_ngrams``."""
    def fp(t: pa.Table) -> pa.Table:
        if n is None:
            import pyarrow.compute as pc

            # null benchmark texts define no fingerprint
            h = hash_strings(pc.drop_null(t[text_col]))
        else:
            grams = [g for s in _doc_ngrams(t[text_col].to_pylist(), n, sep)
                     for g in s]
            h = hash_strings(np.array(grams, object)) if grams \
                else np.empty(0, np.uint64)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    parts = []
    total = 0
    for p in (benchmark_ds.select_columns([text_col])
              .map_batches(fp, batch_format="pyarrow")
              .iter_batches(batch_size=None, batch_format="pyarrow")):
        parts.append(p["h"].to_numpy(zero_copy_only=False))
        total += len(parts[-1])
        # guard IN the loop: the swapped-arguments mistake this message
        # names would otherwise OOM the driver collecting a corpus-sized
        # hash set long before a post-hoc check could fire
        if total > max_ngrams:
            raise ValueError(
                f"benchmark fingerprint stream already exceeds "
                f"max_ngrams={max_ngrams} (collected {total}) — the "
                "benchmark side must be the small side; swap the "
                "arguments or raise the guard")
    if not parts:
        return np.empty(0, np.uint64)
    h = np.unique(np.concatenate(parts))
    if len(h) > max_ngrams:
        raise ValueError(
            f"benchmark fingerprint set has {len(h)} entries "
            f"(> max_ngrams={max_ngrams}) — the benchmark side must be "
            "the small side; swap the arguments or raise the guard")
    return h


def exact_contamination(corpus_ds, benchmark_ds, text_col: str = "text",
                        max_bench: int = 50_000_000):
    """Corpus rows whose full ``text_col`` appears verbatim in the
    benchmark. Returns the corpus rows (all columns) that are
    contaminated — feed to ``filter``/anti-join semantics by dropping
    these ids. Zero exchange; benchmark hashes broadcast once."""
    import ray

    bh = _collect_bench_hashes(benchmark_ds, text_col, None, " ", max_bench)
    ref = ray.put(bh)

    def match(t: pa.Table, r) -> pa.Table:
        from dcpray.rayutil import worker_memo

        arr = worker_memo(("decontam_exact", r.hex()), lambda: ray.get(r))
        if t.num_rows == 0 or len(arr) == 0:
            return t.slice(0, 0)
        import pyarrow.compute as pc

        h = hash_strings(t[text_col])
        pos = np.searchsorted(arr, h)
        hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)] == h)
        # SQL `text IN (...)` is never true for NULL text — and a null
        # corpus text must not hash-match a null benchmark text
        hit &= pc.is_valid(t[text_col]).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(hit))

    return corpus_ds.map_batches(match, fn_args=(ref,),
                                 batch_format="pyarrow")


def ngram_contamination(corpus_ds, benchmark_ds, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        sep: str = " ", min_shared: int = 1,
                        max_bench_ngrams: int = 50_000_000):
    """Corpus docs sharing ≥ ``min_shared`` DISTINCT word-n-grams with
    the benchmark's n-gram union set. Returns (id_col, n_shared) rows
    for contaminated docs only. Zero exchange; the benchmark n-gram
    hash set broadcasts once and each corpus batch resolves itself."""
    import ray

    if n < 1:
        raise ValueError("n must be >= 1")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    bh = _collect_bench_hashes(benchmark_ds, text_col, n, sep,
                               max_bench_ngrams)
    ref = ray.put(bh)

    def match(t: pa.Table, r) -> pa.Table:
        from dcpray.rayutil import worker_memo

        arr = worker_memo(("decontam_ngram", r.hex()), lambda: ray.get(r))
        ids = t[id_col]
        empty = pa.table({id_col: pa.array([], ids.type),
                          "n_shared": pa.array([], pa.int64())})
        if t.num_rows == 0 or len(arr) == 0:
            return empty
        sets = _doc_ngrams(t[text_col].to_pylist(), n, sep)
        sizes = np.fromiter((len(s) for s in sets), np.int64,
                            count=len(sets))
        grams = [g for s in sets for g in s]
        if not grams:
            return empty
        h = hash_strings(np.array(grams, object))
        pos = np.searchsorted(arr, h)
        hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)] == h)
        indptr = np.r_[0, np.cumsum(sizes)]
        # distinct-shared count per doc: sets are already distinct, so a
        # plain segment sum of hits is the distinct intersection size
        shared = np.add.reduceat(
            np.r_[hit.astype(np.int64), 0], indptr[:-1])
        shared[sizes == 0] = 0
        keep = shared >= min_shared
        return pa.table({
            id_col: ids.filter(pa.array(keep)),
            "n_shared": pa.array(shared[keep], pa.int64()),
        })

    return corpus_ds.select_columns([id_col, text_col]) \
        .map_batches(match, fn_args=(ref,), batch_format="pyarrow")
