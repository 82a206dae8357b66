"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shape (the part that must survive 100 TB):

- signatures are computed per Arrow batch in vectorized numpy inside
  ``map_batches`` (actor pools hold the seed/plane matrices);
- candidate generation is a ``groupby`` on a SMALL key (band hash /
  bit signature), never on raw text;
- pair verification re-derives features for candidate pairs only;
- clustering is min-label union-find over the (tiny) surviving pair
  set on the driver (``cluster_pairs``); for corpora where even the
  verified pair set is huge, ``cluster_pairs_distributed`` runs the
  same connected-components computation as iterative min-label
  propagation over coarse-partition groupbys — nothing on the driver.

Pair verification is DISTRIBUTED by default (``verify="join"``): a
bucketed hash-join of the candidate-pair list against the corpus on
doc_id — requested texts are shipped to the pair's verify bucket via two
keyed groupbys (the same machinery the merge uses), so the driver never
materializes corpus text and total text movement is O(corpus once +
pairs). The ``verify="broadcast"`` path (driver dict + ``ray.put``)
remains for small corpora where one object-store copy is cheaper than
two shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.functions.ann import _stack as emb_matrix
from dcpray.hashing import hash_strings, splitmix64

# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = hash_strings(batch[text_col])
    # store as int64 view (parquet/duckdb-friendly); collision probability
    # over 64 bits is negligible at test scale, and survivors are decided
    # by min(key) within a hash group so a collision only over-merges
    return batch.append_column("_h", pa.array(h.view(np.int64)))


def exact_dedup(ds, key_col: str = "doc_id", text_col: str = "text",
                partitions: int = 64):
    """Exact dedup: content-hash → per-batch combiner (keep min key per
    hash locally) → groupby on a COARSE partition of the hash → keep the
    min-key row per hash, vectorized inside each partition (one Python
    call per partition, not per distinct document). Returns the
    surviving full rows."""

    def combine(batch: pa.Table) -> pa.Table:
        batch = add_content_hash(batch, text_col)
        idx = pc.sort_indices(
            batch, sort_keys=[("_h", "ascending"), (key_col, "ascending")]
        )
        t = batch.take(idx)
        h = t["_h"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.r_[True, h[1:] != h[:-1]]
        t = t.filter(pa.array(first))
        hh = t["_h"].combine_chunks().to_numpy(zero_copy_only=False)
        pk = (hh.view(np.uint64) % np.uint64(partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    def keep_min_per_hash(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[("_h", "ascending"), (key_col, "ascending")]
        )
        t = group.take(idx)
        h = t["_h"].combine_chunks().to_numpy(zero_copy_only=False)
        first = np.r_[True, h[1:] != h[:-1]]
        return t.filter(pa.array(first)).drop_columns(["_h", "_pk"])

    pre = ds.map_batches(combine, batch_format="pyarrow")
    return pre.groupby("_pk").map_groups(keep_min_per_hash, batch_format="pyarrow")


# ------------------------------------------------------------- shingles


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized rolling k-byte shingle hashes of one document."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    pows = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return np.unique(splitmix64(win @ pows))


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashes of word n-grams (token-shingle alternative). Uses crc32,
    NOT builtin hash() — the latter is per-process randomized and would
    silently break cross-worker determinism."""
    import zlib

    words = text.split()
    if len(words) < n:
        words = words + [""] * (n - len(words))
    h = np.array(
        [
            zlib.crc32(" ".join(words[i : i + n]).encode())
            for i in range(len(words) - n + 1)
        ],
        dtype=np.uint64,
    )
    return np.unique(splitmix64(h))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


# ----------------------------------------------- vectorized batch hashing


def _flat_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """A string column as (flat uint8 byte buffer, int64 doc offsets) —
    zero-copy views of Arrow's own layout, the basis for hashing every
    document of a batch in one numpy pass instead of a Python loop."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        col = col.cast(pa.string())
    if col.null_count:
        col = pc.fill_null(col, "")
    off_width = np.int32
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_width)[col.offset : col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs.astype(np.int64)


#: odd multiplier: x → (x ^ seed) * _PERM_MULT is a bijection on uint64
#: per seed (xor then odd-multiply), a standard cheap permutation family
#: for MinHash — 2 ops/element where a full splitmix64 remix costs 5
_PERM_MULT = np.uint64(0xBF58476D1CE4E5B9)


def _perm(sh: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (sh[:, None] ^ seeds[None, :]) * _PERM_MULT


def _seg_min(seg: np.ndarray, starts: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Per-segment min of the permuted shingles over one shingle slab."""
    return np.minimum.reduceat(_perm(seg, seeds), starts, axis=0)


def minhash_signatures(col, seeds: np.ndarray, k: int = 5) -> np.ndarray:
    """(n_docs, n_perm) MinHash signatures for a whole string column in
    vectorized numpy: one rolling-hash pass over the batch's flat utf8
    buffer, then segmented per-document minima via ``ufunc.reduceat`` —
    no per-document Python loop. Exactly equivalent to the per-doc
    ``MinHasher.signature`` (min over a multiset equals min over its
    set, so skipping the per-doc unique changes nothing)."""
    data, offs = _flat_utf8(col)
    n = len(offs) - 1
    P = len(seeds)
    sigs = np.empty((n, P), dtype=np.uint64)
    lens = offs[1:] - offs[:-1]
    ok = lens >= k
    pows = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)

    if ok.any() and len(data) >= k:
        ok_idx = np.flatnonzero(ok)
        counts_all = (lens[ok] - k + 1).astype(np.int64)
        out_ok = np.empty((len(ok_idx), P), dtype=np.uint64)
        # outer chunking by BYTES bounds the rolling-hash temporaries
        # ((windows × k) uint64 is an ~8k× amplification of the text) —
        # ~1 MB of text per slab keeps them ≈ 40 MB regardless of batch
        # size; inner chunking keeps each (shingles × perms) slab inside
        # the CPU cache — 512×128×8B ≈ 512 KB (measured 6× faster than
        # 64k-shingle slabs, which thrash memory bandwidth)
        o = 0
        while o < len(ok_idx):
            p = o + 1
            while (p < len(ok_idx)
                   and offs[ok_idx[p] + 1] - offs[ok_idx[o]] <= 1_000_000):
                p += 1
            lo_b = offs[ok_idx[o]]
            hi_b = offs[ok_idx[p - 1] + 1]
            win = np.lib.stride_tricks.sliding_window_view(
                data[lo_b:hi_b], k).astype(np.uint64)
            with np.errstate(over="ignore"):
                flat_h = splitmix64(win @ pows)
            counts = counts_all[o:p]
            seg_id = np.repeat(np.arange(len(counts)), counts)
            cum = np.r_[0, np.cumsum(counts)]
            local = np.arange(counts.sum()) - cum[seg_id]
            sh = flat_h[(offs[:-1][ok_idx[o:p]] - lo_b)[seg_id] + local]
            i = o
            while i < p:
                j = i + 1
                while j < p and cum[j + 1 - o] - cum[i - o] <= 512:
                    j += 1
                out_ok[i:j] = _seg_min(
                    sh[cum[i - o] : cum[j - o]],
                    cum[i - o : j - o] - cum[i - o], seeds)
                i = j
            o = p
        sigs[ok] = out_ok

    if (~ok).any():
        # short docs (len < k, incl. empty): the padded-single-window path
        for i in np.flatnonzero(~ok):
            b = np.pad(data[offs[i] : offs[i + 1]], (0, k - int(lens[i]))).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = splitmix64(np.array([b @ pows], dtype=np.uint64))
            sigs[i] = _perm(h, seeds).min(axis=0)
    return sigs


#: Python ``str.split()`` whitespace (everything ``str.isspace``) as an
#: re2 class — re2's ``\s`` is ASCII-only, so the batch tokenizer must
#: add \v, the information separators, NEL, and the Unicode space/line/
#: paragraph separators to split identically to the single-doc oracle
_UNICODE_WS = r"[\s\x0b\x1c-\x1f\x{85}\p{Zs}\x{2028}\x{2029}]+"


def simhash_batch(col) -> np.ndarray:
    """64-bit SimHash per document for a whole string column: Arrow
    lowercase + whitespace-split, one vectorized token-hash pass over the
    flattened token list, per-document bit votes via ``add.reduceat``.
    Token hash is the stable pandas siphash (hash_strings) — like the
    reference implementation's crc32, deterministic across workers.
    Splits on the full Unicode whitespace set so batch and single-doc
    (``SimHasher.simhash``, ``str.split``) paths agree on e.g. \\u00a0."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), _UNICODE_WS)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    n = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offs[1:] - offs[:-1]
    if len(flat) == 0:
        return np.zeros(n, dtype=np.uint64)
    # drop empty tokens (split of "" / leading+trailing whitespace)
    nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    h = splitmix64(hash_strings(flat))
    bits_mask = np.uint64(1) << np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] & bits_mask[None, :]) != 0) & nonempty[:, None]
    has = counts > 0
    votes = np.zeros((n, 64), dtype=np.int64)
    ntok = np.zeros(n, dtype=np.int64)
    if has.any():
        starts = offs[:-1][has]
        votes[has] = np.add.reduceat(bits.astype(np.int64), starts, axis=0)
        ntok[has] = np.add.reduceat(nonempty.astype(np.int64), starts)
    majority = ((votes * 2 - ntok[:, None]) > 0).astype(np.uint64)
    out = (majority * bits_mask[None, :]).sum(axis=1, dtype=np.uint64)
    out[ntok == 0] = np.uint64(0)
    return out


# ---------------------------------------------------------- MinHash+LSH


class MinHasher:
    """Actor-pool stage: text → (band_id, band_hash, doc_id) rows.
    128 permutations via seeded xor-mix, banded bands×rows_per_band."""

    def __init__(self, num_perm: int = 128, bands: int = 16, shingle_k: int = 5,
                 text_col: str = "text", key_col: str = "doc_id"):
        assert num_perm % bands == 0
        self.seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        self.bands = bands
        self.rpb = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.key_col = key_col

    def signature(self, text: str) -> np.ndarray:
        """Single-doc reference implementation (tests compare the
        vectorized batch path against this)."""
        sh = char_shingle_hashes(text or "", self.k)
        return _perm(sh, self.seeds).min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        sigs = minhash_signatures(batch[self.text_col], self.seeds, self.k)
        # fold each band's rows into one 64-bit band hash
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rpb):
                bh = splitmix64(bh ^ sigs[:, r :: self.rpb][:, : self.bands])
        band_id = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "band_id": pa.array(band_id),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(keys, self.bands)),
            }
        )


def _bucket_pairs(group: pa.Table, max_bucket: int = 256) -> pa.Table:
    """Candidate pairs within one LSH bucket (cap guards a degenerate
    bucket from going quadratic; capped buckets are flagged). Kept as
    the single-bucket reference; the pipeline uses the partitioned
    ``_partition_pairs`` (one call per coarse partition, not per
    bucket)."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    capped = len(ids) > max_bucket
    if capped:
        ids = ids[:max_bucket]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "capped": pa.array([], pa.bool_())})
    iu = np.triu_indices(len(ids), k=1)
    return pa.table(
        {
            "a": pa.array(ids[iu[0]]),
            "b": pa.array(ids[iu[1]]),
            "capped": pa.array(np.full(len(iu[0]), capped)),
        }
    )


def _partition_pairs(group: pa.Table, max_bucket: int = 256) -> pa.Table:
    """Candidate pairs for a COARSE partition holding many whole LSH
    buckets: one lexsort + run detection finds the buckets, and only the
    (rare) multi-doc runs emit pairs. Replaces a per-bucket
    ``map_groups`` — most buckets are singletons, so calling Python once
    per bucket was pure overhead (76k calls for 80k rows at sf0.1)."""
    bid = group["band_id"].to_numpy(zero_copy_only=False)
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, bh, bid))
    bid, bh, doc = bid[order], bh[order], doc[order]
    new = np.r_[True, (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.r_[starts, len(bid)])
    multi = np.flatnonzero(sizes >= 2)
    a_parts, b_parts, cap_parts = [], [], []
    for m in multi:
        ids = np.unique(doc[starts[m] : starts[m] + sizes[m]])
        capped = len(ids) > max_bucket
        if capped:
            ids = ids[:max_bucket]
        if len(ids) < 2:
            continue
        iu = np.triu_indices(len(ids), k=1)
        a_parts.append(ids[iu[0]])
        b_parts.append(ids[iu[1]])
        cap_parts.append(np.full(len(iu[0]), capped))
    if not a_parts:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "capped": pa.array([], pa.bool_())})
    return pa.table({
        "a": pa.array(np.concatenate(a_parts).astype(np.int64)),
        "b": pa.array(np.concatenate(b_parts).astype(np.int64)),
        "capped": pa.array(np.concatenate(cap_parts)),
    })


def minhash_candidate_pairs(ds, num_perm=128, bands=16, shingle_k=5,
                            text_col="text", key_col="doc_id", concurrency=4,
                            partitions=64):
    """(a, b, capped) LSH candidate pairs. The banding exchange groups on
    a COARSE partition key (hash of the band bucket % ``partitions``) so
    whole buckets co-locate but Python runs once per partition, with the
    per-bucket work fully vectorized inside (``_partition_pairs``)."""
    sig = ds.map_batches(
        MinHasher(num_perm, bands, shingle_k, text_col, key_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def add_part(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (splitmix64(bh ^ (bid * np.uint64(0x9E3779B97F4A7C15)))
                  % np.uint64(partitions)).astype(np.int32)
        return t.append_column("pk", pa.array(pk))

    return sig.map_batches(add_part, batch_format="pyarrow").groupby("pk").map_groups(
        _partition_pairs, batch_format="pyarrow"
    )


class PairVerifier:
    """Actor-pool stage: exact n-gram Jaccard over candidate pairs.
    The doc_id→text map is fetched from the object store once per actor."""

    def __init__(self, corpus_ref, shingle_k: int = 5, threshold: float = 0.7):
        import ray

        self.texts = ray.get(corpus_ref)
        self.k = shingle_k
        self.threshold = threshold
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, i: int) -> np.ndarray | None:
        """None for ids with no corpus text — jaccard("", "") is 1.0
        and would report a false-positive duplicate (same contract as
        the join verifier's missing-text -1 sentinel)."""
        if i not in self.texts or self.texts[i] is None:
            return None
        s = self._cache.get(i)
        if s is None:
            s = char_shingle_hashes(self.texts[i], self.k)
            if len(self._cache) < 50_000:
                self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)

        def score(x: int, y: int) -> float:
            sx, sy = self._sh(int(x)), self._sh(int(y))
            return -1.0 if sx is None or sy is None else jaccard(sx, sy)

        j = np.array([score(x, y) for x, y in zip(a, b)])
        keep = j >= self.threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(np.round(j[keep], 6)),
            }
        )


def _verify_bucket(a: np.ndarray, b: np.ndarray, parts: int) -> np.ndarray:
    """Verify-bucket id of each (a, b) candidate pair — ONE definition
    used by request tagging, pair tagging and the broadcast request
    index: any divergence would route pairs to buckets that never
    receive their texts."""
    with np.errstate(over="ignore"):
        return (splitmix64(a.view(np.uint64)
                           ^ (b.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
                % np.uint64(parts)).astype(np.int32)


def _join_schema() -> pa.Schema:
    return pa.schema([
        ("j", pa.int32()), ("g", pa.int32()), ("a", pa.int64()),
        ("b", pa.int64()), ("doc_id", pa.int64()), ("text", pa.string()),
    ])


def verified_pairs_join(cand, ds, *, shingle_k=5, threshold=0.7,
                        text_col="text", key_col="doc_id",
                        join_parts=64, verify_parts=64,
                        requests="broadcast"):
    """Distributed pair verification — no driver materialization of
    corpus TEXT (the naive broadcast path OOMs the driver long before
    LSH breaks). Two request-routing modes:

    - ``requests="broadcast"`` (default): the (doc_id → verify bucket)
      request index — INTS only, O(#candidate ids), the same order the
      driver already holds for union-find clustering — is broadcast via
      ``ray.put``; ONE narrow map pass over the corpus emits each
      requested text to its verify bucket(s) via vectorized
      searchsorted. The corpus itself never shuffles.
    - ``requests="shuffle"``: fully driver-O(1) — requests ∪ corpus are
      grouped by ``hash(doc_id) % join_parts`` and each join partition
      resolves its texts locally. One extra all-to-all; use when even
      the candidate-id list could exceed driver memory (adversarial
      all-duplicate corpora).

    Then verification: pairs ∪ routed texts are grouped by verify
    bucket g; each bucket builds its local doc→shingles map and
    computes exact n-gram Jaccard. Duplicate candidates from multiple
    agreeing LSH bands collapse here (same (a,b) ⇒ same g), replacing
    the old per-pair ``groupby(["a","b"]).map_groups`` dedup pass.

    Text movement is O(requested texts) (+ corpus once for "shuffle");
    output: (a, b, jaccard), a < b, jaccard ≥ threshold — identical to
    the in-memory broadcast verifier's."""
    schema = _join_schema()
    # both the request pass and the verify pass consume the candidate
    # set; materialize it once (it is O(dups) small — post-banding pairs,
    # never raw text) so the LSH signature DAG doesn't execute twice
    cand = cand.materialize()

    def tag_requests(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _verify_bucket(a, b, verify_parts)
        doc = np.concatenate([a, b])
        gg = np.concatenate([g, g])
        j = (splitmix64(doc.view(np.uint64)) % np.uint64(join_parts)).astype(np.int32)
        return pa.table({
            "j": pa.array(j), "g": pa.array(gg),
            "a": pa.nulls(2 * len(a), pa.int64()),
            "b": pa.nulls(2 * len(a), pa.int64()),
            "doc_id": pa.array(doc), "text": pa.nulls(2 * len(a), pa.string()),
        }, schema=schema)

    def corpus_rows(t: pa.Table) -> pa.Table:
        doc = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        j = (splitmix64(doc.view(np.uint64)) % np.uint64(join_parts)).astype(np.int32)
        n = len(doc)
        return pa.table({
            "j": pa.array(j), "g": pa.array(np.full(n, -1, np.int32)),
            "a": pa.nulls(n, pa.int64()), "b": pa.nulls(n, pa.int64()),
            "doc_id": pa.array(doc), "text": t[text_col].cast(pa.string()),
        }, schema=schema)

    def join_texts(group: pa.Table) -> pa.Table:
        g = group["g"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        is_corpus = g < 0
        req = np.unique(np.stack([doc[~is_corpus], g[~is_corpus]], axis=1), axis=0)
        if len(req) == 0:
            return pa.table({"j": pa.array([], pa.int32()), "g": pa.array([], pa.int32()),
                             "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}, schema=schema)
        cd = doc[is_corpus]
        if len(cd) == 0:  # requests but no corpus rows in this partition
            return schema.empty_table()
        order = np.argsort(cd, kind="stable")
        pos = np.searchsorted(cd[order], req[:, 0])
        pos_c = np.minimum(pos, len(cd) - 1)
        found = cd[order][pos_c] == req[:, 0]
        sel = order[pos_c[found]]
        texts = group["text"].filter(pa.array(is_corpus)).take(pa.array(sel))
        n = int(found.sum())
        return pa.table({
            "j": pa.array(np.zeros(n, np.int32)),
            "g": pa.array(req[found, 1].astype(np.int32)),
            "a": pa.nulls(n, pa.int64()), "b": pa.nulls(n, pa.int64()),
            "doc_id": pa.array(req[found, 0].astype(np.int64)), "text": texts,
        }, schema=schema)

    def verify(group: pa.Table) -> pa.Table:
        # split FIRST, convert null-free columns after: to_numpy on a
        # nullable int64 column decodes through float64 and silently
        # corrupts doc ids >= 2^53 (the hashed-64-bit-key scale case)
        is_text_mask = pc.is_null(group["a"])
        text_rows = group.filter(is_text_mask)
        pair_rows = group.filter(pc.invert(is_text_mask))
        doc = text_rows["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        texts = text_rows["text"].to_pylist()
        text_of = dict(zip(doc, texts))
        a = pair_rows["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = pair_rows["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([a, b], axis=1), axis=0) if len(a) \
            else np.empty((0, 2), np.int64)
        cache: dict[int, np.ndarray] = {}

        def sh(i: int) -> np.ndarray | None:
            # a doc id with NO routed text OR a NULL text is a
            # verification FAILURE for its pairs (None), not an empty
            # document — jaccard("","") is 1.0 and would report a
            # false-positive duplicate (same contract as the broadcast
            # verifier's _sh; `or ""` here used to diverge on nulls)
            if i not in text_of or text_of[i] is None:
                return None
            s = cache.get(i)
            if s is None:
                s = char_shingle_hashes(text_of[i], shingle_k)
                cache[i] = s
            return s

        def pair_jac(x: int, y: int) -> float:
            sx, sy = sh(x), sh(y)
            return -1.0 if sx is None or sy is None else jaccard(sx, sy)

        jac = np.array([pair_jac(int(x), int(y)) for x, y in pairs],
                       dtype=np.float64) if len(pairs) else np.empty(0)
        keep = jac >= threshold
        return pa.table({
            "a": pa.array(pairs[keep, 0] if len(pairs) else [], pa.int64()),
            "b": pa.array(pairs[keep, 1] if len(pairs) else [], pa.int64()),
            "jaccard": pa.array(np.round(jac[keep], 6) if len(pairs) else [], pa.float64()),
        })

    if requests == "broadcast":
        import ray

        # driver collects ONLY the (doc_id, g) int request index
        doc_parts, g_parts = [], []
        for bt in cand.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            a = bt["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b = bt["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            g = _verify_bucket(a, b, verify_parts)
            doc_parts += [a, b]
            g_parts += [g, g]
        if doc_parts:
            dg = np.unique(
                np.stack([np.concatenate(doc_parts),
                          np.concatenate(g_parts).astype(np.int64)], axis=1), axis=0)
        else:
            dg = np.empty((0, 2), np.int64)
        req_ref = ray.put((np.ascontiguousarray(dg[:, 0]),
                           np.ascontiguousarray(dg[:, 1].astype(np.int32))))

        def route_texts(t: pa.Table) -> pa.Table:
            from dcpray.rayutil import worker_memo

            # per-worker memo, not a per-batch ray.get: the fetch is
            # node-local/zero-copy but still pays deserialization and a
            # store round-trip on every batch otherwise (the same
            # pattern every other broadcast consumer here uses)
            doc_req, g_req = worker_memo(
                ("minhash_req", req_ref.hex()), lambda: ray.get(req_ref))
            doc = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            lo = np.searchsorted(doc_req, doc, "left")
            hi = np.searchsorted(doc_req, doc, "right")
            counts = hi - lo
            rows = np.repeat(np.arange(len(doc)), counts)
            if len(rows) == 0:
                return schema.empty_table()
            cum = np.cumsum(counts)
            req_idx = np.arange(int(cum[-1])) - np.repeat(cum - counts, counts) \
                + np.repeat(lo, counts)
            n = len(rows)
            return pa.table({
                "j": pa.array(np.zeros(n, np.int32)),
                "g": pa.array(g_req[req_idx]),
                "a": pa.nulls(n, pa.int64()), "b": pa.nulls(n, pa.int64()),
                "doc_id": pa.array(doc[rows]),
                "text": t[text_col].cast(pa.string()).take(pa.array(rows)),
            }, schema=schema)

        routed = ds.select_columns([key_col, text_col]).map_batches(
            route_texts, batch_format="pyarrow"
        )
    else:
        reqs = cand.map_batches(tag_requests, batch_format="pyarrow")
        corpus = ds.select_columns([key_col, text_col]).map_batches(
            corpus_rows, batch_format="pyarrow"
        )
        routed = reqs.union(corpus).groupby("j").map_groups(
            join_texts, batch_format="pyarrow"
        )

    def pairs_tagged(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = _verify_bucket(a, b, verify_parts)
        n = len(a)
        return pa.table({
            "j": pa.array(np.zeros(n, np.int32)), "g": pa.array(g),
            "a": pa.array(a), "b": pa.array(b),
            "doc_id": pa.nulls(n, pa.int64()), "text": pa.nulls(n, pa.string()),
        }, schema=schema)

    tagged = cand.map_batches(pairs_tagged, batch_format="pyarrow")
    return tagged.union(routed).groupby("g").map_groups(
        verify, batch_format="pyarrow"
    )


def minhash_dup_pairs(ds, threshold=0.7, num_perm=128, bands=16, shingle_k=5,
                      text_col="text", key_col="doc_id", concurrency=4,
                      verify="join", requests="broadcast"):
    """Verified near-duplicate pairs (a < b, jaccard ≥ threshold).

    ``verify="join"`` (default): distributed verification — corpus text
    never lands on the driver; ``requests`` picks the routing mode (see
    ``verified_pairs_join``). ``verify="broadcast"``: driver builds the
    full doc→text dict and broadcasts it via ``ray.put`` — only for
    small corpora (≲10⁶ docs)."""
    cand = minhash_candidate_pairs(ds, num_perm, bands, shingle_k, text_col, key_col, concurrency)
    if verify == "join":
        corpus = ds.select_columns([key_col, text_col])
        return verified_pairs_join(
            cand.drop_columns(["capped"]), corpus,
            shingle_k=shingle_k, threshold=threshold,
            text_col=text_col, key_col=key_col, requests=requests,
        )
    import ray

    # drop duplicate pairs produced by multiple agreeing bands
    cand = cand.groupby(["a", "b"]).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    corpus = {}
    for bt in ds.select_columns([key_col, text_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        corpus.update(zip(bt[key_col].to_pylist(), bt[text_col].to_pylist()))
    ref = ray.put(corpus)
    return cand.drop_columns(["capped"]).map_batches(
        PairVerifier, fn_constructor_args=(ref, shingle_k, threshold),
        batch_format="pyarrow", concurrency=concurrency,
    )


def cluster_pairs(pairs_df) -> dict[int, int]:
    """Union-find over verified pairs → {doc_id: representative(min id)}.
    Pair sets after banding+verify are O(#dups); for corpora where even
    that is huge, replace with iterative min-label propagation rounds."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def cluster_pairs_distributed(pairs_ds, parts: int = 32, max_rounds: int = 50,
                              rows_per_part: int = 100_000):
    """Distributed connected components over the verified-pair edge set —
    the scale fallback for ``cluster_pairs`` when even O(#dup pairs)
    exceeds driver memory. Iterative min-label propagation: each round
    joins current labels onto edges AND onto the label links themselves
    (pointer jumping: node → label acts as an extra edge, so label[u]
    also contracts toward label[label[u]]) — one coarse-partition
    groupby with vectorized searchsorted inside — then takes the
    per-node min over {own label} ∪ {propagated candidates} (second
    groupby). Pointer jumping makes convergence O(log n) rounds even on
    path graphs, not O(diameter). Returns a Dataset of
    (doc_id, rep_id), rep = component min — the same contract as
    driver-side ``cluster_pairs``."""
    import ray.data as rd

    # Size the partition count to the EDGE SET before any pk is
    # assigned (edge pk values are baked in at materialization, so
    # co-partitioning requires one modulus throughout): every label
    # round costs ~parts tasks per stage regardless of data, so a small
    # verified-pair set must not pay 32 tasks/stage/round of fixed
    # scheduling overhead. The pair set is O(#dups) — materializing it
    # here is the same bound the auto-switch already relies on.
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    parts = max(1, min(parts, -(-2 * n_pairs // rows_per_part)))

    edge_schema = pa.schema([("pk", pa.int32()), ("node", pa.int64()),
                             ("peer", pa.int64()), ("label", pa.int64())])

    def _pk(x: np.ndarray) -> np.ndarray:
        return (splitmix64(x.view(np.uint64)) % np.uint64(parts)).astype(np.int32)

    def edges_both(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = np.concatenate([a, b])
        peer = np.concatenate([b, a])
        return pa.table({"pk": pa.array(_pk(node)), "node": pa.array(node),
                         "peer": pa.array(peer),
                         "label": pa.nulls(len(node), pa.int64())}, schema=edge_schema)

    edges = pairs_ds.map_batches(edges_both, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        node = np.unique(t["node"].to_numpy(zero_copy_only=False))
        n = len(node)
        return pa.table({"pk": pa.array(_pk(node)), "node": pa.array(node),
                         "peer": pa.nulls(n, pa.int64()),
                         "label": pa.array(node)}, schema=edge_schema)

    def propagate(group: pa.Table) -> pa.Table:
        """One partition: edge rows keyed by node + label rows; emit the
        candidate label for each PEER (label of this node travels over
        its edges)."""
        # split by row kind FIRST so every converted column is null-free
        # int64 (nullable to_numpy decodes via float64, corrupting ids
        # >= 2^53 — same failure mode as the verify join)
        is_lab_mask = pc.invert(pc.is_null(group["label"]))
        lab_rows = group.filter(is_lab_mask)
        edge_rows = group.filter(pc.is_null(group["label"]))
        ln = lab_rows["node"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lv = lab_rows["label"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ln)
        ln, lv = ln[order], lv[order]
        en = edge_rows["node"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ep = edge_rows["peer"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ln) == 0:
            # a partition with edges but no labels (co-partitioning
            # normally prevents it) — & is bitwise, not short-circuit,
            # so the ln[pos] below would IndexError before any guard
            return pa.table({"pk": pa.array([], pa.int32()),
                             "node": pa.array([], pa.int64()),
                             "peer": pa.nulls(0, pa.int64()),
                             "label": pa.array([], pa.int64())},
                            schema=edge_schema)
        pos = np.searchsorted(ln, en)
        pos = np.minimum(pos, max(len(ln) - 1, 0))
        found = ln[pos] == en
        cand_node = ep[found].astype(np.int64)
        cand_lab = lv[pos[found]].astype(np.int64)
        n = len(cand_node)
        return pa.table({"pk": pa.array(_pk(cand_node)), "node": pa.array(cand_node),
                         "peer": pa.nulls(n, pa.int64()),
                         "label": pa.array(cand_lab)}, schema=edge_schema)

    def take_min(group: pa.Table) -> pa.Table:
        node = group["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = group["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        first = np.r_[True, node[1:] != node[:-1]]
        node, lab = node[first], lab[first]
        n = len(node)
        return pa.table({"pk": pa.array(_pk(node)), "node": pa.array(node),
                         "peer": pa.nulls(n, pa.int64()),
                         "label": pa.array(lab)}, schema=edge_schema)

    if edges.count() == 0:
        import ray.data as _rd

        return _rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                        "rep_id": pa.array([], pa.int64())}))

    # node set dedup (several edge batches emit the same node): vectorized
    # per-partition min — initial labels are all the node itself
    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    labels = labels.groupby("pk").map_groups(
        take_min, batch_format="pyarrow"
    ).materialize()

    def label_links(t: pa.Table) -> pa.Table:
        """Labels as extra edges label→node: propagating over them sets
        label[u] ← label[label[u]] (pointer jumping)."""
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = lab != node  # self-links propagate nothing
        src, dst = lab[keep], node[keep]
        return pa.table({"pk": pa.array(_pk(src)), "node": pa.array(src),
                         "peer": pa.array(dst),
                         "label": pa.nulls(len(src), pa.int64())}, schema=edge_schema)

    prev_sum = None
    for _ in range(max_rounds):
        links = labels.map_batches(label_links, batch_format="pyarrow")
        cands = edges.union(links).union(labels).groupby("pk").map_groups(
            propagate, batch_format="pyarrow"
        )
        # bound the block count: each groupby emits as many output
        # partitions as it has input blocks, and union concatenates
        # block lists — without the coalesce the per-round block count
        # (and therefore task count) grows ~3× per round
        labels = cands.union(labels).groupby("pk").map_groups(
            take_min, batch_format="pyarrow"
        ).repartition(parts).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "rep_id": t["label"]}),
        batch_format="pyarrow",
    )


def minhash_dedup(ds, threshold=0.7, cluster="auto",
                  auto_pair_limit=2_000_000, cluster_parts=32, **kw):
    """Full near-dup dedup: returns (labels, survivors_dataset).
    labels: every doc in a dup cluster with its representative; a doc
    survives iff it IS its cluster's representative (min doc_id).

    ``cluster`` picks where connected components run:

    - ``"driver"`` — union-find over the collected pair set. O(#dup
      pairs) driver memory; labels returned as a ``pa.Table``.
    - ``"distributed"`` — ``cluster_pairs_distributed`` min-label
      propagation; the pair set NEVER lands on the driver (the driver
      only ever holds the final int64 drop set, which is what it
      broadcasts anyway). Labels returned as a Dataset.
    - ``"auto"`` (default) — count the (already O(#dups)) pair set
      distributed-side and pick: ≤ ``auto_pair_limit`` pairs → driver,
      else distributed. The pathological corpus (everything
      near-duplicate) therefore cannot OOM the driver through the
      default path."""
    import ray

    key_col = kw.get("key_col", "doc_id")
    pairs_ds = minhash_dup_pairs(ds, threshold=threshold, **kw)
    if cluster == "auto":
        pairs_ds = pairs_ds.materialize()  # pair set only — O(#dups)
        cluster = "driver" if pairs_ds.count() <= auto_pair_limit \
            else "distributed"
    if cluster == "driver":
        pairs = pairs_ds.to_pandas()
        reps = cluster_pairs(pairs)
        drop = np.array(sorted(d for d, r in reps.items() if d != r), np.int64)
        labels = pa.table(
            {
                "doc_id": pa.array(sorted(reps), pa.int64()),
                "rep_id": pa.array([reps[d] for d in sorted(reps)], pa.int64()),
            }
        )
    elif cluster == "distributed":
        labels = cluster_pairs_distributed(pairs_ds, parts=cluster_parts)
        drop_parts = [
            bt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            for bt in labels.map_batches(
                lambda t: t.filter(
                    pc.not_equal(t["rep_id"], t["doc_id"])
                ).select(["doc_id"]),
                batch_format="pyarrow",
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        drop = np.sort(np.concatenate(drop_parts)) if drop_parts else \
            np.empty(0, np.int64)
    else:
        raise ValueError(
            f"cluster must be 'driver', 'distributed' or 'auto', got {cluster!r}"
        )
    # broadcast the drop set ONCE (ray.put + per-worker memoized sorted
    # array) — a closure-captured value_set would re-pickle the whole
    # dup-id list into every task
    drop_ref = ray.put(drop)

    def keep_survivors(t: pa.Table, dref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        d = worker_memo(("minhash_drop", dref.hex()), lambda: ray.get(dref))
        if len(d) == 0:
            return t
        keys = t[key_col].combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        pos = np.minimum(np.searchsorted(d, keys), len(d) - 1)
        return t.filter(pa.array(d[pos] != keys))

    survivors = ds.map_batches(keep_survivors, fn_args=(drop_ref,),
                               batch_format="pyarrow")
    return labels, survivors


# -------------------------------------------------------------- SimHash


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over token hashes →
    (chunk_id, chunk_val, doc_id, simhash) rows for 4×16-bit banding."""

    def __init__(self, text_col="text", key_col="doc_id"):
        self.text_col = text_col
        self.key_col = key_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        """Single-doc reference implementation (tests compare the
        vectorized batch path against this)."""
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            return np.uint64(0)
        h = splitmix64(hash_strings(np.array(toks, dtype=object)))
        bits = (h[:, None] & self.bits[None, :]) != 0
        vote = bits.sum(axis=0) * 2 - len(toks)
        return np.uint64(((vote > 0) * self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        sh = simhash_batch(batch[self.text_col])
        n = len(keys)
        chunk_id = np.tile(np.arange(4, dtype=np.int32), n)
        chunks = np.empty((n, 4), dtype=np.uint64)
        for c in range(4):
            chunks[:, c] = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "chunk_id": pa.array(chunk_id),
                "chunk_val": pa.array(chunks.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(keys, 4)),
                "simhash": pa.array(np.repeat(sh.view(np.int64), 4)),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — replaces a per-value Python
    ``bin(v).count('1')`` loop."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333))
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x * np.uint64(0x0101010101010101)) >> np.uint64(56)
    return x.astype(np.int64)


def simhash_dup_pairs(ds, max_hamming=3, text_col="text", key_col="doc_id",
                      concurrency=4):
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Banding by
    16-bit chunks guarantees recall for ≤3 differing bits (pigeonhole:
    one of 4 chunks must match exactly) — EXCEPT inside a flooded
    (>512-doc) chunk bucket, where the quadratic emit degrades to a
    min-id star and pairs far from the representative may be missed
    (see pairs_in_partition; identical-doc floods are unaffected)."""
    sig = ds.map_batches(
        SimHasher(text_col, key_col), batch_format="pyarrow", concurrency=concurrency
    )

    def add_part(t: pa.Table, partitions: int = 64) -> pa.Table:
        cv = t["chunk_val"].to_numpy(zero_copy_only=False).view(np.uint64)
        ci = t["chunk_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            pk = (splitmix64(cv ^ (ci * np.uint64(0x9E3779B97F4A7C15)))
                  % np.uint64(partitions)).astype(np.int32)
        return t.append_column("pk", pa.array(pk))

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        """Many whole chunk-buckets per partition: one lexsort + run
        detection; only multi-doc runs (rare) emit Hamming pairs."""
        ci = group["chunk_id"].to_numpy(zero_copy_only=False)
        cv = group["chunk_val"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, cv, ci))
        ci, cv, ids, sh = ci[order], cv[order], ids[order], sh[order]
        new = np.r_[True, (ci[1:] != ci[:-1]) | (cv[1:] != cv[:-1])]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.r_[starts, len(ci)])
        a_p, b_p, h_p = [], [], []
        for m in np.flatnonzero(sizes >= 2):
            s, e = starts[m], starts[m] + sizes[m]
            gi, gs = ids[s:e], sh[s:e]
            uniq = np.r_[True, gi[1:] != gi[:-1]]  # ids sorted within run
            gi, gs = gi[uniq], gs[uniq]
            if len(gi) < 2:
                continue
            if len(gi) > 512:
                # pathological bucket (e.g. hundreds of identical docs):
                # a full pairwise emit is quadratic — emit the STAR from
                # the min id instead rather than silently dropping the
                # bucket. Recall caveat (r5 review): only members within
                # max_hamming OF THE REPRESENTATIVE keep an edge, so a
                # qualifying pair (X,Y) with both farther than
                # max_hamming from the rep is lost in THIS bucket — the
                # pigeonhole guarantee is recall-bounded, not exact,
                # once a bucket floods (identical docs, the common
                # flood cause, all sit at distance 0 and are unaffected)
                x = gs[0] ^ gs[1:]
                ham = _popcount64(x)
                keep = ham <= max_hamming
                a_p.append(np.full(int(keep.sum()), gi[0], gi.dtype))
                b_p.append(gi[1:][keep])
                h_p.append(ham[keep].astype(np.int64))
                continue
            iu = np.triu_indices(len(gi), k=1)
            x = gs[iu[0]] ^ gs[iu[1]]
            ham = _popcount64(x)
            keep = ham <= max_hamming
            a_p.append(gi[iu[0]][keep])
            b_p.append(gi[iu[1]][keep])
            h_p.append(ham[keep].astype(np.int64))
        if not a_p:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        return pa.table({
            "a": pa.array(np.concatenate(a_p).astype(np.int64)),
            "b": pa.array(np.concatenate(b_p).astype(np.int64)),
            "hamming": pa.array(np.concatenate(h_p)),
        })

    pairs = sig.map_batches(add_part, batch_format="pyarrow").groupby("pk").map_groups(
        pairs_in_partition, batch_format="pyarrow"
    )
    # duplicate pairs from multiple matching chunks collapse via a
    # vectorized aggregate (hamming is identical across copies), not a
    # per-pair Python map_groups callback
    from ray.data.aggregate import Min

    return pairs.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# --------------------------------------------- embedding-cosine near-dup


class PlaneSigner:
    """Actor-pool stage: random-hyperplane LSH signature of embeddings."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = emb_matrix(batch["embedding"])
        sig = ((emb @ self.planes) > 0) @ (1 << np.arange(self.planes.shape[1]))
        return batch.append_column("sig", pa.array(sig.astype(np.int64)))


def embedding_dup_pairs(ds, threshold=0.95, bits=16, dim=64, concurrency=4):
    """Near-dup (cosine ≥ threshold) pairs via hyperplane-LSH bucketing +
    within-bucket exact cosine. Single-probe: trades some recall for one
    groupby; raise `bits` down / probe count up for higher recall."""
    signed = ds.map_batches(
        PlaneSigner, fn_constructor_args=(dim, bits), batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_cosine(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        emb = emb_matrix(group["embedding"])
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if len(ids) < 2:
            return empty
        norm = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        if len(ids) > 2048:
            # FLOODED bucket — exactly the most-duplicated content. The
            # O(n²) matrix is off the table, but silence would mean
            # "no duplicates here"; emit STAR edges from the min-id
            # representative instead (O(n) one matvec) so downstream
            # clustering still collapses the pile through the rep —
            # same shape as the simhash >512 fallback
            rep = int(np.argmin(ids))
            c = norm @ norm[rep]
            keep = (c >= threshold) & (np.arange(len(ids)) != rep)
            a = np.full(int(keep.sum()), ids[rep], np.int64)
            b = ids[keep].astype(np.int64)
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                             "cosine": pa.array(np.round(c[keep], 6))})
        cos = norm @ norm.T
        iu = np.triu_indices(len(ids), k=1)
        c = cos[iu]
        keep = c >= threshold
        a, b = ids[iu[0]][keep], ids[iu[1]][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "cosine": pa.array(np.round(c[keep], 6))})

    return signed.groupby("sig").map_groups(bucket_cosine, batch_format="pyarrow")


class ExactCosinePairs:
    """Actor-pool stage for EXACT all-pairs cosine near-dup: the
    normalized corpus matrix is broadcast once via ``ray.put`` (one copy
    in the object store, mapped read-only into each actor); every batch
    is one ``batch × corpus`` matmul. O(n·N) total compute, distributed
    per batch — the exact baseline the LSH path approximates, and the
    variant a SQL oracle can verify value-for-value."""

    def __init__(self, corpus_ref, threshold: float):
        import ray

        ids, xn = ray.get(corpus_ref)
        self.ids = ids
        self.xn = xn
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        # non-inplace: emb may be a read-only zero-copy view of the block
        emb = emb_matrix(batch["embedding"])
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = emb @ self.xn.T
        # keep each unordered pair once: a < b
        keep = (cos >= self.threshold) & (ids[:, None] < self.ids[None, :])
        r, c = np.nonzero(keep)
        return pa.table(
            {
                "a": pa.array(ids[r].astype(np.int64)),
                "b": pa.array(self.ids[c].astype(np.int64)),
                # half-up 4dp like DuckDB round(): np.round is half-even
                # and flips exact .5 ties vs the oracle (kept values are
                # >= threshold > 0, so the non-negative form applies)
                "cosine": pa.array(np.floor(cos[r, c] * 1e4 + 0.5) / 1e4),
            }
        )


def embedding_exact_pairs(ds, threshold=0.4, id_col="vec_id",
                          emb_col="embedding", concurrency=4):
    """All (a < b) pairs with exact cosine ≥ threshold.

    DRIVER-BOUNDED: materializes the full (N, dim) corpus matrix on the
    driver before broadcasting it once — O(N·dim·8) driver bytes, so
    ~10⁷ × 64-dim is the practical ceiling (≈5 GB). This is intentional:
    it is the O(n·N) SQL-verifiable baseline that anchors the oracle;
    ``embedding_dup_pairs`` (hyperplane LSH) is the scale path with no
    driver materialization."""
    import ray

    ids_parts, emb_parts = [], []
    for bt in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids_parts.append(bt[id_col].to_numpy(zero_copy_only=False))
        emb_parts.append(emb_matrix(bt[emb_col]))
    ids = np.concatenate(ids_parts)
    xn = np.concatenate(emb_parts)
    xn /= np.linalg.norm(xn, axis=1, keepdims=True)
    ref = ray.put((ids, xn))
    return ds.map_batches(
        ExactCosinePairs, fn_constructor_args=(ref, threshold),
        batch_format="pyarrow", concurrency=concurrency,
    )


# --------------------------------- exact n-gram Jaccard (SQL baseline)


def _doc_ngram_sets(texts, n: int, sep: str):
    """Per-doc DISTINCT word-n-gram string sets (empty tokens dropped),
    matching the oracle's list_distinct(list_transform(...))."""
    out = []
    for t in texts:
        words = [w for w in (t or "").split(sep) if w]
        out.append({sep.join(words[i : i + n])
                    for i in range(len(words) - n + 1)})
    return out


def ngram_jaccard_exact_pairs(ds, threshold: float = 0.5, n: int = 3,
                              id_col: str = "doc_id", text_col: str = "text",
                              sep: str = " ", concurrency: int = 4,
                              max_vocab: int = 50_000_000):
    """All (a < b) pairs with exact word-n-gram-set Jaccard ≥ threshold
    — the SQL-verifiable TEXT-similarity baseline that anchors the
    MinHash+LSH scale path (the text analogue of
    ``embedding_exact_pairs``: intentionally O(n·N), DRIVER-BOUNDED —
    it materializes the corpus n-gram incidence once; MinHash is the
    100-TB path). Pairs whose union is empty (both docs shorter than n
    words) are excluded, matching SQL division-by-zero semantics."""
    import ray

    from dcpray.functions.textstats import round6_half_up

    ids_parts, set_parts = [], []
    for bt in ds.select_columns([id_col, text_col]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        ids_parts.append(bt[id_col].to_numpy(zero_copy_only=False))
        set_parts.extend(_doc_ngram_sets(bt[text_col].to_pylist(), n, sep))
    ids = np.concatenate(ids_parts).astype(np.int64)
    vocab: dict[str, int] = {}
    indptr = np.zeros(len(set_parts) + 1, np.int64)
    codes_list = []
    for i, s in enumerate(set_parts):
        for g in s:
            c = vocab.get(g)
            if c is None:
                c = vocab[g] = len(vocab)
        codes_list.append(np.fromiter((vocab[g] for g in s), np.int64,
                                      count=len(s)))
        indptr[i + 1] = indptr[i] + len(s)
        if len(vocab) > max_vocab:  # fail DURING the build, before OOM
            break
    if len(vocab) > max_vocab:
        raise ValueError(
            f"n-gram vocabulary {len(vocab)} exceeds max_vocab={max_vocab}; "
            "this exact baseline is for corpora the driver can hold — "
            "use minhash_dup_pairs at scale"
        )
    codes = np.concatenate(codes_list) if codes_list else np.empty(0, np.int64)
    sizes = np.diff(indptr)
    ref = ray.put({"ids": ids, "indptr": indptr, "codes": codes,
                   "sizes": sizes, "vocab_size": len(vocab)})

    def score(batch: pa.Table, rref) -> pa.Table:
        from dcpray.rayutil import worker_memo

        def build():
            # SPARSE per-worker index: an inverted code→doc posting list
            # (CSR by code) instead of a dense (n_docs × vocab) matrix —
            # memory is O(nnz + n_docs), never O(n_docs · vocab), so
            # workers can't OOM under the max_vocab guard
            r = ray.get(rref)
            nc = len(r["ids"])
            V = max(r["vocab_size"], 1)
            rows = np.repeat(np.arange(nc, dtype=np.int64),
                             np.diff(r["indptr"]))
            order = np.argsort(r["codes"], kind="stable")
            inv_docs = rows[order]                 # doc ids grouped by code
            code_indptr = np.searchsorted(
                r["codes"][order], np.arange(V + 1, dtype=np.int64))
            return r, inv_docs, code_indptr, np.argsort(r["ids"])

        r, inv_docs, code_indptr, id_order = worker_memo(
            ("ngram_jac", rref.hex()), build)
        b_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = len(r["ids"])
        if len(b_ids) == 0 or nc == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        # the corpus IS the batch source in this baseline, so batch rows
        # exist in the corpus — look their code rows up by doc_id
        pos = np.searchsorted(r["ids"][id_order], b_ids)
        pos = np.minimum(pos, len(id_order) - 1)
        src = id_order[pos]
        assert (r["ids"][src] == b_ids).all(), "batch doc missing from corpus index"
        out_a, out_b, out_j = [], [], []
        for j, si in enumerate(src):
            cs = r["codes"][r["indptr"][si]:r["indptr"][si + 1]]
            size_b = np.int64(len(cs))
            if size_b:
                lo, hi = code_indptr[cs], code_indptr[cs + 1]
                sizes = hi - lo
                total = int(sizes.sum())
                off = np.cumsum(sizes) - sizes
                idx = np.repeat(lo - off, sizes) + np.arange(total, dtype=np.int64)
                inter = np.bincount(inv_docs[idx], minlength=nc)
            else:
                inter = np.zeros(nc, np.int64)
            union = size_b + r["sizes"] - inter
            with np.errstate(divide="ignore", invalid="ignore"):
                jac = np.where(union > 0, inter / union, 0.0)
            keep = (jac >= threshold) & (b_ids[j] < r["ids"]) & (union > 0)
            ci = np.flatnonzero(keep)
            if len(ci):
                out_a.append(np.full(len(ci), b_ids[j], np.int64))
                out_b.append(r["ids"][ci])
                out_j.append(jac[ci])
        cat = (lambda parts, d: np.concatenate(parts) if parts
               else np.empty(0, d))
        return pa.table({
            "a": pa.array(cat(out_a, np.int64), pa.int64()),
            "b": pa.array(cat(out_b, np.int64).astype(np.int64), pa.int64()),
            "jaccard": pa.array(round6_half_up(cat(out_j, np.float64))),
        })

    return ds.map_batches(score, fn_args=(ref,), batch_format="pyarrow")
