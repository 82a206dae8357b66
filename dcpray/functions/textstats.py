"""Text analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` stages over the
``documents`` table (doc_id, text, lang, source, n_chars). Stateful
pieces (compiled regexes, stopword tables) live in callable classes →
Ray actor pools (setup once per actor in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import splitmix64

# semantics shared with the DuckDB oracle (see __ray_entry__.oracle_sql):
#   n_tokens  = count of \S+ runs
#   n_chars   = length(text)
#   punct_ratio = count([^A-Za-z0-9\s]) / max(n_chars, 1), rounded 6dp
#   upper_ratio = count([A-Z]) / max(n_chars, 1), rounded 6dp
# rounding is HALF-UP (duckdb round()); numpy/arrow default to half-even,
# which flips exact .5e-6 ties and hash-mismatches the oracle


def round6_half_up(x):
    """Half-up 6dp round matching DuckDB's round() on non-negatives —
    THE rounding convention every oracle-hashed float column uses
    (numpy/arrow default to half-even, which flips exact .5e-6 ties).
    Shared by textstats and the multimodal decode stats."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


_round6 = round6_half_up  # internal alias


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = pc.count_substring_regex(batch[text_col], r"\S+")
    return batch.append_column("n_tokens", pc.cast(toks, pa.int64()))


#: BPE-style pre-tokenizer (GPT-2 family), RE2-compatible: contraction
#: suffixes, space-prefixed letter/digit/punct runs, whitespace runs.
#: RE2 has no lookahead, so the original pattern's trailing-space
#: refinement (\s+(?!\S)) is dropped — both the engine (Arrow) and the
#: oracle (DuckDB) run THIS exact pattern on the same RE2 semantics.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def token_count_bpe(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Subword-style token count: matches of the BPE pre-tokenizer
    regex — the cheap proxy for 'how many BPE tokens will this document
    cost' that large-scale training pipelines budget with (whitespace
    count underestimates code/punctuation-heavy text)."""
    toks = pc.count_substring_regex(batch[text_col], BPE_PRETOKEN_RE)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens_bpe": pc.cast(toks, pa.int64()),
    })


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + length/punctuation/case stats (quality-signal features)."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    denom = pc.max_element_wise(n_chars, 1)
    punct = pc.count_substring_regex(text, r"[^A-Za-z0-9\s]")
    upper = pc.count_substring_regex(text, r"[A-Z]")
    # preserve NULL-ness through the numpy round-trip: the raw divide
    # of two nulls decodes to NaN via to_numpy, which _round6 would
    # emit as a NON-null NaN value — the SQL oracle (and the sibling
    # n_chars/n_tokens columns) keep null text null
    null_mask = pc.is_null(text)
    punct_ratio = pc.if_else(null_mask, pa.nulls(len(text), pa.float64()),
                             pa.array(_round6(pc.divide(
                                 pc.cast(punct, pa.float64()),
                                 pc.cast(denom, pa.float64()))
                                 .to_numpy(zero_copy_only=False))))
    upper_ratio = pc.if_else(null_mask, pa.nulls(len(text), pa.float64()),
                             pa.array(_round6(pc.divide(
                                 pc.cast(upper, pa.float64()),
                                 pc.cast(denom, pa.float64()))
                                 .to_numpy(zero_copy_only=False))))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
        }
    )


class QualityScorer:
    """Actor-pool stage: composite quality score from cheap heuristics
    (length band, stopword ratio, alphabetic ratio, repetition).
    Fully vectorized: Arrow regex split → flat word list → per-doc
    reduceat sums (stopword membership via one ``is_in`` pass; distinct
    words via factorize + bincount). The stopword value-set is built
    once per actor."""

    STOPWORDS = (
        "the", "and", "of", "a", "to", "in", "is", "it", "for", "on",
        "with", "as", "was", "at", "by", "an", "be", "this", "that",
    )

    def __init__(self):
        self.stop_set = pa.array(sorted(self.STOPWORDS), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n = batch.num_rows
        filled = pc.fill_null(text, "")
        n_chars = pc.utf8_length(filled).to_numpy(zero_copy_only=False).astype(np.int64)

        # words per doc = regex findall [a-z]+ over the lowercased text,
        # expressed as split-on-[^a-z]+ then dropping empty fragments
        toks = pc.split_pattern_regex(pc.utf8_lower(filled), r"[^a-z]+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts_raw = offs[1:] - offs[:-1]
        nonempty = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0 \
            if len(flat) else np.empty(0, bool)
        is_stop = pc.is_in(flat, value_set=self.stop_set).to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)

        n_words = np.zeros(n, np.int64)
        n_stop = np.zeros(n, np.int64)
        n_uniq = np.zeros(n, np.int64)
        has = counts_raw > 0
        if has.any():
            starts = offs[:-1][has]
            n_words[has] = np.add.reduceat(nonempty.astype(np.int64), starts)
            n_stop[has] = np.add.reduceat((is_stop & nonempty).astype(np.int64), starts)
            # distinct words per doc: factorize the flat words, then count
            # unique (doc, code) pairs per doc
            seg = np.repeat(np.arange(n), counts_raw)[nonempty]
            codes = pd.factorize(
                flat.filter(pa.array(nonempty)).to_numpy(zero_copy_only=False)
            )[0]
            ncodes = codes.max() + 1 if len(codes) else 1
            pairs = np.unique(seg.astype(np.int64) * ncodes + codes)
            n_uniq = np.bincount((pairs // ncodes).astype(np.int64), minlength=n)

        alpha = pc.count_substring_regex(filled, r"[A-Za-z]").to_numpy(zero_copy_only=False).astype(np.float64)
        denom_w = np.maximum(n_words, 1).astype(np.float64)
        stop = np.where(n_words > 0, n_stop / denom_w, 0.0)
        uniq = np.where(n_words > 0, n_uniq / denom_w, 0.0)
        alpha_ratio = alpha / np.maximum(1, n_chars)
        length_band = np.where((n_chars >= 50) & (n_chars <= 4000), 1.0, 0.3)
        scores = (0.3 * length_band + 0.2 * np.minimum(stop * 4, 1.0)
                  + 0.25 * alpha_ratio + 0.25 * uniq)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "stopword_ratio": pa.array(_round6(stop)),
                "quality_score": pa.array(_round6(scores)),
            }
        )


class LangId:
    """Actor-pool stage: n-gram / stopword heuristic language ID over
    {en, de, fr, es, zh}. Deliberately self-contained (no models in the
    container); per-actor setup builds the profile tables once."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
        "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"},
        "fr": {"le", "la", "les", "et", "des", "est", "pour", "que", "une", "dans"},
        "es": {"el", "la", "los", "las", "es", "por", "que", "una", "con", "para"},
    }

    ACCENT = {"de": r"[äöüß]", "fr": r"[éèêàçœ]", "es": r"[ñáíóú¿¡]"}
    #: chars that form a "word" for profile matching (the oracle's
    #: regexp_extract_all character class)
    WORD = "a-zäöüßéèêàçñ"

    def __init__(self):
        # ONE tokenizing split pattern + one Arrow value-set per profile
        # (built once per actor). The batch pass is: tokenize once,
        # factorize the flat token list, reduce to distinct (doc, token)
        # pairs, then 4 ``is_in`` membership lookups over the UNIQUE
        # tokens only — replacing the old ~40 whole-word regex scans of
        # every batch (one regex pass per profile word) with a single
        # regex split. Semantics are unchanged: a token is a maximal run
        # of WORD-class chars, and each profile word contributes 0 or 1
        # per doc regardless of multiplicity (the oracle's set
        # intersection).
        self.split_pat = rf"[^{self.WORD}]+"
        self.stop_sets = {
            lang: pa.array(sorted(stops), pa.string())
            for lang, stops in self.PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        lower = pc.utf8_lower(text)
        n = batch.num_rows
        scores = {lang: np.zeros(n, np.int64) for lang in self.PROFILES}

        toks = pc.split_pattern_regex(lower, self.split_pat)
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        if len(flat):
            # Arrow dictionary-encode instead of pandas factorize: no
            # object-array round-trip, and profile membership resolves
            # against the (tiny) dictionary, not per token
            de = pc.dictionary_encode(flat)
            codes = de.indices.to_numpy(zero_copy_only=False)
            dictionary = de.dictionary
            hits = {
                lang: pc.is_in(dictionary, value_set=stop_set).to_numpy(
                    zero_copy_only=False
                )
                for lang, stop_set in self.stop_sets.items()
            }
            any_hit = np.zeros(len(dictionary), bool)
            for h in hits.values():
                any_hit |= h
            mi = np.flatnonzero(any_hit[codes])  # "" is never a profile
            if len(mi):                          # word — auto-excluded
                # doc of each MATCHED token via searchsorted on the list
                # offsets — never materializes the full-width doc-index
                # vector (np.repeat over every token was the hotspot)
                offs = toks.offsets.to_numpy(zero_copy_only=False)
                seg = (np.searchsorted(offs, mi, side="right") - 1).astype(np.int64)
                ncodes = len(dictionary)
                # distinct (doc, profile word): dedup only the MATCHED
                # token occurrences (a small fraction of the batch)
                pairs = np.unique(seg * ncodes + codes[mi].astype(np.int64))
                pair_doc = pairs // ncodes
                pair_code = pairs % ncodes
                for lang, code_hit in hits.items():
                    hit = code_hit[pair_code]
                    scores[lang] = np.bincount(
                        pair_doc[hit], minlength=n
                    ).astype(np.int64)

        for lang, acc in self.ACCENT.items():
            scores[lang] = scores[lang] + 2 * pc.match_substring_regex(
                text, acc
            ).to_numpy(zero_copy_only=False)

        empty = pc.equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
        cjk = pc.match_substring_regex(text, r"[一-鿿]").to_numpy(zero_copy_only=False)
        s_en, s_de, s_fr, s_es = (scores[lang] for lang in ("en", "de", "fr", "es"))
        # tie-break order mirrors the oracle CASE exactly: es beats all on
        # strict >, then fr, then de, else en
        preds = np.select(
            [empty, cjk,
             s_es > np.maximum(np.maximum(s_en, s_de), s_fr),
             s_fr > np.maximum(s_en, s_de),
             s_de > s_en],
            ["und", "zh", "es", "fr", "de"],
            default="en",
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds.tolist(), pa.string())}
        )


# Task-pool forms of the scorer stages: their per-actor state (stopword
# value-sets, profile tables) costs microseconds to build, so a TASK
# pool with a process-level singleton beats paying actor-pool spin-up
# (~1 s wall on a 32-CPU box) for every short job. Use the classes with
# map_batches(cls, concurrency=N) only when the state is genuinely
# expensive (models); use these functions otherwise.

def quality_score_batch(batch: pa.Table) -> pa.Table:
    from dcpray.rayutil import worker_memo

    return worker_memo("quality_scorer", QualityScorer)(batch)


def lang_id_batch(batch: pa.Table) -> pa.Table:
    from dcpray.rayutil import worker_memo

    return worker_memo("lang_id", LangId)(batch)


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic 64-bit document fingerprint: rolling polynomial hash
    of the whitespace-normalized text (stable content identity for dedup
    joins / lineage). Vectorized via pandas string hash + mixing."""
    # null text -> "" BEFORE hashing: pandas' object hash maps None to
    # the same value as the literal string "None" (verified), which
    # would merge a null doc with a real "None" doc (the md5 sibling
    # instead emits NULL for null text to match its SQL oracle; this
    # non-SQL fingerprint keeps the fill-to-"" convention)
    norm = pc.fill_null(batch[text_col], "")
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    from dcpray.hashing import hash_strings

    fp = splitmix64(hash_strings(norm))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array([format(x, "016x") for x in fp], pa.string()),
        }
    )


def fingerprint_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint as md5 of the whitespace-normalized text — the
    SQL-verifiable sibling of ``fingerprint`` (DuckDB: md5(trim(
    regexp_replace(text, '\\s+', ' ', 'g')))). Same normalization."""
    import hashlib

    norm = pc.replace_substring_regex(batch[text_col], r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    # null text -> NULL fingerprint, matching the oracle (md5(NULL) IS
    # NULL in SQL); mapping null to md5("") would merge a null doc with
    # an empty doc in fingerprint-keyed dedup joins (r5 review)
    digests = [
        None if s is None else hashlib.md5(s.encode("utf-8")).hexdigest()
        for s in norm.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint_md5": pa.array(digests, pa.string()),
        }
    )


def repetition_stats(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n") -> pa.Table:
    """Per-document repetition signals — the Gopher-style quality rules
    (Rae et al. 2021, appendix A1) that gate web documents on internal
    duplication. Among the ``sep``-delimited segments of each document
    (lines for ``sep="\\n"``, words for ``sep=" "``):

    - ``n_segments``      — total segment count,
    - ``dup_seg_frac``    — fraction of segments that repeat an
      identical earlier segment (occurrences beyond the first),
    - ``dup_char_frac``   — fraction of segment characters inside those
      repeats (NULL when the document has zero segment characters).

    A document is one row, so its stats are complete within its batch —
    ZERO exchange; one vectorized pass per batch (Arrow split +
    dictionary codes + numpy lexsort/bincount, no Python per row).
    Divisions are float64 over exact integer counts, bit-identical to
    the SQL oracle's CAST(... AS DOUBLE) arithmetic. Null text yields
    null stats (SQL: the lines CTE drops the doc; the oracle re-attaches
    it with a LEFT JOIN)."""
    text = batch[text_col]
    null_mask = pc.is_null(text)
    toks = pc.split_pattern(pc.fill_null(text, ""), sep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    par = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lens = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy(
        zero_copy_only=False).astype(np.float64)
    # distinct-segment identity WITHIN the batch: dictionary codes
    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_rows = batch.num_rows
    n = np.bincount(par, minlength=n_rows)  # >= 1 (split("") == [""])
    tot_chars = np.bincount(par, weights=lens, minlength=n_rows)
    order = np.lexsort((codes, par))
    ps, cs = par[order], codes[order]
    first = np.r_[True, (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])] \
        if len(ps) else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    counts = np.diff(np.r_[starts, len(ps)])  # occurrences per (doc, seg)
    gpar = ps[starts]
    glen = lens[order][starts]
    dup = np.bincount(gpar, weights=(counts - 1).astype(np.float64),
                      minlength=n_rows)
    dup_chars = np.bincount(gpar, weights=(counts - 1) * glen,
                            minlength=n_rows)
    frac = dup / np.maximum(n, 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        cfrac = dup_chars / tot_chars
    nulls_f = pa.nulls(n_rows, pa.float64())
    return pa.table({
        id_col: batch[id_col],
        "n_segments": pc.if_else(null_mask, pa.nulls(n_rows, pa.int64()),
                                 pa.array(n.astype(np.int64))),
        "dup_seg_frac": pc.if_else(null_mask, nulls_f, pa.array(frac)),
        "dup_char_frac": pc.if_else(
            pc.or_(null_mask, pa.array(tot_chars == 0)), nulls_f,
            pa.array(np.where(tot_chars == 0, 0.0, cfrac))),
    })


def ngram_repetition_stats(batch: pa.Table, n: int = 2,
                           text_col: str = "text", id_col: str = "doc_id",
                           sep: str = " ") -> pa.Table:
    """Per-document duplicate word-n-gram signals — the second half of
    the Gopher repetition rules (``repetition_stats`` covers n=1):
    among each document's consecutive n-token windows,

    - ``n_ngrams``          — window count (0 when the doc has < n tokens),
    - ``dup_ngram_frac``    — fraction of windows repeating an earlier
      identical window (NULL when ``n_ngrams`` is 0),
    - ``dup_ngram_char_frac`` — fraction of window characters (sum of
      token lengths) inside those repeats (NULL when zero chars).

    Duplicate-fraction form, not top-n-gram form, because it is
    TIE-FREE: "most common n-gram" needs a tiebreak rule the SQL oracle
    would have to reproduce; duplicate fractions are pure sums. n-gram
    identity is EXACT (iterated pair-unique over dictionary codes —
    no hashing, so no collision can corrupt a count). Zero exchange,
    one vectorized pass per batch; null text yields null stats."""
    if n < 2:
        raise ValueError("ngram_repetition_stats: need n >= 2 "
                         "(use repetition_stats for n=1)")
    text = batch[text_col]
    null_mask = pc.is_null(text)
    toks = pc.split_pattern(pc.fill_null(text, ""), sep)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    par = pc.list_parent_indices(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    lens = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy(
        zero_copy_only=False).astype(np.int64)
    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_rows = batch.num_rows
    m = len(par)
    if m >= n:
        # windows starting at i covering [i, i+n): valid iff the whole
        # window sits in one document
        valid = par[: m - n + 1] == par[n - 1:]
        wpar = par[: m - n + 1][valid]
        # exact window identity: fold successive token codes with a
        # pair-unique per step (ids stay < #distinct pairs, never hash)
        wid = codes[: m - n + 1][valid]
        for j in range(1, n):
            nxt = codes[j: m - n + 1 + j][valid]
            pair = wid * (nxt.max() + 1 if len(nxt) else 1) + nxt
            _, wid = np.unique(pair, return_inverse=True)
        csum = np.r_[0, np.cumsum(lens)]
        wlen = (csum[n:] - csum[:-n])[valid]  # sum of the n token lens
    else:
        wpar = np.empty(0, np.int64)
        wid = np.empty(0, np.int64)
        wlen = np.empty(0, np.int64)
    cnt = np.bincount(wpar, minlength=n_rows)
    tot_chars = np.bincount(wpar, weights=wlen.astype(np.float64),
                            minlength=n_rows)
    order = np.lexsort((wid, wpar))
    ps, ws = wpar[order], wid[order]
    first = np.r_[True, (ps[1:] != ps[:-1]) | (ws[1:] != ws[:-1])] \
        if len(ps) else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    occ = np.diff(np.r_[starts, len(ps)])
    gpar = ps[starts]
    glen = wlen[order][starts].astype(np.float64)
    dup = np.bincount(gpar, weights=(occ - 1).astype(np.float64),
                      minlength=n_rows)
    dup_chars = np.bincount(gpar, weights=(occ - 1) * glen,
                            minlength=n_rows)
    with np.errstate(invalid="ignore", divide="ignore"):
        frac = np.where(cnt > 0, dup / np.maximum(cnt, 1), np.nan)
        cfrac = np.where(tot_chars > 0, dup_chars / np.maximum(tot_chars, 1),
                         np.nan)
    nulls_f = pa.nulls(n_rows, pa.float64())
    no_ngram = pa.array(cnt == 0)
    no_chars = pa.array(tot_chars == 0)
    return pa.table({
        id_col: batch[id_col],
        "n_ngrams": pc.if_else(null_mask, pa.nulls(n_rows, pa.int64()),
                               pa.array(cnt.astype(np.int64))),
        "dup_ngram_frac": pc.if_else(
            pc.or_(null_mask, no_ngram), nulls_f,
            pa.array(np.nan_to_num(frac, nan=0.0))),
        "dup_ngram_char_frac": pc.if_else(
            pc.or_(null_mask, no_chars), nulls_f,
            pa.array(np.nan_to_num(cfrac, nan=0.0))),
    })
