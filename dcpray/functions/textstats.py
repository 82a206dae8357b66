"""Text analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` stages over the
``documents`` table (doc_id, text, lang, source, n_chars). Stateful
pieces (compiled regexes, stopword tables) live in callable classes →
Ray actor pools (setup once per actor in ``__init__``).
"""

from __future__ import annotations

import re

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


def _round6(x):
    """Half-up 6dp round matching DuckDB's round() on non-negatives."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) / 1e6


def token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = pc.count_substring_regex(batch[text_col], r"\S+")
    return batch.append_column("n_tokens", pc.cast(toks, pa.int64()))


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + length/punctuation/case stats (quality-signal features)."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
    denom = pc.max_element_wise(n_chars, 1)
    punct = pc.count_substring_regex(text, r"[^A-Za-z0-9\s]")
    upper = pc.count_substring_regex(text, r"[A-Z]")
    punct_ratio = pa.array(_round6(pc.divide(pc.cast(punct, pa.float64()), pc.cast(denom, pa.float64())).to_numpy(zero_copy_only=False)))
    upper_ratio = pa.array(_round6(pc.divide(pc.cast(upper, pa.float64()), pc.cast(denom, pa.float64())).to_numpy(zero_copy_only=False)))
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
    Stopword sets and regexes are built once per actor."""

    STOPWORDS = {
        "the", "and", "of", "a", "to", "in", "is", "it", "for", "on",
        "with", "as", "was", "at", "by", "an", "be", "this", "that",
    }

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.alpha_re = re.compile(r"[A-Za-z]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        scores = np.empty(len(texts))
        stop_ratios = np.empty(len(texts))
        for i, t in enumerate(texts):
            t = t or ""
            words = self.word_re.findall(t.lower())
            n = len(words)
            stop = sum(w in self.STOPWORDS for w in words) / n if n else 0.0
            alpha = len(self.alpha_re.findall(t)) / max(1, len(t))
            uniq = len(set(words)) / n if n else 0.0
            length_band = 1.0 if 50 <= len(t) <= 4000 else 0.3
            scores[i] = 0.3 * length_band + 0.2 * min(stop * 4, 1.0) + 0.25 * alpha + 0.25 * uniq
            stop_ratios[i] = stop
        scores = _round6(scores)
        stop_ratios = _round6(stop_ratios)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "stopword_ratio": pa.array(stop_ratios),
                "quality_score": pa.array(scores),
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

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Zäöüßéèêàçñ]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        self.accent = {
            "de": re.compile(r"[äöüß]"),
            "fr": re.compile(r"[éèêàçœ]"),
            "es": re.compile(r"[ñáíóú¿¡]"),
        }

    def _classify(self, t: str) -> str:
        if not t:
            return "und"
        if self.cjk_re.search(t):
            return "zh"
        words = set(self.word_re.findall(t.lower()))
        best, best_score = "en", -1.0
        for lang, stops in self.PROFILES.items():
            score = len(words & stops)
            score += 2 * bool(self.accent.get(lang) and self.accent[lang].search(t))
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(preds, pa.string())}
        )


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic 64-bit document fingerprint: rolling polynomial hash
    of the whitespace-normalized text (stable content identity for dedup
    joins / lineage). Vectorized via pandas string hash + mixing."""
    norm = pc.replace_substring_regex(batch[text_col], r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    h = pd.util.hash_array(np.asarray(norm.to_pylist(), dtype=object), categorize=False)
    fp = splitmix64(h)
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
    digests = [
        hashlib.md5((s or "").encode("utf-8")).hexdigest()
        for s in norm.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint_md5": pa.array(digests, pa.string()),
        }
    )
