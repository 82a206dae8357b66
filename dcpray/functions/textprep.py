"""Text preparation operators for LLM training pipelines: chunking,
PII scrubbing, vocabulary extraction.

All three are embarrassingly parallel ``map_batches`` stages (chunking
and scrubbing need NO exchange at all; ``top_terms`` moves only
per-batch partial counts), so they stream at 100 TB without touching
the object store beyond one block at a time.

Reference parity: the reference engine's mapper stage
(/root/reference/couchbase/event.go, /root/reference/connector.go:
mapper → []message fan-out) lets one CDC event produce N sink
messages; ``chunk_text`` is that 1→N fan-out re-expressed as a
vectorized Arrow transform, and ``scrub_pii`` is the 1→1 value-rewrite
form of the same mapper contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dcpray.hashing import hash_strings


def _flat_string(col) -> pa.Array:
    """One contiguous (non-chunked) string array for buffer math."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:
            return pa.array([], col.type)
        col = col.combine_chunks()
    return col


def chunk_batch(t: pa.Table, text_col: str, chunk_chars: int,
                overlap_chars: int, keep_cols: list[str],
                idx_col: str = "chunk_idx",
                out_col: str = "chunk_text") -> pa.Table:
    """Vectorized character-window chunker over one Arrow batch.

    Semantics (shared with the SQL oracle): ``stride = chunk_chars -
    overlap_chars``; document i with ``n > 0`` characters yields
    ``(max(n - overlap - 1, 0) // stride) + 1`` chunks; chunk j covers
    characters ``[j*stride, min(j*stride + chunk_chars, n))``. Null and
    empty documents yield no chunks.

    Character positions are UTF-8 aware WITHOUT a per-row Python loop:
    char starts are the non-continuation bytes ``(b & 0xC0) != 0x80``
    of the flattened data buffer, found with one numpy scan; the output
    chunk bytes are gathered with a single fancy-index and wrapped in a
    fresh Arrow string array built from raw offset/data buffers.
    """
    if chunk_chars <= overlap_chars or overlap_chars < 0:
        raise ValueError("need 0 <= overlap_chars < chunk_chars")
    stride = chunk_chars - overlap_chars
    col = t[text_col]
    keep = pc.and_(pc.is_valid(col),
                   pc.greater(pc.binary_length(col), 0))
    tt = t.filter(keep)
    n_docs = tt.num_rows
    empty_schema = pa.schema(
        [tt.schema.field(c) for c in keep_cols]
        + [pa.field(idx_col, pa.int64()), pa.field(out_col, pa.string())]
    )
    if n_docs == 0:
        return empty_schema.empty_table()
    arr = _flat_string(tt[text_col])
    # large_string (concat of >2GB blocks, pandas ArrowDtype inputs)
    # carries int64 offsets — reading them as int32 would silently
    # misparse every chunk boundary (ADVICE r4)
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(
            f"chunk_batch needs a string/large_string column for "
            f"{text_col!r}, got {arr.type}")
    off = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset: arr.offset + n_docs + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    span = data[off[0]: off[-1]]
    # absolute byte position of every character start
    char_starts = np.flatnonzero((span & 0xC0) != 0x80) + off[0]
    char_base = np.searchsorted(char_starts, off[:-1])
    nchars = np.diff(np.searchsorted(char_starts, off))
    # np.searchsorted(char_starts, off[-1]) == len(char_starts): the
    # final doc's char count comes out right without a sentinel append
    char_starts_ext = np.append(char_starts, off[-1])

    n_chunks = np.maximum(nchars - overlap_chars - 1, 0) // stride + 1
    total = int(n_chunks.sum())
    doc_idx = np.repeat(np.arange(n_docs), n_chunks)
    bases = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
    within = np.arange(total) - bases  # chunk_idx per row

    start_char = within * stride
    end_char = np.minimum(start_char + chunk_chars, nchars[doc_idx])
    byte_start = char_starts_ext[char_base[doc_idx] + start_char]
    byte_end = char_starts_ext[char_base[doc_idx] + end_char]

    lengths = byte_end - byte_start
    out_off = np.concatenate(([0], np.cumsum(lengths)))
    nbytes = int(out_off[-1])
    gather = (np.arange(nbytes)
              - np.repeat(out_off[:-1], lengths)
              + np.repeat(byte_start, lengths))
    newdata = data[gather]
    if nbytes < 2**31:
        chunks_arr = pa.Array.from_buffers(
            pa.string(), total,
            [None, pa.py_buffer(out_off.astype(np.int32).tobytes()),
             pa.py_buffer(newdata.tobytes())])
        out_schema = empty_schema
    else:  # block-level safety valve; blocks this large shouldn't exist
        chunks_arr = pa.Array.from_buffers(
            pa.large_string(), total,
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(newdata.tobytes())])
        # the declared schema must widen too — pa.table() force-casts
        # to the schema, and casting ≥2GiB back to string() overflows
        # (the valve was dead code otherwise, r5 review)
        out_schema = pa.schema(
            [empty_schema.field(c) for c in keep_cols]
            + [pa.field(idx_col, pa.int64()),
               pa.field(out_col, pa.large_string())])
    take = pa.array(doc_idx)
    cols = {c: tt[c].take(take) for c in keep_cols}
    cols[idx_col] = pa.array(within)
    cols[out_col] = chunks_arr
    return pa.table(cols, schema=out_schema)


def chunk_text(ds, text_col: str = "text", chunk_chars: int = 512,
               overlap_chars: int = 64, keep_cols: list[str] | None = None,
               idx_col: str = "chunk_idx", out_col: str = "chunk_text"):
    """Split documents into overlapping fixed-size character windows —
    the 1→N record fan-out of LLM-context preparation. Pure
    ``map_batches``; zero exchange; output size ≈ input ×
    ``chunk/(chunk-overlap)``."""
    keep_cols = list(keep_cols or ["doc_id"])
    return ds.map_batches(
        lambda t: chunk_batch(t, text_col, chunk_chars, overlap_chars,
                              keep_cols, idx_col, out_col),
        batch_format="pyarrow",
    )


#: (name, RE2 pattern, replacement) applied in order — identical
#: strings run through DuckDB regexp_replace(..., 'g') in the oracle,
#: so both engines share ONE pattern source of truth.
DEFAULT_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
)


def scrub_batch(t: pa.Table, text_col: str,
                patterns=DEFAULT_PII_PATTERNS,
                out_col: str | None = None) -> pa.Table:
    """Apply the pattern chain to one batch (RE2 via Arrow's
    ``replace_substring_regex`` — the same regex engine DuckDB uses, so
    oracle parity is byte-exact). Nulls stay null."""
    c = t[text_col]
    for _, pat, rep in patterns:
        c = pc.replace_substring_regex(c, pattern=pat, replacement=rep)
    name = out_col or text_col
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, c)
    return t.append_column(name, c)


def scrub_pii(ds, text_col: str = "text",
              patterns=DEFAULT_PII_PATTERNS, out_col: str | None = None):
    """Redact emails / phone numbers / IPv4 addresses (or any custom
    ``(name, RE2-pattern, replacement)`` chain) from a text column.
    Patterns are applied in order, all-occurrences. Pure map_batches,
    zero exchange; regexes are compiled once per process inside Arrow's
    kernel cache, not per batch."""
    return ds.map_batches(
        lambda t: scrub_batch(t, text_col, patterns, out_col),
        batch_format="pyarrow",
    )


_TOKEN_SPLIT = "[^a-z0-9]+"


def top_terms(ds, text_col: str = "text", k: int = 100,
              partitions: int = 64) -> pa.Table:
    """Global top-k vocabulary terms by document-corpus frequency.

    Tokenization shared with the SQL oracle: lowercase, split on
    ``[^a-z0-9]+``, drop empty tokens. Scale shape: each batch emits
    ONE partial (term, cnt) row per distinct term (vectorized
    ``value_counts``), the exchange moves only those partials hashed by
    term into ``partitions`` groups, each group merges + keeps a local
    top-k, and the driver sees ≤ partitions×k rows. Ties at the k
    boundary break by term ascending — deterministic on both engines.

    Returns a pyarrow Table (term, cnt), cnt desc / term asc.
    """

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]),
                                      pattern=_TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        terms = vc.field("values")
        counts = pc.cast(vc.field("counts"), pa.int64())
        pk = (hash_strings(terms) % np.uint64(partitions)).astype(np.int32)
        return pa.table({"term": terms, "cnt": counts,
                         "_pk": pa.array(pk)})

    def merge_topk(g: pa.Table) -> pa.Table:
        m = pa.TableGroupBy(g.select(["term", "cnt"]), ["term"]) \
            .aggregate([("cnt", "sum")]).rename_columns(["term", "cnt"])
        order = pc.sort_indices(m, sort_keys=[("cnt", "descending"),
                                              ("term", "ascending")])
        return m.take(order[:k])

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("_pk")
             .map_groups(lambda g: merge_topk(g), batch_format="pyarrow"))
    # ≤ partitions×k candidate rows reach the driver — the only
    # materialization, independent of corpus size
    batches = list(parts.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
    if not batches:  # zero tokens in the corpus (or an empty corpus)
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand = pa.concat_tables(batches, promote_options="default")
    order = pc.sort_indices(cand, sort_keys=[("cnt", "descending"),
                                             ("term", "ascending")])
    return cand.take(order[:k])


def _nfc(c) -> pa.ChunkedArray | pa.Array:
    """Real NFC composition. Arrow 16's ``utf8_normalize(form="NFC")``
    does NOT compose (probed: ``e + U+0301`` stays decomposed while
    DuckDB's ``nfc_normalize`` and Python's ``unicodedata`` compose to
    ``é``), so NFC runs as a hybrid: one vectorized pure-ASCII check
    (NFC is the identity on ASCII), and only the non-ASCII rows — a
    small fraction of a real corpus — go through
    ``unicodedata.normalize``."""
    import unicodedata

    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    # a string is NFC-invariant if pure ASCII: byte length == char length
    ascii_mask = pc.equal(pc.binary_length(c), pc.utf8_length(c))
    todo = pc.fill_null(pc.invert(ascii_mask), False)
    idx = np.flatnonzero(todo.to_numpy(zero_copy_only=False))
    if len(idx) == 0:
        return c
    fixed = pa.array(
        [unicodedata.normalize("NFC", s)
         for s in c.take(pa.array(idx)).to_pylist()], c.type)
    # scatter the normalized rows back (replace_with_mask needs flat)
    return pc.replace_with_mask(c, todo, fixed)


def normalize_batch(t: pa.Table, text_col: str, out_col: str | None = None,
                    nfc: bool = True, lowercase: bool = True,
                    collapse_whitespace: bool = True) -> pa.Table:
    """Unicode-normalize one batch: NFC canonical form, utf8proc
    lowercasing, whitespace runs collapsed to single spaces + trimmed.
    Lower/regex are the same libraries both engines use (utf8proc +
    RE2) and NFC matches DuckDB's ``nfc_normalize`` (see ``_nfc``), so
    the SQL oracle is byte-exact. Nulls stay null."""
    c = t[text_col]
    if nfc:
        c = _nfc(c)
    if lowercase:
        c = pc.utf8_lower(c)
    if collapse_whitespace:
        c = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(c, pattern=r"\s+", replacement=" "))
    name = out_col or text_col
    if name in t.column_names:
        return t.set_column(t.column_names.index(name), name, c)
    return t.append_column(name, c)


def normalize_text(ds, text_col: str = "text", out_col: str | None = None,
                   nfc: bool = True, lowercase: bool = True,
                   collapse_whitespace: bool = True):
    """Canonical text normalization (NFC / lowercase / whitespace
    collapse) — the first stage of dedup-oriented preprocessing, so
    near-duplicate detection keys on content, not encoding accidents.
    Pure ``map_batches``, zero exchange, all-Arrow kernels."""
    return ds.map_batches(
        lambda t: normalize_batch(t, text_col, out_col, nfc, lowercase,
                                  collapse_whitespace),
        batch_format="pyarrow",
    )


def doc_term_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-(document, term) counts + per-document token length — the
    exploded term table TF-IDF builds on. One vectorized pass per
    batch: regex split, ``list_parent_indices`` to map tokens back to
    rows, one Arrow groupby on (doc, term). A document's text is one
    row, so its counts are complete within its batch — zero exchange.
    Tokenization matches ``top_terms`` (lowercase, split
    ``[^a-z0-9]+``, drop empties)."""

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]),
                                      pattern=_TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat, par = flat.filter(keep), par.filter(keep)
        pairs = pa.table({
            id_col: t[id_col].take(par),
            "term": flat,
        })
        cnt = pa.TableGroupBy(pairs, [id_col, "term"]).aggregate(
            [([], "count_all")])
        cnt = cnt.rename_columns([id_col, "term", "cnt"])
        # tokens per doc (the tf denominator), joined back in-batch
        dl = pa.TableGroupBy(pairs.select([id_col]), [id_col]).aggregate(
            [([], "count_all")]).rename_columns([id_col, "doc_len"])
        return cnt.join(dl, keys=[id_col])

    return ds.map_batches(explode, batch_format="pyarrow")


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 5, partitions: int = 64):
    """Per-document top-k TF-IDF terms, fully distributed — no vocab
    broadcast, no driver-side state:

    1. ``doc_term_counts`` explodes each batch to (doc, term, cnt,
       doc_len) rows (zero exchange);
    2. document frequency is ONE ``coarse_groupby`` over those rows
       (df = rows per term, since counts hold one row per (doc, term));
    3. idf attaches via the large×large ``hash_join`` on term — the
       exchange is bounded by the exploded pair count, vocabulary size
       never concentrates anywhere;
    4. ``topk_per_group`` keeps each document's top k by score with a
       lexicographic term tiebreak.

    The score is ``(cnt / doc_len) * ((N + 1) / (df + 1))`` — division
    and multiplication only (NO log), because IEEE double arithmetic is
    bit-identical across engines while ``ln`` differs in the last ulp
    between libm implementations and would flip near-tie ranks vs the
    SQL oracle. N counts documents with at least one token. The input
    is re-read once per pass (3 streaming passes total) — at scale the
    re-read IS the design, nothing materializes.

    Returns a Dataset (id_col, term, cnt, doc_len, df, tfidf).
    """
    from dcpray.functions.agg import coarse_groupby, topk_per_group
    from dcpray.functions.join import hash_join

    counts = doc_term_counts(ds, text_col, id_col)
    df_ds = coarse_groupby(counts, ["term"], [("term", "count", "df")],
                           partitions=partitions)
    # N = EXACT count of docs with >= 1 token, computed over the INPUT
    # (one row per document, so per-batch partial counts are exact
    # under ANY block layout — the old per-batch distinct-sum over the
    # EXPLODED rows double-counted docs straddling a dynamic block
    # split, silently shifting every idf; r5 review). ">= 1 token" ⟺
    # ">= 1 [a-z0-9] char" for this tokenizer, so one regex count per
    # row replaces a whole extra exchange.
    def n_docs_partial(t: pa.Table) -> pa.Table:
        has = pc.greater(pc.fill_null(pc.count_substring_regex(
            pc.utf8_lower(t[text_col]), "[a-z0-9]"), 0), 0)
        n = pc.sum(pc.cast(has, pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    n_docs = int(ds.map_batches(
        n_docs_partial, batch_format="pyarrow").sum("n") or 0)

    joined = hash_join(counts, df_ds, on="term", how="inner",
                       partitions=partitions)

    def score(t: pa.Table) -> pa.Table:
        cnt = pc.cast(t["cnt"], pa.float64())
        dl = pc.cast(t["doc_len"], pa.float64())
        dfv = pc.cast(t["df"], pa.float64())
        tf = pc.divide(cnt, dl)
        idf = pc.divide(float(n_docs + 1), pc.add(dfv, 1.0))
        return t.append_column("tfidf", pc.multiply(tf, idf))

    scored = joined.map_batches(score, batch_format="pyarrow")
    return topk_per_group(scored, id_col, "tfidf", k, tiebreak_col="term",
                          descending=True, partitions=partitions)


def assemble_groups(ds, group_col: str, order_col: str, text_col: str,
                    sep: str = "\n", label_col: str | None = None,
                    label_sep: str = ": ", out_col: str = "assembled",
                    partitions: int = 64):
    """Ordered per-group text ASSEMBLY — turns → full conversation
    documents, the transcripts→training-corpus step: SQL's
    ``string_agg(text, sep ORDER BY order_col) GROUP BY group_col``,
    distributed. With ``label_col`` each line becomes
    ``label || label_sep || text`` ("role: text") first.

    Scale shape: the standard ONE coarse exchange on the group key,
    then fully vectorized work per partition — one lexsort, one
    offsets-built ListArray, one ``pc.binary_join``. Python runs once
    per partition, never per group or per row; text bytes move exactly
    once. Null texts are DROPPED before joining (string_agg
    semantics: no element, no separator); a group whose texts are all
    null still appears, with a null assembly, as in SQL. Output: one
    row per group — group key, ``out_col``, ``n_items`` (non-null
    texts), ``n_chars`` (assembled length, null-safe 0).

    The usual partitioning contract applies (one group's rows fit one
    partition task); conversations are bounded, so this holds by
    construction for transcripts.
    """
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    def assemble(group: pa.Table) -> pa.Table:
        require_nonnull(group, (group_col, order_col), "assemble_groups")
        karr = group[group_col].combine_chunks()
        # dictionary-encode → int codes so string keys (conv ids) sort
        # and segment exactly like integer keys
        g = pc.dictionary_encode(karr).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = group[order_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((o, g))
        gs = g[order]
        first = np.r_[True, gs[1:] != gs[:-1]]
        starts = np.flatnonzero(first)
        key_first = karr.take(pa.array(order[starts]))

        txt = _flat_string(group[text_col]).take(pa.array(order))
        if label_col is not None:
            lbl = _flat_string(group[label_col]).take(pa.array(order))
            txt = pc.binary_join_element_wise(
                pc.cast(lbl, pa.string()), txt, label_sep,
                null_handling="emit_null")
        valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
        # string_agg drops nulls: compact the line array, shrink each
        # group's extent by its null count (cumulative remap)
        keep = np.flatnonzero(valid)
        lines = txt.take(pa.array(keep))
        ends = np.r_[starts[1:], len(gs)]
        cum_valid = np.r_[0, np.cumsum(valid)]
        off_lo = cum_valid[starts]
        off_hi = cum_valid[ends]
        n_items = (off_hi - off_lo).astype(np.int64)
        # list offsets over the compacted lines; empty groups (all-null
        # texts) get a NULL list so the join yields SQL's NULL
        offsets = np.r_[off_lo, off_hi[-1] if len(off_hi) else 0] \
            .astype(np.int32)
        list_arr = pa.ListArray.from_arrays(
            pa.array(offsets), lines.combine_chunks()
            if isinstance(lines, pa.ChunkedArray) else lines)
        joined = pc.binary_join(list_arr, sep)
        joined = pc.if_else(pa.array(n_items > 0), joined,
                            pa.nulls(len(n_items), pa.string()))
        return pa.table({
            group_col: key_first,
            out_col: joined,
            "n_items": pa.array(n_items),
            "n_chars": pc.cast(pc.fill_null(pc.utf8_length(joined), 0),
                               pa.int64()),
        })

    return (ds.map_batches(add_coarse_pk, fn_args=(group_col, partitions),
                           batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(assemble, batch_format="pyarrow"))


def pack_sequences(ds, token_col: str, budget: int, id_col: str = "doc_id",
                   partitions: int = 64, out_col: str = "pack_id",
                   group_col: str | None = None):
    """SEQUENCE PACKING for LLM training: assign each document a
    ``pack_id`` so that documents sharing a pack total ≤ ``budget``
    tokens — greedy sequential fill in ``id_col`` order WITHIN each
    hash partition (or within each ``group_col`` group): the standard
    concat-and-chunk recipe's grouping step without splitting
    documents, partition-local rather than one global sequence (a
    global greedy order would serialize the whole corpus through one
    task; packing quality is equivalent, pack MEMBERSHIP differs from
    the single-machine recipe). A single document longer than ``budget`` gets a pack of
    its own, never truncated here (filter upstream if needed). With
    ``group_col`` (a split label, a language) a pack NEVER crosses
    group boundaries — the exchange co-locates each group and the
    boundary walk restarts per group, as a per-split packing must.

    Scale shape: ONE coarse exchange (on the id hash, or on the group
    key when given), then per partition one sort + a boundary walk that
    is O(#packs) Python steps (each a ``searchsorted`` on the token
    cumsum — per-pack, never per-doc). Pack ids are the first document
    id of each pack, so they are globally unique and the assignment is
    DETERMINISTIC for a given ``partitions`` regardless of the input's
    block layout (equality under repartitioning is tested).

    Returns (id_col, token_col, [group_col,] out_col) rows."""
    from dcpray.functions.agg import add_coarse_pk, require_nonnull

    if budget < 1:
        raise ValueError("budget must be >= 1 token")
    sel = [id_col, token_col] + ([group_col] if group_col else [])

    def pack(group: pa.Table) -> pa.Table:
        g0 = group.drop_columns(["_pk"])
        require_nonnull(g0, tuple(sel), "pack_sequences")
        ids = g0[id_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok = g0[token_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if group_col:
            karr = g0[group_col].combine_chunks()
            gk = pc.dictionary_encode(karr).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            order = np.lexsort((ids, gk))
            gks = gk[order]
        else:
            karr = None
            order = np.argsort(ids, kind="stable")
            gks = None
        ids, tok = ids[order], tok[order]
        n = len(ids)
        cols = {id_col: pa.array(ids), token_col: pa.array(tok)}
        if n == 0:
            cols = {id_col: pa.array([], pa.int64()),
                    token_col: pa.array([], pa.int64())}
            if group_col:
                cols[group_col] = pa.array([], karr.type)
            cols[out_col] = pa.array([], pa.int64())
            return pa.table(cols)
        cs = np.cumsum(tok)
        if gks is not None:
            # index of each row's group END (exclusive): packs clamp here
            gstarts = np.flatnonzero(np.r_[True, gks[1:] != gks[:-1]])
            gends = np.r_[gstarts[1:], n]
            row_gend = np.repeat(gends, np.diff(np.r_[gstarts, n]))
        bounds = [0]
        while bounds[-1] < n:
            start = bounds[-1]
            base = cs[start - 1] if start else 0
            # furthest doc keeping the pack within budget; an oversize
            # doc still advances by one (its own pack); never past the
            # group's end
            nxt = int(np.searchsorted(cs, base + budget, side="right"))
            if gks is not None:
                nxt = min(nxt, int(row_gend[start]))
            bounds.append(max(nxt, start + 1))
        b = np.array(bounds[:-1], np.int64)
        sizes = np.diff(np.r_[b, n])
        cols[out_col] = pa.array(np.repeat(ids[b], sizes))
        if group_col:
            cols = {id_col: cols[id_col], token_col: cols[token_col],
                    group_col: karr.take(pa.array(order)),
                    out_col: cols[out_col]}
        return pa.table(cols)

    key = group_col or id_col
    return (ds.select_columns(sel)
            .map_batches(add_coarse_pk, fn_args=(key, partitions),
                         batch_format="pyarrow")
            .groupby("_pk")
            .map_groups(pack, batch_format="pyarrow"))



def extract_json_field(ds, col: str, key: str, out_col: str | None = None,
                       kind: str = "int"):
    """Extract a FLAT scalar field from a JSON-string column — the
    semi-structured payload pattern (the reference's opaque []byte
    Value is typically JSON it never parses, SURVEY §1.1; this is the
    vectorized extraction a table engine adds on top).

    Deliberately REGEX-based (``pc.extract_regex``, RE2) rather than a
    per-row json.loads loop: fully vectorized, and an oracle running
    the SAME pattern via ``regexp_extract`` is exact by construction.
    Handles flat ``{"key": 123}`` / ``{"key": "str"}`` objects — for
    nested JSON use a real parser in an actor stage instead. Missing
    key / null input → null. ``kind``: "int" (casts to int64) or
    "str" (unescapes nothing — raw string group, matching
    regexp_extract)."""
    import re as _re

    if kind not in ("int", "str"):
        raise ValueError("kind must be 'int' or 'str'")
    k = _re.escape(key)
    # pc.extract_regex requires NAMED groups
    pattern = (rf'"{k}":\s*(?P<v>-?\d+)' if kind == "int"
               else rf'"{k}":\s*"(?P<v>[^"]*)"')
    out_col = out_col or key

    def f(t: pa.Table) -> pa.Table:
        s = t[col].combine_chunks()
        m = pc.extract_regex(s, pattern)
        v = pc.struct_field(m, "v")
        if kind == "int":
            v = pc.cast(v, pa.int64())
        return t.append_column(out_col, v)

    return ds.map_batches(f, batch_format="pyarrow")


def _encode_batch(t: pa.Table, vocab_ref, text_col: str,
                  id_col: str) -> pa.Table:
    """Per-batch token encoding kernel: split → filter empties →
    vectorized vocab lookup (pandas Index.get_indexer — one hash probe
    pass, no Python per token) → 1-based in-document positions."""
    import pandas as pd
    import ray

    from dcpray.rayutil import worker_memo

    idx = worker_memo(("encode_vocab", vocab_ref.hex()),
                      lambda: pd.Index(ray.get(vocab_ref)))
    toks = pc.split_pattern_regex(pc.utf8_lower(t[text_col]),
                                  pattern=_TOKEN_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat, par = flat.filter(keep), par.filter(keep)
    parn = par.to_numpy(zero_copy_only=False).astype(np.int64)
    # token id = 1 + vocab rank; OOV -> 0 (the conventional <unk> slot)
    got = idx.get_indexer(flat.to_numpy(zero_copy_only=False))
    ids = np.where(got < 0, 0, got + 1).astype(np.int32)
    # 1-based position among the doc's (non-empty) tokens — identical
    # to the oracle's generate_subscripts over regexp_extract_all
    first = np.r_[True, parn[1:] != parn[:-1]] if len(parn) \
        else np.zeros(0, bool)
    starts = np.flatnonzero(first)
    sizes = np.diff(np.r_[starts, len(parn)])
    pos = np.arange(len(parn)) - np.repeat(starts, sizes) + 1
    return pa.table({
        id_col: t[id_col].take(par),
        "pos": pa.array(pos, pa.int64()),
        "term": flat,
        "token_id": pa.array(ids, pa.int32()),
    })


def encode_tokens(ds, vocab_size: int = 10000, text_col: str = "text",
                  id_col: str = "doc_id", partitions: int = 64):
    """Corpus-vocabulary token encoding — the canonical final step of a
    text training pipeline: build the top-``vocab_size`` vocabulary
    (``top_terms``: count desc, term asc), assign ids 1..V in rank
    order (0 = OOV/<unk>), and encode every document's token sequence
    against it. Output is EXPLODED — one row per (doc, position):
    ``(id_col, pos, term, token_id)`` — so a SQL oracle compares it
    value-for-value (list columns would also be the wrong exchange
    granularity for downstream id-level ops like pack_sequences).

    Scale shape: the vocabulary candidates reach the driver bounded by
    partitions × vocab_size (top_terms' contract); the id table
    broadcasts ONCE (``ray.put`` of the rank-ordered term array, ~V
    strings); encoding itself is zero-exchange — each batch splits,
    probes the shared pandas Index, and positions its own tokens.
    Tokenization is shared verbatim with top_terms/tfidf (lowercase,
    split ``[^a-z0-9]+``, drop empties).

    The input is re-executed between the vocab pass and the encode
    pass (the same re-read design as tfidf_top_terms), so the upstream
    pipeline must be DETERMINISTIC — ``materialize()`` a sampled /
    limited / otherwise nondeterministic input first, or its terms
    will rank against a vocabulary built from different text."""
    import ray

    vocab = top_terms(ds, text_col=text_col, k=vocab_size,
                      partitions=partitions)
    terms = vocab["term"].to_numpy(zero_copy_only=False)
    ref = ray.put(terms)
    return ds.map_batches(_encode_batch, fn_args=(ref, text_col, id_col),
                          batch_format="pyarrow")
