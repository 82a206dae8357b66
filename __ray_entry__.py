"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.

The CDC queries run over a deterministic synthetic change-event WAL of
multi-turn transcripts (the input shape pinned by BASELINE.json) that is
materialised idempotently under /tmp/dcpray_fixtures/<sf>/ — both the
Ray pipeline and the DuckDB oracle read the same files. Training-data
queries run over the driver's own parquet tables (documents, embeddings,
events).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any

from dcpray.rayutil import quiet_empty_schema_warnings  # noqa: E402
from dcpray.sources.io import read_clean  # noqa: E402 (strips pandas schema metadata)

# zero-row partitions of Ray's sort/hash exchange carry no schema and
# would log one benign divergence warning per groupby operator — drop
# exactly that message (see rayutil._EmptySchemaWarningFilter)
quiet_empty_schema_warnings()

FIXTURE_SFS = ("sf0.001", "sf0.01", "sf0.1")
LAKE_ROOT = "/tmp/dcpray_lakes"


def _fx(sf_dir: str) -> str:
    from dcpray.sources.genwal import ensure_fixture

    return ensure_fixture(sf_dir)


def _fresh_lake(sf_dir: str, name: str):
    from dcpray.state.checkpoint import Lake

    d = os.path.join(LAKE_ROOT, os.path.basename(os.path.normpath(sf_dir)), name)
    shutil.rmtree(d, ignore_errors=True)
    return Lake(d)


def _replay_final(sf_dir: str, name: str, **kw):
    from dcpray import ReplayConfig, replay

    fx = _fx(sf_dir)
    lake = _fresh_lake(sf_dir, name)
    cfg = kw.pop("config", None) or ReplayConfig(num_buckets=32)
    replay(lake, os.path.join(fx, "wal"),
           base_snapshot_dir=os.path.join(fx, "base"), config=cfg, **kw)
    return lake


# --------------------------------------------------------------- queries


def _cents_col(t, col: str = "value"):
    """int64 cents = floor(v*100 + 0.5) — THE engine/oracle exactness
    convention for 2dp money-like floats: identical arithmetic runs in
    the SQL oracle, and integer sums/cumsums are then exact in both
    engines regardless of accumulation order (nulls stay null)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(pc.floor(pc.add(pc.multiply(t[col], 100.0), 0.5)),
                   pa.int64())


def _cents_mapper(col: str = "value", out: str = "value_c"):
    """map_batches fn replacing ``col`` with its int64-cents ``out``."""
    def f(t):
        return t.drop_columns([col]).append_column(out, _cents_col(t, col))

    return f


def _q_cdc_replay_full(sf_dir: str):
    """The flagship: full CDC replay of the WAL into the lake; final LWW table vs the pure-SQL oracle."""
    return _replay_final(sf_dir, "full").to_pandas_sorted()


def _q_cdc_resume(sf_dir: str):
    """Kill/resume equivalence: ingest in two committed phases; final
    state must equal the uninterrupted replay (same oracle)."""
    from dcpray import ReplayConfig, replay

    fx = _fx(sf_dir)
    lake = _fresh_lake(sf_dir, "resume")
    cfg = ReplayConfig(num_buckets=32)
    replay(lake, os.path.join(fx, "wal"), base_snapshot_dir=os.path.join(fx, "base"),
           config=cfg, max_files=50)
    replay(lake, os.path.join(fx, "wal"), base_snapshot_dir=os.path.join(fx, "base"),
           config=cfg)
    return lake.to_pandas_sorted()


def _q_cdc_view_role_stats(sf_dir: str):
    """Incrementally-maintained aggregate view: two committed phases,
    one cheap ``refresh()`` after each (cost = rewritten buckets, not a
    table scan); the merged sidecar partials must equal a full SQL
    recompute of the final LWW table's GROUP BY role."""
    from dcpray import IncrementalView, ReplayConfig, ViewSpec, replay

    fx = _fx(sf_dir)
    lake = _fresh_lake(sf_dir, "views")
    cfg = ReplayConfig(num_buckets=32)
    view = IncrementalView(lake, ViewSpec(
        "role_stats", keys=("role",),
        aggs=(("turn_idx", "count", "n_turns"),
              ("turn_idx", "mean", "mean_turn_idx"),
              ("ts", "max", "last_ts"))))
    replay(lake, os.path.join(fx, "wal"),
           base_snapshot_dir=os.path.join(fx, "base"), config=cfg,
           max_files=50)
    view.refresh()
    replay(lake, os.path.join(fx, "wal"),
           base_snapshot_dir=os.path.join(fx, "base"), config=cfg)
    view.refresh()
    out = view.read_table().to_pandas()
    out["mean_turn_idx"] = out["mean_turn_idx"].round(6)
    return out


def _q_cdc_skew_unsalted(sf_dir: str):
    """Salted/unsalted equivalence: conv-only bucketing (hot keys land in
    one bucket) must produce the identical table."""
    from dcpray import ReplayConfig

    return _replay_final(
        sf_dir, "unsalted",
        config=ReplayConfig(num_buckets=32, salted=False, strategy="shuffle"),
    ).to_pandas_sorted()


def _q_cdc_replay_shuffle(sf_dir: str):
    """The generic salted-groupby strategy must produce the identical
    table as the aligned (shuffle-free) default."""
    from dcpray import ReplayConfig

    return _replay_final(
        sf_dir, "shuffle",
        config=ReplayConfig(num_buckets=32, strategy="shuffle"),
    ).to_pandas_sorted()


def _q_cdc_schema_evolution(sf_dir: str):
    """Later WAL segments add a column (tool_version); replay unifies by name and the final table carries it."""
    df = _replay_final(sf_dir, "evo").to_pandas_sorted()
    out = df[df["tool_version"].notna()][["conv_id", "turn_idx", "tool_version"]]
    return out.reset_index(drop=True)


def _q_cdc_mutations_stream(sf_dir: str):
    """DefaultMapper parity (reference mapper.go:10-20): the delivered
    mutation stream — validated events, tombstones dropped, key+payload
    projection."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.sources import wal as walmod
    from dcpray.stages.mapper import default_kafka_mapper
    from dcpray.stages.reject import make_reject_filter

    from dcpray.sources.io import read_parquet_fast

    fx = _fx(sf_dir)
    infos = walmod.scan_wal(os.path.join(fx, "wal"))
    # prune at the read: the projection + validation need 7 of the 14 WAL
    # columns — cas/rev_no/collection/event_time/tool/ts/tool_version
    # never leave storage
    ds = read_parquet_fast(
        [i.path for i in infos],
        columns=["vb", "seqno", "conv_id", "turn_idx", "op", "role", "text"],
    )
    ds = ds.map_batches(
        make_reject_filter(walmod.watermark_array({}, 1), None), batch_format="pyarrow"
    )
    ds = ds.map_batches(default_kafka_mapper, batch_format="pyarrow")

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "seqno": pc.cast(t["seqno"], pa.int64()),
                "role": t["role"],
                "text": t["text"],
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


def _q_cdc_op_counts(sf_dir: str):
    """Event-normalizer parity: per-op event counts over valid events.
    Column-pruned read + per-batch partial counts before the (tiny)
    groupby — the pre-aggregation rule for wide reductions."""
    import pyarrow as pa

    from dcpray.sources import wal as walmod
    from dcpray.sources.io import read_parquet_fast
    from dcpray.stages.reject import make_reject_filter

    fx = _fx(sf_dir)
    infos = walmod.scan_wal(os.path.join(fx, "wal"))
    ds = read_parquet_fast(
        [i.path for i in infos],
        columns=["vb", "seqno", "conv_id", "turn_idx", "op"],
    )
    validate = make_reject_filter(walmod.watermark_array({}, 1), None)

    def partial(t: pa.Table) -> pa.Table:
        t = validate(t)
        vc = t["op"].value_counts()
        return pa.table(
            {
                "op": vc.field("values"),
                "n_part": vc.field("counts").cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("op")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


def _q_cdc_rejected_rows(sf_dir: str):
    """DLQ parity: invalid events land in rejected/ with an error column (reference RejectionLog)."""
    import pandas as pd

    from dcpray import ReplayConfig, replay

    fx = _fx(sf_dir)
    lake = _fresh_lake(sf_dir, "dlq")
    res = replay(lake, os.path.join(fx, "wal"), config=ReplayConfig(num_buckets=32))
    return pd.DataFrame({"n_rejected": [int(res.metrics["rejected_rows"])]})


def _q_cdc_watermarks(sf_dir: str):
    """Committed per-vBucket watermark after full replay."""
    import pandas as pd

    lake = _replay_final(sf_dir, "wm")
    wm = lake.store.load_current().watermarks
    return pd.DataFrame(
        {"vb": sorted(wm), "watermark": [int(wm[v]) for v in sorted(wm)]}
    ).astype("int64")


def _q_cdc_then_token_count(sf_dir: str):
    """Composition: CDC replay → lazy lake Dataset → vectorized token
    count — the shape of a real training-data pipeline consuming the
    materialized transcripts."""
    import pyarrow as pa

    from dcpray.functions.textstats import token_count

    lake = _replay_final(sf_dir, "compose")
    ds = lake.read_current().select_columns(["conv_id", "turn_idx", "text"])

    def count(t: pa.Table) -> pa.Table:
        return token_count(t).drop_columns(["text"])

    return ds.map_batches(count, batch_format="pyarrow")


def _q_cdc_scd2_history(sf_dir: str):
    """SCD Type-2 version chain over the validated WAL stream — every
    version of every (conv_id, turn_idx) with its validity interval
    (the full-history view the reference's pre-compaction Kafka log
    holds implicitly). ZERO exchange: key → vb is a pure function, so
    each wal/vb=NNNN/ directory computes its chains in one independent
    task (history.wal_version_history — the same
    inherit-the-stream-partitioning trick as the aligned LWW merge)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.history import wal_version_history

    fx = _fx(sf_dir)
    ds = wal_version_history(
        os.path.join(fx, "wal"),
        keys=("conv_id", "turn_idx"), version_col="seqno",
        columns=["conv_id", "turn_idx", "seqno", "op", "role"],
    )

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "valid_from": pc.cast(t["seqno"], pa.int64()),
                "valid_to": pc.cast(t["valid_to"], pa.int64()),
                "is_current": t["is_current"],
                "op": t["op"],
                "role": t["role"],
            }
        )

    return ds.map_batches(proj, batch_format="pyarrow")


# seqno cutoff splitting the fixture WAL into the change-feed's two
# commits; per-vb-monotonic seqnos make `seqno <= C` a valid stream
# prefix of every vb. Pinned so the SQL oracle can embed the same value.
_CDF_CUTOFF = 1500


def _cdf_cutoff(fx: str) -> int:
    """Seqno cutoff for the two-commit change-feed lake: the pinned
    value at the driver's sf0.01+ scales (the oracle SQL embeds it),
    halved max-seqno at tiny scales whose WAL never reaches it — a
    pinned 1500 there left wal_b EMPTY and replay() raising
    FileNotFoundError on the never-created directory (r5 review)."""
    import json as _json

    try:
        with open(os.path.join(fx, "meta.json")) as f:
            wm = _json.load(f).get("watermarks", {})
        max_seq = max(int(v) for v in wm.values()) if wm else 0
    except OSError:
        max_seq = 0
    if max_seq > 2 * _CDF_CUTOFF:
        return _CDF_CUTOFF
    return max(max_seq // 2, 1)


def _cdf_stamp(fx: str) -> str:
    """Cache-invalidation fingerprint for the two-commit cdf lake: the
    fixture's meta.json identity + the cutoff. The old len(history)==2
    guard kept serving a lake built from a REGENERATED fixture's stale
    WAL — a silent wrong answer (r5 review)."""
    import hashlib
    import json as _json

    try:
        with open(os.path.join(fx, "meta.json")) as f:
            meta = _json.load(f)
    except OSError:
        meta = {}
    key = _json.dumps(
        {"v": meta.get("fixture_version"), "n": meta.get("n_events"),
         "cutoff": _cdf_cutoff(fx)}, sort_keys=True)
    return hashlib.sha1(key.encode()).hexdigest()[:16]


def _q_cdc_change_feed(sf_dir: str):
    """CHANGE DATA FEED: split the WAL at a seqno cutoff, replay both
    halves as two commits, then ``lake_diff`` the two manifests — the
    per-key insert/update/delete rows a downstream consumer would read
    instead of re-scanning the table (dcpray/functions/history.py;
    the table-form analogue of consuming the Kafka changelog between
    two offsets)."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dcpray import ReplayConfig, replay
    from dcpray.functions.history import lake_diff
    from dcpray.state.checkpoint import Lake

    fx = _fx(sf_dir)
    root = os.path.join(
        LAKE_ROOT, os.path.basename(os.path.normpath(fx)), "cdf"
    )
    lake = Lake(os.path.join(root, "lake"))
    history = lake.store.history() if os.path.exists(lake.lake_dir) else []
    stamp_path = os.path.join(root, "fixture.stamp")
    stamp = _cdf_stamp(fx)
    try:
        with open(stamp_path) as f:
            cached_ok = f.read().strip() == stamp
    except OSError:
        cached_ok = False
    if len(history) != 2 or not cached_ok:  # (re)build the two-commit lake
        cutoff = _cdf_cutoff(fx)
        shutil.rmtree(root, ignore_errors=True)
        # both dirs must EXIST even if a half ends up empty (replay
        # treats a missing WAL dir as a mistyped path and raises)
        os.makedirs(os.path.join(root, "wal_a"), exist_ok=True)
        os.makedirs(os.path.join(root, "wal_b"), exist_ok=True)
        for f in glob.glob(os.path.join(fx, "wal", "*", "*.parquet")):
            t = pq.read_table(f)
            rel = os.path.relpath(f, os.path.join(fx, "wal"))
            halves = (
                ("wal_a", t.filter(pc.less_equal(t["seqno"], cutoff))),
                ("wal_b", t.filter(pc.greater(t["seqno"], cutoff))),
            )
            for name, tt in halves:
                if tt.num_rows:
                    dst = os.path.join(root, name, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    pq.write_table(tt, dst)
        lake = Lake(os.path.join(root, "lake"))
        replay(
            lake,
            os.path.join(root, "wal_a"),
            base_snapshot_dir=os.path.join(fx, "base"),
            config=ReplayConfig(num_buckets=32),
        )
        replay(lake, os.path.join(root, "wal_b"),
               config=ReplayConfig(num_buckets=32))
        with open(stamp_path, "w") as f:
            f.write(stamp)
    return lake_diff(lake, 1, 2)


def _q_cdc_changefeed_persisted(sf_dir: str):
    """The PERSISTED change feed (the reference's Kafka-topic output
    made durable as Parquet): write commit 2's feed once
    (idempotent, atomic dir rename), then serve consumers from the
    files — same oracle as cdc_change_feed, but reading
    <lake>/changefeed/seq=2/ instead of recomputing the diff."""
    from dcpray.functions.history import read_changefeed, write_changefeed
    from dcpray.state.checkpoint import Lake

    _q_cdc_change_feed(sf_dir)  # ensure the two-commit lake exists
    fx = _fx(sf_dir)
    root = os.path.join(
        LAKE_ROOT, os.path.basename(os.path.normpath(fx)), "cdf"
    )
    lake = Lake(os.path.join(root, "lake"))
    write_changefeed(lake, 2)
    return read_changefeed(lake, 1, 2)


def _q_dedup_exact(sf_dir: str):
    """Exact content-hash dedup: one survivor (min key) per distinct text."""
    from dcpray.functions.dedup import exact_dedup

    return exact_dedup(read_clean(os.path.join(sf_dir, "documents.parquet"),
                              override_num_blocks=16))


def _q_text_token_count(sf_dir: str):
    """Whitespace token counts — vectorized regexp count, identical pattern engine-and-oracle."""
    from dcpray.functions.textstats import token_count

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(token_count, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


def _q_text_token_count_bpe(sf_dir: str):
    """BPE-pre-tokenizer token count — the engine and the DuckDB oracle
    run the IDENTICAL RE2 pattern, so counts are exact-checkable."""
    from dcpray.functions.textstats import token_count_bpe

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(token_count_bpe, batch_format="pyarrow")


def _q_text_stats(sf_dir: str):
    """Per-doc text statistics (chars/tokens/punct ratios) — pure Arrow kernels."""
    from dcpray.functions.textstats import text_stats

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(text_stats, batch_format="pyarrow")


def _embedding_query_head(sf_dir: str, n: int = 5):
    """(query matrix, query ids) = the first n embedding rows — ONE
    pruned row-group read instead of materializing the whole table on
    the driver per ANN query (r5 review; shared by all four ANN
    queries)."""
    import numpy as np
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    head = pf.read_row_group(0, columns=["vec_id", "embedding"]).slice(0, n)
    q = np.stack(head["embedding"].to_pylist()).astype(np.float64)
    return q, head["vec_id"].to_numpy()


def _q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k over the embeddings table — zero-copy ingestion, task-pool scorer, no corpus shuffle."""
    import numpy as np
    import pyarrow.parquet as pq
    from dcpray.functions.ann import topk_cosine

    path = os.path.join(sf_dir, "embeddings.parquet")
    q, qids = _embedding_query_head(sf_dir)
    out = topk_cosine(read_clean(path, override_num_blocks=16), q, qids, k=10, concurrency=4)
    return out.select_columns(["query_id", "vec_id"])


def _q_events_hourly(sf_dir: str):
    """High-cardinality (~100k groups) hourly rollup on the library
    ``coarse_groupby``: per-batch Arrow pre-aggregation (the shuffle
    moves one row per distinct key per batch), coarse-partition
    exchange, vectorized Arrow merge per partition — one Python call
    per partition, not per group (6× faster than Ray's per-group
    aggregate at this cardinality)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import coarse_groupby

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id", "ts", "value"],
                    override_num_blocks=16)

    def add_hour(t: pa.Table) -> pa.Table:
        t = t.append_column("hour", pc.floor_temporal(t["ts"], unit="hour"))
        return t.drop_columns(["value"]).append_column(
            "value_c", _cents_col(t))

    # integer-cents sum -> exact in both engines under ANY accumulation
    # order; round(sum(float),4) was one ulp away from flipping digits
    out = coarse_groupby(
        ds.map_batches(add_hour, batch_format="pyarrow"),
        keys=["user_id", "hour"],
        aggs=[("value_c", "count", "n_events"),
              ("value_c", "sum", "sum_c")],
    ).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_c"].astype("float64") / 100
    out = out.drop(columns=["sum_c"])
    return out


# ---- non-SQL-expressible ops (driver records rows-only checks) ----


def _q_dedup_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs, distributed exact-Jaccard verified; rows-only (exact sibling: text_jaccard_exact)."""
    from dcpray.functions.dedup import minhash_dup_pairs

    from dcpray.rayutil import push_based_shuffle

    # a small-SF documents table is ONE parquet file = one Ray block;
    # split it so the signature actors actually parallelize
    docs = read_clean(os.path.join(sf_dir, "documents.parquet"),
                      override_num_blocks=16)
    with push_based_shuffle():  # ~2x on the banded-LSH groupbys
        df = minhash_dup_pairs(docs, threshold=0.6, concurrency=8).to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _q_dedup_simhash_pairs(sf_dir: str):
    """SimHash near-dup pairs (vectorized bit votes, SWAR popcount); rows-only with pigeonhole recall tests."""
    from dcpray.functions.dedup import simhash_dup_pairs

    from dcpray.rayutil import push_based_shuffle

    docs = read_clean(os.path.join(sf_dir, "documents.parquet"),
                      override_num_blocks=16)
    with push_based_shuffle():
        df = simhash_dup_pairs(docs, max_hamming=6, concurrency=8).to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _q_embedding_neardup_pairs(sf_dir: str):
    """Hyperplane-LSH embedding near-dup pairs; rows-only (exact sibling: embedding_neardup_exact)."""
    from dcpray.functions.dedup import embedding_dup_pairs

    import pandas as pd

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"), override_num_blocks=16)
    df = embedding_dup_pairs(ds, threshold=0.9, dim=64).to_pandas()
    if df.empty:
        df = pd.DataFrame({"a": pd.Series(dtype="int64"),
                           "b": pd.Series(dtype="int64"),
                           "cosine": pd.Series(dtype="float64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _q_embedding_neardup_exact(sf_dir: str):
    """Exact all-pairs cosine near-dup (the SQL-verifiable baseline the
    LSH variant approximates)."""
    from dcpray.functions.dedup import embedding_exact_pairs

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"), override_num_blocks=16)
    out = embedding_exact_pairs(ds, threshold=0.4, concurrency=4).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_text_jaccard_exact(sf_dir: str):
    """Exact word-3-gram-set Jaccard pairs — the SQL-verifiable TEXT
    similarity baseline anchoring the MinHash+LSH scale path (the text
    analogue of embedding_neardup_exact)."""
    from dcpray.functions.dedup import ngram_jaccard_exact_pairs

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    out = ngram_jaccard_exact_pairs(ds, threshold=0.5, n=3).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_lang_id(sf_dir: str):
    """Dictionary-based language ID — one tokenize + dictionary-encode pass per batch."""
    # task-pool form: LangId's per-actor state is microseconds to build,
    # so a process-level singleton beats actor-pool spin-up (~1 s wall)
    from dcpray.functions.textstats import lang_id_batch

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def _q_text_fingerprint_md5(sf_dir: str):
    """md5 content fingerprints, bit-compatible with DuckDB md5_number_lower."""
    from dcpray.functions.textstats import fingerprint_md5

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(fingerprint_md5, batch_format="pyarrow")


def _q_text_fingerprint(sf_dir: str):
    """Vectorized splitmix64 content fingerprints; rows-only (md5 sibling: text_fingerprint_md5)."""
    from dcpray.functions.textstats import fingerprint

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(fingerprint, batch_format="pyarrow")


def _q_quality_score(sf_dir: str):
    """Text quality scoring (length/punct/stopword ratios) — task-pool with memoized singleton."""
    from dcpray.functions.textstats import quality_score_batch

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def _q_ann_ivf_topk(sf_dir: str):
    """Approximate ANN: IVF with nprobe < nlist — recall-tested vs the exact probe; rows-only by nature (exact sibling: ann_ivf_full_probe)."""
    import numpy as np
    import pyarrow.parquet as pq
    from dcpray.functions.ann import ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    q, qids = _embedding_query_head(sf_dir)
    return ivf_topk(read_clean(path, override_num_blocks=16), q, qids, k=10, nlist=16, nprobe=8,
                    concurrency=4).select_columns(["query_id", "vec_id"])


def _q_ann_ivf_full_probe(sf_dir: str):
    """IVF with nprobe == nlist probes every list — exact by
    construction, so the brute-force SQL oracle applies. (The default
    ann_ivf_topk query keeps nprobe < nlist to exercise the approximate
    scale path; its recall is tested in tests/test_functions.py.)"""
    import numpy as np
    import pyarrow.parquet as pq
    from dcpray.functions.ann import ivf_topk

    path = os.path.join(sf_dir, "embeddings.parquet")
    q, qids = _embedding_query_head(sf_dir)
    return ivf_topk(read_clean(path, override_num_blocks=16), q, qids, k=10, nlist=16, nprobe=16,
                    concurrency=4).select_columns(["query_id", "vec_id"])


def _q_ann_ivf_index_full_probe(sf_dir: str):
    """Persistent IVF index (build once / query many): build the
    partitioned per-list index under /tmp, then query it probing every
    list — exact by construction, so the brute-force SQL oracle applies.
    (Sub-probe queries read ONLY the probed lists' files — file-level
    pruning; tested in tests/test_functions.py.)"""
    import numpy as np
    import pyarrow.parquet as pq

    from dcpray.functions.ann import build_ivf_index, ivf_query

    path = os.path.join(sf_dir, "embeddings.parquet")
    idx = os.path.join("/tmp/dcpray_ivf", os.path.basename(os.path.normpath(sf_dir)))
    shutil.rmtree(idx, ignore_errors=True)
    build_ivf_index(read_clean(path, override_num_blocks=16), idx, nlist=16, concurrency=4)
    q, qids = _embedding_query_head(sf_dir)
    return ivf_query(idx, q, qids, k=10, nprobe=16).select_columns(
        ["query_id", "vec_id"]
    )


def _q_multimodal_features(sf_dir: str):
    """Multimodal feature extraction over binary payloads (actor-pool decode stage); rows-only (decode siblings: multimodal_decode_bmp/wav)."""
    from dcpray.functions.multimodal import ImageFeatureExtractor, synthesize_media

    import pyarrow as pa

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"],
                override_num_blocks=16)
    media = ds.map_batches(synthesize_media, batch_format="pyarrow")
    feats = media.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                              concurrency=4, batch_size=256)

    def fold(t: pa.Table) -> pa.Table:
        import numpy as np

        f = np.stack(t["features"].to_pylist())
        return pa.table(
            {
                "media_id": t["media_id"],
                "feat_dim": pa.array([f.shape[1]] * len(f), pa.int64()),
                "feat_sum": pa.array(np.round(f.sum(axis=1), 6)),
                "feat_argmax": pa.array(f.argmax(axis=1).astype("int64")),
            }
        )

    return feats.map_batches(fold, batch_format="pyarrow")


def _q_events_sessions(sf_dir: str):
    """Gap-based sessionization (the streaming-window operator): one
    coarse-partition exchange, session assignment + per-session
    aggregate vectorized inside each partition task."""
    from dcpray.functions.window import session_stats

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "value"],
                    override_num_blocks=16)
    # integer cents: the per-session sum is then EXACT in both engines
    # (float64 addition of integers < 2^53) instead of a round(4) that
    # sat one ulp from flipping on accumulation order
    ds = ds.map_batches(_cents_mapper(), batch_format="pyarrow")
    out = session_stats(ds, gap_s=1800.0, value_col="value_c").to_pandas()
    out["sum_value"] = out["sum_value"].astype("float64") / 100
    return out


def _q_events_range_click(sf_dir: str):
    """Trailing-window range join: every (event, click) pair of the
    same user with the click inside the event's preceding hour —
    verified against DuckDB's native range join."""
    import pyarrow.compute as pc

    from dcpray.functions.join import range_join

    path = os.path.join(sf_dir, "events.parquet")
    left = read_clean(path, columns=["event_id", "user_id", "ts"],
                      override_num_blocks=16)
    right = read_clean(path, columns=["user_id", "ts", "event_type"],
                       override_num_blocks=16).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow",
    )
    return range_join(left, right, key_col="user_id", ts_col="ts",
                      right_cols={"ts": "click_ts"}, window_s=3600.0)


def _q_events_range_click_broadcast(sf_dir: str):
    """The zero-exchange broadcast form of the trailing-window join —
    the small click table is (key, ts)-sorted once and broadcast via
    ray.put; the events stream matches per batch with cost independent
    of right size. Same oracle as events_range_click."""
    import pyarrow.compute as pc

    from dcpray.functions.join import range_join_broadcast

    path = os.path.join(sf_dir, "events.parquet")
    left = read_clean(path, columns=["event_id", "user_id", "ts"],
                      override_num_blocks=16)
    right = read_clean(path, columns=["user_id", "ts", "event_type"],
                       override_num_blocks=16).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow",
    )
    return range_join_broadcast(left, right, key_col="user_id", ts_col="ts",
                                right_cols={"ts": "click_ts"},
                                window_s=3600.0)


def _q_events_top3_by_value(sf_dir: str):
    """Heavy hitters: top-3 events by value per user (event_id
    tiebreak). Per-batch local top-k combiner, then one coarse
    exchange."""
    from dcpray.functions.agg import topk_per_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "value"],
                    override_num_blocks=16)
    return topk_per_group(ds, group_col="user_id", order_col="value",
                          k=3, tiebreak_col="event_id")


def _q_events_asof_click(sf_dir: str):
    """Backward as-of join: each event attached to the same user's most
    recent prior-or-equal 'click' event timestamp (null when none) —
    the temporal-join custom operator, verified against DuckDB's native
    ASOF LEFT JOIN."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.join import asof_join

    # two column-pruned reads (left never needs event_type) — one shared
    # read would re-execute its lineage for each branch anyway, scanning
    # the wide projection twice
    path = os.path.join(sf_dir, "events.parquet")
    left = read_clean(path, columns=["event_id", "user_id", "ts"],
                      override_num_blocks=16)
    right = read_clean(path, columns=["user_id", "ts", "event_type"],
                       override_num_blocks=16).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow",
    )
    return asof_join(left, right, key_col="user_id", ts_col="ts",
                     right_cols={"ts": "click_ts"})


def _q_events_asof_next_click(sf_dir: str):
    """FORWARD as-of join: each event attached to the same user's next
    at-or-after 'click' timestamp — direction='forward' reduces to the
    backward merge by negating the internal int64 ts (join.py). Oracle
    is a correlated min() subquery (DuckDB's native ASOF is
    backward-only)."""
    import pyarrow.compute as pc

    from dcpray.functions.join import asof_join

    path = os.path.join(sf_dir, "events.parquet")
    left = read_clean(path, columns=["event_id", "user_id", "ts"],
                      override_num_blocks=16)
    right = read_clean(path, columns=["user_id", "ts", "event_type"],
                       override_num_blocks=16).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "click"))
                   .select(["user_id", "ts"]),
        batch_format="pyarrow",
    )
    return asof_join(left, right, key_col="user_id", ts_col="ts",
                     right_cols={"ts": "next_click_ts"},
                     direction="forward")


def _q_sample_docs_hash(sf_dir: str):
    """Deterministic content-hash 1-in-10 sample — bit-compatible with
    DuckDB's md5_number_lower, so the oracle checks the exact row set."""
    from dcpray.functions.sample import hash_sample

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    override_num_blocks=16)
    return hash_sample(ds, col="text", mod=10, keep=3)


def _q_sample_docs_hash_fast(sf_dir: str):
    """The vectorized hash="fast" sampling sibling (production default
    at 100 TB — ~50× the per-row md5 loop). Same rate/determinism
    contract, different set by design, so no SQL oracle (rows-only
    driver check); parity with md5 mode is unit-tested."""
    from dcpray.functions.sample import hash_sample

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    override_num_blocks=16)
    out = hash_sample(ds, col="text", mod=10, keep=3, hash="fast").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_docs_hash_split(sf_dir: str):
    """Deterministic 8/1/1 train/val/test assignment by content hash."""
    from dcpray.functions.sample import hash_split

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return hash_split(ds, col="text").select_columns(["doc_id", "split"])


def _q_docs_remove_boilerplate(sf_dir: str):
    """C4-style repeated-fragment removal: fragments occurring in ≥3
    places corpus-wide are removed from every document, order
    preserved. (The synthetic docs are single-line, so the driver query
    splits on spaces — same operator, word-granularity separator; a
    real web corpus uses the default newline separator.)"""
    import pyarrow as pa

    from dcpray.functions.boilerplate import remove_repeated_paragraphs

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    cleaned = remove_repeated_paragraphs(ds, min_repeats=3, sep=" ")
    return cleaned.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text_clean": t["text"]}),
        batch_format="pyarrow",
    )


def _q_multimodal_decode_bmp(sf_dir: str):
    """REAL multimodal decode, SQL-verifiable: synthesize a valid 8×8
    BMP per document (pixels a closed-form function of the text length),
    then actually PARSE the BMP back (header, bottom-up rows, BGR,
    padding) and report decoded dims + mean pixel. The oracle computes
    the closed form — any decode error (stride, channel order, row
    flip) breaks the hash match."""
    from dcpray.functions.multimodal import bmp_pixel_stats, synthesize_bmp_media

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    media = ds.map_batches(synthesize_bmp_media, batch_format="pyarrow")
    return media.map_batches(bmp_pixel_stats, batch_format="pyarrow",
                             batch_size=256)


def _q_multimodal_decode_wav(sf_dir: str):
    """REAL audio decode, SQL-verifiable: synthesize a valid PCM16 WAV
    per document (samples a closed-form function of the text length),
    actually PARSE the RIFF container back, and report sample count,
    rate, and RMS amplitude; the oracle computes the closed form."""
    from dcpray.functions.multimodal import synthesize_wav_media, wav_audio_stats

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    media = ds.map_batches(synthesize_wav_media, batch_format="pyarrow")
    return media.map_batches(wav_audio_stats, batch_format="pyarrow",
                             batch_size=256)


def _q_docs_chunk(sf_dir: str):
    """Overlapping character-window chunking (1->N fan-out) — the SQL
    oracle reproduces the window arithmetic with generate_series +
    substring, so boundaries are exact-checked."""
    from dcpray.functions.textprep import chunk_text

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return chunk_text(ds, chunk_chars=200, overlap_chars=32)


def _q_docs_scrub_pii(sf_dir: str):
    """PII redaction. The corpus is synthetic word-soup, so both engine
    and oracle first append a deterministic PII suffix (email + phone +
    IP derived from doc_id) and then scrub it — the oracle checks real
    rewriting, not a no-op."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.textprep import scrub_pii

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)

    def add_pii(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        piid = pa.array((ids % 256).astype(np.int64))
        synth = pc.binary_join_element_wise(
            t["text"], pa.scalar(" contact user"),
            pc.cast(t["doc_id"], pa.string()),
            pa.scalar("@example.com or +1 (555) 123-4567 at 10.0."),
            pc.cast(piid, pa.string()), pa.scalar(".7"), "")
        return t.set_column(t.column_names.index("text"), "text", synth)

    return scrub_pii(ds.map_batches(add_pii, batch_format="pyarrow"))


def _q_docs_top_terms(sf_dir: str):
    """Global top-50 vocabulary terms (tokenizer shared verbatim with
    the oracle; ties break by term)."""
    from dcpray.functions.textprep import top_terms

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["text"], override_num_blocks=16)
    return top_terms(ds, k=50)


def _q_orders_customer_rollup(sf_dir: str):
    """Star-schema enrichment with ZERO shuffle of the fact table: two
    broadcast hash joins (customer, nation are lookup-sized) feed a
    coarse_groupby rollup — revenue per nation."""
    from dcpray.functions.agg import coarse_groupby
    from dcpray.functions.join import broadcast_join

    import pyarrow.parquet as pq

    orders = read_clean(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_custkey", "o_totalprice"],
                        override_num_blocks=16)
    # lookup-sized dims: read on the driver (one footer+column read)
    # instead of spinning a whole Ray execution each — broadcast_join
    # takes pa.Table directly
    customer = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    orders = orders.map_batches(_cents_mapper("o_totalprice", "price_c"),
                                batch_format="pyarrow")
    j = broadcast_join(orders, customer, on="o_custkey",
                       right_on="c_custkey")
    j = broadcast_join(j, nation, on="c_nationkey", right_on="n_nationkey")
    out = coarse_groupby(
        j, keys=["n_name"],
        aggs=[("price_c", "count", "n_orders"),
              ("price_c", "sum", "rev_c")],
        partitions=8,
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["revenue"] = out["rev_c"].astype("float64") / 100
    return out.drop(columns=["rev_c"])


def _q_events_rank_running(sf_dir: str):
    """SQL window functions distributed: per-user row_number() in time
    order + running SUM, one coarse exchange, row-exact vs the
    window-function oracle. The summed value is integer CENTS
    (floor(v*100 + 0.5), identical in both engines) so the running sum
    is exact — float accumulation order differs between numpy cumsum
    and DuckDB's windowed segment tree and would flip rounded digits."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.window import rank_in_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "value"],
                    override_num_blocks=16)

    out = rank_in_group(ds.map_batches(_cents_mapper(), batch_format="pyarrow"),
                        "user_id", "ts", tiebreak_col="event_id",
                        cumsum_col="value_c").to_pandas()
    # int-valued float64 cumsum (< 2^53, exact) -> int64 for the compare
    out["running_sum"] = out["running_sum"].astype("int64")
    return out


def _q_events_customer_skewjoin(sf_dir: str):
    """Skew-aware join on a manufactured hot key (a fifth of all events
    collapse onto key 1): hot left rows take the zero-exchange
    broadcast path, the cold rest takes the coarse shuffle join —
    row-exact vs the plain SQL join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.join import hash_join_skew

    ev = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id"],
                    override_num_blocks=16)

    def hot_key(t: pa.Table) -> pa.Table:
        import numpy as np

        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = np.where(u % 5 == 0, np.int64(1), u)
        return pa.table({"event_id": t["event_id"], "user_key": pa.array(k)})

    cust = read_clean(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey", "c_nationkey"],
                      override_num_blocks=4)
    return hash_join_skew(ev.map_batches(hot_key, batch_format="pyarrow"),
                          cust, on="user_key", right_on="c_custkey",
                          how="inner", partitions=16, hot_threshold=100)


def _q_cdc_conversations(sf_dir: str):
    """Transcripts → training documents: CDC replay → lazy lake read →
    ordered per-conversation assembly ("role: text" lines joined by
    newline) — SQL string_agg(ORDER BY) distributed with one coarse
    exchange and a fully vectorized ListArray+binary_join per
    partition."""
    from dcpray.functions.textprep import assemble_groups

    lake = _replay_final(sf_dir, "assemble")
    ds = lake.read_current().select_columns(["conv_id", "turn_idx",
                                             "role", "text"])
    return assemble_groups(ds, "conv_id", "turn_idx", "text",
                           sep="\n", label_col="role")


def _q_events_rolling7(sf_dir: str):
    """Per-user trailing-7-row moving aggregates (sum/mean/count/min/
    max) — SQL ROWS BETWEEN 6 PRECEDING AND CURRENT ROW, one coarse
    exchange + prefix-sum arithmetic. Integer cents keep the sums
    bit-exact vs the segment-tree oracle (see events_rank_running)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.window import rolling_agg

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "value"],
                    override_num_blocks=16)

    out = rolling_agg(ds.map_batches(_cents_mapper(), batch_format="pyarrow"),
                      "user_id", "ts", "value_c", window=7,
                      tiebreak_col="event_id",
                      aggs=("sum", "mean", "count", "min", "max")
                      ).to_pandas()
    for c in ("rolling_sum", "rolling_min", "rolling_max"):
        out[c] = out[c].astype("int64")   # int-valued float64, exact
    return out


def _q_events_rolling_30min(sf_dir: str):
    """TIME-RANGE moving aggregates: trailing 30 MINUTES per user — SQL
    RANGE BETWEEN INTERVAL 1800 SECONDS PRECEDING AND CURRENT ROW
    (frame by time distance, peers included; window.py
    rolling_agg_range's marker-merge resolves every variable frame
    start in one extra lexsort)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.window import rolling_agg_range

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id", "ts", "value"],
                    override_num_blocks=16)

    out = rolling_agg_range(ds.map_batches(_cents_mapper(), batch_format="pyarrow"),
                            "user_id", "ts", "value_c", interval_s=1800,
                            aggs=("sum", "count")).to_pandas()
    out["rolling_sum"] = out["rolling_sum"].astype("int64")
    return out


def _q_lineitem_part_semi(sf_dir: str):
    """Broadcast SEMI join (EXISTS): lineitem rows whose part is
    oversized — the broadcast is the filtered part side's DISTINCT keys
    only, the fact table never shuffles (join.py broadcast_join
    how='semi')."""
    import pyarrow.compute as pc

    from dcpray.functions.join import broadcast_join

    li = read_clean(os.path.join(sf_dir, "lineitem.parquet"),
                    columns=["l_orderkey", "l_linenumber", "l_partkey"],
                    override_num_blocks=16)
    part = read_clean(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_size"],
                      override_num_blocks=4)
    part = part.map_batches(
        lambda t: t.filter(pc.greater(t["p_size"], 40)),
        batch_format="pyarrow")
    return broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                          how="semi")


def _q_lineitem_part_anti(sf_dir: str):
    """Broadcast ANTI join (NOT EXISTS): the complement of
    lineitem_part_semi, same zero-exchange shape."""
    import pyarrow.compute as pc

    from dcpray.functions.join import broadcast_join

    li = read_clean(os.path.join(sf_dir, "lineitem.parquet"),
                    columns=["l_orderkey", "l_linenumber", "l_partkey"],
                    override_num_blocks=16)
    part = read_clean(os.path.join(sf_dir, "part.parquet"),
                      columns=["p_partkey", "p_size"],
                      override_num_blocks=4)
    part = part.map_batches(
        lambda t: t.filter(pc.greater(t["p_size"], 40)),
        batch_format="pyarrow")
    return broadcast_join(li, part, on="l_partkey", right_on="p_partkey",
                          how="anti")


def _q_events_props_extract(sf_dir: str):
    """Semi-structured payload extraction: pull the int field ``k``
    out of the JSON props column with ONE vectorized RE2 extract per
    batch (textprep.extract_json_field — the oracle runs the identical
    pattern, so values are exact), then aggregate mean value per k."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import coarse_groupby
    from dcpray.functions.textprep import extract_json_field

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "props", "value"],
                    override_num_blocks=16)
    ds = extract_json_field(ds, "props", "k", kind="int")

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"k": t["k"], "event_id": t["event_id"],
                         "value_c": _cents_col(t)})

    return coarse_groupby(ds.map_batches(cents, batch_format="pyarrow"),
                          ["k"], [("event_id", "count", "n"),
                                  ("value_c", "mean", "mean_c")])


def _q_events_latest_per_user(sf_dir: str):
    """arg_max: each user's latest event (max ts, event_id tiebreak) —
    topk_per_group with k=1, i.e. the per-batch local top-k combiner
    means the exchange moves at most one row per (user, batch)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import topk_per_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "event_type"],
                    override_num_blocks=16)

    def enc(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t["ts"], pa.int64()))

    out = topk_per_group(ds.map_batches(enc, batch_format="pyarrow"),
                         "user_id", "ts_us", k=1,
                         tiebreak_col="event_id", descending=True)
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "ts", "event_type"]),
        batch_format="pyarrow")


def _q_events_type_quantiles(sf_dir: str):
    """Per-group EXACT quantiles (quantile_disc GROUP BY): one coarse
    exchange on the group key, one lexsort + rank gather per partition
    — the grouped sibling of the global three-pass exact_quantiles."""
    from dcpray.functions.agg import quantiles_per_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_type", "value"],
                    override_num_blocks=16)
    return quantiles_per_group(ds, "event_type", "value",
                               qs=[0.1, 0.5, 0.9, 0.99])


def _q_events_ntile4(sf_dir: str):
    """SQL NTILE(4) distributed: per-user value quartile in descending
    value order — closed-form bucket arithmetic after one coarse
    exchange + lexsort."""
    from dcpray.functions.window import ntile_in_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "value"],
                    override_num_blocks=16)
    return ntile_in_group(ds, "user_id", "value", tiebreak_col="event_id",
                          n=4, descending=True)


def _q_events_value_histogram(sf_dir: str):
    """Fixed-bin histogram: 50 buckets over [0, 500) — one bincount
    partial per batch, <= bins ints leave each task, no exchange."""
    from dcpray.functions.agg import histogram

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["value"], override_num_blocks=16)
    return histogram(ds, "value", lo=0.0, hi=500.0, bins=50)


def _q_docs_pack_sequences(sf_dir: str):
    """LLM sequence packing: whitespace token counts → greedy packs of
    <= 2048 tokens (pack_id = first doc id of the pack, deterministic
    under any input layout). Greedy-sequential is not SQL-expressible;
    invariants are pytest-checked (budget bound, determinism,
    efficiency) — rows-only here."""
    import pyarrow as pa

    from dcpray.functions.textprep import pack_sequences
    from dcpray.functions.textstats import token_count

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=8)

    def count(t: pa.Table) -> pa.Table:
        return token_count(t).drop_columns(["text"])

    toks = ds.map_batches(count, batch_format="pyarrow")
    return pack_sequences(toks, "n_tokens", budget=2048)


def _q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, user_id): one per-batch partial
    reduce of the input, then one small partial-merge exchange per
    level — the partial algebra (sum/count/mean decomposition) makes
    every level exact without re-reading the events."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import rollup

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "event_type", "user_id", "value"],
                    override_num_blocks=16)

    return rollup(ds.map_batches(_cents_mapper(), batch_format="pyarrow"),
                  ["event_type", "user_id"],
                  [("event_id", "count", "n"), ("value_c", "sum", "sum_c"),
                   ("value_c", "mean", "mean_c")])


def _q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(o_orderstatus, o_orderpriority): all 4 grouping
    levels fanned off ONE collapsed partial set — the input is read and
    reduced exactly once (dcpray/functions/agg.py cube)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import cube

    ds = read_clean(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_orderkey", "o_orderstatus",
                             "o_orderpriority", "o_totalprice"],
                    override_num_blocks=16)

    return cube(ds.map_batches(_cents_mapper("o_totalprice", "price_c"),
                               batch_format="pyarrow"),
                ["o_orderstatus", "o_orderpriority"],
                [("o_orderkey", "count", "n"), ("price_c", "sum", "sum_c"),
                 ("price_c", "mean", "mean_c")])


def _q_events_value_stats(sf_dir: str):
    """Per-user variance/stddev through the partial-aggregate algebra
    (sum + countv + sumsq partials; E[x²]−E[x]² finalize whose float64
    op order the SQL oracle mirrors exactly — bit-identical on integer
    cents)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import coarse_groupby

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id", "value"], override_num_blocks=16)

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "value_c": _cents_col(t)})

    return coarse_groupby(ds.map_batches(cents, batch_format="pyarrow"),
                          ["user_id"],
                          [("value_c", "count", "n"),
                           ("value_c", "var", "var_c"),
                           ("value_c", "std", "std_c")])


def _q_events_corr_value_hour(sf_dir: str):
    """Pearson corr(value, hour-of-day) per event type — five exact
    integer sums per (group, batch) before the one exchange; the SQL
    oracle writes the identical expression tree (agg.py
    corr_per_group)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import corr_per_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_type", "ts", "value"],
                    override_num_blocks=16)

    def prep(t: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(t["ts"]), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "value_c": _cents_col(t), "hour": h})

    return corr_per_group(ds.map_batches(prep, batch_format="pyarrow"),
                          ["event_type"], "value_c", "hour",
                          alias="corr_vh")


def _q_embeddings_unnest(sf_dir: str):
    """UNNEST the embedding list column to (vec_id, pos, val) long form
    — pure vectorized reshape on Arrow list buffers, zero exchange
    (agg.py explode)."""
    from dcpray.functions.agg import explode

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"),
                    columns=["vec_id", "embedding"],
                    override_num_blocks=8)
    return explode(ds, "embedding", pos_col="pos", value_col="val")


def _q_events_rank_family(sf_dir: str):
    """The full SQL rank family in one pass: row_number (tiebreak-
    deterministic) plus tie-aware rank / dense_rank / percent_rank /
    cume_dist ordered by hour-of-day (deliberately tie-rich) per user
    (window.py rank_in_group ranks=...). percent_rank and cume_dist
    are single float64 divisions of exact integers — bit-identical to
    SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.window import rank_in_group

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts"],
                    override_num_blocks=16)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"], "user_id": t["user_id"],
            "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
        })

    return rank_in_group(ds.map_batches(prep, batch_format="pyarrow"),
                         "user_id", "hour", tiebreak_col="event_id",
                         out_col="row_number",
                         ranks=("rank", "dense_rank", "percent_rank",
                                "cume_dist"))


def _q_events_describe(sf_dir: str):
    """describe(): one-pass per-column count/mean/std/min/max — each
    batch collapses to ONE partial row, no exchange (agg.py describe;
    std by the pinned-op-order identity, bit-exact vs the oracle's
    explicit arithmetic on integer cents)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import describe

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id", "value"], override_num_blocks=16)

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "value_c": _cents_col(t)})

    return describe(ds.map_batches(cents, batch_format="pyarrow"),
                    ["user_id", "value_c"])


def _q_customer_updates_diff(sf_dir: str):
    """Generic table_diff (SQL MERGE classification): customer vs a
    deterministically perturbed copy (balance bumped for custkey%7,
    custkey%13 rows dropped) → per-key update/delete change set
    (history.py table_diff — the exchange-based sibling of the lake's
    zero-exchange lake_diff)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.history import table_diff

    def base():
        ds = read_clean(os.path.join(sf_dir, "customer.parquet"),
                        columns=["c_custkey", "c_acctbal", "c_mktsegment"],
                        override_num_blocks=8)

        def cents(t: pa.Table) -> pa.Table:
            return pa.table({"c_custkey": t["c_custkey"],
                             "bal_c": _cents_col(t, "c_acctbal"),
                             "c_mktsegment": t["c_mktsegment"]})

        return ds.map_batches(cents, batch_format="pyarrow")

    def perturb(t: pa.Table) -> pa.Table:
        import numpy as np

        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 13 != 0))
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        bump = pa.array((k % 7 == 0) * np.int64(1000))
        return t.set_column(t.schema.get_field_index("bal_c"), "bal_c",
                            pc.add(t["bal_c"], bump))

    new = base().map_batches(perturb, batch_format="pyarrow")
    return table_diff(base(), new, keys=["c_custkey"])


def _q_custkeys_intersect(sf_dir: str):
    """SQL INTERSECT: customers that placed at least one order — both
    sides collapse to per-batch distinct keys BEFORE the one exchange
    (dcpray/functions/setops.py)."""
    import pyarrow as pa

    from dcpray.functions.setops import intersect_distinct

    cust = read_clean(os.path.join(sf_dir, "customer.parquet"),
                      columns=["c_custkey"], override_num_blocks=8)
    orders = read_clean(os.path.join(sf_dir, "orders.parquet"),
                        columns=["o_custkey"], override_num_blocks=8)
    orders = orders.map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"]}),
        batch_format="pyarrow")
    return intersect_distinct(cust, orders, ["c_custkey"])


def _q_events_except_days(sf_dir: str):
    """SQL EXCEPT on a MULTI-COLUMN key: (user, day) pairs that
    purchased but never clicked that day."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.setops import except_distinct

    def side(event_type: str):
        ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                        columns=["user_id", "ts", "event_type"],
                        override_num_blocks=16)

        def prep(t: pa.Table, et=event_type) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], et))
            # floor_temporal (timestamp-typed day) rather than a date32
            # cast: DuckDB hands CAST(ts AS DATE) back as datetime64, so
            # a date32 result is value-equal but dtype-mismatched under
            # the driver's strict schema/hash compare (r4 verdict #2)
            return pa.table({
                "user_id": t["user_id"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    return except_distinct(side("purchase"), side("click"),
                           ["user_id", "day"])


def _q_lineitem_melt(sf_dir: str):
    """UNPIVOT/melt: four lineitem measures into long (name, value)
    form — a pure vectorized map_batches reshape, zero exchange."""
    from dcpray.functions.agg import melt

    ds = read_clean(os.path.join(sf_dir, "lineitem.parquet"),
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount", "l_tax"],
                    override_num_blocks=8)
    return melt(ds, ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def _q_events_pivot_types(sf_dir: str):
    """PIVOT: per-user event count per event_type as wide columns —
    conditional-aggregation form, partials through coarse_groupby."""
    from dcpray.functions.agg import pivot

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id", "event_type", "event_id"],
                    override_num_blocks=16)
    return pivot(ds, "user_id", "event_type", "event_id",
                 names=["click", "view", "purchase"], agg="count")


def _q_events_forward_fill(sf_dir: str):
    """LOCF imputation: error events carry no value — fill each from
    the user's last non-null value in time order (leading gaps stay
    null). One coarse exchange + one maximum.accumulate per
    partition."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.window import forward_fill

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"],
                    override_num_blocks=16)

    def null_errors(t: pa.Table) -> pa.Table:
        v = pc.if_else(pc.equal(t["event_type"], pa.scalar("error")),
                       pa.nulls(t.num_rows, pa.float64()), t["value"])
        return t.set_column(t.column_names.index("value"), "value", v)

    return forward_fill(ds.map_batches(null_errors, batch_format="pyarrow"),
                        "user_id", "ts", "value", tiebreak_col="event_id",
                        out_col="value_ff")


def _q_events_lag_lead(sf_dir: str):
    """SQL LAG/LEAD distributed: previous and next value per user in
    time order — one coarse exchange, one lexsort + masked gathers per
    partition. Pure gathers, so doubles compare exactly."""
    from dcpray.functions.window import lag_lead

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "user_id", "ts", "value"],
                    override_num_blocks=16)
    return lag_lead(ds, "user_id", "ts", "value", tiebreak_col="event_id",
                    lags=(1,), leads=(1,))


def _q_docs_contamination_exact(sf_dir: str):
    """Benchmark decontamination, exact form: a deterministic 1-in-20
    hash split of documents plays the held-out benchmark; corpus rows
    whose text appears verbatim in it are flagged. Benchmark text
    hashes broadcast once (ray.put), corpus streams with ZERO
    exchange."""
    from dcpray.functions.decontam import exact_contamination
    from dcpray.functions.sample import hash_sample

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=8)
    bench = hash_sample(ds, col="text", mod=20, keep=7)
    return exact_contamination(ds, bench)


def _q_docs_contamination_ngram(sf_dir: str):
    """Benchmark decontamination, word-8-gram form: corpus docs sharing
    any distinct 8-gram with the benchmark union set, with the shared
    count — catches partial copies exact matching misses. Same
    zero-exchange broadcast shape; oracle generates the identical
    8-grams via generate_series."""
    from dcpray.functions.decontam import ngram_contamination
    from dcpray.functions.sample import hash_sample

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=8)
    bench = hash_sample(ds, col="text", mod=20, keep=7)
    return ngram_contamination(ds, bench, n=8)


def _q_docs_tfidf_top3(sf_dir: str):
    """Per-document top-3 TF-IDF terms, fully distributed (df via
    coarse_groupby, idf attached via hash_join on term — no vocab
    broadcast). Score uses division/multiplication only (no log) so the
    IEEE doubles are bit-identical to the SQL oracle's."""
    from dcpray.functions.textprep import tfidf_top_terms

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=8)
    return tfidf_top_terms(ds, k=3, partitions=32)


def _q_docs_normalize(sf_dir: str):
    """Canonical text normalization: NFC + utf8proc lowercase +
    whitespace collapse — byte-exact vs DuckDB (shared utf8proc + RE2)."""
    from dcpray.functions.textprep import normalize_text

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=8)
    return normalize_text(ds, "text", out_col="norm_text")


def _q_docs_top100_longest(sf_dir: str):
    """Global ranked retrieval on Ray's native distributed sort
    (range-partitioned AllToAll): top 100 documents by length with a
    deterministic doc_id tiebreak."""
    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "n_chars"], override_num_blocks=8)
    return ds.sort(key=["n_chars", "doc_id"],
                   descending=[True, False]).limit(100)


def _urgent_orders(sf_dir: str):
    """Pruned orders read filtered to 1-URGENT — shared by the LEFT and
    FULL OUTER join queries. Arrow batch filter, not
    Dataset.filter(lambda row): the row form runs a Python predicate
    per row in the hot path."""
    import pyarrow.compute as pc

    od = read_clean(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_orderkey", "o_orderpriority", "o_custkey"],
                    override_num_blocks=8)
    return od.map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")),
        batch_format="pyarrow")


def _q_lineitem_orders_join(sf_dir: str):
    """Large×large distributed hash join (no broadcast side): lineitem
    LEFT JOIN the urgent-orders subset — both sides shuffle exactly
    once on the coarse key partition; unmatched lineitems keep null
    order columns (SQL LEFT OUTER null semantics verified row-exact)."""
    from dcpray.functions.join import hash_join

    li = read_clean(os.path.join(sf_dir, "lineitem.parquet"),
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice"],
                    override_num_blocks=16)
    return hash_join(li, _urgent_orders(sf_dir), on="l_orderkey",
                     right_on="o_orderkey", how="left", partitions=32)


def _q_lineitem_orders_full_outer(sf_dir: str):
    """Distributed FULL OUTER hash join (r4 verdict #4): heavy
    lineitems (qty > 45) ⋈ urgent orders — each side has rows the
    other lacks, so BOTH preservation directions are exercised: heavy
    lineitems of non-urgent orders keep null order columns, urgent
    orders with no heavy lineitem keep null lineitem columns, and the
    join key is coalesced across sides."""
    import pyarrow.compute as pc

    from dcpray.functions.join import hash_join

    li = read_clean(os.path.join(sf_dir, "lineitem.parquet"),
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice", "l_quantity"],
                    override_num_blocks=16)
    heavy = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45)).drop_columns(
            ["l_quantity"]),
        batch_format="pyarrow")
    return hash_join(heavy, _urgent_orders(sf_dir), on="l_orderkey",
                     right_on="o_orderkey", how="full", partitions=32)


def _q_events_stratified_sample(sf_dir: str):
    """Deterministic 5-per-user sample, md5-rank-exact vs the SQL
    row_number oracle."""
    from dcpray.functions.sample import stratified_sample

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    override_num_blocks=16)
    return stratified_sample(ds, "user_id", 5, id_col="event_id")


def _q_events_daily_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per day — per-batch distinct collapse
    before the exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import distinct_count

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["ts", "user_id"], override_num_blocks=16)

    def add_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.floor_temporal(t["ts"], unit="day"))

    out = distinct_count(ds.map_batches(add_day, batch_format="pyarrow"),
                         ["day"], "user_id", alias="users").to_pandas()
    out["users"] = out["users"].astype("int64")
    return out[["day", "users"]]


def _q_events_daily_users_approx(sf_dir: str):
    """HyperLogLog COUNT(DISTINCT user) per day — the 100-TB sibling of
    the oracle-checked exact `events_daily_users`: the exchange moves
    one fixed 4 KiB sketch per (day, batch) regardless of user
    cardinality. Approximate by nature (σ ≈ 1.6% at p=12) ⇒ rows-only
    driver check; accuracy + merge associativity are unit-tested."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from dcpray.functions.agg import approx_distinct_count

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["ts", "user_id"], override_num_blocks=16)

    def add_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.floor_temporal(t["ts"], unit="day"))

    out = approx_distinct_count(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["day"], "user_id", alias="users_approx").to_pandas()
    return out[["day", "users_approx"]]


def _q_events_value_quantiles(sf_dir: str):
    """EXACT quantiles without a global sort: histogram selection in
    three streaming passes, DuckDB quantile_disc convention
    (rank = ceil(n*q) - 1)."""
    from dcpray.functions.agg import exact_quantiles

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["value"], override_num_blocks=16)
    out = exact_quantiles(
        ds, "value", [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99],
        bins=4096).to_pandas()
    out["value"] = out["value"].round(6)
    return out


def _q_events_hopping_30min(sf_dir: str):
    """30-minute windows hopping every 10 minutes (each event in
    exactly 3 windows) — vectorized 1->3 expansion, partials-only
    exchange."""
    from dcpray.functions.window import hopping_window

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["ts", "value"], override_num_blocks=16)
    ds = ds.map_batches(_cents_mapper(), batch_format="pyarrow")
    out = hopping_window(ds, "ts", size_s=1800, hop_s=600,
                         aggs=[("ts", "count", "n_events"),
                               ("value_c", "sum", "sum_c")]).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_c"].astype("float64") / 100
    return out.drop(columns=["sum_c"])


def _q_embedding_kmeans(sf_dir: str):
    """Distributed spherical k-means (8 clusters, 5 Lloyd iterations,
    deterministic hashed-id init) -> cluster sizes. Iterative, so no
    SQL oracle; equivalence to a numpy Lloyd reference is unit-tested
    (tests/test_ops_r4.py)."""
    from dcpray.functions.agg import coarse_groupby
    from dcpray.functions.kmeans import kmeans_assign, kmeans_fit

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"),
                    columns=["vec_id", "embedding"], override_num_blocks=8)
    cents = kmeans_fit(ds, k=8, iters=5, metric="cosine")
    assign = kmeans_assign(ds, cents, metric="cosine")
    out = coarse_groupby(assign, keys=["cluster"],
                         aggs=[("vec_id", "count", "n_vectors")],
                         partitions=4).to_pandas()
    out["n_vectors"] = out["n_vectors"].astype("int64")
    return out.sort_values("cluster").reset_index(drop=True)



def _q_docs_repetition(sf_dir: str):
    """Gopher-style per-document repetition stats in WORD mode (the
    fixture's documents are single-line, space-separated tokens; the
    operator is separator-generic — sep="\\n" gives the line flavor).
    Fractions are float64 divisions of exact integer counts, identical
    to the oracle's CAST(... AS DOUBLE) arithmetic."""
    import pyarrow as pa

    from dcpray.functions.textstats import repetition_stats

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return ds.map_batches(
        lambda t: repetition_stats(t, sep=" "), batch_format="pyarrow")


def _q_embeddings_knn3(sf_dir: str):
    """Exact top-3 cosine kNN self-join over the embeddings table —
    the similarity-graph primitive. Rank order is on the ROUNDED
    (4dp, half away from zero) cosine with neighbor-id ties ascending,
    exactly reproducible in SQL (full-precision floats differ in the
    last ulp between engines and would flip near-tie ranks)."""
    from dcpray.functions.ann import knn_self_join

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"),
                    columns=["vec_id", "embedding"], override_num_blocks=8)
    return knn_self_join(ds, k=3)


def _q_embeddings_knn3_ivf_full(sf_dir: str):
    """IVF-bucketed kNN self-join at FULL probe (nprobe == nlist):
    row-identical to the brute path and to the same SQL oracle — the
    scale route's correctness anchor (sub-probe recall is unit-tested,
    rows-only by nature, mirroring ann_ivf_topk ↔ ann_ivf_full_probe)."""
    from dcpray.functions.ann import knn_self_join_ivf

    ds = read_clean(os.path.join(sf_dir, "embeddings.parquet"),
                    columns=["vec_id", "embedding"], override_num_blocks=8)
    return knn_self_join_ivf(ds, k=3, nlist=8, nprobe=8)


def _q_docs_encode_tokens(sf_dir: str):
    """Corpus-vocab token encoding (vocab_size=64 so OOV is exercised):
    one row per (doc, position) with the term and its 1-based vocab
    rank id (0 = OOV). Vocabulary ranking and tokenizer are shared
    verbatim with docs_top_terms' oracle."""
    from dcpray.functions.textprep import encode_tokens

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return encode_tokens(ds, vocab_size=64)


def _q_sample_docs_rate(sf_dir: str):
    """Arbitrary-rate deterministic Bernoulli sample (rate 0.3):
    keep when md5-lower64(text) < floor(0.3 · 2^64) — the identical
    integer threshold appears in the SQL oracle, so the selected SET
    matches exactly (hash_sample's mod form only does 1-in-k rates)."""
    from dcpray.functions.sample import bernoulli_sample

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return bernoulli_sample(ds, rate=0.3)


def _q_events_top_users(sf_dir: str):
    """EXACT global heavy hitters: top-20 users by event count —
    coarse_groupby partial counts + topk_global (per-batch combiner
    bounds the exchange to k rows per batch; ties break by user_id)."""
    from dcpray.functions.agg import coarse_groupby, topk_global

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id"], override_num_blocks=16)
    counts = coarse_groupby(ds, keys=["user_id"],
                            aggs=[("user_id", "count", "n_events")],
                            partitions=16)
    out = topk_global(counts, "n_events", k=20,
                      tiebreak_col="user_id").to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    return out


def _q_events_top_users_approx(sf_dir: str):
    """Misra–Gries sketch sibling of events_top_users: ZERO-exchange
    heavy hitters with a bounded undercount (capacity 256 per summary —
    real truncation at this scale). Rows-only by nature (counts are
    lower bounds); the exact sibling above is the oracle-checked one,
    same lattice as HLL ↔ distinct_count."""
    from dcpray.functions.agg import approx_topk

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["user_id"], override_num_blocks=16)
    return approx_topk(ds, "user_id", k=20, capacity=256)


def _q_docs_ngram_repetition(sf_dir: str):
    """Gopher duplicate-2-gram stats per document (the n>=2 half of the
    repetition rules; duplicate-fraction form is TIE-FREE so the SQL
    oracle reproduces it exactly — no 'most common n-gram' tiebreak)."""
    from dcpray.functions.textstats import ngram_repetition_stats

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    return ds.map_batches(
        lambda t: ngram_repetition_stats(t, n=2, sep=" "),
        batch_format="pyarrow")


def _q_docs_quality_percentile(sf_dir: str):
    """Operator COMPOSITION: quality scoring (actor-memoized scorer)
    feeding corpus-wide exact percentile normalization — the
    quality-gate shape of a training-data pipeline ('keep the top X%')
    as one streaming Dataset, no global sort, no materialization."""
    from dcpray.functions.textstats import quality_score_batch
    from dcpray.functions.window import percent_rank_global

    ds = read_clean(os.path.join(sf_dir, "documents.parquet"),
                    columns=["doc_id", "text"], override_num_blocks=16)
    scored = ds.map_batches(quality_score_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "quality_score"])
    return percent_rank_global(scored, "quality_score")


def _q_events_value_percentile(sf_dir: str):
    """Corpus-wide exact PERCENT_RANK over event values (quality-score
    calibration shape): distinct-value CDF merged once on the driver,
    broadcast, attached per batch — no global sort, no all-to-all."""
    from dcpray.functions.window import percent_rank_global

    ds = read_clean(os.path.join(sf_dir, "events.parquet"),
                    columns=["event_id", "value"], override_num_blocks=16)
    return percent_rank_global(ds, "value")


def entry() -> Any:
    """Flagship pipeline: full CDC replay of the sf0.001 transcript WAL
    into a fresh lake; returns the final transcripts table."""
    return _q_cdc_replay_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    for sf in FIXTURE_SFS[:2]:  # pre-materialize so oracle SQL can run first
        try:
            _fx(sf)
        except Exception:
            pass
    return {
        # --- ordering contract: the driver's correctness harness
        # verifies only the FIRST 50 entries, so queries without a
        # prior driver-verified CORRECTNESS row come first (round-4
        # verdict #1); the long-green CDC core and early waves rotate
        # to the tail for this round.
        "lineitem_orders_full_outer": _q_lineitem_orders_full_outer,
        "docs_tfidf_top3": _q_docs_tfidf_top3,
        "events_rank_running": _q_events_rank_running,
        "events_customer_skewjoin": _q_events_customer_skewjoin,
        "cdc_conversations": _q_cdc_conversations,
        "events_rolling7": _q_events_rolling7,
        "events_rolling_30min": _q_events_rolling_30min,
        "events_props_extract": _q_events_props_extract,
        "events_latest_per_user": _q_events_latest_per_user,
        "lineitem_part_semi": _q_lineitem_part_semi,
        "lineitem_part_anti": _q_lineitem_part_anti,
        "events_type_quantiles": _q_events_type_quantiles,
        "docs_contamination_exact": _q_docs_contamination_exact,
        "events_lag_lead": _q_events_lag_lead,
        "events_ntile4": _q_events_ntile4,
        "events_rollup": _q_events_rollup,
        "orders_cube": _q_orders_cube,
        "events_value_stats": _q_events_value_stats,
        "events_corr_value_hour": _q_events_corr_value_hour,
        "embeddings_unnest": _q_embeddings_unnest,
        "events_rank_family": _q_events_rank_family,
        "events_describe": _q_events_describe,
        "customer_updates_diff": _q_customer_updates_diff,
        "custkeys_intersect": _q_custkeys_intersect,
        "events_except_days": _q_events_except_days,
        "lineitem_melt": _q_lineitem_melt,
        "events_pivot_types": _q_events_pivot_types,
        "events_forward_fill": _q_events_forward_fill,
        "events_value_histogram": _q_events_value_histogram,
        "docs_pack_sequences": _q_docs_pack_sequences,
        "docs_contamination_ngram": _q_docs_contamination_ngram,
        "events_stratified_sample": _q_events_stratified_sample,
        "events_daily_users": _q_events_daily_users,
        "events_daily_users_approx": _q_events_daily_users_approx,
        "events_value_quantiles": _q_events_value_quantiles,
        "events_hopping_30min": _q_events_hopping_30min,
        "embedding_kmeans": _q_embedding_kmeans,
        "multimodal_decode_bmp": _q_multimodal_decode_bmp,
        "multimodal_decode_wav": _q_multimodal_decode_wav,
        # --- round-5 wave (also never driver-verified yet) ---
        "docs_repetition": _q_docs_repetition,
        "embeddings_knn3": _q_embeddings_knn3,
        "events_value_percentile": _q_events_value_percentile,
        "docs_quality_percentile": _q_docs_quality_percentile,
        "docs_ngram_repetition": _q_docs_ngram_repetition,
        "events_top_users": _q_events_top_users,
        "events_top_users_approx": _q_events_top_users_approx,
        "docs_encode_tokens": _q_docs_encode_tokens,
        "embeddings_knn3_ivf_full": _q_embeddings_knn3_ivf_full,
        "sample_docs_rate": _q_sample_docs_rate,
        # --- three-rounds-green rotation (driver-verified r2-r4) ---
        "cdc_replay_full": _q_cdc_replay_full,
        "cdc_resume_equivalence": _q_cdc_resume,
        "cdc_view_role_stats": _q_cdc_view_role_stats,
        "cdc_skew_unsalted": _q_cdc_skew_unsalted,
        "cdc_replay_shuffle": _q_cdc_replay_shuffle,
        "cdc_schema_evolution": _q_cdc_schema_evolution,
        "cdc_mutations_stream": _q_cdc_mutations_stream,
        "cdc_op_counts": _q_cdc_op_counts,
        "cdc_rejected_rows": _q_cdc_rejected_rows,
        "cdc_watermarks": _q_cdc_watermarks,
        "cdc_then_token_count": _q_cdc_then_token_count,
        "cdc_scd2_history": _q_cdc_scd2_history,
        "cdc_change_feed": _q_cdc_change_feed,
        "cdc_changefeed_persisted": _q_cdc_changefeed_persisted,
        "dedup_exact": _q_dedup_exact,
        "text_token_count": _q_text_token_count,
        "text_token_count_bpe": _q_text_token_count_bpe,
        "text_stats": _q_text_stats,
        "ann_topk": _q_ann_topk,
        "events_hourly": _q_events_hourly,
        "events_sessions": _q_events_sessions,
        "events_asof_click": _q_events_asof_click,
        "events_asof_next_click": _q_events_asof_next_click,
        "events_top3_by_value": _q_events_top3_by_value,
        "events_range_click": _q_events_range_click,
        "events_range_click_broadcast": _q_events_range_click_broadcast,
        "sample_docs_hash": _q_sample_docs_hash,
        "sample_docs_hash_fast": _q_sample_docs_hash_fast,
        "docs_hash_split": _q_docs_hash_split,
        "docs_remove_boilerplate": _q_docs_remove_boilerplate,
        "dedup_minhash_pairs": _q_dedup_minhash_pairs,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "embedding_neardup_pairs": _q_embedding_neardup_pairs,
        "embedding_neardup_exact": _q_embedding_neardup_exact,
        "lang_id": _q_lang_id,
        "text_jaccard_exact": _q_text_jaccard_exact,
        "text_fingerprint": _q_text_fingerprint,
        "text_fingerprint_md5": _q_text_fingerprint_md5,
        "quality_score": _q_quality_score,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_ivf_full_probe": _q_ann_ivf_full_probe,
        "ann_ivf_index_full_probe": _q_ann_ivf_index_full_probe,
        "multimodal_features": _q_multimodal_features,
        "docs_chunk": _q_docs_chunk,
        "docs_scrub_pii": _q_docs_scrub_pii,
        "docs_top_terms": _q_docs_top_terms,
        "orders_customer_rollup": _q_orders_customer_rollup,
        "lineitem_orders_join": _q_lineitem_orders_join,
        "docs_normalize": _q_docs_normalize,
        "docs_top100_longest": _q_docs_top100_longest,
    }




def _scrub_pii_oracle() -> str:
    """The scrub oracle is built from DEFAULT_PII_PATTERNS itself —
    one pattern source of truth for engine and SQL (the same
    convention token_count_bpe uses for its RE2 pattern)."""
    from dcpray.functions.textprep import DEFAULT_PII_PATTERNS

    expr = ("text || ' contact user' || CAST(doc_id AS varchar) || "
            "'@example.com or +1 (555) 123-4567 at 10.0.' || "
            "CAST(doc_id % 256 AS varchar) || '.7'")
    for _, pat, rep in DEFAULT_PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def oracle_sql() -> dict[str, str]:
    for sf in FIXTURE_SFS[:2]:
        try:
            _fx(sf)
        except Exception:
            pass
    fx = "/tmp/dcpray_fixtures/sf0.01"
    # bound ONCE and reused under several keys (equivalent operators
    # share one oracle; editing a lone copy would silently
    # desynchronize the siblings — same pattern as cdc_change_feed_sql)
    quality_sql = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+') words,
         length(regexp_extract_all(text, '[A-Za-z]')) n_alpha,
         length(text) n_chars
  FROM documents
), s AS (
  SELECT doc_id, len(words) n,
         len(list_filter(words, w -> w IN ('the','and','of','a','to','in','is',
             'it','for','on','with','as','was','at','by','an','be','this','that'))) n_stop,
         len(list_distinct(words)) n_uniq, n_alpha, n_chars
  FROM w
)
SELECT doc_id,
  round(CASE WHEN n > 0 THEN n_stop / CAST(n AS DOUBLE) ELSE 0 END, 6) stopword_ratio,
  round(0.3 * (CASE WHEN n_chars BETWEEN 50 AND 4000 THEN 1.0 ELSE 0.3 END)
      + 0.2 * least((CASE WHEN n > 0 THEN n_stop / CAST(n AS DOUBLE) ELSE 0 END) * 4, 1.0)
      + 0.25 * (n_alpha / CAST(greatest(1, n_chars) AS DOUBLE))
      + 0.25 * (CASE WHEN n > 0 THEN n_uniq / CAST(n AS DOUBLE) ELSE 0 END), 6) quality_score
FROM s"""
    knn3_sql = """
SELECT vec_id, nbr_id, rank, cosine FROM (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         round(CAST(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cosine,
         row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(CAST(list_cosine_similarity(
                 CAST(a.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) AS DOUBLE), 4) DESC,
             b.vec_id) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
) WHERE rank <= 3"""
    ann_bruteforce_sql = """
WITH q AS (SELECT vec_id query_id, embedding qe FROM embeddings WHERE vec_id < 5)
SELECT query_id, vec_id FROM (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                                     e.vec_id) rn
  FROM q CROSS JOIN embeddings e
) WHERE rn <= 10"""
    range_click_sql = """
SELECT l.event_id, l.user_id, l.ts, r.ts AS click_ts
FROM events l
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id
 AND r.ts > l.ts - INTERVAL 60 MINUTE
 AND r.ts <= l.ts"""

    wal_valid = f"""
  SELECT conv_id, turn_idx, role, text, tool, ts, tool_version, seqno, op
  FROM read_parquet('{fx}/wal/*/*.parquet', union_by_name=true)
  WHERE conv_id IS NOT NULL AND turn_idx >= 0
    AND op IN ('mutation','deletion','expiration')"""
    lww_final = f"""
WITH wal AS ({wal_valid}
), base AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         CAST(NULL AS VARCHAR) tool_version, CAST(0 AS UBIGINT) seqno, 'mutation' op
  FROM read_parquet('{fx}/base/*.parquet')
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY seqno DESC) rn
  FROM (SELECT * FROM wal UNION ALL BY NAME SELECT * FROM base)
)
SELECT conv_id, turn_idx, role, text, tool, ts, tool_version
FROM ranked WHERE rn = 1 AND op = 'mutation'"""
    cdc_change_feed_sql = f"""
WITH sa AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY seqno DESC) rn
    FROM (SELECT * FROM ({wal_valid}) WHERE seqno <= {_CDF_CUTOFF}
          UNION ALL BY NAME
          SELECT conv_id, turn_idx, role, text, tool, ts,
                 CAST(NULL AS VARCHAR) tool_version,
                 CAST(0 AS UBIGINT) seqno, 'mutation' op
          FROM read_parquet('{fx}/base/*.parquet')))
  WHERE rn = 1 AND op = 'mutation'
), sb AS (
  SELECT * EXCLUDE (rn) FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                                 ORDER BY seqno DESC) rn
    FROM (SELECT * FROM ({wal_valid})
          UNION ALL BY NAME
          SELECT conv_id, turn_idx, role, text, tool, ts,
                 CAST(NULL AS VARCHAR) tool_version,
                 CAST(0 AS UBIGINT) seqno, 'mutation' op
          FROM read_parquet('{fx}/base/*.parquet')))
  WHERE rn = 1 AND op = 'mutation'
)
SELECT coalesce(a.conv_id, b.conv_id) AS conv_id,
       coalesce(a.turn_idx, b.turn_idx) AS turn_idx,
       CASE WHEN a.conv_id IS NULL THEN 'insert'
            WHEN b.conv_id IS NULL THEN 'delete'
            ELSE 'update' END AS _change_type,
       CASE WHEN b.conv_id IS NULL THEN a.role ELSE b.role END AS role,
       CASE WHEN b.conv_id IS NULL THEN a.text ELSE b.text END AS text,
       CASE WHEN b.conv_id IS NULL THEN a.tool ELSE b.tool END AS tool,
       CASE WHEN b.conv_id IS NULL THEN a.ts ELSE b.ts END AS ts,
       CASE WHEN b.conv_id IS NULL THEN a.tool_version
            ELSE b.tool_version END AS tool_version
FROM sa a FULL OUTER JOIN sb b
  ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
WHERE a.conv_id IS NULL OR b.conv_id IS NULL
   OR a.role IS DISTINCT FROM b.role
   OR a.text IS DISTINCT FROM b.text
   OR a.tool IS DISTINCT FROM b.tool
   OR a.ts IS DISTINCT FROM b.ts
   OR a.tool_version IS DISTINCT FROM b.tool_version"""
    return {
        "cdc_replay_full": lww_final,
        "cdc_resume_equivalence": lww_final,
        "cdc_view_role_stats": f"""
SELECT role, CAST(count(*) AS BIGINT) n_turns,
       round(avg(turn_idx), 6) mean_turn_idx, max(ts) last_ts
FROM ({lww_final}) GROUP BY role""",
        "cdc_skew_unsalted": lww_final,
        "cdc_replay_shuffle": lww_final,
        "cdc_schema_evolution": f"""
SELECT conv_id, turn_idx, tool_version FROM ({lww_final})
WHERE tool_version IS NOT NULL""",
        "cdc_mutations_stream": f"""
SELECT conv_id, turn_idx, CAST(seqno AS BIGINT) seqno, role, text
FROM ({wal_valid.strip()}) WHERE op = 'mutation'""",
        "cdc_op_counts": f"""
SELECT op, CAST(count(*) AS BIGINT) n FROM ({wal_valid.strip()}) GROUP BY op""",
        "cdc_rejected_rows": f"""
SELECT CAST(count(*) AS BIGINT) n_rejected
FROM read_parquet('{fx}/wal/*/*.parquet', union_by_name=true)
WHERE conv_id IS NULL OR turn_idx < 0 OR op NOT IN ('mutation','deletion','expiration')""",
        "cdc_watermarks": f"""
SELECT CAST(vb AS BIGINT) vb, CAST(max(seqno) AS BIGINT) watermark
FROM read_parquet('{fx}/wal/*/*.parquet', union_by_name=true) GROUP BY vb""",
        "cdc_then_token_count": rf"""
SELECT conv_id, turn_idx,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) n_tokens
FROM ({lww_final})""",
        "cdc_scd2_history": f"""
SELECT conv_id, turn_idx, CAST(seqno AS BIGINT) AS valid_from,
       CAST(LEAD(seqno) OVER (PARTITION BY conv_id, turn_idx
                              ORDER BY seqno) AS BIGINT) AS valid_to,
       (LEAD(seqno) OVER (PARTITION BY conv_id, turn_idx
                          ORDER BY seqno) IS NULL) AS is_current,
       op, role
FROM ({wal_valid})""",
        "cdc_changefeed_persisted": cdc_change_feed_sql,
        "cdc_change_feed": cdc_change_feed_sql,
        "dedup_exact": """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""",
        "text_token_count": r"""
SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) n_tokens
FROM documents""",
        "text_token_count_bpe": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
       )) AS BIGINT) n_tokens_bpe
FROM documents""",
        "text_stats": r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) n_chars,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) n_tokens,
       round(length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) / greatest(length(text), 1), 6) punct_ratio,
       round(length(regexp_extract_all(text, '[A-Z]')) / greatest(length(text), 1), 6) upper_ratio
FROM documents""",
        "ann_topk": ann_bruteforce_sql,
        "text_fingerprint_md5": r"""
SELECT doc_id, md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) fingerprint_md5
FROM documents""",
        "lang_id": r"""
WITH w AS (
  SELECT doc_id, text,
         list_distinct(regexp_extract_all(lower(text), '[a-zäöüßéèêàçñ]+')) words
  FROM documents
), s AS (
  SELECT doc_id, text,
    len(list_filter(words, x -> x IN ('the','and','of','to','in','is','that','for','with','was'))) s_en,
    len(list_filter(words, x -> x IN ('der','die','und','das','ist','nicht','mit','ein','von','zu')))
      + 2 * CAST(regexp_matches(text, '[äöüß]') AS INT) s_de,
    len(list_filter(words, x -> x IN ('le','la','les','et','des','est','pour','que','une','dans')))
      + 2 * CAST(regexp_matches(text, '[éèêàçœ]') AS INT) s_fr,
    len(list_filter(words, x -> x IN ('el','la','los','las','es','por','que','una','con','para')))
      + 2 * CAST(regexp_matches(text, '[ñáíóú¿¡]') AS INT) s_es
  FROM w
)
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 'und'
       WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
       WHEN s_fr > greatest(s_en, s_de) THEN 'fr'
       WHEN s_de > s_en THEN 'de'
       ELSE 'en' END lang_pred
FROM s""",
        "quality_score": quality_sql,
        "docs_quality_percentile": f"""
WITH q AS ({quality_sql})
SELECT doc_id, quality_score,
       percent_rank() OVER (ORDER BY quality_score) AS percent_rank
FROM q""",
        "text_jaccard_exact": """
WITH w0 AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') w
  FROM documents
), s AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 2, 0)),
    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) g
  FROM w0
)
SELECT a.doc_id a, b.doc_id b,
       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) > 0
  AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= 0.5""",
        "embedding_neardup_exact": """
SELECT x.vec_id a, y.vec_id b,
       round(CAST(list_cosine_similarity(x.embedding, y.embedding)
                  AS DOUBLE), 4) cosine
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.4""",
        "ann_ivf_index_full_probe": ann_bruteforce_sql,
        "ann_ivf_full_probe": ann_bruteforce_sql,
        "events_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 sum_value
FROM events GROUP BY 1, 2""",
        "events_sessions": """
WITH lagged AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM lagged
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) session_id,
       CAST(count(*) AS BIGINT) n_events,
       min(ts) session_start, max(ts) session_end,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100
         sum_value
FROM s GROUP BY 1, 2""",
        "events_range_click": range_click_sql,
        "events_range_click_broadcast": range_click_sql,
        "events_top3_by_value": """
SELECT event_id, user_id, value FROM (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) rn
  FROM events
) WHERE rn <= 3""",
        "events_asof_click": """
SELECT l.event_id, l.user_id, l.ts, r.ts AS click_ts
FROM events l
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "events_asof_next_click": """
SELECT l.event_id, l.user_id, l.ts,
       (SELECT min(r.ts)
        FROM events r
        WHERE r.event_type = 'click' AND r.user_id = l.user_id
          AND r.ts >= l.ts) AS next_click_ts
FROM events l""",
        "sample_docs_hash": """
SELECT doc_id, text, lang, source, n_chars FROM documents
WHERE md5_number_lower(text) % 10 = 3""",
        "docs_hash_split": """
SELECT doc_id,
  CASE WHEN text IS NULL THEN NULL
       WHEN md5_number_lower(text) % 10 < 8 THEN 'train'
       WHEN md5_number_lower(text) % 10 < 9 THEN 'val'
       ELSE 'test' END split
FROM documents""",
        "docs_remove_boilerplate": """
WITH paras AS (
  SELECT doc_id, unnest(string_split(text, ' ')) p,
         generate_subscripts(string_split(text, ' '), 1) i
  FROM documents
), hot AS (
  SELECT md5(p) h FROM paras GROUP BY md5(p) HAVING count(*) >= 3
), kept AS (
  SELECT doc_id, p, i FROM paras WHERE md5(p) NOT IN (SELECT h FROM hot)
)
SELECT d.doc_id, coalesce(k.text_clean, '') text_clean
FROM documents d LEFT JOIN (
  SELECT doc_id, string_agg(p, ' ' ORDER BY i) text_clean
  FROM kept GROUP BY doc_id
) k USING (doc_id)""",
        "multimodal_decode_bmp": """
SELECT d.doc_id AS media_id,
       CAST(8 AS INTEGER) width, CAST(8 AS INTEGER) height,
       round(avg(CAST((length(coalesce(d.text, ''))*7 + g.i*13) % 256
                      AS DOUBLE)), 6) pixel_mean
FROM documents d, generate_series(0, 191) g(i)
GROUP BY d.doc_id""",
        "multimodal_decode_wav": """
SELECT d.doc_id AS media_id,
       CAST(256 AS INTEGER) n_samples, CAST(16000 AS INTEGER) rate,
       round(sqrt(avg(CAST(
         ((length(coalesce(d.text, ''))*11 + g.i*17) % 512) - 256
         AS DOUBLE) ** 2)), 6) rms
FROM documents d, generate_series(0, 255) g(i)
GROUP BY d.doc_id""",
        "docs_chunk": """
WITH d AS (
  SELECT doc_id, text,
         greatest(length(text) - 32 - 1, 0) // 168 AS mj
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
e AS (
  SELECT doc_id, text, unnest(generate_series(0, mj)) AS chunk_idx FROM d)
SELECT doc_id, CAST(chunk_idx AS BIGINT) chunk_idx,
       substring(text, chunk_idx * 168 + 1, 200) AS chunk_text
FROM e""",
        "docs_scrub_pii": _scrub_pii_oracle(),
        "docs_top_terms": """
SELECT t AS term, CAST(count(*) AS BIGINT) cnt FROM (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
  FROM documents) tt WHERE t <> ''
GROUP BY t ORDER BY cnt DESC, t LIMIT 50""",
        "orders_customer_rollup": """
SELECT n_name, CAST(count(*) AS BIGINT) n_orders,
       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
        "lineitem_orders_join": """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       o_orderpriority, o_custkey
FROM lineitem
LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON l_orderkey = o_orderkey""",
        "lineitem_orders_full_outer": """
SELECT COALESCE(l.l_orderkey, o.o_orderkey) AS l_orderkey,
       l.l_linenumber, l.l_extendedprice,
       o.o_orderpriority, o.o_custkey
FROM (SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem WHERE l_quantity > 45) l
FULL OUTER JOIN (SELECT o_orderkey, o_orderpriority, o_custkey
                 FROM orders WHERE o_orderpriority = '1-URGENT') o
  ON l.l_orderkey = o.o_orderkey""",
        "docs_normalize": r"""
SELECT doc_id, text,
       trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
         AS norm_text
FROM documents""",
        "docs_top100_longest": """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 100""",
        "events_customer_skewjoin": """
SELECT event_id, user_key, c_nationkey FROM (
  SELECT event_id,
         CASE WHEN user_id % 5 = 0 THEN 1 ELSE user_id END AS user_key
  FROM events) e
JOIN customer ON user_key = c_custkey""",
        "cdc_conversations": f"""
SELECT conv_id,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
         AS assembled,
       count(role || ': ' || text) AS n_items,
       coalesce(length(string_agg(role || ': ' || text, chr(10)
         ORDER BY turn_idx)), 0) AS n_chars
FROM ({lww_final}) GROUP BY conv_id""",
        "events_type_quantiles": " UNION ALL ".join(
            f"SELECT event_type, {q} AS q, quantile_disc(value, {q}) AS value "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type"
            for q in (0.1, 0.5, 0.9, 0.99)),
        "docs_contamination_exact": """
SELECT doc_id, text FROM documents
WHERE text IN (SELECT text FROM documents
               WHERE md5_number_lower(text) % 20 = 7)""",
        "docs_contamination_ngram": """
WITH sc AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(w) - 7, 0)),
    i -> w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7])) g
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') w
        FROM documents)),
sb AS (
  SELECT DISTINCT unnest(g) ng FROM sc
  WHERE doc_id IN (SELECT doc_id FROM documents
                   WHERE md5_number_lower(text) % 20 = 7))
SELECT c.doc_id, count(*) AS n_shared
FROM (SELECT doc_id, unnest(g) AS ng FROM sc) c
JOIN sb ON c.ng = sb.ng
GROUP BY c.doc_id""",
        "events_lag_lead": """
SELECT event_id, user_id, ts, value,
       LAG(value, 1)  OVER w AS lag_1,
       LEAD(value, 1) OVER w AS lead_1
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "events_ntile4": """
SELECT event_id, user_id, value,
       NTILE(4) OVER (PARTITION BY user_id
                      ORDER BY value DESC, event_id) AS ntile
FROM events""",
        "events_value_histogram": """
WITH b AS (
  SELECT least(CAST(floor(value / 10.0) AS BIGINT), 49) AS bin
  FROM events WHERE value IS NOT NULL AND value >= 0 AND value <= 500)
SELECT i AS bin, i * 10.0 AS lo, (i + 1) * 10.0 AS hi,
       coalesce(c.count, 0) AS count
FROM generate_series(0, 49) s(i)
LEFT JOIN (SELECT bin, count(*) AS count FROM b GROUP BY bin) c
  ON c.bin = i""",
        "events_rollup": """
WITH e AS (
  SELECT event_id, event_type, user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_type, user_id, grouping_id(event_type, user_id) AS gid,
       count(event_id) AS n, CAST(sum(value_c) AS BIGINT) AS sum_c,
       avg(value_c) AS mean_c
FROM e GROUP BY ROLLUP(event_type, user_id)""",
        "orders_cube": """
WITH o AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM orders)
SELECT o_orderstatus, o_orderpriority,
       grouping_id(o_orderstatus, o_orderpriority) AS gid,
       count(o_orderkey) AS n, CAST(sum(price_c) AS BIGINT) AS sum_c,
       avg(price_c) AS mean_c
FROM o GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
        "events_value_stats": """
WITH e AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
  FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vc*vc) AS DOUBLE)/count(vc)
         - (CAST(sum(vc) AS DOUBLE)/count(vc))
           * (CAST(sum(vc) AS DOUBLE)/count(vc)) AS var_c,
       sqrt(CAST(sum(vc*vc) AS DOUBLE)/count(vc)
         - (CAST(sum(vc) AS DOUBLE)/count(vc))
           * (CAST(sum(vc) AS DOUBLE)/count(vc))) AS std_c
FROM e GROUP BY user_id""",
        "events_corr_value_hour": """
WITH e AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL)
SELECT event_type,
       (CAST(count(*) AS DOUBLE) * sum(x*y)
          - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
       / (sqrt(CAST(count(*) AS DOUBLE) * sum(x*x)
               - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
          * sqrt(CAST(count(*) AS DOUBLE) * sum(y*y)
                 - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)))
         AS corr_vh
FROM e GROUP BY event_type""",
        "embeddings_unnest": """
SELECT vec_id,
       unnest(list_transform(generate_series(1, len(embedding)),
                             i -> CAST(i - 1 AS BIGINT))) AS pos,
       unnest(embedding) AS val
FROM embeddings""",
        "events_rank_family": """
WITH e AS (
  SELECT event_id, user_id, CAST(hour(ts) AS BIGINT) AS hour FROM events)
SELECT event_id, user_id, hour,
       row_number() OVER (PARTITION BY user_id ORDER BY hour, event_id)
         AS row_number,
       rank() OVER w AS rank,
       dense_rank() OVER w AS dense_rank,
       percent_rank() OVER w AS percent_rank,
       cume_dist() OVER w AS cume_dist
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY hour)""",
        "events_describe": """
WITH e AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT 'user_id' AS column, CAST(count(*) AS DOUBLE) AS n,
       avg(user_id) AS mean,
       sqrt(CAST(sum(user_id*user_id) AS DOUBLE)/count(user_id)
            - (CAST(sum(user_id) AS DOUBLE)/count(user_id))
              * (CAST(sum(user_id) AS DOUBLE)/count(user_id))) AS std,
       CAST(min(user_id) AS DOUBLE) AS min,
       CAST(max(user_id) AS DOUBLE) AS max
FROM e
UNION ALL
SELECT 'value_c', CAST(count(*) AS DOUBLE), avg(value_c),
       sqrt(CAST(sum(value_c*value_c) AS DOUBLE)/count(value_c)
            - (CAST(sum(value_c) AS DOUBLE)/count(value_c))
              * (CAST(sum(value_c) AS DOUBLE)/count(value_c))),
       CAST(min(value_c) AS DOUBLE), CAST(max(value_c) AS DOUBLE)
FROM e""",
        "customer_updates_diff": """
WITH o AS (
  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
         c_mktsegment
  FROM customer),
nw AS (
  SELECT c_custkey,
         bal_c + CASE WHEN c_custkey % 7 = 0 THEN 1000 ELSE 0 END AS bal_c,
         c_mktsegment
  FROM o WHERE c_custkey % 13 <> 0)
SELECT coalesce(o.c_custkey, nw.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN nw.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS _change_type,
       CASE WHEN nw.c_custkey IS NULL THEN o.bal_c ELSE nw.bal_c END AS bal_c,
       CASE WHEN nw.c_custkey IS NULL THEN o.c_mktsegment
            ELSE nw.c_mktsegment END AS c_mktsegment
FROM o FULL OUTER JOIN nw ON o.c_custkey = nw.c_custkey
WHERE o.c_custkey IS NULL OR nw.c_custkey IS NULL
   OR o.bal_c IS DISTINCT FROM nw.bal_c
   OR o.c_mktsegment IS DISTINCT FROM nw.c_mktsegment""",
        "custkeys_intersect": """
SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders""",
        "events_except_days": """
SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type='purchase'
EXCEPT
SELECT user_id, CAST(ts AS DATE) FROM events WHERE event_type='click'""",
        "lineitem_melt": """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS name,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       l_extendedprice FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
       FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""",
        "events_pivot_types": """
SELECT user_id,
       count(CASE WHEN event_type = 'click' THEN event_id END) AS click,
       count(CASE WHEN event_type = 'view' THEN event_id END) AS view,
       count(CASE WHEN event_type = 'purchase' THEN event_id END) AS purchase
FROM events GROUP BY user_id""",
        "events_forward_fill": """
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
  FROM events)
SELECT event_id, user_id, ts, event_type, value,
       last_value(value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff
FROM e""",
        "events_rolling7": """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id, user_id, ts, value_c,
       CAST(SUM(value_c) OVER w AS BIGINT) AS rolling_sum,
       AVG(value_c)   OVER w AS rolling_mean,
       COUNT(value_c) OVER w AS rolling_count,
       MIN(value_c)   OVER w AS rolling_min,
       MAX(value_c)   OVER w AS rolling_max
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""",
        "events_rolling_30min": """
WITH e AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT user_id, ts, value_c,
       CAST(SUM(value_c) OVER w AS BIGINT) AS rolling_sum,
       COUNT(value_c) OVER w AS rolling_count
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1800 SECONDS PRECEDING
                          AND CURRENT ROW)""",
        "events_props_extract": r"""
WITH e AS (
  SELECT CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k,
         event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT k, CAST(count(*) AS BIGINT) AS n, avg(value_c) AS mean_c
FROM e GROUP BY k""",
        "events_latest_per_user": """
SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id) rn
  FROM events) WHERE rn = 1""",
        "lineitem_part_semi": """
SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem l
WHERE EXISTS (SELECT 1 FROM part p
              WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)""",
        "lineitem_part_anti": """
SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p
                  WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)""",
        "events_rank_running": """
WITH e AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_c
  FROM events)
SELECT event_id, user_id, ts, value_c,
       CAST(row_number() OVER w AS BIGINT) AS rank,
       CAST(sum(value_c) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_sum
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "docs_tfidf_top3": """
WITH toks AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
    FROM documents) WHERE t <> ''
), counts AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) cnt FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) doc_len FROM toks GROUP BY 1
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) df FROM counts GROUP BY 1
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
scored AS (
  SELECT c.doc_id, c.term, c.cnt, dl.doc_len, df.df,
         (c.cnt / dl.doc_len) * ((n.n_docs + 1) / (df.df + 1)) AS tfidf
  FROM counts c JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, cnt, doc_len, df, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
    ORDER BY tfidf DESC, term) rn FROM scored) WHERE rn <= 3""",
        "events_stratified_sample": """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id
    ORDER BY md5_number_lower(CAST(event_id AS varchar)), event_id) AS rn
  FROM events) WHERE rn <= 5""",
        "events_daily_users": """
SELECT date_trunc('day', ts) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) users
FROM events GROUP BY 1""",
        "events_value_quantiles": """
WITH a AS (SELECT quantile_disc(value,
  [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS v FROM events)
SELECT unnest([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
       round(unnest(v), 6) AS value FROM a""",
        "events_hopping_30min": """
SELECT w AS window_start, CAST(count(*) AS BIGINT) n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS DOUBLE)/100 sum_value
FROM (SELECT make_timestamp((epoch_us(ts) // 600000000) * 600000000
                            - j * 600000000) AS w, value
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)
      WHERE ts IS NOT NULL)
GROUP BY w""",
        "docs_repetition": """
WITH l AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS seg FROM documents
), g AS (
  SELECT doc_id, seg, count(*) AS c, length(seg) AS len
  FROM l GROUP BY doc_id, seg
), d AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_segments,
         CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_seg_frac,
         CASE WHEN sum(c * len) = 0 THEN NULL
              ELSE CAST(sum((c - 1) * len) AS DOUBLE)
                   / CAST(sum(c * len) AS DOUBLE) END AS dup_char_frac
  FROM g GROUP BY doc_id
)
SELECT doc.doc_id, d.n_segments, d.dup_seg_frac, d.dup_char_frac
FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id""",
        "embeddings_knn3": knn3_sql,
        # the IVF self-join at FULL probe must equal the brute path —
        # ONE oracle string bound for both (the cdc_change_feed /
        # quality_sql sharing convention)
        "embeddings_knn3_ivf_full": knn3_sql,
        "events_value_percentile": """
SELECT event_id, value,
       percent_rank() OVER (ORDER BY value) AS percent_rank
FROM events""",
        "docs_ngram_repetition": """
WITH l AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM l WHERE len(toks) > 1),
g AS (SELECT doc_id, w1, w2, count(*) AS c,
             length(w1) + length(w2) AS bl
      FROM b GROUP BY doc_id, w1, w2),
d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
             CAST(sum(c - 1) AS DOUBLE)
                 / CAST(sum(c) AS DOUBLE) AS dup_ngram_frac,
             CASE WHEN sum(c * bl) = 0 THEN NULL
                  ELSE CAST(sum((c - 1) * bl) AS DOUBLE)
                       / CAST(sum(c * bl) AS DOUBLE) END AS dup_ngram_char_frac
      FROM g GROUP BY doc_id)
SELECT doc.doc_id,
       CASE WHEN doc.text IS NULL THEN NULL
            ELSE coalesce(d.n_ngrams, 0) END AS n_ngrams,
       d.dup_ngram_frac, d.dup_ngram_char_frac
FROM documents doc LEFT JOIN d ON doc.doc_id = d.doc_id""",
        "events_top_users": """
SELECT user_id, n_events FROM (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
ORDER BY n_events DESC, user_id LIMIT 20""",
        # threshold = floor(0.3 * 2^64), the exact integer the engine
        # compares against (dcpray.functions.sample.bernoulli_sample)
        "sample_docs_rate": """
SELECT doc_id, text FROM documents
WHERE text IS NOT NULL
  AND md5_number_lower(text) < CAST('5534023222112865280' AS UBIGINT)""",
        "docs_encode_tokens": """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term,
         generate_subscripts(
             regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
  FROM documents
), vocab AS (
  SELECT term, CAST(row_number() OVER (ORDER BY c DESC, term) AS INTEGER)
         AS id
  FROM (SELECT term, count(*) AS c FROM toks GROUP BY term)
  QUALIFY id <= 64
)
SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos, t.term,
       coalesce(v.id, 0) AS token_id
FROM toks t LEFT JOIN vocab v USING (term)""",
    }

