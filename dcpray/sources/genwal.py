"""Deterministic synthetic change-event WAL over multi-turn transcripts.

The table analogue of the reference's integration corpus (travel-sample,
31,591 docs; /root/reference/test/integration/integration_test.go:107,
/root/reference/test/couchbase/configure.sh:38): a fixed, seeded fixture
that the correctness gate replays end-to-end. Requirements from
FIXTURES.md:

1. multi-version keys (exercise last-writer-wins),
2. tombstones (deletion + expiration; some followed by re-insert, some
   final — mirrors NewDeleteEvent/NewExpireEvent, couchbase/event.go:24-56),
3. rows split across files NOT in seqno order (merge must be order-free),
4. 2-3 hot conversations holding ~20% of events (skew),
5. a schema-evolution tranche (last file per vBucket adds tool_version),
6. a base-table preload (initial transcripts snapshot, watermark-0),
plus a handful of poison rows (null conv_id / negative turn_idx) for the
rejection (DLQ) sink.

Everything is numpy-vectorized and seed-derived (no wall clock); the
fixture directory is written tmp-then-rename so concurrent callers see
either nothing or a complete fixture.

Layout::

    <out_dir>/
      wal/vb_0000/part-000.parquet ...   # vb also an in-file column
      base/part-000.parquet              # initial transcripts snapshot
      meta.json                          # counts, watermarks, knobs
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dcpray.hashing import splitmix64, vb_of_conv_index
from dcpray.schema import (
    DEFAULT_COLLECTION,
    OP_DELETION,
    OP_EXPIRATION,
    OP_MUTATION,
    TOOL_VERSION_COL,
)

EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z, seed-derived offsets only

_FILLER = [
    "the assistant considered the request and drafted a careful reply with sources",
    "the user asked a follow-up question about the previous answer and its caveats",
    "tool output was summarized into a short actionable digest for the next turn",
    "a long chain of reasoning was compressed into three bullet points of evidence",
    "the conversation shifted to edge cases discovered while testing the pipeline",
    "an error message was pasted verbatim and annotated line by line for debugging",
    "the plan was revised after the benchmark showed a shuffle bottleneck at scale",
    "a schema change added a new field that older readers must treat as missing",
]

_TOOLS = ["search", "python", "browser", "calculator", "shell"]

ROLES = np.array(["system", "user", "assistant", "tool"])


@dataclass(frozen=True)
class FixtureSpec:
    """Knobs for one fixture scale."""

    num_vbuckets: int
    num_convs: int
    seed: int = 42
    turns_lo: int = 4
    turns_hi: int = 24  # exclusive
    multi_version_frac: float = 0.40
    extra_versions_hi: int = 5  # 2..hi extra versions
    delete_frac: float = 0.10
    expire_frac: float = 0.05
    reinsert_frac: float = 0.40  # of tombstoned keys
    hot_convs: int = 3
    hot_fraction: float = 0.20
    files_per_vb: int = 4
    base_key_frac: float = 0.5  # WAL keys preloaded in the base snapshot
    base_only_convs: int = 0  # 0 → num_convs // 10
    poison_rows: int = 0  # 0 → auto


# scale presets keyed by the basename of the driver's sf dir
SCALES: dict[str, FixtureSpec] = {
    "tiny": FixtureSpec(num_vbuckets=8, num_convs=100, files_per_vb=3),
    "sf0.001": FixtureSpec(num_vbuckets=8, num_convs=100, files_per_vb=3),
    "sf0.01": FixtureSpec(num_vbuckets=64, num_convs=5000),
    "sf0.1": FixtureSpec(num_vbuckets=256, num_convs=100_000),
    "bench10m": FixtureSpec(num_vbuckets=1024, num_convs=360_000),
}

FIXTURE_ROOT = "/tmp/dcpray_fixtures"


def fixture_dir_for(sf_dir_or_name: str, root: str = FIXTURE_ROOT) -> str:
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    return os.path.join(root, name)


def ensure_fixture(sf_dir_or_name: str, root: str = FIXTURE_ROOT) -> str:
    """Idempotently materialize the fixture for a scale; returns its dir."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    spec = SCALES.get(name)
    if spec is None:
        raise ValueError(f"unknown fixture scale {name!r}; known: {sorted(SCALES)}")
    out = os.path.join(root, name)
    if not os.path.exists(os.path.join(out, "meta.json")):
        generate_fixture(out, spec)
    return out


def _cumcount(group_ids: np.ndarray) -> np.ndarray:
    """Position of each element within its (contiguous) group."""
    n = len(group_ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, group_ids[1:] != group_ids[:-1]])
    return idx - np.repeat(idx[starts], np.diff(np.r_[starts, n]))


def _zpad_conv(conv: np.ndarray) -> pd.Series:
    return "conv-" + pd.Series(conv.astype(np.int64)).astype(str).str.zfill(8)


def generate_fixture(out_dir: str, spec: FixtureSpec, force: bool = False) -> dict:
    """Generate the WAL + base snapshot; returns meta dict."""
    if os.path.exists(os.path.join(out_dir, "meta.json")) and not force:
        with open(os.path.join(out_dir, "meta.json")) as f:
            return json.load(f)

    rng = np.random.RandomState(spec.seed)
    tmp = out_dir + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "wal"))
    os.makedirs(os.path.join(tmp, "base"))

    # ---- keys: (conv, turn) ----
    n_turns = rng.randint(spec.turns_lo, spec.turns_hi, spec.num_convs)
    conv_of_key = np.repeat(np.arange(spec.num_convs, dtype=np.int64), n_turns)
    turn_of_key = _cumcount(conv_of_key).astype(np.int32)
    n_keys = len(conv_of_key)

    # ---- versions per key (multi-version + hot-conv boost) ----
    versions = np.ones(n_keys, dtype=np.int64)
    mv = rng.rand(n_keys) < spec.multi_version_frac
    versions[mv] += rng.randint(1, spec.extra_versions_hi, mv.sum())
    hot = rng.choice(spec.num_convs, size=min(spec.hot_convs, spec.num_convs), replace=False)
    hot_key = np.isin(conv_of_key, hot)
    if hot_key.any():
        cold_ev = versions[~hot_key].sum()
        target_hot = spec.hot_fraction / (1 - spec.hot_fraction) * cold_ev
        factor = max(2, int(np.ceil(target_hot / max(1, versions[hot_key].sum()))))
        versions[hot_key] = np.minimum(versions[hot_key] * factor, 512)

    # ---- tombstones + re-inserts ----
    u = rng.rand(n_keys)
    del_key = u < spec.delete_frac
    exp_key = (u >= spec.delete_frac) & (u < spec.delete_frac + spec.expire_frac)
    tomb_key = del_key | exp_key
    reins_key = tomb_key & (rng.rand(n_keys) < spec.reinsert_frac)

    counts = versions + tomb_key.astype(np.int64) + reins_key.astype(np.int64)
    key_of_event = np.repeat(np.arange(n_keys, dtype=np.int64), counts)
    order = _cumcount(key_of_event)
    n_events = len(key_of_event)

    v_of = versions[key_of_event]
    is_tomb_ev = tomb_key[key_of_event] & (order == v_of)
    op = np.full(n_events, OP_MUTATION, dtype=object)
    op[is_tomb_ev & del_key[key_of_event]] = OP_DELETION
    op[is_tomb_ev & exp_key[key_of_event]] = OP_EXPIRATION
    is_mut = ~is_tomb_ev  # re-insert rows (order == v+1) stay mutations

    # version index used in text/ts: re-insert counts as the next version
    ver = np.where(order > v_of, v_of, order).astype(np.int64)

    # ---- poison rows (DLQ fixture) ----
    n_poison = spec.poison_rows or max(4, n_events // 2000)

    conv_of_event = conv_of_key[key_of_event]
    turn_of_event = turn_of_key[key_of_event]

    # append poison before seqno assignment so they consume real seqnos
    p_conv = np.full(n_poison, -1, dtype=np.int64)
    p_turn = np.full(n_poison, -1, dtype=np.int32)
    conv_all = np.r_[conv_of_event, p_conv]
    turn_all = np.r_[turn_of_event, p_turn]
    op_all = np.r_[op, np.full(n_poison, OP_MUTATION, dtype=object)]
    ver_all = np.r_[ver, np.zeros(n_poison, dtype=np.int64)]
    key_all = np.r_[key_of_event, n_keys + np.arange(n_poison)]
    order_all = np.r_[order, np.zeros(n_poison, dtype=np.int64)]
    n_all = n_events + n_poison

    # ---- per-key-increasing global time, then per-vb seqno ----
    draws = rng.rand(n_all)
    sorted_by_key_draw = np.lexsort((draws, key_all))
    time_of = np.empty(n_all)
    # events are contiguous & ordered per key, so ascending draws align with order
    time_of[np.lexsort((order_all, key_all))] = draws[sorted_by_key_draw]

    vb_all = np.empty(n_all, dtype=np.uint16)
    vb_all[:n_events] = vb_of_conv_index(conv_of_event, spec.num_vbuckets)
    vb_all[n_events:] = rng.randint(0, spec.num_vbuckets, n_poison).astype(np.uint16)

    seqno = np.empty(n_all, dtype=np.uint64)
    by_vb_time = np.lexsort((time_of, vb_all))
    seqno[by_vb_time] = _cumcount(vb_all[by_vb_time]).astype(np.uint64) + 1

    # ---- payload columns ----
    conv_str = _zpad_conv(conv_all)
    filler = np.array(_FILLER, dtype=object)
    f_idx = (conv_all * 7 + turn_all * 3 + ver_all) % len(filler)
    text = (
        "c" + pd.Series(conv_all).astype(str)
        + "-t" + pd.Series(turn_all.astype(np.int64)).astype(str)
        + "-v" + pd.Series(ver_all).astype(str)
        + " " + pd.Series(filler[f_idx])
    )
    role = np.where(
        turn_all == 0, "system", np.where(turn_all % 2 == 1, "user", "assistant")
    ).astype(object)
    tool_mask = (role == "assistant") & ((conv_all + turn_all) % 5 == 0)
    tool = np.where(
        tool_mask, np.array(_TOOLS, dtype=object)[(conv_all + turn_all) % len(_TOOLS)], None
    )
    ts_us = EPOCH_US + conv_all * 3_600_000_000 + turn_all.astype(np.int64) * 60_000_000 + ver_all * 1_000_000
    event_rank = np.argsort(np.argsort(time_of))
    event_time_us = EPOCH_US + event_rank * 1_000_000
    with np.errstate(over="ignore"):
        cas = splitmix64(key_all.astype(np.uint64) * np.uint64(1315423911) + ver_all.astype(np.uint64))
    rev_no = (order_all + 1).astype(np.uint64)
    tool_version = np.where(
        tool_mask, "tv" + pd.Series((ver_all % 3).astype(str)), None
    )

    mut_mask = np.array([o == OP_MUTATION for o in op_all])
    poison_mask = conv_all < 0

    def _nullify(arr, extra_null=None):
        out = np.asarray(arr, dtype=object).copy()
        out[~mut_mask] = None
        if extra_null is not None:
            out[extra_null] = None
        return out

    table = pa.table(
        {
            "vb": pa.array(vb_all, type=pa.uint16()),
            "seqno": pa.array(seqno, type=pa.uint64()),
            "cas": pa.array(cas, type=pa.uint64()),
            "rev_no": pa.array(rev_no, type=pa.uint64()),
            "op": pa.array(op_all.tolist(), type=pa.string()),
            "collection": pa.array([DEFAULT_COLLECTION] * n_all, type=pa.string()),
            "event_time": pa.array(event_time_us, type=pa.timestamp("us")),
            "conv_id": pa.array(
                np.where(poison_mask, None, conv_str.to_numpy(dtype=object)),
                type=pa.string(),
            ),
            "turn_idx": pa.array(turn_all, type=pa.int32()),
            "role": pa.array(_nullify(role, poison_mask), type=pa.string()),
            "text": pa.array(_nullify(text.to_numpy(dtype=object), poison_mask), type=pa.string()),
            "tool": pa.array(_nullify(tool, poison_mask), type=pa.string()),
            "ts": pa.array(
                pd.array(np.where(mut_mask & ~poison_mask, ts_us, None), dtype="Int64"),
                type=pa.timestamp("us"),
            ),
            TOOL_VERSION_COL: pa.array(_nullify(tool_version, poison_mask), type=pa.string()),
        }
    )

    # ---- split into files: per-vb random order (out-of-seqno-order files) ----
    perm = rng.rand(n_all)
    by_vb_perm = np.lexsort((perm, vb_all))
    table = table.take(by_vb_perm)
    vb_sorted = vb_all[by_vb_perm]
    bounds = np.flatnonzero(np.r_[True, vb_sorted[1:] != vb_sorted[:-1]])
    bounds = np.r_[bounds, n_all]
    n_evolved_files = 0
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        vb = int(vb_sorted[lo])
        vb_dir = os.path.join(tmp, "wal", f"vb_{vb:04d}")
        os.makedirs(vb_dir, exist_ok=True)
        nfiles = min(spec.files_per_vb, hi - lo)
        splits = np.linspace(lo, hi, nfiles + 1).astype(np.int64)
        for f in range(nfiles):
            part = table.slice(splits[f], splits[f + 1] - splits[f])
            evolved = f == nfiles - 1  # last file per vb = evolution tranche
            if not evolved:
                part = part.drop_columns([TOOL_VERSION_COL])
            else:
                n_evolved_files += 1
            pq.write_table(part, os.path.join(vb_dir, f"part-{f:03d}.parquet"))

    # ---- base snapshot (preload + base-only conversations) ----
    base_mask = rng.rand(n_keys) < spec.base_key_frac
    b_conv = conv_of_key[base_mask]
    b_turn = turn_of_key[base_mask]
    n_bo = spec.base_only_convs or max(2, spec.num_convs // 10)
    bo_turns = rng.randint(2, 6, n_bo)
    bo_conv = np.repeat(spec.num_convs + np.arange(n_bo, dtype=np.int64), bo_turns)
    bo_turn = _cumcount(bo_conv).astype(np.int32)
    ac = np.r_[b_conv, bo_conv]
    at = np.r_[b_turn, bo_turn]
    b_text = (
        "c" + pd.Series(ac).astype(str) + "-t" + pd.Series(at.astype(np.int64)).astype(str)
        + "-v-base " + pd.Series(np.array(_FILLER, dtype=object)[(ac + at) % len(_FILLER)])
    )
    b_role = np.where(at == 0, "system", np.where(at % 2 == 1, "user", "assistant")).astype(object)
    base_table = pa.table(
        {
            "conv_id": pa.array(_zpad_conv(ac).to_numpy(dtype=object), type=pa.string()),
            "turn_idx": pa.array(at, type=pa.int32()),
            "role": pa.array(b_role, type=pa.string()),
            "text": pa.array(b_text.to_numpy(dtype=object), type=pa.string()),
            "tool": pa.array([None] * len(ac), type=pa.string()),
            "ts": pa.array(
                EPOCH_US + ac * 3_600_000_000 + at.astype(np.int64) * 60_000_000 - 1_000_000,
                type=pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(base_table, os.path.join(tmp, "base", "part-000.parquet"))

    # ---- meta + atomic publish ----
    wm = {}
    by_vb = np.lexsort((seqno, vb_all))
    last = np.flatnonzero(np.r_[vb_all[by_vb][1:] != vb_all[by_vb][:-1], True])
    for j in last:
        wm[int(vb_all[by_vb][j])] = int(seqno[by_vb][j])
    meta = {
        "spec": asdict(spec),
        "n_events": int(n_events),
        "n_poison": int(n_poison),
        "n_keys": int(n_keys),
        "n_base_rows": int(base_table.num_rows),
        "n_evolved_files": int(n_evolved_files),
        "op_counts": {
            OP_MUTATION: int(mut_mask[: n_events].sum()),
            OP_DELETION: int((op == OP_DELETION).sum()),
            OP_EXPIRATION: int((op == OP_EXPIRATION).sum()),
        },
        "hot_convs": [f"conv-{h:08d}" for h in sorted(int(x) for x in hot)],
        "watermarks": wm,
    }
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)

    shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # a concurrent generator won the rename race — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return meta
