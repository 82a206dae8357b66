"""Naive single-threaded reference applier — the test oracle.

The table analogue of the reference integration test's delivered-stream
assertion (/root/reference/test/integration/integration_test.go:93-116):
apply the WAL sequentially in (vb, seqno) order on top of the base
snapshot, last-writer-wins by seqno, tombstones delete the key. Pure
pandas/pyarrow, no Ray — deliberately simple and obviously correct.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dcpray.schema import (
    OP_MUTATION,
    TOOL_VERSION_COL,
    TRANSCRIPT_COLUMNS,
)

FINAL_COLUMNS = TRANSCRIPT_COLUMNS + [TOOL_VERSION_COL]


def read_wal_pandas(wal_dir: str) -> pd.DataFrame:
    """Read every WAL file, unifying schemas (missing tool_version → null).
    An EMPTY (or fully-consumed) WAL yields an empty frame so
    naive_final_state can express 'base snapshot only, no changefeed'."""
    files = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))
    if not files:
        return pd.DataFrame(columns=FINAL_COLUMNS + ["vb", "seqno", "op"])
    tables = [pq.read_table(f) for f in files]
    schema = pa.unify_schemas([t.schema for t in tables])
    tables = [
        t.cast(pa.schema([schema.field(n) for n in t.schema.names]))
        for t in tables
    ]
    dfs = []
    for t in tables:
        df = t.to_pandas(types_mapper={pa.string(): pd.StringDtype()}.get)
        for name in schema.names:
            if name not in df.columns:
                df[name] = pd.NA
        dfs.append(df[schema.names])
    return pd.concat(dfs, ignore_index=True)


def naive_final_state(wal_dir: str, base_dir: str | None) -> pd.DataFrame:
    """Sequential replay → final transcripts table (+ tool_version),
    sorted by (conv_id, turn_idx), pandas StringDtype columns."""
    wal = read_wal_pandas(wal_dir)
    # rejected rows (poison) never reach the table
    wal = wal[wal["conv_id"].notna() & (wal["turn_idx"] >= 0)]
    frames = []
    if base_dir:
        base_files = sorted(glob.glob(os.path.join(base_dir, "*.parquet")))
        if base_files:
            base = pd.concat(
                [pq.read_table(f).to_pandas() for f in base_files], ignore_index=True
            )
            base["seqno"] = 0
            base["op"] = OP_MUTATION
            if TOOL_VERSION_COL not in base.columns:
                base[TOOL_VERSION_COL] = None
            frames.append(base[FINAL_COLUMNS + ["seqno", "op"]])
    frames.append(wal[FINAL_COLUMNS + ["seqno", "op"]])
    log = pd.concat(frames, ignore_index=True)
    # per key, same vb ⇒ seqno totally orders its events; base preload is 0
    log = log.sort_values("seqno", kind="stable")
    # whole-row last-writer-wins (NOT groupby().last(), which takes the
    # last non-NA value per column and would resurrect stale fields)
    final = log.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    final = final[final["op"] == OP_MUTATION]
    out = (
        final[FINAL_COLUMNS]
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out
