"""WAL source: schema-unified, watermark-pruned Parquet reads.

The bounded-replay analogue of the reference's DCP source (S1 in SURVEY
§2; dcp.NewDcp + listener, /root/reference/connector.go:156): the
vBucket-sharded change stream is a Parquet directory ``wal/vb_NNNN/*``;
"resume from the last committed (vb, seqno)" (connector.go:166,179)
becomes

- file-level pruning: a file whose footer max(seqno) is ≤ the committed
  watermark for its vBucket is skipped without reading data (parquet
  row-group statistics only), and
- row-level filtering: a vectorized ``seqno > watermark[vb]`` mask inside
  ``map_batches``.

Schema evolution at the source: footers are unified with
``pa.unify_schemas`` so files before the tool_version tranche read as
null (SURVEY §7 step 6).
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


@dataclass(frozen=True)
class WalFileInfo:
    path: str
    vb: int
    min_seqno: int
    max_seqno: int
    rows: int
    schema: pa.Schema


def _scan_footer(path: str) -> WalFileInfo:
    f = pq.ParquetFile(path)
    md = f.metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    vb_lo = vb_hi = sq_lo = sq_hi = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        s_vb = g.column(idx["vb"]).statistics
        s_sq = g.column(idx["seqno"]).statistics
        vb_lo = s_vb.min if vb_lo is None else min(vb_lo, s_vb.min)
        vb_hi = s_vb.max if vb_hi is None else max(vb_hi, s_vb.max)
        sq_lo = s_sq.min if sq_lo is None else min(sq_lo, s_sq.min)
        sq_hi = s_sq.max if sq_hi is None else max(sq_hi, s_sq.max)
    if vb_lo != vb_hi:
        # multi-vb file: no file-level pruning possible, mark vb=-1
        vb_lo = -1
    return WalFileInfo(path, int(vb_lo), int(sq_lo), int(sq_hi), md.num_rows, f.schema_arrow)


def scan_wal(wal_dir: str) -> list[WalFileInfo]:
    """Footer-only scan of every WAL file (threaded; at cluster scale this
    would fan out as Ray tasks, but footers are ~KB so threads suffice)."""
    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))
    with ThreadPoolExecutor(max_workers=16) as ex:
        return list(ex.map(_scan_footer, paths))


def prune_files(
    infos: list[WalFileInfo], watermarks: dict[int, int]
) -> list[WalFileInfo]:
    """Drop files fully below the committed watermark (exactly-once resume:
    these events were already applied and must not be re-read)."""
    if not watermarks:
        return infos
    out = []
    for i in infos:
        wm = watermarks.get(i.vb, 0) if i.vb >= 0 else 0
        if i.max_seqno > wm:
            out.append(i)
    return out


def unified_schema(infos: list[WalFileInfo]) -> pa.Schema:
    return pa.unify_schemas([i.schema for i in infos])


def file_watermarks(infos: list[WalFileInfo]) -> dict[int, int]:
    """Per-vb max seqno across the given files (footer stats only) —
    becomes the committed watermark once the run's manifest lands."""
    wm: dict[int, int] = {}
    for i in infos:
        if i.vb >= 0:
            wm[i.vb] = max(wm.get(i.vb, 0), i.max_seqno)
    return wm


def watermark_array(watermarks: dict[int, int], num_vb_hint: int = 1024) -> np.ndarray:
    """Dense vb → seqno array for the vectorized row filter."""
    size = max([num_vb_hint] + [vb + 1 for vb in watermarks]) if watermarks else num_vb_hint
    arr = np.zeros(size, dtype=np.uint64)
    for vb, s in watermarks.items():
        arr[vb] = s
    return arr


def read_wal(wal_dir: str, watermarks: dict[int, int] | None = None):
    """The WAL as a lazy Dataset: pruned file list, unified schema.
    Row-level watermark filtering happens in the replay pipeline's first
    map_batches (it also does validation/DLQ routing in the same pass)."""
    import ray.data as rd

    infos = prune_files(scan_wal(wal_dir), watermarks or {})
    if not infos:
        return None, []
    schema = unified_schema(infos)
    from dcpray.sources.io import read_parquet_fast

    ds = read_parquet_fast([i.path for i in infos], schema=schema)
    return ds, infos
