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
    if md.num_rows == 0:
        # an external producer's empty flush is a legitimate tail-mode
        # artifact: zero events, nothing to prune or replay from it
        return WalFileInfo(path, -1, 0, -1, 0, f.schema_arrow)
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    vb_lo = vb_hi = sq_lo = sq_hi = None
    have_stats = True
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        s_vb = g.column(idx["vb"]).statistics
        s_sq = g.column(idx["seqno"]).statistics
        if s_vb is None or s_sq is None or not s_vb.has_min_max \
                or not s_sq.has_min_max:
            have_stats = False
            break
        vb_lo = s_vb.min if vb_lo is None else min(vb_lo, s_vb.min)
        vb_hi = s_vb.max if vb_hi is None else max(vb_hi, s_vb.max)
        sq_lo = s_sq.min if sq_lo is None else min(sq_lo, s_sq.min)
        sq_hi = s_sq.max if sq_hi is None else max(sq_hi, s_sq.max)
    if not have_stats:
        # writer disabled column statistics: read just the two routing
        # columns (tiny) instead of crashing the whole scan
        t = f.read(columns=["vb", "seqno"])
        import pyarrow.compute as _pc

        vb_lo = _pc.min(t["vb"]).as_py()
        vb_hi = _pc.max(t["vb"]).as_py()
        sq_lo = _pc.min(t["seqno"]).as_py()
        sq_hi = _pc.max(t["seqno"]).as_py()
        # an ALL-NULL routing column yields None (corrupt segment —
        # exactly what the DLQ exists for): mark multi-vb and an
        # unprunable seqno range so the file is always read and its
        # rows dead-letter row-by-row, instead of TypeError here
        if vb_lo is None or vb_hi is None:
            vb_lo, vb_hi = -1, -2  # differ -> multi-vb marker below
        if sq_lo is None or sq_hi is None:
            sq_lo, sq_hi = 0, (1 << 62)
            # the unprunable sentinel must NEVER feed a committed
            # watermark or floor: vb=-1 keeps this file out of
            # file_watermarks (vb>=0 only) and floors (path-exact
            # residual tracking) — a valid vb here would pin that vb's
            # watermark at 2^62 and silently discard every future
            # segment for it
            vb_lo, vb_hi = -1, -2
    if vb_lo != vb_hi:
        # multi-vb file: no file-level pruning possible, mark vb=-1
        vb_lo = -1
    return WalFileInfo(path, int(vb_lo), int(sq_lo), int(sq_hi), md.num_rows, f.schema_arrow)


def _scan_footer_opt(path: str) -> WalFileInfo | None:
    """None when the segment vanished between stat and the footer read
    (external retention — the same supported race the stat loop
    tolerates)."""
    try:
        return _scan_footer(path)
    except FileNotFoundError:
        return None


def _scan_chunk(paths: list[str]) -> list:
    return [_scan_footer_opt(p) for p in paths]


CACHE_ROOT = os.environ.get("DCPRAY_WALCACHE_DIR", "/tmp/dcpray_walcache")


def _cache_path(wal_dir: str) -> str:
    import hashlib

    key = hashlib.sha1(os.path.abspath(wal_dir).encode()).hexdigest()[:16]
    return os.path.join(CACHE_ROOT, f"{key}.json")


def _load_cache(wal_dir: str) -> dict:
    try:
        with open(_cache_path(wal_dir)) as f:
            import json

            return json.load(f)
    except Exception:
        return {}


def _save_cache(wal_dir: str, cache: dict) -> None:
    import json
    import uuid

    os.makedirs(CACHE_ROOT, exist_ok=True)
    p = _cache_path(wal_dir)
    tmp = f"{p}.tmp-{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(cache, f)
    os.rename(tmp, p)


def _info_to_entry(i: WalFileInfo, st) -> dict:
    import base64

    return {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "vb": i.vb,
        "min_seqno": i.min_seqno,
        "max_seqno": i.max_seqno,
        "rows": i.rows,
        "schema": base64.b64encode(i.schema.serialize().to_pybytes()).decode(),
    }


def _entry_to_info(path: str, e: dict) -> WalFileInfo:
    import base64

    schema = pa.ipc.read_schema(pa.BufferReader(base64.b64decode(e["schema"])))
    return WalFileInfo(path, e["vb"], e["min_seqno"], e["max_seqno"], e["rows"], schema)


def scan_wal(wal_dir: str) -> list[WalFileInfo]:
    """Footer-only scan of every WAL file, with a persistent metadata
    cache (the analogue of a table format's manifest / a broker's segment
    index): WAL segments are immutable, so a footer need only ever be
    parsed once — entries are validated by (size, mtime) and stale ones
    rescanned. Cold scans of large listings fan out as Ray tasks (footer
    parsing is pure-Python and GIL-bound — threads don't help)."""
    paths = sorted(glob.glob(os.path.join(wal_dir, "**", "*.parquet"), recursive=True))
    cache = _load_cache(wal_dir)
    infos: dict[str, WalFileInfo] = {}
    todo: list[str] = []
    stats = {}
    vanished: set[str] = set()
    for p in paths:
        try:
            st = os.stat(p)
        except FileNotFoundError:
            # external retention deleted the segment between glob and
            # stat — a supported operation (effective_floor voids the
            # affected floor); skip it rather than dying mid-scan
            vanished.add(p)
            cache.pop(p, None)
            continue
        stats[p] = st
        e = cache.get(p)
        if e and e["size"] == st.st_size and e["mtime_ns"] == st.st_mtime_ns:
            infos[p] = _entry_to_info(p, e)
        else:
            todo.append(p)
    paths = [p for p in paths if p not in vanished]

    if todo:
        import ray

        if len(todo) >= 1024 and ray.is_initialized():
            scan = ray.remote(num_cpus=0.5)(_scan_chunk)
            chunk = 256
            refs = [scan.remote(todo[i:i + chunk]) for i in range(0, len(todo), chunk)]
            fresh = [info for part in ray.get(refs) for info in part]
        else:
            with ThreadPoolExecutor(max_workers=32) as ex:
                fresh = list(ex.map(_scan_footer_opt, todo))
        fresh = [i for i in fresh if i is not None]
        vanished |= set(todo) - {i.path for i in fresh}
        paths = [p for p in paths if p not in vanished]
        for i in fresh:
            infos[i.path] = i
            cache[i.path] = _info_to_entry(i, stats[i.path])
        cache = {p: e for p, e in cache.items() if p in infos or os.path.exists(p)}
        _save_cache(wal_dir, cache)
    # EMPTY segments (an external producer's zero-event flush) carry no
    # events and no prunable range — exposing their vb=-1 sentinel
    # upstream made them indistinguishable from multi-vb segments
    # (bricking aligned replay / wedging compact's safety check); they
    # are simply not part of the logical WAL (r5 review)
    return [infos[p] for p in paths if infos[p].rows > 0]


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
    return pa.unify_schemas([i.schema for i in infos], promote_options="permissive")


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
    # never size 0: a delta of only multi-vb files reports vb=-1 for every
    # segment, making the naive hint 0 — indexing an empty array with the
    # clamped index -1 would silently read the LAST vb's watermark
    size = max(size, 1)
    arr = np.zeros(size, dtype=np.uint64)
    for vb, s in watermarks.items():
        arr[vb] = s
    return arr


def is_processed(
    info: WalFileInfo, processed_paths: set[str], floor: dict[int, int]
) -> bool:
    """Resume check: a file is already applied iff its path is in the
    exact residual set OR its vb's processed-floor covers its whole
    seqno range (multi-vb files, vb=-1, are always tracked exactly)."""
    return info.path in processed_paths or (
        info.vb >= 0 and info.max_seqno <= floor.get(info.vb, 0)
    )


def _path_fingerprint(path: str) -> int:
    """Stable 63-bit fingerprint of one WAL path (xor-combinable)."""
    import hashlib

    return int.from_bytes(hashlib.sha1(path.encode()).digest()[:8], "big") >> 1


def floor_identity(infos_of_vb) -> int:
    """Order-independent identity of a floor's covered file SET: xor of
    per-path fingerprints. Any change of the set — a late out-of-order
    arrival, an external deletion, or an equal-count SWAP of one file
    for another — changes the identity (xor cancellation of a swap
    requires a 63-bit fingerprint collision)."""
    h = 0
    for i in infos_of_vb:
        h ^= _path_fingerprint(i.path)
    return h


def effective_floor(
    all_infos: list[WalFileInfo],
    floor: dict[int, int],
    floor_ids: dict[int, int],
) -> dict[int, int]:
    """Validate committed floors against the CURRENT scan. A floor is
    only sound if every scanned file at or below it was processed; the
    manifest records the xor-identity of the covered file set at commit
    time (``floor_ids``), so ANY change in a vb's sub-floor file set —
    a late out-of-order-visible segment, and even an equal-count swap
    combined with an external deletion — VOIDS that vb's floor and its
    non-residual files replay (exact by LWW idempotence: re-applied
    versions lose to equal-or-newer winners and persisted tombstones).
    This turns the floor's in-order-visibility assumption into a
    checked property instead of silent data loss. A vb with NO recorded
    identity (manifest written by an older format) keeps its floor —
    those manifests carried exact path sets."""
    seen: dict[int, int] = {}
    for i in all_infos:
        if i.vb >= 0 and i.max_seqno <= floor.get(i.vb, 0):
            seen[i.vb] = seen.get(i.vb, 0) ^ _path_fingerprint(i.path)
    return {
        vb: f for vb, f in floor.items()
        if vb not in floor_ids or seen.get(vb, 0) == floor_ids[vb]
    }


def compact_processed(
    all_infos: list[WalFileInfo],
    processed_paths: set[str],
    prev_floor: dict[int, int],
) -> tuple[dict[int, int], list[str], dict[int, int]]:
    """Compact the exact processed-file set into per-vb seqno floors
    plus a residual path list — the manifest stays O(#vb + #straggler
    files) instead of O(#segments) (SURVEY §8: ~10 MB of JSON rewritten
    per commit at 200k segments).

    Invariant that makes the floor safe under the fixture's deliberately
    interleaved per-file seqno ranges: floor[vb] = min(max_seqno of
    unprocessed files of vb) − 1, so EVERY file at or below the floor is
    processed by construction; processed files above it stay in the
    exact residual set. When nothing of a vb is unprocessed the floor
    equals the vb's watermark and every path compacts away. Segments
    that become visible BELOW an existing floor later (impossible for
    real in-order log segments) are caught by ``effective_floor``'s
    coverage-count check and trigger a re-replay, not a silent skip.

    ``prev_floor`` must already be validated by ``effective_floor``.
    Returns (floor, residual paths, floor set-identities)."""
    by_vb: dict[int, list[WalFileInfo]] = {}
    multi: list[WalFileInfo] = []
    for i in all_infos:
        (multi if i.vb < 0 else by_vb.setdefault(i.vb, [])).append(i)

    def done(i: WalFileInfo) -> bool:
        return is_processed(i, processed_paths, prev_floor)

    floor_out: dict[int, int] = {}
    ids: dict[int, int] = {}
    residual: set[str] = {i.path for i in multi if i.path in processed_paths}
    for vb, fl in by_vb.items():
        unproc = [i.max_seqno for i in fl if not done(i)]
        f = (min(unproc) - 1) if unproc else max(i.max_seqno for i in fl)
        if f > 0:
            floor_out[vb] = f
            ids[vb] = floor_identity(i for i in fl if i.max_seqno <= f)
        residual |= {i.path for i in fl if done(i) and i.max_seqno > f}
    return floor_out, sorted(residual), ids


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
