"""Incremental downstream sync on dcpray: consume the lake as a
CHANGE FEED instead of re-scanning it.

The reference's downstream consumers read the connector's Kafka topic
and see only new messages (connector.go:103-123 produces; compaction
keeps latest-per-key). The lake-form analogue: each committed manifest
is an offset, and ``lake_diff(from_seq, to_seq)`` is "the messages
between two offsets" — per-key insert/update/delete rows whose cost is
O(changed buckets), not O(table), because copy-forwarded buckets are
skipped without reading a byte.

This example replays a WAL in two committed phases and keeps a
downstream "mirror" table in sync purely from the diffs, verifying the
mirror equals the lake's final state. Run standalone (owns its Ray
session):

    PYTHONPATH=. python examples/incremental_sync.py \
        --wal /tmp/dcpray_fixtures/sf0.001/wal \
        --base /tmp/dcpray_fixtures/sf0.001/base \
        --out /tmp/dcpray_sync
"""
from __future__ import annotations

import os

import pandas as pd


def _final_state(lake):
    final = lake.read_current().to_pandas()
    return final


def resume_or_rebootstrap(lake, mirror: pd.DataFrame, consumer_seq: int,
                          keys=("conv_id", "turn_idx")):
    """The gap-recovery contract for a PERSISTED-feed consumer: try to
    resume the feed from the consumer's last-applied seq; if the feed
    was gc-ed past it (``ChangefeedGapError``), RE-BOOTSTRAP the
    mirror from the lake's committed state instead of applying a
    partial feed (which would silently diverge the mirror). Returns
    (mirror, new_consumer_seq, mode)."""
    from dcpray.functions.history import (
        ChangefeedGapError,
        read_changefeed,
    )

    cur = lake.store.load_current().seq
    if cur == consumer_seq:
        return mirror, consumer_seq, "up_to_date"
    try:
        feed = read_changefeed(lake, consumer_seq, cur).to_pandas()
    except ChangefeedGapError:
        # the error names the earliest contiguous seq, but the simplest
        # always-correct recovery is a full re-bootstrap from the lake
        return _final_state(lake), cur, "rebootstrapped"
    key_list = list(keys)
    dels = feed[feed["_change_type"] == "delete"][key_list]
    ups = feed[feed["_change_type"] != "delete"].drop(
        columns=["_change_type"])
    mi = mirror.set_index(key_list)
    mi = mi.drop(index=pd.MultiIndex.from_frame(dels), errors="ignore")
    if len(ups):
        ui = ups.set_index(key_list)
        mi = pd.concat([mi.drop(index=ui.index, errors="ignore"), ui])
    return mi.reset_index(), cur, "incremental"


def run_sync(wal_dir: str, base_dir: str | None, out_dir: str,
             *, num_buckets: int = 16) -> dict:
    """Replay in two phases; apply each phase's change feed to a
    pandas mirror (stand-in for any external store — the rows a real
    sink would UPSERT/DELETE). Returns row counts and verifies
    mirror == lake final state."""
    from dcpray import Lake, ReplayConfig, replay
    from dcpray.functions.history import lake_diff
    from dcpray.sources import wal as walmod

    lake = Lake(os.path.join(out_dir, "lake"))
    cfg = ReplayConfig(num_buckets=num_buckets)
    n_files = len(walmod.scan_wal(wal_dir))

    # phase 1: bootstrap (first half of the WAL files)
    replay(lake, wal_dir, base_snapshot_dir=base_dir, config=cfg,
           max_files=max(n_files // 2, 1))
    # phase 2: the rest
    replay(lake, wal_dir, config=cfg)

    keys = ["conv_id", "turn_idx"]
    applied = {"insert": 0, "update": 0, "delete": 0}
    seqs = [m.seq for m in lake.store.history()]
    # the bootstrap "diff" from offset 0 is the first manifest's full
    # state (insert-only); every later step consumes a real change feed
    mirror = lake.read_at(seqs[0]).to_pandas()
    applied["insert"] += len(mirror)

    for prev, cur in zip(seqs, seqs[1:]):
        feed = lake_diff(lake, prev, cur).to_pandas()
        for _, grp in feed.groupby("_change_type"):
            applied[grp["_change_type"].iloc[0]] += len(grp)
        # apply: delete removed keys, upsert the rest
        dels = feed[feed["_change_type"] == "delete"][keys]
        ups = feed[feed["_change_type"] != "delete"].drop(
            columns=["_change_type"])
        if len(dels) or len(ups):
            mi = mirror.set_index(keys)
            mi = mi.drop(index=pd.MultiIndex.from_frame(dels),
                         errors="ignore")
            if len(ups):
                ui = ups.set_index(keys)
                mi = pd.concat([mi.drop(index=ui.index, errors="ignore"),
                                ui])
            mirror = mi.reset_index()

    # verify: mirror == lake final state
    final = _final_state(lake)
    final = final.drop(columns=[c for c in ("_op", "_seqno")
                                if c in final.columns])
    cols = sorted(set(mirror.columns) & set(final.columns))
    a = mirror[cols].sort_values(keys).reset_index(drop=True)
    b = final[cols].sort_values(keys).reset_index(drop=True)
    # fillna first: a never-updated mirror row carries NaN where the
    # lake carries None — same null, different pandas spelling
    pd.testing.assert_frame_equal(a.fillna("~").astype(str),
                                  b.fillna("~").astype(str))
    return {"commits": len(seqs), "mirror_rows": len(mirror),
            "lake_rows": len(final), **applied, "in_sync": True}


if __name__ == "__main__":
    import argparse
    import shutil

    import ray

    p = argparse.ArgumentParser()
    p.add_argument("--wal", required=True)
    p.add_argument("--base", default=None)
    p.add_argument("--out", default="/tmp/dcpray_sync")
    args = p.parse_args()
    shutil.rmtree(args.out, ignore_errors=True)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        print(run_sync(args.wal, args.base, args.out))
    finally:
        ray.shutdown()
