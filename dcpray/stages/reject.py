"""Validation + watermark filter + rejection (DLQ) sink — one pass.

Combines three reference behaviors into a single vectorized stage:

- resume filtering (events at or below the committed per-vb seqno are
  already applied; reference resumes from committed checkpoints,
  connector.go:166,179),
- event validation / normalization guard (the reference's dispatch drops
  unknown event kinds silently, connector.go:91-92 — here structurally
  invalid rows are not silently dropped but dead-lettered),
- the rejection log: failed rows + error reason written as Parquet, the
  analogue of RejectionLogSinkResponseHandler producing
  {topic,key,error[,value]} to a rejection topic
  (/root/reference/kafka/rejection_log_sink_response_handler.go:13-87),
  with includeValue semantics (config.go:42-45).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dcpray.schema import OPS


def make_reject_filter(
    wm_arr: np.ndarray,
    rejected_dir: str | None,
    include_value: bool = True,
):
    """Returns a stateless map_batches fn: keeps valid, above-watermark
    rows; dead-letters invalid ones. Runs as elastic Ray tasks (no state
    beyond the small broadcast watermark array captured in the closure)."""

    def _filter(batch: pa.Table) -> pa.Table:
        # vb/seqno are the engine's own routing columns: a null there is
        # a structurally invalid event that must be DEAD-LETTERED, not
        # crash the merge task (and nullable-int to_numpy would decode
        # through float64, corrupting large seqnos) — fill AFTER masking
        vb_ok = pc.is_valid(batch["vb"]).to_numpy(zero_copy_only=False)
        seq_ok = pc.is_valid(batch["seqno"]).to_numpy(zero_copy_only=False)
        vb = pc.fill_null(pc.cast(batch["vb"], pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        seq = pc.fill_null(pc.cast(batch["seqno"], pa.uint64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        # a NEGATIVE vb would index wm_arr from the END (numpy wrap) and
        # silently drop the row against the wrong vb's watermark —
        # structurally invalid, so it must dead-letter (r5 review)
        vb_nonneg = vb >= 0
        if len(wm_arr) == 0:  # no committed watermark: everything is live
            live = np.ones(len(seq), dtype=bool)
        else:
            idx = np.clip(vb, 0, len(wm_arr) - 1)
            wm = np.where(vb_nonneg & (vb < len(wm_arr)), wm_arr[idx], 0)
            live = seq > wm
        # invalid rows are always "live": DLQ them
        live |= ~(vb_ok & seq_ok & vb_nonneg)

        conv_ok = pc.is_valid(batch["conv_id"]).to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
        turn_ok = np.where(pc.is_valid(batch["turn_idx"]).to_numpy(zero_copy_only=False), turn >= 0, False)
        op_ok = pc.is_in(batch["op"], value_set=pa.array(OPS)).to_numpy(zero_copy_only=False)
        valid = conv_ok & turn_ok & op_ok & vb_ok & seq_ok & vb_nonneg

        bad = live & ~valid
        if bad.any() and rejected_dir is not None:
            rej = batch.filter(pa.array(bad))
            reasons = np.select(
                [
                    ~(vb_ok & seq_ok)[bad],
                    (~vb_nonneg)[bad],
                    ~conv_ok[bad],
                    ~turn_ok[bad],
                ],
                ["null vb/seqno", "negative vb", "null conv_id",
                 "invalid turn_idx"],
                default="unknown op",
            )
            cols = {
                "vb": rej["vb"],
                "seqno": rej["seqno"],
                "conv_id": rej["conv_id"],
                "turn_idx": rej["turn_idx"],
                "error": pa.array(reasons, type=pa.string()),
            }
            if include_value:  # rejectionLog.includeValue
                for c in ("role", "text", "tool", "op"):
                    if c in rej.schema.names:
                        cols[c] = rej[c]
            out = pa.table(cols)
            path = os.path.join(rejected_dir, f"part-{uuid.uuid4().hex}.parquet")
            tmp = path + ".tmp"
            pq.write_table(out, tmp)
            os.rename(tmp, path)
        return batch.filter(pa.array(live & valid))

    return _filter
