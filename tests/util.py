"""Comparison helpers shared by the test suite."""

from __future__ import annotations

import numpy as np
import pandas as pd

FINAL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_version"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for final-state comparison: fixed columns, stable
    (conv_id, turn_idx) order, plain-object nullables, us timestamps."""
    out = df.copy()
    for c in FINAL_COLUMNS:
        if c not in out.columns:
            out[c] = None
    out = out[FINAL_COLUMNS]
    out["turn_idx"] = out["turn_idx"].astype(np.int64)
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    for c in ("conv_id", "role", "text", "tool", "tool_version"):
        out[c] = out[c].astype(object).where(pd.notna(out[c]), None)
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(
        drop=True
    )


def assert_final_state_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    a, e = normalize(actual), normalize(expected)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
