"""Stable, vectorized key hashing.

Two uses, mirroring the reference's two hash partitionings:

- ``vb_of`` — key → vBucket, the stream partition (Couchbase hashes doc
  keys into 1024 vBuckets; reference couchbase/event.go:16). Used only by
  the synthetic WAL generator.
- ``bucket_of`` — (conv_id, turn_idx) → merge bucket, the analogue of the
  Kafka producer's Hash balancer on message key
  (/root/reference/kafka/client.go:205; config/config.go:49-50). Hashing
  the FULL primary key (not just conv_id) is the structural form of
  "salted sub-keys": a hot conversation's turns spread across buckets, so
  key skew cannot concentrate a shuffle partition. LWW only requires
  co-locating rows of one (conv_id, turn_idx) key, which this preserves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants)."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hash_strings(arr: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Stable uint64 hash of a string column (vectorized via pandas'
    fixed-key siphash; deterministic across processes)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object), categorize=True)


def key_hash(conv_id, turn_idx) -> np.ndarray:
    """uint64 hash of the primary key (conv_id, turn_idx)."""
    h = hash_strings(conv_id)
    if isinstance(turn_idx, (pa.Array, pa.ChunkedArray)):
        turn_idx = turn_idx.to_numpy(zero_copy_only=False)
    t = np.asarray(turn_idx)
    # null turn_idx (poison rows) → sentinel
    t = np.where(pd.isna(t), -1, t).astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        return splitmix64(h ^ (t * _GOLDEN))


def bucket_of(conv_id, turn_idx, num_buckets: int) -> np.ndarray:
    """Merge bucket of each row — hash of the full key (salted form)."""
    return (key_hash(conv_id, turn_idx) % np.uint64(num_buckets)).astype(np.int32)


def bucket_of_conv(conv_id, num_buckets: int) -> np.ndarray:
    """Unsalted variant (bucket by conv_id only) — kept to prove
    salted/unsalted equivalence in tests and for conversation-local
    output layouts."""
    return (splitmix64(hash_strings(conv_id)) % np.uint64(num_buckets)).astype(
        np.int32
    )


def vb_of_conv(conv_id, num_vbuckets: int) -> np.ndarray:
    """Key → vBucket as a pure function of the key string, mirroring
    Couchbase's vb = crc32(key) % 1024 (the property the reference's
    stream partitioning relies on; couchbase/event.go:16). Because vb is
    derivable from conv_id alone, a vb-partitioned WAL is ALREADY
    hash-partitioned by conversation — the aligned replay strategy
    exploits this to merge without any shuffle."""
    return (splitmix64(hash_strings(conv_id)) % np.uint64(num_vbuckets)).astype(
        np.uint16
    )
