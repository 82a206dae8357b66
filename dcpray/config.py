"""Replay pipeline configuration.

The analogue of the reference's YAML config + ApplyDefaults
(/root/reference/config/config.go:16-45,82-114). Batching knobs map onto
Ray Data's block/batch sizing instead of the producer micro-batcher
(producerBatchSize=2000 / producerBatchBytes=1MiB / 10s ticker,
config/config.go:91-101 — subsumed by the streaming executor, SURVEY §2 B1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass
class ReplayConfig:
    # merge-shuffle fan-out: number of hash buckets = output partitions.
    # Sized so one bucket's post-combine rows fit comfortably in a worker
    # heap; at 100 TB this is raised into the 10^4-10^5 range.
    num_buckets: int = 64
    # Arrow rows per map_batches call on stateless stages (None = whole block)
    batch_size: int | None = 65536
    # physical merge strategy: "aligned" (shuffle-free; lake buckets =
    # vb % num_buckets, valid whenever WAL files are single-vb) or
    # "shuffle" (salted-key groupby; any layout). See pipelines/replay.py.
    strategy: str = "aligned"
    # the stream's vBucket modulus (aligned only; None → inferred as
    # max observed vb + 1 — exact when every vbucket has traffic)
    num_vbuckets: int | None = None
    # salted (hash of full (conv_id, turn_idx) key) vs conv_id-only bucketing;
    # salted spreads hot conversations across buckets (north-rule skew rule)
    salted: bool = True
    # reject rows failing validation into <lake>/rejected/ instead of failing
    # the run (DLQ semantics, rejection_log_sink_response_handler.go:13-80)
    rejection_log: bool = True
    rejection_include_value: bool = True  # config.go:42-45 rejectionLog.includeValue
    # read-side file pruning using parquet footer stats vs the watermark
    prune_files: bool = True
    # stateful merge-applier actor pool (aligned strategy): keeps each
    # bucket's committed table cached in its pinned actor across runs, so
    # a continuous tail merges deltas against memory instead of re-reading
    # lake files (stages/aligned.py MergeApplier). False → stateless tasks.
    merge_actor_pool: bool = False
    # pool sizing: (min unused, max = pool size); also the legacy
    # actor-concurrency knob for map_batches-based stages
    merge_concurrency: tuple[int, int] = (2, 8)
    # per-actor cache bound (total cached rows across its buckets)
    merge_cache_rows: int = 2_000_000
    # per-task WAL reduce chunk: raw events accumulate to this many rows
    # before the local LWW collapse runs (bounds a merge task's peak
    # memory; the partials themselves are ≤1 row per key)
    merge_chunk_rows: int = 1_000_000
    # aligned-strategy straggler mitigation: a bucket whose delta exceeds
    # this many raw events is split into parallel partial LWW reduces
    # (stages/aligned.py partial_reduce) feeding one final merge —
    # equivalent by LWW associativity, and the aligned-mode form of the
    # north rule's hot-key salting
    hot_bucket_rows: int = 4_000_000
    # collection → output table routing (reference collectionTopicMapping,
    # connector.go:125-140); None → single transcripts table. Multi-table
    # routing is performed by pipelines/route.py:replay_routed, which takes
    # collection → Lake directly; this field documents the mapping for
    # config-file-driven deployments.
    collection_table_mapping: dict[str, str] | None = None
    # POSIX ManifestStore only: how long an unreferenced same-seq
    # manifest may sit before a committer treats its writer as crashed
    # and takes the seq over (None → the store's 30 s default). An
    # orchestrator whose crash-recovery rerun restarts in well under
    # 30 s should LOWER this to match its restart latency — the lease
    # exists to protect a live slow writer, and must stay above the
    # worst-case link→CURRENT publish gap. Ignored by CasManifestStore
    # (conditional PUT has no orphan window).
    commit_orphan_lease_s: float | None = None
    # retained for parity / documentation with the reference defaults
    reference_defaults: dict = field(
        default_factory=lambda: {
            "producerBatchSize": 2000,
            "producerBatchBytes": 1 << 20,
            "producerBatchTickerDuration_s": 10,
            "requiredAcks": 1,
        }
    )

    @staticmethod
    def for_scale(scale_name: str) -> "ReplayConfig":
        """Bucket fan-out sized to the fixture scale: enough buckets to
        keep every core busy through the merge stage (≥4× typical core
        count at the bigger scales) while one bucket's rows stay small."""
        buckets = {
            "tiny": 16,
            "sf0.001": 16,
            "sf0.01": 64,
            "sf0.1": 128,
            "bench10m": 256,
        }.get(scale_name, 64)
        return ReplayConfig(num_buckets=buckets)

    @staticmethod
    def from_env() -> "ReplayConfig":
        """Env-var interpolation analogue (connector.go:241-249)."""
        nvb = _env("DCPRAY_NUM_VBUCKETS", "")
        return ReplayConfig(
            num_buckets=int(_env("DCPRAY_NUM_BUCKETS", "64")),
            salted=_env("DCPRAY_SALTED", "1") == "1",
            strategy=_env("DCPRAY_STRATEGY", "aligned"),
            num_vbuckets=int(nvb) if nvb else None,
            merge_actor_pool=_env("DCPRAY_MERGE_ACTOR_POOL", "0") == "1",
            hot_bucket_rows=int(_env("DCPRAY_HOT_BUCKET_ROWS", "4000000")),
        )
