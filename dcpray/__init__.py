"""dcpray — a Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the capabilities of Trendyol/go-dcp-kafka (reference at
/root/reference, see SURVEY.md) as Ray Data pipelines: a vBucket-sharded
change-event WAL (mutation / deletion / expiration, ordered per-vBucket by
DCP-style sequence numbers) is replayed into a Parquet lake of multi-turn
transcripts keyed by (conv_id, turn_idx), with

- a user flat-map Mapper stage (reference mapper.go:8),
- hash-bucketed last-writer-wins merge-apply (the table analogue of Kafka
  log compaction, reference kafka/client.go:235-275),
- per-partition seqno watermarks + atomic manifest commits for
  exactly-once resume (reference connector.go:166,179;
  kafka/metadata/kafka_metadata.go),
- Arrow schema unification for schema evolution,
- a rejected-rows (DLQ) sink (reference
  kafka/rejection_log_sink_response_handler.go),
- per-run metrics (reference metric/collector.go).

Two physical strategies (pipelines/replay.py): the default ``aligned``
path exploits that vb is a pure function of the key, merging each
``vb % num_buckets`` partition independently with NO shuffle at all (the
table analogue of the reference's per-vBucket listener chains); the
generic ``shuffle`` path — ``map_batches`` precombine →
``groupby(bucket).map_groups`` — covers non-key-partitioned WALs and
salted-key skew. Nothing in this package calls ``ray.init`` — the caller
owns the session.
"""

from dcpray.config import ReplayConfig
from dcpray.functions.agg import coarse_groupby
from dcpray.pipelines.builder import Pipeline, PipelineBuilder, SinkResponseHandler
from dcpray.pipelines.compact import compact, gc
from dcpray.pipelines.replay import replay
from dcpray.state.checkpoint import CasManifestStore, Lake, ManifestStore
from dcpray.state.views import IncrementalView, ViewSpec

__all__ = [
    "ReplayConfig", "replay", "Lake", "ManifestStore", "CasManifestStore",
    "PipelineBuilder", "Pipeline", "SinkResponseHandler", "compact", "gc",
    "coarse_groupby", "IncrementalView", "ViewSpec",
]
__version__ = "0.1.0"
