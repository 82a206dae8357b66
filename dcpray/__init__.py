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

Everything is expressed Ray-Data-first: ``ray.data.read_parquet`` →
``map_batches`` over zero-copy Arrow batches → ``groupby(bucket).map_groups``
for the single all-to-all exchange → partitioned Parquet + manifest.
Nothing in this package calls ``ray.init`` — the caller owns the session.
"""

from dcpray.config import ReplayConfig
from dcpray.pipelines.replay import replay
from dcpray.state.checkpoint import Lake, ManifestStore

__all__ = ["ReplayConfig", "replay", "Lake", "ManifestStore"]
__version__ = "0.1.0"
