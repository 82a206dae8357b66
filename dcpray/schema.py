"""Arrow schemas for the change-event WAL and the transcripts lake table.

Models the reference's single record type ``couchbase.Event``
(/root/reference/couchbase/event.go:9-22): opaque binary key/value become
the structured transcript key (conv_id, turn_idx) and payload
(role, text, tool, ts); the op flags IsMutated/IsDeleted/IsExpired
(event.go:17-19, dispatch connector.go:75-93) become the ``op`` column;
VbID/SeqNo/Cas/RevNo map 1:1. Tombstones (deletion / expiration) carry a
null payload, mirroring NewDeleteEvent / NewExpireEvent passing value=nil
(event.go:24-56).
"""

from __future__ import annotations

import pyarrow as pa

# ---- op discriminators (exactly one per event; see event.go:24-73) ----
OP_MUTATION = "mutation"
OP_DELETION = "deletion"
OP_EXPIRATION = "expiration"
OPS = (OP_MUTATION, OP_DELETION, OP_EXPIRATION)

DEFAULT_COLLECTION = "_default"

# ---- transcripts lake table (BASELINE.json input_hint) ----
TRANSCRIPT_FIELDS: list[tuple[str, pa.DataType]] = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]
TRANSCRIPT_SCHEMA = pa.schema(TRANSCRIPT_FIELDS)
TRANSCRIPT_COLUMNS = [n for n, _ in TRANSCRIPT_FIELDS]

# Schema-evolution variant: a later WAL tranche adds a new tool-field
# variant column; earlier rows read as null after unification.
TOOL_VERSION_COL = "tool_version"
EVOLVED_TRANSCRIPT_SCHEMA = TRANSCRIPT_SCHEMA.append(
    pa.field(TOOL_VERSION_COL, pa.string())
)

# ---- WAL change-event schema (couchbase.Event in table form) ----
WAL_FIELDS: list[tuple[str, pa.DataType]] = [
    ("vb", pa.uint16()),  # Event.VbID — the stream partition
    ("seqno", pa.uint64()),  # Event.SeqNo — per-vb monotonic; the LWW version
    ("cas", pa.uint64()),  # Event.Cas
    ("rev_no", pa.uint64()),  # Event.RevNo
    ("op", pa.string()),  # mutation | deletion | expiration
    ("collection", pa.string()),  # Event.CollectionName (topic routing key)
    ("event_time", pa.timestamp("us")),  # Event.EventTime
    *TRANSCRIPT_FIELDS,  # key (conv_id, turn_idx) + payload
]
WAL_SCHEMA = pa.schema(WAL_FIELDS)
EVOLVED_WAL_SCHEMA = WAL_SCHEMA.append(pa.field(TOOL_VERSION_COL, pa.string()))

# CDC bookkeeping columns carried through the pipeline but dropped from the
# materialized transcripts table. ``_seqno`` is persisted in lake files so an
# incremental merge is idempotent under arbitrary replay overlap.
SEQNO_LAKE_COL = "_seqno"
OP_LAKE_COL = "_op"
BUCKET_COL = "_bucket"

# payload columns that are null on tombstones
PAYLOAD_COLUMNS = ["role", "text", "tool", "ts"]


def wal_read_schema(with_evolution: bool = True) -> pa.Schema:
    """Unified schema to read a WAL directory that may span the
    schema-evolution boundary (pre-tranche files lack tool_version)."""
    return EVOLVED_WAL_SCHEMA if with_evolution else WAL_SCHEMA


def unify_wal_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Arrow schema unification at the source/sink (north-rule schema
    evolution): added columns appear, missing ones read as null, and
    compatible types widen (permissive promotion, e.g. int32 → int64)."""
    return pa.unify_schemas(schemas, promote_options="permissive")
