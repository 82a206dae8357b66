"""Fast Parquet → Dataset reads for paths whose footers we already scanned.

``ray.data.read_parquet`` prefetches every fragment's footer through Ray
tasks at Dataset-construction time (ParquetMetadataProvider.
prefetch_file_metadata) — ~13 s for a 1024-file WAL on this node, pure
overhead here because the engine scans footers itself (wal.scan_wal) for
watermark pruning and schema unification. ``read_parquet_fast`` disables
only that prefetch (row-count/size estimation falls back to Ray's
fragment sampling); all read execution is unchanged and still
distributed.
"""

from __future__ import annotations

import pyarrow as pa


class _NoPrefetchMetadataProvider:
    """Lazily-resolved subclass (ray import deferred)."""

    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is None:
            from ray.data.datasource.parquet_meta_provider import (
                ParquetMetadataProvider,
            )

            class NoPrefetch(ParquetMetadataProvider):
                def prefetch_file_metadata(self, fragments, **kwargs):
                    return None

            cls._cls = NoPrefetch
        return cls._cls()


def read_clean(path: str, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with pandas-writer schema metadata
    stripped. Pandas-written parquet carries a ``b'pandas'`` schema
    metadata blob whose presence makes ``pyarrow.Schema`` unhashable,
    which defeats Ray Data's schema deduplication and spams
    'Failed to hash the schemas' warnings on every stage."""
    import pyarrow.parquet as pq
    import ray.data as rd

    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(path, schema=schema, columns=columns, **kwargs)


def read_parquet_fast(
    paths: list[str],
    *,
    schema: pa.Schema | None = None,
    columns: list[str] | None = None,
    **kwargs,
):
    import ray.data as rd

    return rd.read_parquet(
        paths,
        schema=schema,
        columns=columns,
        meta_provider=_NoPrefetchMetadataProvider.get(),
        **kwargs,
    )
