"""Incremental ingestion.

The reference has NO streaming operators (SURVEY.md §2.10) — its
service layer is request/response. The engine's incremental story is
append-only micro-batch: new pages land in a directory/Iceberg table;
``incremental_append`` re-runs extract->chunk->embed->tile for the new
rows only and appends to level 0; upper levels rebuild only for
touched cells (cell ids of new rows), which the per-level manifests
make cheap to locate. A Structured Streaming wrapper
(``stream_pages``) drives the same batch logic via foreachBatch.
"""

from raptor_rag_spark.streaming.incremental import (
    incremental_level0,
    read_stream_level0,
    stream_pages,
)
from raptor_rag_spark.streaming.stateful import sessionize_stream

__all__ = [
    "incremental_level0",
    "read_stream_level0",
    "sessionize_stream",
    "stream_pages",
]
