"""Sources & sinks.

Parquet is the native format here; Iceberg is the design target for
the pages/tree tables (snapshot-atomic level checkpoints) but its
runtime jars are not in this image. The Iceberg-SHAPED surface is
``catalog.get_catalog`` — append-only snapshots, time travel,
metadata-only rollback, partitioned layout — backed by parquet + a
JSON metadata log, swapping to real Iceberg when the jars exist.
Tree level checkpoints (tree.write_level) keep their own manifests
for resume; the pages table is written partitioned by (year, month)
of warc_ts for directory-level pruning (write_pages_partitioned).
"""

from raptor_rag_spark.sources.catalog import ParquetSnapshotCatalog, get_catalog
from raptor_rag_spark.sources.tables import (
    load_table,
    load_tables,
    pages_from_documents,
    register_views,
    write_pages_partitioned,
)

__all__ = [
    "ParquetSnapshotCatalog",
    "get_catalog",
    "load_table",
    "load_tables",
    "pages_from_documents",
    "register_views",
    "write_pages_partitioned",
]
