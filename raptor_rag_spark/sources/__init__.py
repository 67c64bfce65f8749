"""Sources & sinks.

Parquet is the native format here; Iceberg is the design target for
the pages/tree tables (snapshot-atomic level checkpoints) but its
runtime jars are not in this image — the Iceberg path is gated behind
an import/config try and falls back to parquet + manifest files
(tree.write_level), which provides the same resume semantics.
"""

from raptor_rag_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
