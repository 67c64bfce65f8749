"""raptor_rag_spark — a PySpark-native spatial-join + tiling engine.

Recasts the reference RAPTOR pipeline (serdarildercaglar/raptor-rag:
recursive UMAP -> GMM soft clustering -> summarization tree, FAISS flat
retrieval) as an idiomatic Spark engine:

- text -> chunks -> embeddings -> 2-D reduced space -> hierarchical
  quadkey cell index ("H3/S2-style" tiling over embedding space)
- retrieval = tile-pruned kNN join (candidate equi-join on cell_id +
  ring expansion + exact cosine re-rank window + token-budget window)
- tree build = driver loop over resolutions; per-cell aggregation with
  a deterministic extractive summarizer; checkpointed per level with
  per-partition lineage + metrics (resume mid-build)
- spatial extras: cluster-boundary polygons, point-in-polygon join,
  raster<->vector density grids
- training-data pipeline ops: dedup (exact / minhash-LSH / simhash /
  ngram-jaccard / embedding-cosine), ANN similarity search, language
  ID, quality scoring, fingerprinting, multimodal binary plumbing.

Everything is DataFrame-first; Python appears only inside Arrow-batched
pandas UDFs (embed, chunk, summarize, hull).
"""

from raptor_rag_spark.config import EngineConfig


def engine(*args, **kwargs):
    """Convenience constructor for the user-facing facade
    (raptor_rag_spark.api.RaptorEngine) without importing pyspark at
    package-import time."""
    from raptor_rag_spark.api import RaptorEngine

    return RaptorEngine(*args, **kwargs)


__all__ = ["EngineConfig", "engine"]
__version__ = "0.4.0"
