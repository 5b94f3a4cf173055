"""PySpark-native analytics engine with the capabilities of the reference
MapReduce K-Means framework (Ritisha-21089/K-Means-Clustering-via-Map-Reduce),
re-expressed Spark-first per SURVEY.md.

Subpackages:
- ``sources``   — parquet/csv/json table loaders with explicit schemas
- ``functions`` — reusable column-expression builders (distance, shingles, ...)
- ``operators`` — dedup / similarity / text-analysis / multimodal operators
- ``plans``     — physical-plan introspection helpers (pushdown/broadcast checks)
- ``streaming`` — Structured Streaming pipelines (tumbling/session windows)
- ``kmeans``    — K-Means kernels: DataFrame Lloyd's (reference parity) + MLlib
- ``queries``   — the declared relational query surface (SURVEY.md §2.3)
"""

from k_means_clustering_via_map_reduce_spark.session import configure, get_spark

__all__ = ["get_spark", "configure"]
