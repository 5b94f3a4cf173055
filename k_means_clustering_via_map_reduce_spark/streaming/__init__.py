"""Structured Streaming pipelines (K4): tumbling windows with watermark,
session windows. Importing registers streaming query-surface entries."""

import k_means_clustering_via_map_reduce_spark.streaming.dedup  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.ingest  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.joins  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.latedata  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.kmeans_stream  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.stateful  # noqa: F401
import k_means_clustering_via_map_reduce_spark.streaming.windows  # noqa: F401
