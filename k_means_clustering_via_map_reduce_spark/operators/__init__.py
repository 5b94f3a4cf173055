"""Extension operators: dedup, similarity search, text analysis,
multimodal plumbing. Importing this package registers their query-surface
entries into ``queries.QUERIES`` / ``queries.ORACLE_SQL``."""

import k_means_clustering_via_map_reduce_spark.operators.dedup  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.multimodal  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.similarity  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.text  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.asof  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.sketch  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.sampling  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.pipeline  # noqa: F401
import k_means_clustering_via_map_reduce_spark.operators.rangejoin  # noqa: F401
