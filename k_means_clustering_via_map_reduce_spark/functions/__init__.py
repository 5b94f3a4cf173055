from k_means_clustering_via_map_reduce_spark.functions.vector import (
    centroid_literal,
    cosine_similarity,
    dot,
    euclidean_distance_cols,
    nearest_centroid,
    squared_distance,
    vector_norm,
)
from k_means_clustering_via_map_reduce_spark.functions.text import (
    min_shingle_md5_fingerprint,
    shingles,
    tokens,
)

__all__ = [
    "centroid_literal",
    "cosine_similarity",
    "dot",
    "euclidean_distance_cols",
    "nearest_centroid",
    "squared_distance",
    "vector_norm",
    "min_shingle_md5_fingerprint",
    "shingles",
    "tokens",
]
