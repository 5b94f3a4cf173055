from k_means_clustering_via_map_reduce_spark.sources.sinks import (
    write_bucketed,
    write_centroids_txt,
    write_csv,
    write_json,
    write_parquet,
)
from k_means_clustering_via_map_reduce_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    read_points_csv,
    spread,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_points_csv",
    "spread",
    "write_bucketed",
    "write_centroids_txt",
    "write_csv",
    "write_json",
    "write_parquet",
]
