from k_means_clustering_via_map_reduce_spark.plans.introspect import (
    broadcast_hash_join_count,
    codegen_stage_count,
    count_shuffles,
    partition_filters,
    physical_plan,
    pushed_filters,
    scan_read_schemas,
    shuffled_array_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "broadcast_hash_join_count",
    "codegen_stage_count",
    "count_shuffles",
    "partition_filters",
    "physical_plan",
    "pushed_filters",
    "scan_read_schemas",
    "shuffled_array_columns",
    "whole_stage_codegen_spans",
]
