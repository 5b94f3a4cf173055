"""Sketch aggregates — the sub-linear-memory replacements for exact
distinct counts and percentiles at 100 TB.

q9 computes exact ``count(DISTINCT user_id)``: correct, but its state is
the distinct set itself and the shuffle carries every distinct value.
The sketch forms bound state to KB per group regardless of data size:

- ``approx_count_distinct`` — HyperLogLog++ (relative error
  configurable, default 5%); mergeable, so partial aggregation works
  map-side like any algebraic agg.
- ``percentile_approx`` — Greenwald-Khanna quantile sketch with bounded
  accuracy parameter.

No SQL oracle: DuckDB's approx functions use different sketch
parameters/implementations, so cross-engine equality is not defined.
The driver records rows-only; pytest bounds the error against the exact
answers (tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table

HLL_RSD = 0.05  # HyperLogLog++ target relative standard deviation
PCTL_ACCURACY = 10_000  # Greenwald-Khanna accuracy parameter


@query("t5_sketch_stats")
def sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: HLL++ distinct users, approximate median and p95
    of value. The exact counterparts (q9 / sort-based percentiles) are
    the correctness baseline in pytest."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias(
                "approx_users"
            ),
            r4(
                F.percentile_approx("value", 0.5, PCTL_ACCURACY)
            ).alias("approx_p50"),
            r4(
                F.percentile_approx("value", 0.95, PCTL_ACCURACY)
            ).alias("approx_p95"),
        )
        .orderBy("event_type")
    )
