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

import pandas as pd  # module-level so pandas_udf type hints resolve

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


# --------------------------------------------------------------------------
# T13 — grouped-aggregate pandas UDF: the UDAF extension point (SURVEY.md
# §2.2 names scalar + grouped-agg pandas_udf as the engine's user
# extension API; t8/m1 cover grouped-map and map-iter, this covers the
# aggregate form). Geometric mean is the demo aggregate: numerically it
# must run as exp(mean(log)) — a naive product overflows at corpus
# group sizes — and that log-space form replays exactly in SQL.
# --------------------------------------------------------------------------


def geometric_mean_udf():
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    return geomean


@query(
    "t13_grouped_agg_udf",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS geo_mean_value,
           round(avg(value), 4)          AS arith_mean_value,
           count(*)                      AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def grouped_agg_udf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type geometric mean of event values via a GROUPED-AGGREGATE
    pandas UDF (Arrow-batched, one result row per group), alongside the
    built-in arithmetic mean for contrast. Values are strictly positive
    on this table, so log-space is total.

    Scale: a grouped-agg pandas UDF receives each group's full value
    series — per-group memory is the group size, and there is NO
    partial aggregation (unlike built-in aggregates): the full column
    shuffles on the group key. That is the documented cost of the UDAF
    extension point; aggregates expressible as built-ins (this one:
    exp(avg(ln)) — exactly what the oracle runs) should prefer them.
    The UDF path exists for aggregates that genuinely need the whole
    series (trimmed means, medians-of-ratios, model fits). Spark also
    refuses to mix grouped-agg pandas UDFs with built-in aggregates in
    one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the built-in side
    aggregates separately and joins back on the group key — K-row
    frames, broadcast join."""
    ev = load_table(spark, sf_dir, "events")
    geomean = geometric_mean_udf()
    geo = ev.groupBy("event_type").agg(
        F.round(geomean(F.col("value")), 4).alias("geo_mean_value")
    )
    builtins = ev.groupBy("event_type").agg(
        r4(F.avg("value")).alias("arith_mean_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        geo.join(F.broadcast(builtins), "event_type")
        .select(
            "event_type", "geo_mean_value", "arith_mean_value", "n_events"
        )
        .orderBy("event_type")
    )
