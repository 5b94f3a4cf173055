"""K5 — streaming K-Means inference: the reference's core kernel
(centroid assignment, mapper.py:24-36 semantics) applied to an unbounded
event stream.

The production shape for a fitted clustering model at 100 TB/day:
centroids are fitted ONCE in batch (tiny driver state, broadcast into
the stream), each arriving event is assigned to its nearest centroid as
a NARROW per-row expression (no shuffle, no state), and only the
windowed per-cluster aggregation is stateful — watermark-bounded like
every other windowed agg in this package.

Reproducibility contract: each Lloyd iteration QUANTIZES its centroids
to 6 decimals. An unquantized mean over millions of doubles is
summation-order-dependent, so two engines can disagree in the last ulp
and flip a borderline assignment in the next iteration; rounding to a
fixed grid makes every iteration's centroids — and therefore every
assignment — engine-exact. That is what lets a genuinely iterative +
streaming query carry a full SQL oracle (unrolled per iteration, the
k1 pattern) instead of a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.functions.vector import (
    nearest_centroid,
)
from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table
from k_means_clustering_via_map_reduce_spark.streaming.windows import (
    TUMBLE,
    WATERMARK,
    _run_complete_stream,
    _with_event_time,
)

K5_K = 4
K5_ITERS = 3
K5_QUANT = 6  # decimals each iteration's centroids round to


def fit_value_centroids(
    spark: SparkSession, sf_dir: str, k: int = K5_K, iters: int = K5_ITERS
) -> list[float]:
    """Quantized 1-D Lloyd's over ``events.value``: init = first ``k``
    values in ``event_id`` order (O17 semantics), per iteration assign →
    per-cluster mean → round to ``K5_QUANT`` decimals → dense renumber
    by old id (empty clusters drop, reference §7.4). K scalars of
    driver state; each iteration is one narrow assignment + one K-group
    agg, exactly ``lloyd_fit``'s physical shape."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    first = ev.orderBy("event_id").limit(k).collect()
    cents = [float(r["value"]) for r in first]
    for _ in range(iters):
        assigned = ev.withColumn(
            "cid",
            nearest_centroid(F.array(F.col("value")), [(c,) for c in cents]),
        )
        rows = (
            assigned.groupBy("cid")
            .agg(F.round(F.avg("value"), K5_QUANT).alias("c"))
            .collect()
        )
        cents = [float(r["c"]) for r in sorted(rows, key=lambda r: r["cid"])]
    return cents


def _k5_oracle() -> str:
    """Unrolled SQL replay of ``fit_value_centroids`` + the windowed
    assignment — one CTE pair (assign, centroids) per iteration."""
    sql = f"""
    WITH c0 AS (
      SELECT (row_number() OVER (ORDER BY event_id)) - 1 AS cid, value AS c
      FROM (SELECT event_id, value FROM events ORDER BY event_id LIMIT {K5_K})
    )"""
    prev = "c0"
    for i in range(1, K5_ITERS + 1):
        sql += f""",
    a{i} AS (
      SELECT e.ts, e.value,
             (SELECT p.cid FROM {prev} p
              ORDER BY sqrt((e.value - p.c) * (e.value - p.c)), p.cid LIMIT 1)
               AS cid
      FROM events e
    ),
    c{i} AS (
      SELECT (row_number() OVER (ORDER BY cid)) - 1 AS cid, c
      FROM (SELECT cid, round(avg(value), {K5_QUANT}) AS c
            FROM a{i} GROUP BY cid)
    )"""
        prev = f"c{i}"
    sql += f""",
    scored AS (
      SELECT e.ts, e.value,
             (SELECT p.cid FROM {prev} p
              ORDER BY sqrt((e.value - p.c) * (e.value - p.c)), p.cid LIMIT 1)
               AS cluster_id
      FROM events e
    )
    SELECT date_trunc('hour', ts) AS hour_ts, cluster_id,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM scored GROUP BY 1, 2 ORDER BY hour_ts, cluster_id
    """
    return sql


@query("k5_stream_cluster_counts", oracle=_k5_oracle())
def stream_cluster_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5: per-cluster hourly event counts as a REAL streaming query —
    batch-fitted quantized centroids broadcast into the stream, nearest
    assignment per event (narrow, stateless), tumbling 1h windows with
    the standard watermark; complete-mode terminal state equals the
    batch aggregate the unrolled SQL oracle computes."""
    cents = fit_value_centroids(spark, sf_dir)
    cent_tuples = [(c,) for c in cents]

    def builder(events: DataFrame) -> DataFrame:
        return (
            _with_event_time(events)
            .withWatermark("ts", WATERMARK)
            .withColumn(
                "cluster_id",
                nearest_centroid(F.array(F.col("value")), cent_tuples),
            )
            .groupBy(F.window("ts", TUMBLE).alias("win"), F.col("cluster_id"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # sum, not avg: source values carry 4 decimals, so the
                # group sum sits ON the 1e-4 grid (binary error ~1e-12 away
                # from it) and rounds identically in any engine. A group
                # avg over a dyadic count (sum/8) can land EXACTLY on a
                # x.xxxx5 half-boundary, where Spark and the oracle round
                # opposite ways depending on summation order's last ulp.
                r4(F.sum("value")).alias("total_value"),
            )
        )

    return (
        _run_complete_stream(spark, sf_dir, builder)
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
            "cluster_id",
            "n_events",
            "total_value",
        )
        .orderBy("hour_ts", "cluster_id")
    )
