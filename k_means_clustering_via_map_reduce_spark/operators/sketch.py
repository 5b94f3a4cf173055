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


# --------------------------------------------------------------------------
# T24 — EXACT distributed heavy hitters via per-partition Misra-Gries +
# candidate verification (round-8 surface, registered round 8). The
# frequent-items face t5's HLL/GK sketches don't cover —
# and unlike them it produces an EXACT, SQL-oracle-able answer from a
# bounded-memory sketch:
#
#   1. Each partition runs Misra-Gries with K counters over its token
#      stream (O(K) memory regardless of partition size) and emits its
#      surviving candidates — mapInPandas, one pass, no shuffle.
#   2. Soundness of the union: if freq(x) > n/K globally, then
#      Σ_p (freq_p(x) − n_p/K) > 0, so freq_p(x) > n_p/K in at least
#      one partition p — and per-partition MG provably keeps every
#      such item. The union of partition candidates is therefore a
#      SUPERSET of the true heavy hitters, no matter how rows are
#      distributed.
#   3. Exact verify: re-count ONLY the candidate tokens (broadcast
#      semi-join into one aggregation) and keep freq > n/K.
#
# The candidate SET depends on partitioning; the verified OUTPUT never
# does (pinned in tests/test_heavy_hitters.py). This is the LSH/d11
# candidate-then-verify pattern applied to frequency: sketch for
# recall, exact pass for precision — the shape that scales a top-k
# over 100 TB of tokens without ever shuffling the full vocabulary.
# --------------------------------------------------------------------------
MG_COUNTERS = 64


def _misra_gries(tokens, k: int) -> dict:
    """Classic Misra-Gries: K-1 counters; decrement-all on overflow.
    Returns the surviving counter map (values are LOWER bounds on the
    partition-local frequency, freq_p(x) ≥ count ≥ freq_p(x) − n_p/K)."""
    counters: dict = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < k - 1:
            counters[t] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def heavy_hitters(
    docs: DataFrame, k: int = MG_COUNTERS
) -> DataFrame:
    """(token, freq) of every token with freq > total_tokens / k,
    EXACT, via per-partition MG candidates + one verified re-count."""
    from collections.abc import Iterator

    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import itertools

        # one MG state across ALL batches of this partition: Arrow
        # batch boundaries are an implementation detail, the sketch
        # bound is per PARTITION
        counters = _misra_gries(
            itertools.chain.from_iterable(pdf["token"] for pdf in batches),
            k,
        )
        yield pd.DataFrame({"token": list(counters.keys())})

    cands = toks.mapInPandas(mg, schema="token string").distinct()
    total = toks.count()
    verified = (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > total / k)
    )
    return verified


T24_ORACLE = f"""
    WITH t AS (
      SELECT unnest(string_split(trim(text), ' ')) AS token
      FROM documents
    ), n AS (SELECT count(*) AS total FROM t)
    SELECT token, CAST(count(*) AS BIGINT) AS freq
    FROM t CROSS JOIN n
    GROUP BY token, n.total
    HAVING count(*) > n.total / {MG_COUNTERS}.0
    ORDER BY freq DESC, token
"""


@query("t24_heavy_hitters", oracle=T24_ORACLE)
def t24_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T24: exact corpus heavy hitters (freq > n/64) from a
    bounded-memory one-pass sketch — the oracle is the plain exact
    GROUP BY + HAVING, which the candidate-verify construction must
    reproduce EXACTLY (a dropped candidate, a decrement bug, or a
    threshold boundary slip loses or invents a token)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        heavy_hitters(docs)
        .select("token", F.col("freq").cast("bigint").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
    )
