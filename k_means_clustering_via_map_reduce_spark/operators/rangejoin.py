"""Binned range join — the scale-correct pattern for time-proximity
joins with NO equi-key.

The reference's substrate can only hash-partition on an exact key
(mapper.py partition = hash(key) % R semantics); a "rows within Δt of
each other" join has no such key, and the naive plan is a cross join —
O(n²) at any scale. The standard distributed fix (used by every range-
join implementation from Spark's own range-join hints to
Flink/interval-join): quantize the time axis into fixed-width bins,
equi-join on the bin id, and re-check the exact predicate as a residual
filter.

Correctness of the bin enumeration: the RIGHT row maps to exactly one
bin (``floor(t/w)``); the LEFT row enumerates every bin its window
``[t+lo, t+hi]`` overlaps. A qualifying pair therefore meets in exactly
one bin — the right row's — so no dedup step is needed, and a
non-qualifying pair that shares a bin is removed by the residual filter.

Scale shape: shuffle is one hash exchange of each side on the bin id;
per-bin work is |left ∩ bin| × |right ∩ bin| — linear in row count for
fixed event density, never the n² pair space. Wire amplification of the
left side is ⌈(hi-lo)/w⌉+1 (= 3 here), the knob being bin width w:
wider bins → less duplication but more residual-filter work. Hot bins
(time-of-day spikes) are ordinary equi-join skew — AQE's skew-join
split or ``salted_join`` (operators/skew.py) apply unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query
from k_means_clustering_via_map_reduce_spark.sources import load_table


def _epoch_us(ts: Column) -> Column:
    """Exact integer event time: epoch MICROSECONDS of a TIMESTAMP_NTZ
    column (the session timezone is pinned UTC, so the NTZ→LTZ cast is
    wall-clock-preserving and matches DuckDB's ``epoch_us``). Integer
    microseconds make the residual predicate exact — a double epoch
    would round at ~1e15 magnitude."""
    return F.unix_micros(ts.cast("timestamp"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    bin_us: int | None = None,
) -> DataFrame:
    """Join each left row to every right row with
    ``right.ts ∈ [left.ts + lower_us, left.ts + upper_us]`` (inclusive),
    via bin-bucketed equi-join + residual filter.

    Returns the joined frame with all columns of both inputs (callers
    project/aggregate); the internal ``__bin``/``__lus``/``__rus``
    columns are dropped. ``bin_us`` defaults to the window span — the
    sweet spot where left-side duplication is ≤ 2 bins + 1."""
    span = upper_us - lower_us
    if span <= 0:
        raise ValueError("range_join needs upper_us > lower_us")
    w = bin_us or span
    l = left.withColumn("__lus", _epoch_us(F.col(left_ts)))
    r = right.withColumn("__rus", _epoch_us(F.col(right_ts)))
    # Left row's window [t+lo, t+hi] overlaps bins floor((t+lo)/w) ..
    # floor((t+hi)/w): enumerate them with sequence+explode (floor
    # division on longs — exact).
    l = l.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor((F.col("__lus") + F.lit(lower_us)) / F.lit(w)),
                F.floor((F.col("__lus") + F.lit(upper_us)) / F.lit(w)),
            )
        ),
    )
    r = r.withColumn("__bin", F.floor(F.col("__rus") / F.lit(w)))
    joined = l.join(r, "__bin").filter(
        (F.col("__rus") >= F.col("__lus") + F.lit(lower_us))
        & (F.col("__rus") <= F.col("__lus") + F.lit(upper_us))
    )
    return joined.drop("__bin", "__lus", "__rus")


NEIGHBOR_WINDOW_US = 60_000_000  # ±1 minute


@query(
    "q28_range_join_neighbors",
    oracle=f"""
    SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_neighbors,
           CAST(coalesce(sum(CASE WHEN b.event_type = a.event_type
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_same_type
    FROM events a
    LEFT JOIN events b
      ON epoch_us(b.ts) >= epoch_us(a.ts) - {NEIGHBOR_WINDOW_US}
     AND epoch_us(b.ts) <= epoch_us(a.ts) + {NEIGHBOR_WINDOW_US}
     AND b.event_id <> a.event_id
    GROUP BY a.event_id
    ORDER BY a.event_id
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q28: per-event temporal-neighborhood stats — for EVERY event, how
    many other events (any user) fall within ±1 minute, and how many of
    those share its event_type. A pure range join: there is no equi-key,
    so the binned plan is the only one that survives scale (the oracle's
    theta join is DuckDB's IEJoin — fine single-node, impossible to
    hash-partition)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type"
    )
    # Keep the self-match (every event trivially lies in its own window
    # and shares its own type) and subtract it after the aggregation:
    # every event then owns ≥1 pair row, so zero-neighbor events need no
    # separate zeros-preserving outer join — one whole join and its two
    # exchanges cheaper than the naive count-then-left-join-back plan.
    pairs = range_join(
        ev,
        ev.select(
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
            F.col("event_type").alias("b_type"),
        ),
        "ts",
        "b_ts",
        -NEIGHBOR_WINDOW_US,
        NEIGHBOR_WINDOW_US,
    )
    return (
        pairs.groupBy("event_id")
        .agg(
            (F.count(F.lit(1)) - 1).alias("n_neighbors"),
            (
                F.sum(
                    F.when(
                        F.col("b_type") == F.col("event_type"), 1
                    ).otherwise(0)
                )
                - 1
            ).alias("n_same_type"),
        )
        .orderBy("event_id")
    )
