"""Streaming deduplication — the streaming face of the dedup operator
family (operators/dedup.py): an at-least-once source (replayed files,
Kafka redeliveries) deduped to exactly-once rows downstream.

``dropDuplicatesWithinWatermark`` keeps per-key state only until the
watermark passes the key's first-seen event time, so state is bounded by
the watermark horizon × arrival rate — the property that makes this
viable on an unbounded 100 TB/day stream, where an unbounded
``dropDuplicates`` would accumulate state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from k_means_clustering_via_map_reduce_spark.queries import query

DEDUP_WATERMARK = "10 minutes"


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = DEDUP_WATERMARK,
) -> DataFrame:
    """Drop duplicate rows (same ``keys``) arriving within the watermark
    horizon of each other. Duplicates straddling the horizon are the
    source's SLA problem, not state the engine can afford to keep.

    The output schema equals the input schema: watermarks demand a
    zoned TIMESTAMP, so a TIMESTAMP_NTZ event-time column is cast for
    the stateful operator (wall-clock-preserving under the pinned UTC
    session timezone) and cast back on emit — a dedup must not mutate
    the passthrough columns it didn't touch."""
    from pyspark.sql import functions as F

    ntz = dict(events.dtypes).get(ts_col) == "timestamp_ntz"
    if ntz:
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    out = events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
    if ntz:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
    return out


# --------------------------------------------------------------------------
# K7 — streaming dedup as a driver-checked query: the exact distinct key
# set, emitted incrementally in append mode.
# --------------------------------------------------------------------------


@query(
    "k7_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``dropDuplicates`` over the events stream, projected to
    its dedup key (user_id, event_type): append mode emits each key once
    at first arrival, so the terminal output IS the distinct key set —
    exactly SQL DISTINCT, and deterministic even though arrival order is
    not, because only key columns are emitted.

    This is the EXACT variant: global dedup state (one row per distinct
    key, forever) — correct on any bounded replay, and the right tool
    when the key space itself is bounded (user × type here). For
    unbounded key spaces at 100 TB/day, ``dedup_stream`` above bounds
    state by a watermark horizon instead, trading cross-horizon
    duplicates for O(horizon) state; its semantics are arrival-order-
    dependent and therefore pytest-checked, not SQL-oracled."""
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        _run_complete_stream,
    )

    emitted = _run_complete_stream(
        spark,
        sf_dir,
        lambda s: s.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        output_mode="append",
    )
    return emitted.orderBy("user_id", "event_type")
