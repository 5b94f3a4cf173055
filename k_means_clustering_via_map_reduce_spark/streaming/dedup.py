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

from pyspark.sql import DataFrame

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
