"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the engine's extension point for stateful logic that windowed aggregation
cannot express (the task-level analogue of the reference's reducer
state, reducer.py:17-51, except distributed, checkpointed, and
incremental).

Example operator: per-user running totals with a "large spender" flag
the first time a user's cumulative value crosses a threshold. State per
key is two scalars — constant memory per user regardless of event count;
at 100 TB/day the state store grows with distinct active users only, and
the shuffle is the usual hash on the group key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from k_means_clustering_via_map_reduce_spark.queries import query

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, crossed BOOLEAN"
)
STATE_SCHEMA = "n BIGINT, total DOUBLE, flagged BOOLEAN"


def running_totals_fn(threshold: float):
    """Build the per-group update function: folds each micro-batch's rows
    for one user into (count, sum) state and emits the updated totals,
    with ``crossed`` true exactly once — on the batch where the running
    total first exceeds ``threshold``."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, flagged = state.get
        else:
            n, total, flagged = 0, 0.0, False
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        newly_crossed = (not flagged) and total > threshold
        state.update((n, total, flagged or newly_crossed))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "crossed": [newly_crossed],
            }
        )

    return update


def running_user_totals(
    events: DataFrame, threshold: float = 100.0
) -> DataFrame:
    """Apply the stateful operator to a STREAMING events DataFrame
    (columns: user_id, value). Each micro-batch emits one row per active
    user with cumulative totals."""
    return events.groupBy("user_id").applyInPandasWithState(
        running_totals_fn(threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# K8 — the custom stateful operator as a driver-checked query.
# --------------------------------------------------------------------------
K8_THRESHOLD = 3300.0  # ~median per-user total on the fixtures: the
# crossed flag splits users non-vacuously


@query(
    "k8_stateful_totals",
    oracle=f"""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           CAST(sum(value) > {K8_THRESHOLD} AS BIGINT) AS ever_crossed
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stateful_totals_query(spark, sf_dir: str) -> DataFrame:
    """Run ``running_user_totals`` as a genuine streaming query and
    reduce the update-mode emission log to its TERMINAL state: values
    are all positive on this stream, so per-user (n_events,
    total_value) are monotone across emissions and the per-user max of
    each IS the final state — batch-count-independent, which is what
    lets an incremental stateful operator carry a plain SQL oracle.
    ``ever_crossed`` folds the once-only ``crossed`` edge flag back to
    a level (did the total ever exceed the threshold)."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.queries import r4
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        _run_complete_stream,
    )

    emitted = _run_complete_stream(
        spark,
        sf_dir,
        lambda s: running_user_totals(
            s.select("user_id", "value"), threshold=K8_THRESHOLD
        ),
        output_mode="update",
    )
    return (
        emitted.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            r4(F.max("total_value")).alias("total_value"),
            F.max(F.col("crossed").cast("int"))
            .cast("bigint")
            .alias("ever_crossed"),
        )
        .orderBy("user_id")
    )
