"""As-of (point-in-time) join — an operator Spark's join surface lacks
natively, composed from existing primitives per the engine's custom-
operator policy (composition first, Pandas UDF only if semantics demand).

Semantics: for every left row, attach the single right row with the
LARGEST right timestamp ≤ the left timestamp within the same key group
(backward as-of, inclusive) — the "latest known state at event time"
join used for feature lookups and slowly-changing joins.

Scale shape: NOT a join at all. Both sides union into one stream tagged
by side, then ONE window pass per key carries the latest right payload
forward (``last(..., ignorenulls)`` over rows UNBOUNDED PRECEDING →
CURRENT ROW). Cost is a single hash shuffle on the key + a per-partition
sort — same wire volume as the inputs, no pair-space, no range
explosion, skew-bounded by the busiest key like any windowed op. A
sort-merge pair join formulation would shuffle the same bytes but then
pay a per-pair predicate; the union-window form is strictly better on
Spark.

Determinism contract: right rows must be unique per (key, right_ts) —
pre-aggregate duplicates away (as q20 does with max_by) or ties at equal
timestamps are resolved arbitrarily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join. Returns every left row's columns
    plus ``right_cols`` (NULL when no right row precedes it).

    At equal timestamps the right row sorts FIRST (side tag 0 < 1), so a
    right row exactly at the left timestamp IS matched — `a.ts >= b.ts`
    semantics, identical to DuckDB/pandas ``ASOF JOIN`` defaults.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]

    r_payload = F.struct(*[F.col(c) for c in right_cols])
    r_payload_type = right.select(r_payload.alias("_p")).schema["_p"].dataType
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    l_payload_type = left.select(l_payload.alias("_p")).schema["_p"].dataType

    l2 = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_payload.alias("__l"),
        F.lit(None).cast(r_payload_type).alias("__r"),
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_payload_type).alias("__l"),
        r_payload.alias("__r"),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l2.unionByName(r2)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        "__l.*",
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )


# --------------------------------------------------------------------------
# Query-surface registration: clicks matched to the user's most recent
# prior (or simultaneous) view. DuckDB's native ASOF JOIN is the oracle.
# --------------------------------------------------------------------------
from k_means_clustering_via_map_reduce_spark.queries import query, r4  # noqa: E402
from k_means_clustering_via_map_reduce_spark.sources import load_table  # noqa: E402


@query(
    "q20_asof_join",
    oracle="""
    WITH a AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT user_id, ts, max(event_id) AS view_event_id,
             max_by(value, event_id) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT a.event_id, a.user_id, a.ts,
           b.view_event_id, round(b.view_value, 4) AS view_value
    FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
    ORDER BY a.event_id
    """,
)
def asof_join_query(spark, sf_dir):
    """Each click joined to the latest view by the same user at or before
    the click (backward inclusive as-of). The view side is pre-aggregated
    to one row per (user, ts) so ties are deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    j = asof_join(
        clicks,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id", "view_value"],
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        "view_event_id",
        r4(F.col("view_value")).alias("view_value"),
    ).orderBy("event_id")
