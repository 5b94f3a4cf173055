"""K6 — stream-stream interval join: click-to-view attribution.

The canonical unbounded-stream join shape: two event streams joined on
an equi-key (user) plus a time-range predicate (click lands within the
attribution window after the view). Spark buffers both sides in keyed
state; the time-range condition is what makes that state FINITE — the
view side is provably unjoinable once the watermark passes
``view.ts + window``, so state is evicted instead of growing with the
stream. Without the range predicate a stream-stream join must retain
every row forever; with it, state is O(window · arrival rate) per key —
the 100 TB/day sizing knob is the window length, not the corpus.

The reference's barrier-synchronized batch loop (master.py:215-258) has
no analogue: this join never sees "all" of either input.

Oracled like the other streaming entries: run as a REAL streaming query
(append mode — stream-stream joins have no complete mode — with
``Trigger.AvailableNow`` to a memory sink); an inner join emits every
match once all files are ingested, so the emitted set equals the batch
join the DuckDB oracle computes.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.streaming.windows import (
    WATERMARK,
    _events_stream,
    _stage_events_dir,
    _with_event_time,
)

ATTRIBUTION_WINDOW = "24 hours"
ATTRIBUTION_WINDOW_SQL = "INTERVAL 24 HOUR"


def attribution_join(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """Inner interval join: each click paired with every SAME-USER view
    it follows within the attribution window (strictly after — a click
    at the view's own timestamp is not attributed). Both sides
    watermarked so Spark derives the state-eviction bound from the
    two-sided time constraint."""
    v = _with_event_time(views).withWatermark("ts", WATERMARK).alias("v")
    c = _with_event_time(clicks).withWatermark("ts", WATERMARK).alias("c")
    return v.join(
        c,
        F.expr(
            f"""
            v.user_id = c.user_id
            AND c.ts > v.ts
            AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
            """
        ),
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("c.ts").cast("timestamp_ntz").alias("click_ts"),
        r4(F.col("c.value")).alias("click_value"),
    )


def _run_append_stream(
    spark: SparkSession, sf_dir: str, builder
) -> DataFrame:
    """Run ``builder(views_stream, clicks_stream)`` as a genuine
    append-mode streaming query (AvailableNow, memory sink) and return
    the materialized emitted rows. Mirrors
    ``windows._run_complete_stream`` — throwaway tmpfs checkpoint, the
    8-partition stateful-stage sizing, JVM-side materialization."""
    name = f"ss_{uuid.uuid4().hex[:12]}"
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_ssj_", dir=ckpt_base
    ) as tmp:
        events_dir = _stage_events_dir(spark, sf_dir)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            stream = _events_stream(spark, events_dir)
            views = stream.filter(F.col("event_type") == "view")
            clicks = stream.filter(F.col("event_type") == "click")
            q = (
                builder(views, clicks)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return result


@query(
    "k6_stream_attribution",
    oracle=f"""
    SELECT v.event_id AS view_id, c.event_id AS click_id,
           v.user_id AS user_id, v.ts AS view_ts, c.ts AS click_ts,
           round(c.value, 4) AS click_value
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
    ORDER BY view_id, click_id
    """,
)
def stream_attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: the view→click attribution join run as a REAL stream-stream
    join. The emitted append-mode rows after full ingest must equal the
    batch interval join the oracle computes — proving the keyed
    dual-sided join state machinery end-to-end."""
    return _run_append_stream(spark, sf_dir, attribution_join).orderBy(
        "view_id", "click_id"
    )


# --------------------------------------------------------------------------
# K9 — stream-static enrichment join: the OTHER streaming join shape
# (k6 is stream-stream). A static dimension table joins each arriving
# event statelessly — no join state at all, because the static side is
# just (re)read per micro-batch; broadcast at dimension sizes.
# --------------------------------------------------------------------------


@query(
    "k9_stream_enrich",
    oracle="""
    SELECT date_trunc('hour', e.ts) AS hour_ts,
           coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
           count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2 ORDER BY hour_ts, segment
    """,
)
def stream_enrich_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9: hourly per-segment totals over the events stream enriched
    with the static customer dimension via a stream-static LEFT join.
    The join itself is STATELESS (each micro-batch joins against the
    static table — broadcast here, and at any real dimension size);
    only the downstream windowed aggregation holds state. Complete-mode
    terminal state must equal the batch join+rollup the oracle
    computes.

    The 100 TB/day shape: dimension updates show up on the next
    micro-batch read (slowly-changing enrichment without restarting the
    query) — something neither the reference's barrier loop nor a
    static join can express."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        TUMBLE,
        _run_complete_stream,
    )

    customer = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        )
    )

    def enrich_agg(events: DataFrame) -> DataFrame:
        joined = (
            _with_event_time(events)
            .join(customer, F.col("user_id") == F.col("c_custkey"), "left")
            .withColumn(
                "segment", F.coalesce("c_mktsegment", F.lit("UNKNOWN"))
            )
        )
        return (
            joined.withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", TUMBLE).alias("win"), F.col("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                r4(F.sum("value")).alias("total_value"),
            )
        )

    return (
        _run_complete_stream(spark, sf_dir, enrich_agg)
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
            "segment",
            "n_events",
            "total_value",
        )
        .orderBy("hour_ts", "segment")
    )


def left_outer_attribution(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """K15 join body: every view, attributed clicks attached when they
    exist — the UNMATCHED views emit a NULL-click row only once the
    watermark proves no qualifying click can still arrive."""
    v = _with_event_time(views).withWatermark("ts", WATERMARK).alias("v")
    c = _with_event_time(clicks).withWatermark("ts", WATERMARK).alias("c")
    return v.join(
        c,
        F.expr(
            f"""
            v.user_id = c.user_id
            AND c.ts > v.ts
            AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
            """
        ),
        "left_outer",
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("c.ts").cast("timestamp_ntz").alias("click_ts"),
    )


@query(
    "k15_stream_outer_join",
    oracle=f"""
    WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    m AS (SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
                 v.ts AS view_ts, c.ts AS click_ts
          FROM v JOIN c ON v.user_id = c.user_id
            AND c.ts > v.ts AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}),
    wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM c))
                  - INTERVAL 10 MINUTE AS w),
    unmatched AS (
      SELECT v.event_id AS view_id, NULL::BIGINT AS click_id, v.user_id,
             v.ts AS view_ts, NULL::TIMESTAMP AS click_ts
      FROM v, wm
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.event_id)
        AND v.ts + {ATTRIBUTION_WINDOW_SQL} < wm.w)
    SELECT * FROM m UNION ALL SELECT * FROM unmatched
    ORDER BY view_id, click_id
    """,
)
def k15_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K15 — stream-stream LEFT OUTER interval join: k6's attribution
    with the no-click views KEPT. Unlike every other streaming entry,
    the NULL-side rows are *watermark-manufactured*: Spark may emit an
    unmatched view only when the watermark passes ``view.ts + window``
    (the point at which a matching click is provably impossible), so the
    RESULT — not just the timing — depends on eviction semantics.

    The oracle replays exactly that contract: matched pairs are the
    batch interval join; NULL rows are the unmatched views whose
    eviction bound lies strictly below the terminal JOIN watermark —
    which is the MIN of the two sides' watermarks,
    ``least(max view ts, max click ts) - delay``, NOT the global events
    max (each watermark node tracks only the rows that flow through it;
    the corpus's last event is often a purchase neither side sees).
    Views nearer the stream's end stay buffered when AvailableNow
    terminates, and are correctly ABSENT. A join
    that drops late state too early, never evicts, or emits unmatched
    rows eagerly (the batch left-join shortcut) all flip the hash.

    Scale: state is O(window · arrival rate) per key like k6 — the
    outer flavor adds only a matched-bit per buffered view; emission
    is driven by the same watermark bookkeeping that bounds the state."""
    res = _run_append_stream(spark, sf_dir, left_outer_attribution)
    return res.orderBy("view_id", "click_id")


def full_outer_attribution(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """K17 join body: k15's kept-views PLUS unattributed clicks — both
    NULL sides manufactured by watermark eviction, each under its OWN
    bound (see k17's docstring)."""
    v = _with_event_time(views).withWatermark("ts", WATERMARK).alias("v")
    c = _with_event_time(clicks).withWatermark("ts", WATERMARK).alias("c")
    return v.join(
        c,
        F.expr(
            f"""
            v.user_id = c.user_id
            AND c.ts > v.ts
            AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
            """
        ),
        "full_outer",
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.coalesce(F.col("v.user_id"), F.col("c.user_id")).alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("c.ts").cast("timestamp_ntz").alias("click_ts"),
    )


@query(
    "k17_stream_full_outer_join",
    oracle=f"""
    WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    m AS (SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
                 v.ts AS view_ts, c.ts AS click_ts
          FROM v JOIN c ON v.user_id = c.user_id
            AND c.ts > v.ts AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}),
    wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM c))
                  - INTERVAL 10 MINUTE AS w),
    uv AS (SELECT v.event_id AS view_id, NULL::BIGINT AS click_id,
                  v.user_id, v.ts AS view_ts, NULL::TIMESTAMP AS click_ts
           FROM v, wm
           WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.view_id = v.event_id)
             AND v.ts + {ATTRIBUTION_WINDOW_SQL} < wm.w),
    uc AS (SELECT NULL::BIGINT AS view_id, c.event_id AS click_id,
                  c.user_id, NULL::TIMESTAMP AS view_ts, c.ts AS click_ts
           FROM c, wm
           WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.event_id)
             AND c.ts < wm.w)
    SELECT * FROM m UNION ALL SELECT * FROM uv UNION ALL SELECT * FROM uc
    ORDER BY view_id NULLS LAST, click_id NULLS LAST
    """,
)
def k17_stream_full_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K17 — stream-stream FULL OUTER interval join, completing the
    streaming outer family (k6 inner, k15 left). Each NULL side has a
    DIFFERENT watermark-derived eviction bound, and the oracle encodes
    both: an unmatched VIEW emits once the watermark passes
    ``view.ts + window`` (no future click can land in its window —
    k15's bound), while an unmatched CLICK emits once the watermark
    merely passes ``click.ts`` (a matching view must PRECEDE the click,
    and any future view arrives with ts above the watermark; a click
    needs no window-length grace). Both bounds are measured against the
    per-side-min terminal watermark (k15's least() contract) — getting
    either bound wrong, or reusing the view bound for clicks, flips the
    hash.

    Scale: identical state machine to k6/k15 — the full-outer flavor
    tracks a matched-bit on BOTH buffers; state remains
    O(window · rate) per key with clicks evicting a full window sooner
    than views."""
    res = _run_append_stream(spark, sf_dir, full_outer_attribution)
    return res.orderBy(
        F.col("view_id").asc_nulls_last(), F.col("click_id").asc_nulls_last()
    )


def joined_hourly(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """K19 body: the k6 inner interval join feeding an hourly windowed
    aggregation of the pairs — TWO stateful operators (join + agg) in
    one streaming plan (SPARK-40925's join→agg combination; k18 is
    agg→agg)."""
    v = _with_event_time(views).withWatermark("ts", WATERMARK).alias("v")
    c = _with_event_time(clicks).withWatermark("ts", WATERMARK).alias("c")
    pairs = v.join(
        c,
        F.expr(
            f"""
            v.user_id = c.user_id
            AND c.ts > v.ts
            AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
            """
        ),
    ).select(F.col("v.ts").alias("vts"), F.col("c.value").alias("cv"))
    return (
        pairs.groupBy(F.window("vts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            r4(F.sum("cv")).alias("click_value"),
        )
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
            "n_pairs",
            "click_value",
        )
    )


@query(
    "k19_stream_join_then_agg",
    oracle=f"""
    WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    m AS (SELECT v.ts AS vts, c.value AS cv
          FROM v JOIN c ON v.user_id = c.user_id
            AND c.ts > v.ts AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}),
    wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM c))
                  - INTERVAL 10 MINUTE - {ATTRIBUTION_WINDOW_SQL} AS w)
    SELECT date_trunc('hour', vts) AS hour_ts,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(sum(cv), 4) AS click_value
    FROM m, wm
    WHERE date_trunc('hour', vts) + INTERVAL 1 HOUR <= wm.w
    GROUP BY 1 ORDER BY hour_ts
    """,
)
def k19_stream_join_then_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K19 — interval join CHAINED into a windowed aggregation inside
    one append-mode query: hourly attributed-pair counts + click value,
    keyed on the VIEW's hour.

    The semantic pin is the aggregation's eviction bound: a view-hour
    window can keep receiving JOIN OUTPUT until the watermark passes
    ``view.ts + attribution_window`` (a click up to 24 h later still
    lands in that view's hour), so the join delays its OUTPUT watermark
    by its state-retention interval and the downstream agg finalizes
    windows only below ``least(max view ts, max click ts) - delay -
    24 h`` — measured, and exactly what the oracle encodes (using the
    un-delayed k15 bound over-reports 8 fixture windows and flips the
    hash). This is why pre-SPARK-40925 Spark rejected agg-after-join
    outright: correctness REQUIRES the per-operator watermark
    bookkeeping.

    Scale: join state O(window · rate) per user key as k6; agg state is
    per open hour window — bounded by the SAME delayed watermark, a few
    hundred windows deep at a 24 h attribution horizon."""
    return _run_append_stream(spark, sf_dir, joined_hourly).orderBy(
        "hour_ts"
    )


def semi_attribution(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """K27 join body: the attributed-VIEWS set — each view emitted at
    most ONCE, when a qualifying click proves it converted; click
    payloads never enter the output. Spark's left-semi stream-stream
    join keeps the k6 dual-sided state machine but stores only a
    matched bit on the view side and emits on first match."""
    v = _with_event_time(views).withWatermark("ts", WATERMARK).alias("v")
    c = _with_event_time(clicks).withWatermark("ts", WATERMARK).alias("c")
    return v.join(
        c,
        F.expr(
            f"""
            v.user_id = c.user_id
            AND c.ts > v.ts
            AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL}
            """
        ),
        "left_semi",
    ).select(
        F.col("v.event_id").alias("view_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        r4(F.col("v.value")).alias("view_value"),
    )


@query(
    "k27_stream_semi_join",
    oracle=f"""
    SELECT v.event_id AS view_id, v.user_id AS user_id,
           v.ts AS view_ts, round(v.value, 4) AS view_value
    FROM events v
    WHERE v.event_type = 'view'
      AND EXISTS (
        SELECT 1 FROM events c
        WHERE c.event_type = 'click' AND c.user_id = v.user_id
          AND c.ts > v.ts AND c.ts <= v.ts + {ATTRIBUTION_WINDOW_SQL})
    ORDER BY view_id
    """,
)
def k27_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K27 — stream-stream LEFT SEMI interval join: the third join
    flavor beside k6's inner (per-pair) and k15/k17's outers
    (watermark-manufactured NULLs). Semi is the CONVERSION-SET shape —
    "which views converted?" — and its state story differs from both:
    the view side buffers a matched BIT instead of accumulating
    emitted pairs (a view with 50 qualifying clicks emits once, not
    50 times), and no row is ever watermark-manufactured, so the
    emitted set equals the batch EXISTS the oracle computes (the k6
    emission argument: every match is visible once both sides ingest).
    A duplicate emission per extra click — the inner-join shortcut —
    is the hash flip this entry exists to catch.

    Scale: state is O(window · arrival rate) per key like k6, but the
    output (and any downstream consumer) is bounded by the VIEW
    stream's cardinality, never the match multiplicity."""
    return _run_append_stream(spark, sf_dir, semi_attribution).orderBy(
        "view_id"
    )


# --------------------------------------------------------------------------
# K32 — stream-static TEMPORAL join against an SCD-2 dimension
# (round-14 surface, library-first; the @query registration is one
# decorator away). k9 is the equi-key enrichment; this is the Kimball
# temporal form: each arriving event picks the dimension row valid AT
# ITS EVENT TIME (cohort equality + ts within [valid_from, valid_to)),
# not the current row — the join every fact pipeline with
# slowly-changing attributes needs. Stateless like k9 (the static side
# re-reads/broadcasts per micro-batch); only the downstream aggregate
# holds state.
#
# Scale: the dimension is rows-per-entity x eras — broadcast at any
# real dimension size; the range predicate evaluates per-row inside
# the broadcast hash join's stream side, no extra shuffle.
# --------------------------------------------------------------------------
K32_MID = "2024-01-15 00:00:00"
K32_LO = "2024-01-01 00:00:00"
K32_HI = "2024-02-01 00:00:00"
K32_COHORTS = 10

K32_ORACLE = f"""
    WITH dim AS (
      SELECT c AS cohort, 't' || (c % 3) AS tier, 'early' AS era,
             TIMESTAMP '{K32_LO}' AS vf, TIMESTAMP '{K32_MID}' AS vt
      FROM range(0, {K32_COHORTS}) t(c)
      UNION ALL
      SELECT c, 't' || ((c + 1) % 3), 'late',
             TIMESTAMP '{K32_MID}', TIMESTAMP '{K32_HI}'
      FROM range(0, {K32_COHORTS}) t(c))
    SELECT d.tier, d.era, count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e
    JOIN dim d ON e.user_id % {K32_COHORTS} = d.cohort
              AND e.ts >= d.vf AND e.ts < d.vt
    GROUP BY 1, 2 ORDER BY tier, era
"""


def scd2_dim(spark: SparkSession) -> DataFrame:
    """The synthetic two-era SCD-2 dimension both engines derive from
    the same integer formula (cohort = user_id % 10; the tier ROTATES
    at the era boundary, so events on either side of it must route to
    different tiers or the census flips)."""
    c = F.col("id")
    era1 = spark.range(K32_COHORTS).select(
        c.alias("cohort"),
        F.concat(F.lit("t"), (c % 3).cast("string")).alias("tier"),
        F.lit("early").alias("era"),
        F.lit(K32_LO).cast("timestamp").alias("vf"),
        F.lit(K32_MID).cast("timestamp").alias("vt"),
    )
    era2 = spark.range(K32_COHORTS).select(
        c.alias("cohort"),
        F.concat(F.lit("t"), ((c + 1) % 3).cast("string")).alias("tier"),
        F.lit("late").alias("era"),
        F.lit(K32_MID).cast("timestamp").alias("vf"),
        F.lit(K32_HI).cast("timestamp").alias("vt"),
    )
    return era1.unionByName(era2)


def k32_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K32 (banked): per-(tier, era) totals over the events stream
    temporally joined to the SCD-2 dimension — a closed/open boundary
    flip at the era edge, a join on the CURRENT row instead of the
    event-time row, or a lost era flips the hash."""
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        _run_complete_stream,
    )

    dim = F.broadcast(scd2_dim(spark))

    def enrich_agg(events: DataFrame) -> DataFrame:
        e = _with_event_time(events)
        joined = e.join(
            dim,
            (e["user_id"] % K32_COHORTS == dim["cohort"])
            & (e["ts"] >= dim["vf"])
            & (e["ts"] < dim["vt"]),
        )
        return joined.groupBy("tier", "era").agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )

    return _run_complete_stream(spark, sf_dir, enrich_agg).orderBy(
        "tier", "era"
    )
