"""Streaming ingest into the snapshot-versioned table — the production
corpus-build loop, end to end: an unbounded feed lands as a sequence of
immutable, individually time-travelable versions.

Composes three pieces the engine already proves separately:

- k12's idempotent-foreachBatch discipline (a batch-id ledger absorbs
  checkpoint replays, so a crash between sink write and checkpoint
  commit cannot double-apply a batch);
- f18's atomic manifest commit (``sources/versioned.py``): each
  micro-batch becomes version N, readable forever after;
- f20's compaction then repairs the one-file-per-micro-batch layout
  this loop necessarily produces.

The reference has no streaming or storage lifecycle at all (one static
CSV through a fixed two-stage MapReduce, master.py:12-266); this is
engine surface the 100 TB training-data pipeline needs: "corpus @
version N" is pinned the moment batch N commits, while the feed keeps
running.

Scale: per batch, one distributed parquet write + one O(#files)
driver-side manifest link — commit cost is metadata-proportional, and
the ledger check is one latest-manifest read (the batch-id list rides
INSIDE the manifest, so ledger record and commit are one atomic link).
State is zero (the ingest is stateless row passthrough); exactly-once
comes from the in-manifest ledger, not from holding data in the state
store.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query, staging_key
from k_means_clustering_via_map_reduce_spark.sources import load_table

_INGEST_STAGED: dict[tuple, tempfile.TemporaryDirectory] = {}


def ensure_staged(spark: SparkSession, sf_dir: str) -> None:
    """PUBLIC staging entrypoint: both ingest feeds (k21's three-batch
    feed and k22's two-sided feeds), shared by the queries and
    bench.py's prestage (round-12 ADVICE #3)."""
    _stage_ingest_feed(spark, sf_dir)
    _stage_k22_feeds(spark, sf_dir)


def _stage_ingest_feed(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as three mtime-ordered single-file batches (split
    by event_id % 3) so the micro-batch sequence is deterministic."""
    key = staging_key(sf_dir, "events")
    if key not in _INGEST_STAGED:
        tmp = tempfile.TemporaryDirectory(prefix="kmce_ingest_feed_")
        src = os.path.join(tmp.name, "src")
        os.makedirs(src)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        for i in range(3):
            stage = os.path.join(tmp.name, f"w{i}")
            ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.parquet(
                stage
            )
            part = next(f for f in os.listdir(stage) if f.startswith("part-"))
            dst = os.path.join(src, f"{i}-slice.parquet")
            os.rename(os.path.join(stage, part), dst)
            os.utime(dst, (1_700_000_000 + 60 * i,) * 2)
        _INGEST_STAGED[key] = tmp
    return os.path.join(_INGEST_STAGED[key].name, "src")


def commit_batch_versioned(
    batch_df: DataFrame, batch_id: int, root: str
) -> bool:
    """foreachBatch body: commit one micro-batch as a new table version,
    EXACTLY once. The batch id rides inside the manifest itself (the
    Delta txn-action idiom, ``commit_append(batch_id=...)``), so the
    ledger record and the version commit are one atomic ``os.link`` —
    there is no crash order that applies a batch twice: replay of a
    committed batch → its id is in the latest manifest's cumulative
    ``batches`` list → skip; crash after the data write but before the
    manifest link → orphan files no reader sees (vacuum reclaims), and
    the replay commits cleanly. The round-6 design wrote a separate
    ``applied/<batch_id>`` marker after the link, leaving a window
    where a replay added a duplicate version; that window no longer
    exists. Returns whether the batch was applied."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        applied_batches,
        commit_append,
    )

    if batch_id in applied_batches(root):
        return False
    commit_append(batch_df, root, batch_id=batch_id)
    return True


def run_versioned_ingest(
    spark: SparkSession, src: str, root: str, checkpoint: str
) -> None:
    """Drain the staged feed into the versioned table, one file per
    micro-batch, through a durable checkpoint (restartable)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: commit_batch_versioned(df, bid, root)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@query(
    "k21_stream_versioned_ingest",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def stream_versioned_ingest_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K21: drain the three-batch events feed into a versioned table
    via foreachBatch commits, then aggregate the LATEST version's
    time-travel read. The terminal read must equal the batch aggregate
    over all events — a lost batch, a double-committed replay, or a
    reader that lists the data directory (seeing an in-flight txn's
    files) all flip the hash. Version-per-batch and restart-idempotency
    are pytest-pinned (tests/test_streaming_ingest.py)."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_version,
    )
    from k_means_clustering_via_map_reduce_spark.streaming.windows import r4

    src = _stage_ingest_feed(spark, sf_dir)
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_vingest_", dir=ckpt_base
    ) as tmp:
        root = os.path.join(tmp, "table")
        run_versioned_ingest(
            spark, src, root, os.path.join(tmp, "ckpt")
        )
        result = (
            read_version(spark, root)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                r4(F.sum("value")).alias("total_value"),
            )
            .localCheckpoint(eager=True)
        )
    return result.orderBy("event_type")


# --------------------------------------------------------------------------
# K22 — stream-stream JOIN chained into the versioned-table sink. The full
# production attribution pipeline: two live feeds → watermarked
# interval join → idempotent versioned commits — k15's join semantics
# composed with k21's storage lifecycle, so "attributed pairs @ version
# N" is pinned the moment batch N lands while both feeds keep running.
# --------------------------------------------------------------------------


def run_joined_versioned_ingest(
    spark: SparkSession,
    view_src: str,
    click_src: str,
    root: str,
    checkpoint: str,
    window_sql: str = "INTERVAL 5 MINUTES",
    delay: str = "10 minutes",
) -> list[dict]:
    """Drain two staged feeds through a watermarked inner interval join
    (click strictly after its same-user view, within ``window_sql``)
    into per-batch versioned commits. Rows are held in join state until
    the two-sided watermark proves them complete, so a batch's commit
    contains only FINALIZED pairs — a terminal far-future tick on both
    feeds (the k10/k18 idiom) flushes everything; ticks themselves
    never join (disjoint sentinel users).

    Scale: join state is O(window × rate) per side (measured flat in
    BASELINE.md's round-6 join-state arm AND the round-7 versioned-sink
    arm, scripts/streaming_state_probe.py --ingest-join); commit cost
    is k21's metadata-proportional manifest link. State and storage
    concerns stay decoupled — the sink never holds rows back and the
    join never touches disk layout.

    Returns the run's streaming progress events (state-probe input;
    query callers ignore them)."""

    def _stream(src: str) -> DataFrame:
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    v = _stream(view_src).withWatermark("ts", delay).alias("v")
    c = _stream(click_src).withWatermark("ts", delay).alias("c")
    joined = v.join(
        c,
        F.expr(
            f"v.user_id = c.user_id AND c.ts > v.ts "
            f"AND c.ts <= v.ts + {window_sql}"
        ),
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("v.ts").cast("timestamp_ntz").alias("view_ts"),
        F.col("c.ts").cast("timestamp_ntz").alias("click_ts"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            joined.writeStream.foreachBatch(
                lambda df, bid: commit_batch_versioned(df, bid, root)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return list(q.recentProgress or [])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


_K22_STAGED: dict[tuple, tempfile.TemporaryDirectory] = {}


def stage_events_side_timesliced(
    spark: SparkSession, sf_dir: str, root: str, etype: str, n_slices: int = 3
) -> str:
    """Stage one event_type's rows as ``n_slices`` mtime-ordered,
    TIME-ORDERED parquet slices (the real queue order). The slicing
    axis is load-bearing: an id-split would make every later batch late
    against the first batch's watermark and the stream-stream join
    would silently DROP its rows — with time-ordered slices a view
    evicts only once no future click can match it, so the landed join
    equals the batch join with no eviction bound."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == etype)
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
        )
    )
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).collect()[0]
    span = max(1, (hi - lo + 1) // n_slices)
    src = os.path.join(root, etype)
    os.makedirs(src)
    for i in range(n_slices):
        s_lo = lo + i * span
        s_hi = hi + 1 if i == n_slices - 1 else lo + (i + 1) * span
        df = ev.filter(
            (F.col("ts").cast("long") >= s_lo)
            & (F.col("ts").cast("long") < s_hi)
        ).coalesce(1)
        stage = os.path.join(root, f"stage_{etype}_{i}")
        df.write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        dst = os.path.join(src, f"{i}-slice.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + 60 * i,) * 2)
    return src


def _stage_k22_feeds(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    key = staging_key(sf_dir, "events")
    if key not in _K22_STAGED:
        tmp = tempfile.TemporaryDirectory(prefix="kmce_k22_feed_")
        stage_events_side_timesliced(spark, sf_dir, tmp.name, "view")
        stage_events_side_timesliced(spark, sf_dir, tmp.name, "click")
        _K22_STAGED[key] = tmp
    base = _K22_STAGED[key].name
    return os.path.join(base, "view"), os.path.join(base, "click")


@query(
    "k22_joined_versioned_ingest",
    oracle="""
    WITH j AS (
      SELECT v.event_id AS view_id, c.event_id AS click_id,
             v.user_id AS user_id
      FROM events v JOIN events c ON v.user_id = c.user_id
       AND v.event_type = 'view' AND c.event_type = 'click'
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
           min(view_id) AS first_view, max(click_id) AS last_click
    FROM j GROUP BY user_id ORDER BY user_id
    """,
)
def k22_joined_versioned_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K22: the full production attribution pipeline — two live feeds
    (views, clicks, staged in time-ordered slices) → watermarked 24h
    interval join → exactly-once versioned commits → per-user aggregate
    of the LANDED table. The oracle is the plain DuckDB batch join: it
    matches only if the streaming join finalized every pair (no
    watermark drop, no speculative emission) AND the sink committed
    each batch exactly once. Version-prefix monotonicity, restart
    no-ops, and the id-split staging trap are pinned in
    tests/test_streaming_ingest.py.

    Scale: join state is O(window x rate) per side (the round-6
    BASELINE.md join-state arm measured it exactly flat); commit cost
    is k21's metadata-proportional manifest link; the batch-id ledger
    rides inside the manifest, so replay protection adds zero I/O."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_version,
    )

    vsrc, csrc = _stage_k22_feeds(spark, sf_dir)
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_k22_", dir=ckpt_base
    ) as tmp:
        root = os.path.join(tmp, "table")
        run_joined_versioned_ingest(
            spark, vsrc, csrc, root, os.path.join(tmp, "ckpt"),
            window_sql="INTERVAL 24 HOUR",
        )
        result = (
            read_version(spark, root)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.min("view_id").alias("first_view"),
                F.max("click_id").alias("last_click"),
            )
            .localCheckpoint(eager=True)
        )
    return result.orderBy("user_id")


# --------------------------------------------------------------------------
# K28 — PINNED-SNAPSHOT stream enrichment (round-11 bank, library-
# first). Spark's stream-static join re-resolves the static side
# every micro-batch — correct for "current state" enrichment, but a
# REPRODUCIBLE training pipeline must enrich against a PINNED
# dimension snapshot while the dim keeps evolving under it. The
# versioned store's time travel supplies exactly that: the batch
# handler joins each micro-batch BOTH ways — against read_version(v1)
# (pinned) and read_version(latest) (evolving) — while a COW UPDATE
# bumps every multiplier between batches, so the two sums diverge in
# a deterministic staircase. A time-travel read that silently
# resolves to latest makes pinned == evolving and flips the oracle.
#
# Deterministic schedule: the k10 idiom — one file per micro-batch
# (mtime-ordered thirds by event_id % 3), AvailableNow; foreachBatch
# runs sequentially on the driver, so dim version at batch i is
# exactly 1 + i. Integer cents end to end.
#
# Scale: the dim side is broadcast-sized; the pinned read costs the
# same scan either way (time travel is manifest metadata); state is
# zero (plain per-batch joins).
# --------------------------------------------------------------------------
K28_ORACLE = """
    WITH e AS (
      SELECT event_id % 3 AS batch, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_type,
           CAST(sum(cents) AS BIGINT) AS pinned_cents,
           CAST(sum(cents * (1 + batch)) AS BIGINT) AS evolving_cents
    FROM e GROUP BY event_type ORDER BY event_type
"""


@query("k28_pinned_enrich", oracle=K28_ORACLE)
def k28_pinned_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K28 (banked): per-type revenue under a pinned dim snapshot vs
    the evolving head, while the dim takes a COW update between every
    micro-batch."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        read_version,
        update_where,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_k28_", dir=ckpt_base
    ) as tmp:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i in range(3):
            stage = os.path.join(tmp, f"w{i}")
            ev.filter(F.col("event_id") % 3 == i).coalesce(1)\
                .write.parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.startswith("part-")
            )
            dst = os.path.join(src, f"{i}-third.parquet")
            os.rename(os.path.join(stage, part), dst)
            os.utime(dst, (1_700_000_000 + 60 * i,) * 2)
        dim_root = os.path.join(tmp, "dim")
        types = ev.select("event_type").distinct()
        commit_append(
            types.withColumn("mult", F.lit(1).cast("bigint")), dim_root
        )
        out_dir = os.path.join(tmp, "out")
        os.makedirs(out_dir)

        def handle(batch_df, bid: int) -> None:
            pinned = read_version(spark, dim_root, 1)
            latest = read_version(spark, dim_root)
            joined = (
                batch_df.join(
                    F.broadcast(
                        pinned.withColumnRenamed("mult", "pmult")
                    ),
                    "event_type",
                )
                .join(
                    F.broadcast(
                        latest.withColumnRenamed("mult", "lmult")
                    ),
                    "event_type",
                )
                .groupBy("event_type")
                .agg(
                    F.sum(F.col("cents") * F.col("pmult")).alias(
                        "pinned_cents"
                    ),
                    F.sum(F.col("cents") * F.col("lmult")).alias(
                        "evolving_cents"
                    ),
                )
            )
            joined.write.parquet(os.path.join(out_dir, f"b{bid}"))
            # the dim EVOLVES after every batch: head moves, the pin
            # must not
            update_where(spark, dim_root, "mult >= 0",
                         {"mult": "mult + 1"})

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option(
                "checkpointLocation", os.path.join(tmp, "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.read.parquet(
                *[
                    os.path.join(out_dir, d)
                    for d in sorted(os.listdir(out_dir))
                ]
            )
            .groupBy("event_type")
            .agg(
                F.sum("pinned_cents").alias("pinned_cents"),
                F.sum("evolving_cents").alias("evolving_cents"),
            )
            .localCheckpoint(eager=True)
        )
    return result.orderBy("event_type")
