"""Watermark-semantics queries: results that DEPEND on late-data drops
and append-mode eviction, driver-checkable against a SQL oracle.

The other streaming entries (k4/k5/k7-k9) replay the whole events table
in AvailableNow mode, where the terminal state equals a batch aggregate
— correct, but the watermark never *changes* the answer, so a broken
watermark would pass those oracles. The queries here stage a
deterministic THREE-BATCH feed where it does:

- batch 0 ``0-ontime``: the even-``event_id`` half of events;
- batch 1 ``1-tick``: one synthetic row at max(on-time ts) + 3 h whose
  only job is to advance the watermark (its own window/key never
  surfaces in either query's output);
- batch 2 ``2-late``: the odd half shifted BACK 30 minutes (late
  arrivals) plus UNSHIFTED copies of the last-10-minutes on-time rows
  (duplicate keys that are late-but-admissible).

Spark's stateful operators use TWO watermarks per micro-batch
(SPARK-40925): late events are filtered with the PREVIOUS batch's
watermark, eviction/emission uses the current one. With
``maxFilesPerTrigger=1`` + forced file modification times the batch
sequence is exact, so both are pure functions of the data:

    wm1 = ms_floor(max on-time ts) - 10 min   (late filter for batch 2)
    wm2 = ms_floor(tick ts)        - 10 min   (final eviction)

(Spark's event-time stats are millisecond-floored; the oracles
replicate with ``date_trunc('milliseconds', ...)``.) Batch-2 rows
whose hour window closed at or before wm1 are DROPPED; the tick's own
window ends after wm2 so append mode withholds it — both effects are
deterministic SQL over the events table, which is exactly what the
DuckDB oracles compute.

Scale: identical shape to the k4 production path — per-window/per-key
state bounded by the watermark horizon, shuffle hashed on the state
key; the staged three-file feed is a fixture-scale stand-in for the
out-of-order bucket listings any 100 TB/day ingest actually sees.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query, r4
from k_means_clustering_via_map_reduce_spark.sources import load_table

WATERMARK_DELAY = "10 minutes"
LATE_SHIFT = "30 minutes"

_LATE_STAGED: dict[str, tempfile.TemporaryDirectory] = {}


def ensure_staged(spark: SparkSession, sf_dir: str) -> str:
    """PUBLIC staging entrypoint: the late-data queries and bench.py's
    prestage share this one path (round-12 ADVICE #3)."""
    return _stage_late_feed(spark, sf_dir)


def _stage_late_feed(spark: SparkSession, sf_dir: str) -> str:
    """Stage the three-batch feed as three single-part parquet files
    whose modification times force processing order. ``coalesce(1)``
    guarantees one part file per batch so the watermark sequence is a
    data-only function. Staged once per (process, sf_dir, source
    mtime)."""
    from k_means_clustering_via_map_reduce_spark.queries import staging_key

    key = staging_key(sf_dir, "events")
    if key not in _LATE_STAGED:
        tmp = tempfile.TemporaryDirectory(prefix="kmce_late_feed_")
        src = os.path.join(tmp.name, "src")
        os.makedirs(src)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            # Watermarks demand TIMESTAMP; UTC session tz makes the
            # NTZ->LTZ cast wall-clock-preserving (see windows.py).
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        ontime = ev.filter(F.col("event_id") % 2 == 0)
        # One driver-side scalar (the on-time max) parameterizes the
        # tick and the duplicate window — K-row collect, any scale.
        max_ts = ontime.agg(F.max("ts")).collect()[0][0]
        tick = spark.createDataFrame(
            [(-1, max_ts, -1, "tick", 0.0)], schema=ontime.schema
        ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 3 HOURS"))
        late = (
            ev.filter(F.col("event_id") % 2 == 1)
            .withColumn("ts", F.col("ts") - F.expr(f"INTERVAL {LATE_SHIFT}"))
            .unionAll(
                ontime.filter(
                    F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
                )
            )
        )
        for i, (tag, df) in enumerate(
            [("ontime", ontime), ("tick", tick), ("late", late)]
        ):
            stage = os.path.join(tmp.name, f"w{i}")
            df.coalesce(1).write.parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.startswith("part-")
            )
            dst = os.path.join(src, f"{i}-{tag}.parquet")
            os.rename(os.path.join(stage, part), dst)
            # The file source orders candidates by mod time; pin them a
            # minute apart so batch order never ties.
            os.utime(dst, (1_700_000_000 + 60 * i,) * 2)
        _LATE_STAGED[key] = tmp
    return os.path.join(_LATE_STAGED[key].name, "src")


def _run_feed_append(spark: SparkSession, src: str, transform) -> DataFrame:
    """Run ``transform(stream)`` over the staged feed one file per
    micro-batch (AvailableNow honors the read limit), append mode to a
    memory sink, and return the emission log."""
    name = f"late_{uuid.uuid4().hex[:12]}"
    schema = spark.read.parquet(src).schema
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_stream_", dir=ckpt_base
    ) as tmp:
        # Same stateful-stage sizing rationale as windows.py: state
        # store count scales with shuffle partitions, not data.
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            q = (
                transform(stream)
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


# Shared oracle prelude: the on-time half, its max, and the batch-2
# late-filter watermark wm1 (ms-floored max minus the delay).
_FEED_CTES = """
    even AS (
      SELECT event_id, ts, user_id, event_type, value
      FROM events WHERE event_id % 2 = 0
    ),
    mx AS (
      SELECT max(ts) AS m,
             date_trunc('milliseconds', max(ts)) - INTERVAL 10 MINUTE AS w1
      FROM even
    )
"""


# The watermark-semantics oracle, shared by k10 (memory sink) and k11
# (durable parquet file sink): surviving rows = on-time half + late
# rows whose hour window was still open at wm1 + the in-horizon
# duplicate copies; the tick's window (end past wm2) never emits.
_EVICTION_ORACLE = f"""
    WITH {_FEED_CTES},
    surviving AS (
      SELECT ts, value FROM even
      UNION ALL
      SELECT e.ts - INTERVAL 30 MINUTE AS ts, e.value
      FROM events e, mx
      WHERE e.event_id % 2 = 1
        AND date_trunc('hour', e.ts - INTERVAL 30 MINUTE) + INTERVAL 1 HOUR
            > mx.w1
      UNION ALL
      SELECT e.ts, e.value FROM even e, mx
      WHERE e.ts > mx.m - INTERVAL 10 MINUTE
    )
    SELECT date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM surviving GROUP BY 1 ORDER BY hour_ts
    """


def _hourly_agg(stream: DataFrame) -> DataFrame:
    return (
        stream.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("total_value"),
        )
    )


@query("k10_watermark_eviction", oracle=_EVICTION_ORACLE)
def watermark_eviction_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10: hourly tumbling counts in APPEND mode over the late feed.
    The result depends on the watermark three ways — batch-2 rows whose
    hour closed at or before wm1 are dropped, admissible late rows
    (shift inside the window slack, and the unshifted duplicates) merge
    into still-open windows, and the tick's own window (end past wm2)
    is withheld by append mode — so a watermark that stopped advancing,
    dropped nothing, or evicted at the wrong bound diverges from the
    oracle."""
    src = _stage_late_feed(spark, sf_dir)
    return (
        _run_feed_append(spark, src, _hourly_agg)
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
            "n_events",
            "total_value",
        )
        .orderBy("hour_ts")
    )


@query("k11_stream_parquet_sink", oracle=_EVICTION_ORACLE)
def stream_parquet_sink_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11: the same watermarked hourly aggregation as k10, but written
    through the DURABLE path — ``writeStream.format("parquet")`` with a
    real checkpoint — then read back from the sink directory. The file
    sink is the production shape (the memory sink exists only for
    oracle harnesses), so this driver-checks exactly-once append
    emission + on-disk fidelity end-to-end: the read-back must
    reproduce k10's memory-sink result row for row, which is why both
    share one oracle. Flattening (window.start -> TIMESTAMP_NTZ)
    happens BEFORE the sink so the parquet schema is the engine's
    canonical naive-UTC layout."""
    src = _stage_late_feed(spark, sf_dir)
    flat = lambda stream: _hourly_agg(stream).select(  # noqa: E731
        F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
        "n_events",
        "total_value",
    )
    with tempfile.TemporaryDirectory(prefix="kmce_psink_") as tmp:
        out = os.path.join(tmp, "out")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            stream = (
                spark.readStream.schema(spark.read.parquet(src).schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
            )
            q = (
                flat(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        # Materialize before the TemporaryDirectory (and the sink files)
        # disappear — the caller collects lazily.
        result = spark.read.parquet(out).localCheckpoint(eager=True)
    return result.orderBy("hour_ts")


@query(
    "k7b_dedup_within_watermark",
    oracle="""
    SELECT event_id, CAST(1 AS BIGINT) AS n_emit
    FROM events WHERE event_id % 2 = 0 ORDER BY event_id
    """,
)
def dedup_within_watermark_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7b: ``dropDuplicatesWithinWatermark`` on event_id over the late
    feed — the BOUNDED-STATE twin of k7's dropDuplicates (whose state
    never expires; see streaming/dedup.py). Per-key state lives only
    [ts, ts + delay], so at 100 TB/day state size tracks the watermark
    horizon, not key cardinality.

    The emission-count oracle (every even id exactly once) is sensitive
    to all three state behaviors: the 30-min-shifted odd rows are ALL
    below wm1 (shift > delay), so a broken late filter admits odd ids;
    the unshifted last-10-minute duplicates pass the late filter but
    their keys' state is still live (ts + delay outlives wm1), so a
    state store that evicted too early double-emits those ids; and the
    tick key is excluded Spark-side (sentinel id -1)."""
    src = _stage_late_feed(spark, sf_dir)

    def dedup(stream: DataFrame) -> DataFrame:
        return stream.withWatermark(
            "ts", WATERMARK_DELAY
        ).dropDuplicatesWithinWatermark(["event_id"])

    return (
        _run_feed_append(spark, src, dedup)
        .filter(F.col("event_id") >= 0)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_emit"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# K12 — foreachBatch incremental upsert: the "write to anything" sink
# arm (k11 covers the built-in file sink). Each micro-batch's per-type
# aggregate is MERGEd into a copy-on-write parquet snapshot, with a
# batch-id ledger making re-delivery a no-op — the exactly-once recipe
# Spark documents for idempotent foreachBatch sinks (checkpoint replays
# a batch after a crash; the ledger, not the sink, absorbs it).
# --------------------------------------------------------------------------
def merge_batch_into_snapshot(batch_df: DataFrame, batch_id: int,
                              root: str) -> bool:
    """Apply one micro-batch to the snapshot under ``root``:
    ``applied/<batch_id>`` ledger marker → skip if present (idempotent
    replay); else full-outer MERGE of the batch's per-type aggregate
    into the latest ``snap-<n>`` and write ``snap-<batch_id>``.
    Returns whether the batch was applied.

    Scale: the snapshot is (event-type cardinality) rows — the merge
    join is broadcast-sized by construction. For a 100 TB/day keyspace
    the same loop writes partition-level copy-on-write (dynamic
    partition overwrite on the merge keys' partitions) instead of a
    whole-snapshot rewrite — f6 documents that shape batch-side."""
    import glob as _glob

    spark = batch_df.sparkSession
    applied = os.path.join(root, "applied")
    os.makedirs(applied, exist_ok=True)
    marker = os.path.join(applied, str(batch_id))
    if os.path.exists(marker):
        return False
    delta = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_events"),
        F.sum("value").alias("d_value"),
    )
    # Merge ONLY onto snapshots from EARLIER batches. A crash between
    # the snapshot write and the ledger write leaves snap-<batch_id> on
    # disk without a marker; on replay, merging onto that half-committed
    # snapshot would double-apply the batch — deriving snap-<batch_id>
    # from its predecessor again is idempotent instead.
    snaps = sorted(
        (
            p
            for p in _glob.glob(os.path.join(root, "snap-*"))
            if int(p.rsplit("-", 1)[1]) < batch_id
        ),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    if snaps:
        prev = spark.read.parquet(snaps[-1])
    else:
        prev = spark.createDataFrame(
            [], "event_type STRING, n_events BIGINT, total_value DOUBLE"
        )
    merged = (
        prev.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (
                F.coalesce(F.col("n_events"), F.lit(0))
                + F.coalesce(F.col("d_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("total_value"), F.lit(0.0))
                + F.coalesce(F.col("d_value"), F.lit(0.0))
            ).alias("total_value"),
        )
    )
    merged.write.mode("overwrite").parquet(
        os.path.join(root, f"snap-{batch_id}")
    )
    with open(marker, "w") as fh:
        fh.write("applied")
    return True


@query(
    "k12_foreachbatch_upsert",
    oracle=f"""
    WITH {_FEED_CTES},
    feed AS (
      SELECT event_type, value FROM even
      UNION ALL
      SELECT 'tick' AS event_type, 0.0 AS value
      UNION ALL
      SELECT event_type, value FROM events WHERE event_id % 2 = 1
      UNION ALL
      SELECT e.event_type, e.value FROM events e, mx
      WHERE e.event_id % 2 = 0 AND e.ts > mx.m - INTERVAL 10 MINUTE
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM feed GROUP BY event_type ORDER BY event_type
    """,
)
def foreachbatch_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K12: stream the three-batch feed through ``foreachBatch``,
    merge-upserting each batch's per-type aggregate into a parquet
    snapshot guarded by a batch-id ledger. After the stream drains,
    batch 0 is RE-DELIVERED by hand — the crash-replay case — and must
    be a ledger no-op: if the guard fails, the even half double-counts
    and the oracle compare breaks, so idempotency itself is
    driver-checked, not just asserted in pytest. No watermark is
    involved (foreachBatch sees every row; k10/k11 pin eviction), so
    the oracle is the plain per-type aggregate of the full feed."""
    src = _stage_late_feed(spark, sf_dir)
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(
        prefix="kmce_upsert_", dir=ckpt_base
    ) as tmp:
        root = os.path.join(tmp, "state")
        os.makedirs(root)
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_batch_into_snapshot(df, bid, root)
            )
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # Crash-replay simulation: re-deliver batch 0's exact data with
        # its original batch id. The ledger must reject it.
        batch0 = spark.read.parquet(os.path.join(src, "0-ontime.parquet"))
        # Explicit raise (not `assert`) so the driver-checked idempotency
        # probe survives `python -O`, which strips asserts entirely.
        if merge_batch_into_snapshot(batch0, 0, root) is not False:
            raise AssertionError(
                "ledger accepted a replayed batch id — exactly-once "
                "idempotency probe failed"
            )
        import glob as _glob

        snaps = sorted(
            _glob.glob(os.path.join(root, "snap-*")),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        result = (
            spark.read.parquet(snaps[-1])
            .select(
                "event_type",
                "n_events",
                r4(F.col("total_value")).alias("total_value"),
            )
            .localCheckpoint(eager=True)
        )
    return result.orderBy("event_type")
