"""K4 streaming tests: batch-equivalence via the oracle harness runs in
test_queries_oracle; here — deterministic replay of a watermarking stream
and late-data drop semantics (SURVEY.md §5.2-6)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.streaming.windows import (
    run_incremental,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, schema="event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, value DOUBLE"
    ).coalesce(1).write.mode("append").parquet(path)


def _agg(stream):
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").cast("timestamp_ntz").alias("ws"), "n")
    )


@pytest.mark.timeout(300)
def test_watermark_drops_late_rows_in_append_mode(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 5)

    with tempfile.TemporaryDirectory(prefix="kmce_stream_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # Batch 1: events in hour 0 and hour 2. Watermark advances to
        # max(ts) - 10min = 02:05-0:10 → hour-0 window closes and emits.
        _write_batch(
            spark,
            src,
            [
                (1, t0, 10, 1.0),
                (2, t0 + dt.timedelta(minutes=10), 10, 1.0),
                (3, t0 + dt.timedelta(hours=2), 11, 1.0),
            ],
        )
        q, name = run_incremental(spark, src, _agg)
        try:
            q.processAllAvailable()
            emitted_1 = {r["ws"]: r["n"] for r in spark.table(name).collect()}
            # Hour-0 window (2 events) must be finalized and emitted.
            assert emitted_1.get(dt.datetime(2024, 1, 1, 0, 0)) == 2

            # Batch 2: a LATE hour-0 event (beyond watermark) plus a new
            # hour-3 event to advance time further.
            _write_batch(
                spark,
                src,
                [
                    (4, t0 + dt.timedelta(minutes=1), 12, 1.0),  # late, dropped
                    (5, t0 + dt.timedelta(hours=3), 11, 1.0),
                ],
            )
            q.processAllAvailable()
            # Another empty-ish batch so hour-2 can finalize via the new
            # watermark.
            _write_batch(spark, src, [(6, t0 + dt.timedelta(hours=4), 11, 1.0)])
            q.processAllAvailable()
            time.sleep(0.5)
            final = {r["ws"]: r["n"] for r in spark.table(name).collect()}
            # The late event must NOT bump hour 0 — append mode emitted it
            # once, count stays 2 and no duplicate/updated row appears.
            hour0_rows = [
                r for r in spark.table(name).collect()
                if r["ws"] == dt.datetime(2024, 1, 1, 0, 0)
            ]
            assert len(hour0_rows) == 1
            assert hour0_rows[0]["n"] == 2
            # Hour-2 window eventually emitted with exactly 1 event.
            assert final.get(dt.datetime(2024, 1, 1, 2, 0)) == 1
        finally:
            q.stop()
            spark.catalog.dropTempView(name)


def _last_state_rows(q) -> int:
    """numRowsTotal of the stateful operator from the most recent
    progress event that carries one — the observable for watermark-driven
    state EVICTION (complete-mode tests can never see this shrink)."""
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            return int(ops[0]["numRowsTotal"])
    raise AssertionError("no stateOperators in any progress event")


@pytest.mark.timeout(300)
def test_sliding_append_watermark_eviction(spark):
    """Overlapping (1h/30m) windows driven file-by-file in APPEND mode —
    the unbounded-stream execution shape: on-time windows emit exactly
    once when the watermark passes their end, a beyond-watermark row is
    dropped (not merged, not re-emitted), and closed windows leave the
    state store (numRowsTotal shrinks back to the open-window count
    instead of growing monotonically)."""
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        sliding_agg,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def agg(stream):
        return sliding_agg(stream.withColumn("event_type", F.lit("e"))).select(
            F.col("win.start").cast("timestamp_ntz").alias("ws"), "n_events"
        )

    with tempfile.TemporaryDirectory(prefix="kmce_slide_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # Two hour-0 events: each lands in windows starting 23:30 and
        # 00:00 → 2 open window states.
        _write_batch(
            spark,
            src,
            [
                (1, t0 + dt.timedelta(minutes=5), 1, 1.0),
                (2, t0 + dt.timedelta(minutes=20), 1, 1.0),
            ],
        )
        q, name = run_incremental(spark, src, agg)
        try:
            q.processAllAvailable()
            assert spark.table(name).count() == 0  # nothing closed yet
            # 02:00 event → watermark 01:50 → both hour-0 windows close
            # and emit; its own 2 windows replace them in state.
            _write_batch(spark, src, [(3, t0 + dt.timedelta(hours=2), 1, 1.0)])
            q.processAllAvailable()
            emitted = {r["ws"]: r["n_events"] for r in spark.table(name).collect()}
            assert emitted == {
                dt.datetime(2023, 12, 31, 23, 30): 2,
                dt.datetime(2024, 1, 1, 0, 0): 2,
            }
            # A LATE hour-0 row (far beyond the 01:50 watermark) + an
            # advancer. The late row must not re-open, bump, or re-emit
            # the closed hour-0 windows.
            _write_batch(
                spark,
                src,
                [
                    (4, t0 + dt.timedelta(minutes=7), 2, 1.0),  # dropped
                    (5, t0 + dt.timedelta(hours=4), 1, 1.0),
                ],
            )
            q.processAllAvailable()
            rows = spark.table(name).collect()
            hour0 = [r for r in rows if r["ws"].day == 31 or r["ws"].hour == 0]
            assert {r["ws"]: r["n_events"] for r in hour0} == {
                dt.datetime(2023, 12, 31, 23, 30): 2,
                dt.datetime(2024, 1, 1, 0, 0): 2,
            }
            assert len(hour0) == 2, "closed windows re-emitted"
            # 6 window states existed over the run; only event 5's two
            # windows may remain open → eviction actually happened.
            assert _last_state_rows(q) == 2
        finally:
            q.stop()
            spark.catalog.dropTempView(name)


@pytest.mark.timeout(300)
def test_session_append_merge_and_eviction(spark):
    """Session windows (30m gap) in APPEND mode: an out-of-order event
    INSIDE the watermark bridges two open sessions into one (emitted as
    a single merged row), a beyond-watermark event is dropped instead of
    resurrecting a closed session, and closed sessions are evicted from
    the state store."""
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        session_agg_streaming,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)

    def agg(stream):
        return session_agg_streaming(stream).select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("ss"),
            F.col("sw.end").cast("timestamp_ntz").alias("se"),
            "n_events",
        )

    with tempfile.TemporaryDirectory(prefix="kmce_sess_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # u1: one session of 2 events; u2: one session. Watermark 00:00.
        _write_batch(
            spark,
            src,
            [
                (1, t0, 1, 1.0),
                (2, t0 + dt.timedelta(minutes=10), 1, 1.0),
                (3, t0 + dt.timedelta(minutes=5), 2, 1.0),
            ],
        )
        q, name = run_incremental(spark, src, agg)
        try:
            q.processAllAvailable()
            assert spark.table(name).count() == 0
            # u4 at 01:00 and 01:32: gap 32m → TWO open sessions.
            # Watermark → 01:22, so u1 (end 00:40) and u2 (end 00:35)
            # close and emit.
            _write_batch(
                spark,
                src,
                [
                    (4, t0 + dt.timedelta(hours=1), 4, 1.0),
                    (5, t0 + dt.timedelta(hours=1, minutes=32), 4, 1.0),
                ],
            )
            q.processAllAvailable()
            emitted = {
                (r["user_id"], r["ss"]): r["n_events"]
                for r in spark.table(name).collect()
            }
            assert emitted == {
                (1, t0): 2,
                (2, t0 + dt.timedelta(minutes=5)): 1,
            }
            # 01:25 is ABOVE the 01:22 watermark and within 30m of both
            # u4 sessions → the session-MERGE path fuses them. 04:00
            # advances the watermark so the merged session closes.
            _write_batch(
                spark,
                src,
                [
                    (6, t0 + dt.timedelta(hours=1, minutes=25), 4, 1.0),
                    (7, t0 + dt.timedelta(hours=4), 5, 1.0),
                ],
            )
            q.processAllAvailable()
            u4 = [r for r in spark.table(name).collect() if r["user_id"] == 4]
            assert len(u4) == 1, "bridged sessions emitted separately"
            assert u4[0]["n_events"] == 3
            assert u4[0]["ss"] == t0 + dt.timedelta(hours=1)
            assert u4[0]["se"] == t0 + dt.timedelta(hours=2, minutes=2)
            # LATE u1 row (watermark is 03:50) must not resurrect u1's
            # closed session; u6 advances the watermark past u5's end.
            _write_batch(
                spark,
                src,
                [
                    (8, t0 + dt.timedelta(minutes=20), 1, 1.0),  # dropped
                    (9, t0 + dt.timedelta(hours=5), 6, 1.0),
                ],
            )
            q.processAllAvailable()
            u1 = [r for r in spark.table(name).collect() if r["user_id"] == 1]
            assert len(u1) == 1 and u1[0]["n_events"] == 2
            # 5 sessions existed; only u6's open session may remain.
            assert _last_state_rows(q) == 1
        finally:
            q.stop()
            spark.catalog.dropTempView(name)


def test_session_window_gap_boundary(spark):
    """An event exactly `gap` after the last one starts a NEW session
    (Spark merges only when ts < previous end)."""
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        session_windows,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0, 1, 1.0),
            (2, t0 + dt.timedelta(minutes=29, seconds=59), 1, 1.0),  # merges
            (3, t0 + dt.timedelta(minutes=59, seconds=59) + dt.timedelta(minutes=30), 1, 1.0),  # exactly at end → new
        ],
        schema="event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, value DOUBLE",
    )
    rows = session_windows(df).orderBy("session_start").collect()
    assert len(rows) == 2
    assert rows[0]["n_events"] == 2
    assert rows[1]["n_events"] == 1


@pytest.mark.timeout(300)
def test_streaming_dedup_within_watermark(spark):
    """The same event_id delivered in two micro-batches must reach the
    sink once; a distinct id must pass through."""
    import uuid as _uuid

    from k_means_clustering_via_map_reduce_spark.streaming.dedup import (
        dedup_stream,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    name = f"dedup_{_uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory(prefix="kmce_sdedup_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        _write_batch(spark, src, [(1, t0, 10, 1.0), (2, t0, 11, 2.0)])
        stream = (
            spark.readStream.schema(
                "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, value DOUBLE"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            dedup_stream(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            # Redeliver event 1 (same id, within watermark) + new event 3.
            _write_batch(
                spark,
                src,
                [
                    (1, t0 + dt.timedelta(minutes=1), 10, 1.0),
                    (3, t0 + dt.timedelta(minutes=2), 12, 3.0),
                ],
            )
            q.processAllAvailable()
            ids = sorted(
                r["event_id"] for r in spark.table(name).collect()
            )
            assert ids == [1, 2, 3], ids
            # Passthrough schema preserved: the input's TIMESTAMP_NTZ ts
            # must not be silently rewritten to a zoned timestamp.
            assert (
                dict(spark.table(name).dtypes)["ts"] == "timestamp_ntz"
            ), spark.table(name).dtypes
        finally:
            q.stop()
            spark.catalog.dropTempView(name)


@pytest.mark.timeout(300)
def test_foreachbatch_parquet_sink_equals_batch(spark, sf_dir, tmp_path):
    """The foreachBatch parquet sink's terminal state must equal the
    batch hourly aggregate."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        stream_to_parquet_sink,
    )

    out = str(tmp_path / "hourly")
    stream_to_parquet_sink(spark, sf_dir, out)
    got = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.timeout(300)
def test_k5_fit_is_deterministic_and_quantized(spark, sf_dir):
    """K5's batch fit must be run-to-run identical (quantized Lloyd's:
    every iteration rounds its centroids to a fixed grid, making the
    trajectory engine-exact) and every centroid must sit on that grid."""
    from k_means_clustering_via_map_reduce_spark.streaming.kmeans_stream import (
        K5_K,
        K5_QUANT,
        fit_value_centroids,
    )

    a = fit_value_centroids(spark, sf_dir)
    b = fit_value_centroids(spark, sf_dir)
    assert a == b
    assert len(a) == K5_K
    for c in a:
        assert round(c, K5_QUANT) == c


@pytest.mark.timeout(300)
def test_k5_stream_counts_cover_all_events(spark, sf_dir):
    """Every event lands in exactly one (hour, cluster) cell: the
    streamed per-cluster counts must total the events row count, and
    cluster ids must be valid."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from k_means_clustering_via_map_reduce_spark.streaming.kmeans_stream import (
        K5_K,
        stream_cluster_counts,
    )

    rows = stream_cluster_counts(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total
    assert {r["cluster_id"] for r in rows} <= set(range(K5_K))


@pytest.mark.timeout(300)
def test_k6_stream_attribution_equals_batch_join(spark, sf_dir):
    """The append-mode stream-stream interval join must emit exactly the
    batch interval join's pairs: same-user, click strictly after the
    view, within the attribution window (inclusive upper edge)."""
    import k_means_clustering_via_map_reduce_spark.queries as Q
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    Q.load_all()
    got = {
        (r["view_id"], r["click_id"])
        for r in Q.QUERIES["k6_stream_attribution"](spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    want = {
        (r["view_id"], r["click_id"])
        for r in v.join(
            c,
            F.expr(
                "v.user_id = c.user_id AND c.ts > v.ts "
                "AND c.ts <= v.ts + INTERVAL 24 HOUR"
            ),
        )
        .select(
            F.col("v.event_id").alias("view_id"),
            F.col("c.event_id").alias("click_id"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def _run_multibatch(spark, src, builder, output_mode, tmp):
    """Run ``builder(stream)`` over ``src`` one file per micro-batch
    (AvailableNow over a single staged file would process everything in
    ONE batch, leaving the cross-batch state path untested)."""
    import uuid as _uuid

    name = f"mb_{_uuid.uuid4().hex[:10]}"
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        builder(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def test_stateful_totals_across_micro_batches(spark, sf_dir, tmp_path):
    """k8's max-per-user reduction claims batch-count independence; force
    4 micro-batches and check the reduced terminal state still equals
    the batch aggregate (and that multi-emission actually happened)."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        running_user_totals,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    emitted = _run_multibatch(
        spark,
        src,
        lambda s: running_user_totals(s, threshold=3300.0),
        "update",
        str(tmp_path),
    )
    n_users = ev.select("user_id").distinct().count()
    # >1 emission per active user proves the multi-batch path ran.
    assert emitted.count() > n_users
    final = emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n"),
        F.round(F.max("total_value"), 4).alias("tv"),
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("tv"),
    )
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0


def test_stream_dedup_across_micro_batches(spark, sf_dir, tmp_path):
    """k7's append-mode dropDuplicates must emit each key exactly ONCE
    even when its occurrences span micro-batches — state carries between
    batches, so later re-arrivals of a seen key emit nothing."""
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    emitted = _run_multibatch(
        spark,
        src,
        lambda s: s.dropDuplicates(["user_id", "event_type"]),
        "append",
        str(tmp_path),
    )
    got = {(r["user_id"], r["event_type"]) for r in emitted.collect()}
    want = {
        (r["user_id"], r["event_type"])
        for r in ev.distinct().collect()
    }
    # Exactly once per key: row count equals distinct-key count.
    assert emitted.count() == len(want)
    assert got == want


def test_late_feed_staging_is_deterministic(spark, sf_dir):
    """The k10/k7b/k11 oracles are only valid if the staged feed really
    is three single-part files in forced modification-time order — one
    micro-batch each under maxFilesPerTrigger=1. Pin that invariant,
    plus the content split the oracles assume (on-time = even ids;
    late = odd ids shifted back + unshifted last-10-minute duplicates;
    the tick strictly newest)."""
    from k_means_clustering_via_map_reduce_spark.streaming.latedata import (
        _stage_late_feed,
    )

    src = _stage_late_feed(spark, sf_dir)
    files = sorted(os.listdir(src))
    assert files == ["0-ontime.parquet", "1-tick.parquet", "2-late.parquet"]
    mtimes = [os.path.getmtime(os.path.join(src, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3

    ontime = spark.read.parquet(os.path.join(src, files[0]))
    tick = spark.read.parquet(os.path.join(src, files[1]))
    late = spark.read.parquet(os.path.join(src, files[2]))
    assert ontime.filter(F.col("event_id") % 2 == 1).count() == 0
    assert tick.count() == 1 and tick.first()["event_id"] == -1
    # The tick is strictly newer than every other row's event time.
    max_other = max(
        ontime.agg(F.max("ts")).first()[0], late.agg(F.max("ts")).first()[0]
    )
    assert tick.first()["ts"] > max_other
    # Late file = all odd ids plus SOME duplicated even ids (the
    # in-horizon copies) — and every copy matches an on-time row.
    dup = late.filter(F.col("event_id") % 2 == 0)
    assert dup.count() > 0
    assert (
        dup.join(ontime, ["event_id", "ts", "user_id", "value"]).count()
        == dup.count()
    )


def test_merge_batch_into_snapshot_ledger_and_accumulation(spark, tmp_path):
    """The foreachBatch merge (k12) must accumulate across distinct
    batch ids and no-op on a re-delivered id — the exactly-once ledger
    contract, unit-scale."""
    from k_means_clustering_via_map_reduce_spark.streaming.latedata import (
        merge_batch_into_snapshot,
    )

    root = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [("click", 1.0), ("click", 2.0), ("view", 10.0)],
        "event_type string, value double",
    )
    b1 = spark.createDataFrame(
        [("click", 4.0), ("purchase", 7.0)], "event_type string, value double"
    )
    assert merge_batch_into_snapshot(b0, 0, root) is True
    assert merge_batch_into_snapshot(b0, 0, root) is False  # replay
    assert merge_batch_into_snapshot(b1, 1, root) is True

    import glob

    latest = sorted(
        glob.glob(root + "/snap-*"), key=lambda p: int(p.rsplit("-", 1)[1])
    )[-1]
    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in spark.read.parquet(latest).collect()
    }
    assert got == {
        "click": (3, 7.0),
        "view": (1, 10.0),
        "purchase": (1, 7.0),
    }


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Checkpoint continuity for the k12 sink pattern: drain the source
    with one file present, then add two more files and RESTART against
    the same checkpoint + state roots. The resumed run must process
    only the new files (the ledger sees no replayed batch 0 unless the
    checkpoint re-delivers it, in which case the ledger absorbs it) and
    the final snapshot must equal the all-data aggregate — the
    exactly-once-across-restart contract a production ingest relies
    on."""
    import glob

    from k_means_clustering_via_map_reduce_spark.streaming.latedata import (
        merge_batch_into_snapshot,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def write_file(i, rows):
        df = spark.createDataFrame(rows, "event_type string, value double")
        stage = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        os.rename(os.path.join(stage, part), os.path.join(src, f"{i}.parquet"))
        os.utime(os.path.join(src, f"{i}.parquet"),
                 (1_700_000_000 + 60 * i,) * 2)

    def run():
        stream = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_batch_into_snapshot(df, bid, state)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_file(0, [("click", 1.0), ("view", 2.0)])
    run()  # first incarnation drains file 0

    write_file(1, [("click", 3.0)])
    write_file(2, [("view", 4.0), ("purchase", 5.0)])
    run()  # restart: same checkpoint, must pick up files 1-2 only

    latest = sorted(
        glob.glob(state + "/snap-*"), key=lambda p: int(p.rsplit("-", 1)[1])
    )[-1]
    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in spark.read.parquet(latest).collect()
    }
    assert got == {
        "click": (2, 4.0),
        "view": (2, 6.0),
        "purchase": (1, 5.0),
    }
    # Three applied batches across the two incarnations, no double-apply.
    assert sorted(os.listdir(state + "/applied")) == ["0", "1", "2"]


def test_merge_snapshot_replay_after_partial_commit_is_idempotent(
    spark, tmp_path
):
    """Crash window: snapshot written, ledger marker NOT yet written.
    The replayed batch must re-derive its snapshot from the PREDECESSOR
    (not from its own half-committed output), leaving totals
    unchanged."""
    import glob
    import os as _os

    from k_means_clustering_via_map_reduce_spark.streaming.latedata import (
        merge_batch_into_snapshot,
    )

    root = str(tmp_path / "state")
    b0 = spark.createDataFrame([("click", 1.0)], "event_type string, value double")
    b1 = spark.createDataFrame([("click", 2.0)], "event_type string, value double")
    assert merge_batch_into_snapshot(b0, 0, root)
    assert merge_batch_into_snapshot(b1, 1, root)

    def totals():
        latest = sorted(
            glob.glob(root + "/snap-*"), key=lambda p: int(p.rsplit("-", 1)[1])
        )[-1]
        r = spark.read.parquet(latest).collect()[0]
        return (r.n_events, r.total_value)

    assert totals() == (2, 3.0)
    _os.remove(root + "/applied/1")  # simulate the crash-before-marker
    assert merge_batch_into_snapshot(b1, 1, root) is True  # replay applies
    assert totals() == (2, 3.0)  # ...but totals are identical


def test_k18_plan_has_two_stateful_operators(spark, sf_dir):
    """The chained query must contain TWO stateful aggregation stages in
    ONE plan (SPARK-40925) — if Spark silently planned a single agg, the
    n_subwindows contract would still hold batch-side, so pin the plan."""
    import os
    import tempfile

    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        _stage_chain_feed,
        chained_windowed_agg,
    )

    src = _stage_chain_feed(spark, sf_dir)
    schema = spark.read.parquet(src).schema
    with tempfile.TemporaryDirectory(prefix="k18_plan_") as tmp:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            chained_windowed_agg(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
            n_state = len(q.lastProgress["stateOperators"])
        finally:
            q.stop()
    assert n_state == 2, f"expected 2 stateful operators, got {n_state}"


def test_k19_join_then_agg_has_two_stateful_operators(spark, sf_dir):
    """k19's plan must carry the join AND the agg as stateful stages in
    one query (SPARK-40925's join→agg combination)."""
    import os
    import tempfile

    from k_means_clustering_via_map_reduce_spark.streaming.joins import (
        joined_hourly,
    )
    from k_means_clustering_via_map_reduce_spark.streaming.windows import (
        _events_stream,
        _stage_events_dir,
    )
    import pyspark.sql.functions as F

    events_dir = _stage_events_dir(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="k19_plan_") as tmp:
        stream = _events_stream(spark, events_dir)
        q = (
            joined_hourly(
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "click"),
            )
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
            n_state = len(q.lastProgress["stateOperators"])
        finally:
            q.stop()
    assert n_state == 2, f"expected join+agg stateful pair, got {n_state}"
