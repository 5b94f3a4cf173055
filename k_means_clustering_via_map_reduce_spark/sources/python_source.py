"""F15 — custom Python DataSource (Spark 4.0, SPARK-44076): the
user-defined SOURCE extension point, completing the extension family
(scalar/grouped/table functions are t8/t13/t14/t16; this is the input
side). A real connector (REST API, message bus, bespoke binary store)
implements exactly this shape: declare a schema, split the scan into
``InputPartition``s, and yield rows per partition on the EXECUTORS.

The demo source synthesizes deterministic "sensor readings" from row
formulas, so the driver oracle can recompute every value — connector
plumbing (schema contract, partition planning, per-partition iteration,
option parsing) is proven without external infrastructure, the same
honest-stub discipline as the multimodal codec boundary
(operators/multimodal.py).

The reference's only source is its hand-split CSV scan
(master.py:113-133, mapper.py:22-43); this is the engine's answer to
"what if my data isn't in a file format Spark ships".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import query

try:  # pragma: no cover - import guard mirrors the k8b dependency gate
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAVE_DATASOURCE = True
except ImportError:  # pre-4.0 PySpark
    _HAVE_DATASOURCE = False


SENSOR_ROWS = 1000
SENSOR_PARTS = 8


if _HAVE_DATASOURCE:

    class SensorReader(DataSourceReader):
        """Partition-parallel reader: partition i yields rows
        i, i+P, i+2P, ... — a deterministic round-robin split, so the
        result is independent of partition count (pinned in
        tests/test_sinks.py)."""

        def __init__(self, options):
            self.n = int(options.get("rows", str(SENSOR_ROWS)))
            self.parts = int(options.get("partitions", str(SENSOR_PARTS)))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, part):
            # Runs on the executor for exactly one InputPartition.
            for r in range(part.value, self.n, self.parts):
                yield (r, r % 10, float((r * 37) % 1000) / 10.0)

    class SensorSource(DataSource):
        """``spark.read.format("kmce_sensor")`` — schema + reader
        factory. Writer support would subclass DataSourceWriter the
        same way; streaming support, SimpleDataSourceStreamReader."""

        @classmethod
        def name(cls) -> str:
            return "kmce_sensor"

        def schema(self) -> str:
            return "reading_id BIGINT, sensor BIGINT, temp DOUBLE"

        def reader(self, schema):
            return SensorReader(self.options)


def read_sensor(
    spark: SparkSession,
    rows: int = SENSOR_ROWS,
    partitions: int = SENSOR_PARTS,
) -> DataFrame:
    """Register (idempotent) and read the custom source."""
    spark.dataSource.register(SensorSource)
    return (
        spark.read.format("kmce_sensor")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


if _HAVE_DATASOURCE:

    @query(
        "f15_python_datasource",
        oracle=f"""
        WITH r AS (SELECT unnest(range(0, {SENSOR_ROWS})) AS reading_id),
        s AS (SELECT reading_id, reading_id % 10 AS sensor,
                     ((reading_id * 37) % 1000) / 10.0 AS temp FROM r)
        SELECT sensor, count(*) AS n, round(sum(temp), 4) AS sum_temp
        FROM s GROUP BY sensor ORDER BY sensor
        """,
    )
    def f15_python_datasource(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Scan the custom Python source across 8 InputPartitions and
        aggregate per sensor; the oracle regenerates every reading from
        the row formula, so a dropped partition, a mis-split range, or
        an option-parsing bug flips the hash.

        Scale: partition planning happens on the driver (cheap
        metadata); row production is executor-side and Arrow-batched by
        the DataSource framework. A Python source pays the
        Python-worker toll per batch — the documented contract is
        connectors-and-stubs here, bulk columnar data through the
        native readers (f1-f14)."""
        return (
            read_sensor(spark)
            .groupBy("sensor")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("temp"), 4).alias("sum_temp"),
            )
            .orderBy("sensor")
        )


# --------------------------------------------------------------------------
# K16 — custom STREAMING Python DataSource (SimpleDataSourceStreamReader):
# the streaming half of f15's connector surface. A real connector (queue
# consumer, CDC tail, HTTP poll) implements exactly this: offsets as
# plain dicts, read(start) -> (rows, nextOffset) prefetched on the
# driver, readBetweenOffsets replaying committed ranges on recovery.
# --------------------------------------------------------------------------
TICK_TOTAL = 1000
TICK_CHANNELS = 5


def _tick_rows(start: int, end: int):
    # A LIST, not a generator: the simple-reader wrapper caches the
    # prefetched batch and pickles it for recovery replay — generators
    # fail that pickle at planInputPartitions time.
    return [
        (r, r % TICK_CHANNELS, float((r * 13) % 100))
        for r in range(start, end)
    ]


if _HAVE_DATASOURCE:
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    class TickStreamReader(SimpleDataSourceStreamReader):
        """Offset = {"pos": next_unread_row}. ``read`` drains every row
        available at the trigger (the AvailableNow contract: the
        prefetched chunk at trigger start IS the batch — a partial
        chunk would simply be the next trigger's work in a live
        stream); ``readBetweenOffsets`` deterministically replays any
        committed range after recovery, which the restart pytest
        exercises across two runs sharing a checkpoint."""

        def __init__(self, options):
            self.total = int(options.get("total", str(TICK_TOTAL)))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = max(pos, self.total)
            return _tick_rows(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return _tick_rows(start["pos"], end["pos"])

    class TickStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kmce_ticks"

        def schema(self) -> str:
            return "tick_id BIGINT, chan BIGINT, v DOUBLE"

        def simpleStreamReader(self, schema):
            return TickStreamReader(self.options)


def run_tick_stream(
    spark: SparkSession, total: int, checkpoint: str
) -> DataFrame:
    """Aggregate the tick stream per channel in complete mode through a
    memory sink; returns the materialized terminal table."""
    import os
    import uuid

    spark.dataSource.register(TickStreamSource)
    name = f"ticks_{uuid.uuid4().hex[:12]}"
    q = (
        spark.readStream.format("kmce_ticks")
        .option("total", str(total))
        .load()
        .groupBy("chan")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("v"), 4).alias("sum_v"),
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(checkpoint, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return result


if _HAVE_DATASOURCE:

    @query(
        "k16_python_stream_source",
        oracle=f"""
        WITH r AS (SELECT unnest(range(0, {TICK_TOTAL})) AS tick_id),
        s AS (SELECT tick_id, tick_id % {TICK_CHANNELS} AS chan,
                     CAST((tick_id * 13) % 100 AS DOUBLE) AS v FROM r)
        SELECT chan, count(*) AS n, round(sum(v), 4) AS sum_v
        FROM s GROUP BY chan ORDER BY chan
        """,
    )
    def k16_python_stream_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Per-channel totals of the custom tick stream, run as a REAL
        streaming query (complete mode, AvailableNow, checkpointed).
        The oracle regenerates every tick from the row formula: a
        dropped offset range, a double-read, or an option-parsing bug
        flips the hash. Restart continuity (initialOffset from the
        checkpoint + readBetweenOffsets replay) is pinned separately in
        tests/test_sinks.py across two runs sharing one checkpoint.

        Scale: the simple-reader prefetch runs on the DRIVER — right
        for control-plane-sized feeds (the contract of
        SimpleDataSourceStreamReader); bulk streams use the partitioned
        DataSourceStreamReader or the native file/Kafka sources (k4-k15
        family)."""
        import tempfile

        ckpt_base = "/dev/shm" if __import__("os").path.isdir("/dev/shm") \
            else None
        with tempfile.TemporaryDirectory(
            prefix="kmce_ticks_", dir=ckpt_base
        ) as tmp:
            res = run_tick_stream(spark, TICK_TOTAL, tmp)
        return res.orderBy("chan")


# --------------------------------------------------------------------------
# F17 — custom Python DataSource WRITER (the output half of f15's
# connector surface; Spark 4 DataSourceWriter API). A real connector
# (REST bulk endpoint, message bus producer, bespoke store) implements
# exactly this: per-partition executor-side ``write(iterator) →
# WriterCommitMessage``, then a driver-side ``commit(messages)`` that
# finalizes atomically (or ``abort`` that rolls back). The demo sink
# writes JSON-lines files with a rename-on-close discipline and a
# commit-time _MANIFEST.json, so partial task output is never visible
# to readers — the same protocol parquet's OutputCommitter implements
# natively.
# --------------------------------------------------------------------------
if _HAVE_DATASOURCE:
    from dataclasses import dataclass

    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    @dataclass
    class JsonlCommit(WriterCommitMessage):
        filename: str
        n_rows: int
        part_id: int

    class JsonlSinkWriter(DataSourceWriter):
        """Executor side: stream the partition's rows to an
        ATTEMPT-unique ``part-{pid}-a{attemptId}.jsonl.tmp``, rename on
        close, report (attempt filename, row count, partition) to the
        driver. Task retries and speculative attempts each get their own
        file — two live attempts can never interleave into one path —
        and the driver-side ``commit()`` promotes exactly the winning
        attempt per partition (the one whose WriterCommitMessage Spark
        delivered) to the canonical ``part-{pid}.jsonl`` name, then
        sweeps losing-attempt residue. Readers only ever see promoted
        finals plus ``_MANIFEST.json``."""

        def __init__(self, options, overwrite):
            self.path = options.get("path")
            self.overwrite = overwrite

        def write(self, iterator):
            import json as _json
            import os as _os

            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId()
            aname = f"part-{pid:05d}-a{ctx.taskAttemptId()}.jsonl"
            apath = _os.path.join(self.path, aname)
            n = 0
            with open(apath + ".tmp", "w") as f:
                for row in iterator:
                    f.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            _os.rename(apath + ".tmp", apath)
            return JsonlCommit(aname, n, pid)

        def commit(self, messages):
            import json as _json
            import os as _os
            import re as _re

            # Spark delivers ONE commit message per partition (the
            # winning attempt); promote it, then sweep every
            # non-promoted attempt file / torn .tmp left by retries.
            finals = []
            for m in messages:
                final = f"part-{m.part_id:05d}.jsonl"
                _os.replace(
                    _os.path.join(self.path, m.filename),
                    _os.path.join(self.path, final),
                )
                finals.append(final)
            attempt_pat = _re.compile(r"^part-\d{5}-a\d+\.jsonl(\.tmp)?$")
            for n in _os.listdir(self.path):
                if attempt_pat.match(n):
                    _os.remove(_os.path.join(self.path, n))
            manifest = {
                "files": sorted(finals),
                "rows": sum(m.n_rows for m in messages),
            }
            with open(
                _os.path.join(self.path, "_MANIFEST.json"), "w"
            ) as f:
                _json.dump(manifest, f)

        def abort(self, messages):
            import os as _os
            import re as _re

            attempt_pat = _re.compile(r"^part-\d{5}-a\d+\.jsonl(\.tmp)?$")
            for n in _os.listdir(self.path):
                if attempt_pat.match(n):
                    _os.remove(_os.path.join(self.path, n))

    class JsonlSink(DataSource):
        """``df.write.format("kmce_jsonl_sink").option("path", dir)`` —
        local-filesystem demo; a cluster deployment points ``path`` at
        a shared store (the write/commit protocol is identical)."""

        @classmethod
        def name(cls) -> str:
            return "kmce_jsonl_sink"

        def writer(self, schema, overwrite):
            return JsonlSinkWriter(self.options, overwrite)


_F17_STAGED: dict[tuple, object] = {}


def write_jsonl_sink(df: DataFrame, path: str) -> None:
    """Write through the custom sink (register is idempotent)."""
    spark = df.sparkSession
    spark.dataSource.register(JsonlSink)
    df.write.format("kmce_jsonl_sink").option("path", path).mode(
        "append"
    ).save()


if _HAVE_DATASOURCE:

    @query(
        "f17_python_datasink",
        oracle="""
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM documents GROUP BY lang ORDER BY lang
        """,
    )
    def f17_python_datasink(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Round-trip documents through the custom Python sink (6
        write partitions → 6 committed files + manifest) and aggregate
        the read-back against the original parquet — f1's fidelity
        contract applied to the user-defined OUTPUT path.

        Scale: writes are per-partition streaming appends (no driver
        collect, no shuffle beyond the explicit repartition that sets
        file count); commit is one driver-side metadata write, O(tasks)
        not O(rows) — the same asymmetics every sane distributed sink
        has. The Python-worker toll applies per batch; bulk columnar
        output belongs to the native writers (f1-f14), custom sinks to
        systems Spark has no native client for."""
        import os as _os
        import tempfile as _tf

        from k_means_clustering_via_map_reduce_spark.queries import (
            staging_key,
        )
        from k_means_clustering_via_map_reduce_spark.sources import (
            load_table,
        )

        key = staging_key(sf_dir, "documents")
        if key not in _F17_STAGED:
            tmp = _tf.TemporaryDirectory(prefix="kmce_pysink_")
            d = load_table(spark, sf_dir, "documents").select(
                "doc_id", "lang", "n_chars"
            )
            write_jsonl_sink(d.repartition(6), tmp.name)
            _F17_STAGED[key] = tmp
        out = _F17_STAGED[key].name
        back = spark.read.schema(
            "doc_id BIGINT, lang STRING, n_chars BIGINT"
        ).json(_os.path.join(out, "*.jsonl"))
        return (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .orderBy("lang")
        )


# --------------------------------------------------------------------------
# K20 — custom streaming source chained into an event-time WATERMARKED
# windowed aggregate: the composition a real queue-consumer pipeline is.
# k16 proves the connector in complete mode (watermark never changes the
# answer there); k20 runs a user-defined source through append-mode
# eviction state, reusing latedata.py's three-batch discipline with the
# batch schedule encoded IN the reader (offset = batch index, one
# scheduled batch per read() call = one micro-batch):
#
#   batch 0 "ontime": rows r in [0, N), ts = BASE + r*STEP (~3h20m span);
#   batch 1 "tick":   one row at max(on-time ts) + 3 h — only job is to
#                     advance the watermark (its window never emits);
#   batch 2 "late":   the on-time rows replayed 30 min EARLIER (their
#                     hour windows closed at wm1 -> dropped) plus
#                     unshifted duplicates of the last-10-minutes rows
#                     (late-but-admissible; merge into the final window).
#
# Batch-2 filtering uses the PREVIOUS batch's watermark wm1 =
# max(on-time) - delay, eviction the current wm2 = tick - delay
# (SPARK-40925) — every timestamp is integer seconds, so both bounds
# are exact integer arithmetic the DuckDB oracle replays verbatim.
# --------------------------------------------------------------------------
ETICK_BASE = 1_704_067_200  # 2024-01-01 00:00:00 UTC, hour-aligned
ETICK_N = 600
ETICK_STEP = 20  # seconds between on-time rows
ETICK_CHANNELS = 5
ETICK_LATE_SHIFT = 1800  # 30 minutes
ETICK_TICK_GAP = 10800  # 3 hours
ETICK_DELAY_S = 600  # watermark delay, 10 minutes
ETICK_MAX0 = ETICK_BASE + (ETICK_N - 1) * ETICK_STEP
ETICK_TICK_TS = ETICK_MAX0 + ETICK_TICK_GAP


def _etick_batch(i: int):
    # A LIST (pickled for recovery replay, k16's lesson).
    if i == 0:
        return [
            (r, ETICK_BASE + r * ETICK_STEP, r % ETICK_CHANNELS,
             float((r * 13) % 100))
            for r in range(ETICK_N)
        ]
    if i == 1:
        return [(-1, ETICK_TICK_TS, -1, 0.0)]
    if i == 2:
        shifted = [
            (r, ETICK_BASE + r * ETICK_STEP - ETICK_LATE_SHIFT,
             r % ETICK_CHANNELS, float((r * 13) % 100))
            for r in range(ETICK_N)
        ]
        dups = [
            (r, ETICK_BASE + r * ETICK_STEP, r % ETICK_CHANNELS,
             float((r * 13) % 100))
            for r in range(ETICK_N)
            if ETICK_BASE + r * ETICK_STEP > ETICK_MAX0 - ETICK_DELAY_S
        ]
        return shifted + dups
    return []


if _HAVE_DATASOURCE:

    class EventTickStreamReader(SimpleDataSourceStreamReader):
        """Offset = {"b": next_unread_batch}; each read() hands the
        engine exactly one scheduled batch, so the watermark advances
        between batches just as it would consuming a live queue."""

        def __init__(self, options):
            self.batches = int(options.get("batches", "3"))

        def initialOffset(self):
            return {"b": 0}

        def read(self, start):
            b = start["b"]
            if b >= self.batches:
                # No-progress contract differs from the progress case:
                # the wrapper probes an end==start result with next(it),
                # so it must be an empty ITERATOR (a list raises
                # TypeError at latestOffset under a live trigger).
                return iter([]), {"b": b}
            return _etick_batch(b), {"b": b + 1}

        def readBetweenOffsets(self, start, end):
            rows = []
            for b in range(start["b"], end["b"]):
                rows.extend(_etick_batch(b))
            return rows

    class EventTickStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "kmce_eticks"

        def schema(self) -> str:
            return "event_id BIGINT, ts_sec BIGINT, chan BIGINT, v DOUBLE"

        def simpleStreamReader(self, schema):
            return EventTickStreamReader(self.options)


_ETICK_LAST_PROGRESS: list = []  # final run's progress events, for pins


def run_etick_stream(
    spark: SparkSession,
    batches: int,
    checkpoint: str,
    sink_dir: str | None = None,
) -> DataFrame:
    """Watermarked hourly-per-channel aggregate over the custom source,
    APPEND mode (the emission log IS the answer — a window surfaces
    only once its end passes the eviction watermark).

    The simple-reader prefetch wrapper hands AvailableNow only its
    FIRST prefetched chunk, which would collapse the schedule into one
    micro-batch — so this runs a live processing-time trigger and stops
    at a DETERMINISTIC terminal condition instead: the no-data batch
    (numInputRows == 0) whose watermark equals the feed's final value,
    i.e. eviction has caught up with everything the schedule can ever
    emit. Until that batch exists the loop just keeps polling; the
    outcome does not depend on trigger timing."""
    import datetime as _dt
    import os
    import time
    import uuid

    spark.dataSource.register(EventTickStreamSource)
    final_wm_sec = (
        ETICK_TICK_TS if batches >= 2 else ETICK_MAX0
    ) - ETICK_DELAY_S
    target_wm = _dt.datetime.fromtimestamp(
        final_wm_sec, _dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.000Z")
    name = f"eticks_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # The terminal condition below polls lastProgress for the NO-DATA
    # batch, but Spark throttles no-data progress events to one per
    # 10 s by default (noDataProgressEventInterval) — the stream sat
    # finished-but-unreported for ~10 s every run, the dominant term
    # of the r12 "fixed streaming latency" audit (13.3 s -> 3.3 s warm
    # with the interval at 200 ms). Reporting cadence only; batch
    # content, watermarks, and the emission log are unaffected.
    prev_ndp = spark.conf.get(
        "spark.sql.streaming.noDataProgressEventInterval", "10000ms"
    )
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "200")
    try:
        stream = (
            spark.readStream.format("kmce_eticks")
            .option("batches", str(batches))
            .load()
            .select(
                F.col("ts_sec").cast("timestamp").alias("ts"),
                "chan",
                "v",
            )
            .withWatermark("ts", f"{ETICK_DELAY_S} seconds")
            .groupBy(F.window("ts", "1 hour").alias("win"), "chan")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("v"), 4).alias("sum_v"),
            )
        )
        # The append-mode MEMORY sink cannot recover from a checkpoint;
        # restart scenarios write through the durable parquet file sink
        # (k11's production shape) and read the emission log back.
        writer = (
            stream.writeStream.format("parquet").option("path", sink_dir)
            if sink_dir
            else stream.writeStream.format("memory").queryName(name)
        )
        q = (
            writer.outputMode("append")
            .option("checkpointLocation", os.path.join(checkpoint, "ckpt"))
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                p = q.lastProgress
                if (
                    p
                    and p["numInputRows"] == 0
                    and p.get("eventTime", {}).get("watermark") == target_wm
                ):
                    break
                time.sleep(0.1)
            else:
                raise TimeoutError(
                    f"etick stream never reached watermark {target_wm}"
                )
            _ETICK_LAST_PROGRESS[:] = [dict(e) for e in q.recentProgress]
        finally:
            q.stop()
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataProgressEventInterval", prev_ndp
        )
    if sink_dir:
        return spark.read.parquet(sink_dir).localCheckpoint(eager=True)
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return result


if _HAVE_DATASOURCE:

    @query(
        "k20_stream_source_watermark",
        oracle=f"""
        WITH r AS (SELECT unnest(range(0, {ETICK_N})) AS r),
        ontime AS (
          SELECT {ETICK_BASE} + r * {ETICK_STEP} AS ts_sec,
                 r % {ETICK_CHANNELS} AS chan,
                 CAST((r * 13) % 100 AS DOUBLE) AS v
          FROM r),
        dups AS (
          SELECT * FROM ontime
          WHERE ts_sec > {ETICK_MAX0} - {ETICK_DELAY_S}),
        late AS (
          SELECT ts_sec - {ETICK_LATE_SHIFT} AS ts_sec, chan, v
          FROM ontime
          WHERE ((ts_sec - {ETICK_LATE_SHIFT}) // 3600) * 3600 + 3600
                > {ETICK_MAX0} - {ETICK_DELAY_S}),
        surviving AS (
          SELECT * FROM ontime UNION ALL
          SELECT * FROM dups UNION ALL
          SELECT * FROM late)
        SELECT make_timestamp((ts_sec // 3600) * 3600 * 1000000) AS hour_ts,
               chan, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(v), 4) AS sum_v
        FROM surviving
        WHERE (ts_sec // 3600) * 3600 + 3600
              <= {ETICK_TICK_TS} - {ETICK_DELAY_S}
        GROUP BY 1, 2 ORDER BY hour_ts, chan
        """,
    )
    def k20_stream_source_watermark(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Append-mode emission log of the watermarked hourly-channel
        aggregate over the custom streaming source. The oracle replays
        both watermark bounds in integer arithmetic: late replays whose
        hour window closed at wm1 are dropped, admissible duplicates
        merge, the tick's own window never emits — a source that
        re-delivered a batch, skipped one, or a watermark that stopped
        advancing all diverge.

        Scale: state is per-(window, chan), bounded by the watermark
        horizon; the shuffle hashes on the state key exactly as the
        native-source k4/k10 path — the Python source changes WHERE
        rows enter, not the stateful plan. Restart/offset-replay is
        pinned in tests/test_sinks.py across two runs sharing one
        checkpoint."""
        import tempfile as _tf

        ckpt_base = "/dev/shm" if __import__("os").path.isdir("/dev/shm") \
            else None
        with _tf.TemporaryDirectory(
            prefix="kmce_eticks_", dir=ckpt_base
        ) as tmp:
            res = run_etick_stream(spark, 3, tmp)
        return res.select(
            F.col("win.start").cast("timestamp_ntz").alias("hour_ts"),
            "chan",
            "n_events",
            "sum_v",
        ).orderBy("hour_ts", "chan")


# --------------------------------------------------------------------------
# F24 — the versioned table as a FIRST-CLASS Spark connector with
# pushdown-driven data skipping (round-8 surface, registered round 8).
#
# spark.read.format("kmce_versioned").option("root", ...) composes the
# whole lakehouse layer with Catalyst: `schema()` serves the manifest's
# recorded (evolved) schema, `pushFilters` (Spark 4.1 Python DataSource
# API) receives Catalyst's conjunctive predicates and prunes the FILE
# LIST against the manifest's per-file min/max stats, `partitions()`
# hands back one InputPartition per surviving file, and `read()`
# pyarrow-scans only that file — null-filling columns the file predates
# (the schema-evolution read contract, now inside a connector).
#
# Pruning is conservative and NON-EXACT by design: every pushed filter
# is returned to Spark for post-scan row evaluation (`yield` all),
# so a pruning bug can only cost performance if it keeps too much — a
# file wrongly DROPPED is caught by the parity test pinning connector
# output == read_version() on every probe.
#
# USAGE NOTE (upstream behavior, pinned in tests): Spark 4.1 attaches a
# Python source's pushdown planning to the loaded relation node, so a
# FILTERLESS re-read of the SAME loaded DataFrame after a filtered
# query reuses the filtered planning (minimal repro with a toy
# pushFilters source in tests/test_versioned_connector.py — every
# pushFilters source is affected, not this one specifically; a fresh
# reader is created per planning, so no connector state is involved).
# Call .load() per query, as f24 does.
# --------------------------------------------------------------------------


def register_versioned_source(spark: SparkSession) -> str:
    """Register the ``kmce_versioned`` DataSource; returns the name."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        InputPartition,
        IsNotNull,
        IsNull,
        LessThan,
        LessThanOrEqual,
    )
    from pyspark.sql.types import StructType

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        latest_version,
        read_manifest,
    )

    class FilePartition(InputPartition):
        def __init__(
            self,
            path: str,
            schema_json: dict,
            mapping: dict | None = None,
            dv_key: str = "",
            dv_paths: tuple = (),
        ):
            self.path = path
            self.schema_json = schema_json
            # column mapping (logical -> physical) and this file's
            # deletion-vector key + the snapshot's sidecar paths — the
            # partition is pickled to executors, so everything it
            # needs to reproduce read_version's semantics rides along
            self.mapping = mapping or {}
            self.dv_key = dv_key
            self.dv_paths = tuple(dv_paths)

    def resolve_version(options, root: str) -> int:
        # Explicit option parse (round-7 ADVICE): a truthy-based
        # `int(opt or latest)` sent version="0" hunting for manifest
        # v0 (which never exists) and silently treated "" as latest.
        # Absent option => latest; present => must parse to an int
        # >= 1, anything else fails loudly.
        raw = options.get("version")
        if raw is None:
            return latest_version(root)
        try:
            v = int(raw)
        except (TypeError, ValueError):
            raise ValueError(
                f"kmce_versioned: option version={raw!r} is not an "
                "integer; omit the option to read the latest version"
            ) from None
        if v < 1:
            raise ValueError(
                f"kmce_versioned: option version={v} is out of range "
                "(versions start at 1); omit the option for latest"
            )
        return v

    class VersionedReader(DataSourceReader):
        def __init__(self, options, schema_json):
            self.root = options["root"]
            self.version = resolve_version(options, self.root)
            self.schema_json = schema_json
            manifest = read_manifest(self.root, self.version)
            self.files = list(manifest["files"])
            self.stats = manifest.get("stats", {})
            # merge-on-read state: logical->physical rename map and
            # deletion-vector sidecars — the connector must reproduce
            # read_version's semantics or a renamed column silently
            # null-fills and DV-deleted rows resurrect
            self.mapping = manifest.get("column_mapping", {})
            self.dvs = list(manifest.get("dvs", []))
            # column -> [lo, hi] probe bounds accumulated by pushFilters
            self.bounds: dict = {}
            # column -> 'null' | 'notnull' predicates (f38 null-count
            # skipping), same per-plan lifecycle as ``bounds``
            self.null_preds: dict = {}
            # column -> probe value for EqualTo (f40 bloom skipping)
            self.eq_preds: dict = {}

        def pushFilters(self, filters):
            # PER-PLAN state: Spark reuses this reader object across
            # actions on the same DataFrame, so bounds accumulated for
            # one query must never prune a later one (found by the
            # random-evolution parity property test — an unfiltered
            # collect() after a range probe silently lost files).
            self.bounds = {}
            self.null_preds = {}
            self.eq_preds = {}
            for f in filters:
                if (
                    isinstance(f, (IsNull, IsNotNull))
                    and len(f.attribute) == 1
                ):
                    self.null_preds[f.attribute[0]] = (
                        "null" if isinstance(f, IsNull) else "notnull"
                    )
                    yield f
                    continue
                # single-column comparisons tighten the probe window;
                # everything is ALSO handed back to Spark (yield), so
                # pruning stays a pure file-count optimization
                col = (
                    f.attribute[0]
                    if isinstance(
                        f,
                        (
                            EqualTo,
                            GreaterThan,
                            GreaterThanOrEqual,
                            LessThan,
                            LessThanOrEqual,
                        ),
                    )
                    and len(f.attribute) == 1
                    else None
                )
                if col is not None and isinstance(
                    f.value, (int, float, str, bool)
                ):
                    lo, hi = self.bounds.get(col, (None, None))
                    if isinstance(f, EqualTo):
                        lo, hi = f.value, f.value
                        # equality probes additionally consult the
                        # per-file bloom (f40) — strings/ints/bools
                        # only, matching the writer's canonical form
                        if isinstance(f.value, (str, bool)) or (
                            isinstance(f.value, int)
                        ):
                            self.eq_preds[col] = f.value
                    elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                        lo = f.value if lo is None else max(lo, f.value)
                    else:
                        hi = f.value if hi is None else min(hi, f.value)
                    self.bounds[col] = (lo, hi)
                yield f

        def _kept_files(self):
            kept = []
            for f in self.files:
                s = self.stats.get(f, {})
                ok = True
                for col, (lo, hi) in self.bounds.items():
                    # footer stats speak the files' PHYSICAL names;
                    # pushed filters speak logical ones
                    b = s.get(self.mapping.get(col, col))
                    if b is None or not isinstance(b, list):
                        continue  # no stats: cannot prune, keep
                    try:
                        if hi is not None and b[0] > hi:
                            ok = False
                        if lo is not None and b[1] < lo:
                            ok = False
                    except TypeError:
                        continue  # cross-type compare: keep
                # null-count skipping (f38): IS NULL skips files with
                # zero recorded nulls; IS NOT NULL skips all-null
                # files. Absent counts keep the file; live deletion
                # vectors only ever REMOVE rows, so "zero nulls" stays
                # a valid skip and "all null" stays all-null or empty
                # (an empty scan is correct to skip too).
                nulls = s.get("__nulls__", {})
                rows = s.get("__rows__")
                for col, kind in self.null_preds.items():
                    n = nulls.get(self.mapping.get(col, col))
                    if n is None:
                        continue
                    if kind == "null" and n == 0:
                        ok = False
                    elif kind == "notnull" and rows is not None \
                            and n == rows:
                        ok = False
                # bloom skipping (f40): an equality probe whose value
                # the file's bloom rules out skips the file; a file
                # without a bloom for the column is always kept. Live
                # DVs only REMOVE rows, so a bloom miss stays a valid
                # skip after any DV delete.
                blooms = s.get("__bloom__", {})
                for col, val in self.eq_preds.items():
                    b64 = blooms.get(self.mapping.get(col, col))
                    if b64 is None:
                        continue
                    from k_means_clustering_via_map_reduce_spark.sources.versioned import (  # noqa: E501
                        bloom_might_contain,
                    )

                    if not bloom_might_contain(b64, val):
                        ok = False
                if ok:
                    kept.append(f)
            return kept

        def partitions(self):
            import os as _os

            kept = self._kept_files()
            # consume the plan's bounds: a later plan that never calls
            # pushFilters (no filters to push) must read EVERY file
            self.bounds = {}
            self.null_preds = {}
            self.eq_preds = {}
            if not kept:
                # an empty partition list makes Spark invoke read(None);
                # hand back one explicit empty-file sentinel instead
                return [FilePartition("", self.schema_json)]
            dv_paths = tuple(
                _os.path.join(self.root, d) for d in self.dvs
            )
            return [
                FilePartition(
                    _os.path.join(self.root, f),
                    self.schema_json,
                    mapping=self.mapping,
                    # the sidecar key is the manifest's file spelling
                    # (relative for table-local, absolute for clone
                    # refs) — exactly what delete_where_dv recorded
                    dv_key=f,
                    dv_paths=dv_paths,
                )
                for f in kept
            ]

        def read(self, part):
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            from pyspark.sql.pandas.types import to_arrow_schema

            if not part.path:  # the pruned-everything sentinel
                return
            want = to_arrow_schema(StructType.fromJson(part.schema_json))
            table = pq.read_table(part.path)
            if part.dv_paths:
                # apply this file's deletion vector: physical row
                # positions of a whole-file read are 0..n-1 in order.
                # The _dv_file predicate is PUSHED into the sidecar
                # read (row-group pruning via parquet stats) so each
                # file partition decodes only the vector rows keyed to
                # it, not every sidecar in full (round-11 ADVICE).
                dead: set = set()
                for dv_path in part.dv_paths:
                    dv = pq.read_table(
                        dv_path,
                        columns=["_dv_pos"],
                        filters=[("_dv_file", "==", part.dv_key)],
                    )
                    dead.update(dv.column("_dv_pos").to_pylist())
                if dead:
                    bad = [p for p in dead if not 0 <= p < len(table)]
                    if bad:
                        raise ValueError(
                            f"kmce_versioned: deletion-vector positions "
                            f"{sorted(bad)[:3]} are out of range for "
                            f"{part.path} ({len(table)} rows) — corrupt "
                            "sidecar or mismatched file key"
                        )
                    keep = np.ones(len(table), dtype=bool)
                    keep[list(dead)] = False
                    table = table.filter(pa.array(keep))
            mapping = part.mapping
            cols = []
            for field in want:
                phys = mapping.get(field.name, field.name)
                if phys in table.column_names:
                    cols.append(table.column(phys).cast(field.type))
                else:
                    # schema evolution: the file predates this column
                    cols.append(pa.nulls(len(table), type=field.type))
            for batch in pa.Table.from_arrays(
                cols, schema=want
            ).to_batches():
                yield batch

    class VersionedSource(DataSource):
        @classmethod
        def name(cls):
            return "kmce_versioned"

        def schema(self):
            from k_means_clustering_via_map_reduce_spark.sources.versioned import (
                table_schema,
            )

            root = self.options["root"]
            version = resolve_version(self.options, root)
            ts = table_schema(root, version)
            if ts is None:
                raise ValueError(
                    "kmce_versioned requires a manifest-recorded schema "
                    "(pre-evolution tables: read via read_version)"
                )
            self._schema_json = ts.jsonValue()
            return ts

        def reader(self, schema):
            return VersionedReader(self.options, schema.jsonValue())

    spark.dataSource.register(VersionedSource)
    return "kmce_versioned"


F24_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents WHERE doc_id >= 150 AND doc_id < 260
    GROUP BY lang ORDER BY lang
"""

_F24_STAGED: dict = {}


def _f24_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage f24's input: documents as a 10-commit versioned table
    (one doc_id range per single-file commit)."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.queries import staging_key
    from k_means_clustering_via_map_reduce_spark.sources.tables import (
        load_table,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F24_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_vds_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        hi = d.agg(F.max("doc_id")).collect()[0][0]
        step = (hi + 10) // 10
        for b in range(10):
            commit_append(
                d.filter(
                    (F.col("doc_id") >= b * step)
                    & (F.col("doc_id") < (b + 1) * step)
                ).coalesce(1),
                tmp.name,
            )
        _F24_STAGED[key] = tmp
    return _F24_STAGED[key].name


@query("f24_versioned_connector_read", oracle=F24_ORACLE)
def f24_versioned_connector_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """F24: a doc_id range aggregated through
    ``spark.read.format("kmce_versioned")`` — Catalyst pushes the range
    into the connector, pushFilters prunes the manifest's file list
    against per-file stats, and the result must equal the oracle's
    plain relational filter (pruning that drops a needed file loses
    rows and flips the hash; Spark re-evaluates every filter post-scan,
    so keeping too much can only cost time).

    Scale: the skipping decision is O(#files) driver-side metadata; the
    executors receive one InputPartition per SURVIVING file only."""
    register_versioned_source(spark)
    df = (
        spark.read.format("kmce_versioned")
        .option("root", _f24_stage(spark, sf_dir))
        .load()
    )
    return (
        df.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 260))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# K23 — the versioned table as a STREAMING SOURCE (change feed; round-8
# surface, library-first). Offsets ARE versions: a micro-batch is the
# rows of the manifests' `added` files between two versions, so the
# feed is deterministic, replayable from any committed offset (the
# manifests and data files are immutable — readBetweenOffsets is a pure
# manifest lookup), and INCREMENTAL ACROSS RESTARTS: a scheduled job
# with a checkpoint consumes exactly the versions committed since its
# last run (pinned in tests). This closes the lakehouse loop begun by
# k21: streams ingest INTO the table, and the table is itself a stream.
#
# APPEND-ONLY semantics, stated honestly: a COW delete/update version's
# `added` files contain rewritten SURVIVORS, which an append-feed would
# re-emit without retractions — same restriction Delta's change feed
# places on append-only streaming reads. Use on ingest-style tables
# (k21/k22's); CDC with remove-records is a different operator.
#
# Scale: the simple-reader contract materializes each chunk driver-side
# (right for metadata-paced feeds: a version is typically one
# micro-batch of files); the partition-parallel DataSourceStreamReader
# with one InputPartition per added FILE is the documented scale form,
# same split as f24's batch reader.
# --------------------------------------------------------------------------


def register_version_feed_source(spark: SparkSession) -> str:
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )
    from pyspark.sql.types import StructType

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        _manifest_visible,
        latest_version,
        read_manifest,
        table_schema,
    )

    def _added_rows(root: str, schema_json: dict, v0: int, v1: int) -> list:
        import os as _os

        import pyarrow.parquet as pq

        want = StructType.fromJson(schema_json)
        names = [f.name for f in want.fields]
        out = []
        for v in range(v0 + 1, v1 + 1):
            manifest = read_manifest(root, v)
            if not _manifest_visible(manifest, root):
                # the offset bound comes from latest_version, so an
                # in-flight multi-table slot should never be inside the
                # range; if one ever is, fail loudly rather than feed
                # uncommitted rows downstream (round-11 ADVICE)
                raise ValueError(
                    f"kmce_version_feed: version {v} of {root} belongs "
                    "to an uncommitted or aborted multi-table "
                    "transaction"
                )
            if (
                "compacted_from" in manifest
                or "dv_materialized_from" in manifest
            ):
                # OPTIMIZE and the deletion-vector flush rewrite the
                # SAME live rows into new files — no-data-change
                # versions (Delta's dataChange=false); an append feed
                # that emitted their `added` files would re-emit the
                # whole table (caught by the round-8 interleaving
                # harness). Skip them.
                continue
            if (
                manifest.get("deleted_from")
                or manifest.get("updated_from")
                or manifest.get("merged_from")
                or manifest.get("dv_added")
            ):
                # a COW rewrite's `added` files are rewritten SURVIVORS
                # — emitting them duplicates rows the feed already
                # delivered, and an append-only feed has no retraction
                # to carry the change. Fail loudly (Delta's append-only
                # streaming-read contract); CDC is a different operator.
                # An INSERT-ONLY merge (merged_from == []) rewrote
                # nothing — its added files are genuinely new rows and
                # flow through like an append.
                raise ValueError(
                    f"kmce_version_feed: version {v} is a copy-on-write "
                    "rewrite; the append-only change feed cannot "
                    "represent deletes/updates"
                )
            mapping = manifest.get("column_mapping", {})
            for rel in manifest.get("added", []):
                table = pq.read_table(_os.path.join(root, rel))
                cols = {}
                for n in names:
                    # files speak PHYSICAL names under column mapping
                    phys = mapping.get(n, n)
                    if phys in table.column_names:
                        cols[n] = table.column(phys).to_pylist()
                    else:
                        cols[n] = [None] * len(table)
                out.extend(zip(*[cols[n] for n in names]))
        # a LIST, not a generator: the simple-reader wrapper pickles
        # the prefetched chunk for recovery replay
        return out

    class VersionFeedReader(SimpleDataSourceStreamReader):
        def __init__(self, options, schema_json):
            self.root = options["root"]
            self.schema_json = schema_json

        def initialOffset(self):
            return {"version": 0}

        def read(self, start):
            latest = latest_version(self.root)
            v0 = start["version"]
            if latest <= v0:
                # no progress: an empty ITERATOR, not a list — the
                # wrapper probes it with next() at latestOffset
                return iter([]), start
            return (
                _added_rows(self.root, self.schema_json, v0, latest),
                {"version": latest},
            )

        def readBetweenOffsets(self, start, end):
            return _added_rows(
                self.root, self.schema_json, start["version"], end["version"]
            )

    class VersionFeedSource(DataSource):
        @classmethod
        def name(cls):
            return "kmce_version_feed"

        def schema(self):
            root = self.options["root"]
            ts = table_schema(root, latest_version(root))
            if ts is None:
                raise ValueError(
                    "kmce_version_feed requires a manifest-recorded schema"
                )
            self._sj = ts.jsonValue()
            return ts

        def simpleStreamReader(self, schema):
            return VersionFeedReader(self.options, schema.jsonValue())

    spark.dataSource.register(VersionFeedSource)
    return "kmce_version_feed"


K23_ORACLE = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang ORDER BY lang
"""

_K23_STAGED: dict = {}


def _k23_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage k23's input: documents as a 4-commit versioned table
    whose change feed the registered query streams."""
    import os as _os
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.queries import staging_key
    from k_means_clustering_via_map_reduce_spark.sources.tables import (
        load_table,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _K23_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_feed_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        for b in range(4):
            commit_append(
                d.filter(F.col("doc_id") % 4 == b).coalesce(1),
                _os.path.join(tmp.name, "t"),
            )
        _K23_STAGED[key] = tmp
    return _os.path.join(_K23_STAGED[key].name, "t")


def ensure_staged(spark: SparkSession, sf_dir: str) -> None:
    """PUBLIC staging entrypoint for the connector entries' input
    tables (f24 range-pruned read, k23 change feed, f38 null-count
    skipping, f40 bloom skipping) — one staging path shared by the
    queries and bench.py's prestage (round-12 ADVICE #3 discipline,
    extended in the r13 optimization round). The registered queries
    measure the connector READ path, which is what their isolated
    min-of-N records have always measured (the staging dict persists
    across runs in a session); prestaging aligns in-suite with those
    records. The verify driver still pays staging inside its own run."""
    _f24_stage(spark, sf_dir)
    _k23_stage(spark, sf_dir)
    _f38_stage(spark, sf_dir)
    _f40_stage(spark, sf_dir)


@query("k23_version_feed_read", oracle=K23_ORACLE)
def k23_version_feed_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K23: stream the versioned table's change feed (4 staged commits)
    through a complete-mode aggregate; the terminal table must equal
    the oracle's batch aggregate over the WHOLE corpus — a skipped
    version, a double-read manifest, or a null-fill slip changes a
    count. The restart-incremental contract (a second run's checkpoint
    consumes only versions committed since the first) is pinned in
    tests/test_version_feed.py."""
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    register_version_feed_source(spark)
    root = _k23_stage(spark, sf_dir)
    name = f"feed_{_uuid.uuid4().hex[:12]}"
    with _tf.TemporaryDirectory(prefix="kmce_feed_ckpt_") as ck:
        q = (
            spark.readStream.format("kmce_version_feed")
            .option("root", root)
            .load()
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("sum_chars"),
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", _os.path.join(ck, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        result = (
            spark.table(name)
            .orderBy("lang")
            .localCheckpoint(eager=True)
        )
        spark.catalog.dropTempView(name)
        return result


# --------------------------------------------------------------------------
# F38 — NULL-COUNT data skipping through the connector (round-12
# surface, library-first; the @query registration is one decorator
# away). Delta records per-file nullCount in its add stats for exactly
# this: `WHERE col IS NOT NULL` skips all-null files and `WHERE col IS
# NULL` skips null-free files before any executor is scheduled.
# commit_append now records per-column null totals + the file row
# count from the parquet footers (versioned.py _collect_file_stats,
# reserved __nulls__/__rows__ keys); pushFilters accepts
# IsNull/IsNotNull and prunes file partitions with them — every filter
# is still yielded back to Spark, so skipping stays a pure file-count
# optimization and can only flip the hash by LOSING a needed file.
#
# Scale: the skip decision is O(#files) driver metadata, the classic
# lever when a sparse optional column (labels, scores, tool outputs)
# is populated in a small fraction of a 100 TB table's files.
# --------------------------------------------------------------------------
_F38_STAGED: dict = {}
F38_BATCHES = 12

F38_ORACLE = f"""
    WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
    mx AS (SELECT max(doc_id) AS hi FROM d),
    e AS (SELECT doc_id, lang,
                 CASE WHEN (doc_id // ((hi + {F38_BATCHES})
                                       // {F38_BATCHES})) % 3 = 0
                      THEN NULL ELSE n_chars END AS opt_chars
          FROM d, mx)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(opt_chars) AS BIGINT) AS sum_opt_chars
    FROM e WHERE opt_chars IS NOT NULL
    GROUP BY lang ORDER BY lang
"""


def _f38_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as a versioned table of F38_BATCHES single-file
    commits where every third file's ``opt_chars`` is entirely NULL —
    per-FILE nullness, so IS NOT NULL pruning is observable."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.queries import staging_key
    from k_means_clustering_via_map_reduce_spark.sources.tables import (
        load_table,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F38_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_f38_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        hi = d.agg(F.max("doc_id")).collect()[0][0]
        step = (hi + F38_BATCHES) // F38_BATCHES
        for b in range(F38_BATCHES):
            part = d.filter(
                (F.col("doc_id") >= b * step)
                & (F.col("doc_id") < (b + 1) * step)
            ).withColumn(
                "opt_chars",
                F.lit(None).cast("bigint")
                if b % 3 == 0
                else F.col("n_chars").cast("bigint"),
            )
            commit_append(part.drop("n_chars").coalesce(1), tmp.name)
        _F38_STAGED[key] = tmp
    return _F38_STAGED[key].name


@query("f38_null_count_skipping", oracle=F38_ORACLE)
def f38_null_count_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F38 (banked): IS NOT NULL aggregation through the connector —
    null-count skipping that drops a needed file loses rows and flips
    the hash; keeping too much only costs time (pruning-bite is pinned
    in tests/test_versioned_connector.py)."""
    register_versioned_source(spark)
    root = _f38_stage(spark, sf_dir)
    df = spark.read.format("kmce_versioned").option("root", root).load()
    return (
        df.filter(F.col("opt_chars").isNotNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("opt_chars").alias("sum_opt_chars"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F40 — BLOOM-FILTER file skipping through the connector (round-13
# surface, library-first; the @query registration is one decorator
# away). Min/max bounds (f23), z-order (f25) and null counts (f38)
# cannot prune an EQUALITY probe on a column whose values INTERLEAVE
# across files — exactly the shape of source/tenant/label ids in an
# ingest-ordered corpus. Delta's answer is a per-column bloom filter
# index; here each opted-in commit records a 512-byte bloom per
# (file, column) in the manifest stats (versioned.py
# _collect_bloom_stats, reserved __bloom__ key), and pushFilters'
# EqualTo probes consult it: a bloom miss skips the file, a missing
# bloom keeps it — skipping can only flip the hash by LOSING a file.
#
# The staging makes the bite attributable to the BLOOM specifically:
# each file holds two sources {src<i>, src<19-i>}, which leaves THREE
# files whose lexicographic [min, max] covers 'src7' (lexicographic
# order puts src7 next-to-last, so no disjoint partitioning can make
# more than three ranges cover it) — min/max skipping keeps 3, the
# bloom keeps exactly the 1 file that holds the probe value (measured;
# pinned in tests/test_versioned_connector.py).
#
# Scale: the probe is O(#files) driver metadata against 512-byte
# bitsets — the standard needle-in-100TB equality lever when sort
# order can't help.
# --------------------------------------------------------------------------
_F40_STAGED: dict = {}
F40_FILES = 10
F40_PROBE = "src7"

F40_ORACLE = f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE source = '{F40_PROBE}'
    GROUP BY lang ORDER BY lang
"""


def _f40_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage documents as F40_FILES single-file commits, file i
    holding sources {src<i>, src<19-i>}, with
    bloom_columns=("source",) on every commit — three files' source
    ranges cover the probe, exactly one's bloom does."""
    import tempfile as _tf

    from k_means_clustering_via_map_reduce_spark.queries import staging_key
    from k_means_clustering_via_map_reduce_spark.sources.tables import (
        load_table,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    key = staging_key(sf_dir, "documents")
    if key not in _F40_STAGED:
        tmp = _tf.TemporaryDirectory(prefix="kmce_f40_")
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "n_chars"
        )
        for i in range(F40_FILES):
            part = d.filter(
                F.col("source").isin(f"src{i}", f"src{19 - i}")
            )
            commit_append(
                part.coalesce(1), tmp.name, bloom_columns=("source",)
            )
        _F40_STAGED[key] = tmp
    return _F40_STAGED[key].name


@query("f40_bloom_skipping", oracle=F40_ORACLE)
def f40_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F40 (registered r13): per-lang stats for ONE source through the
    connector — a bloom that rules out a file actually holding the
    probe value loses rows and flips the hash; a conservative keep
    only costs time."""
    register_versioned_source(spark)
    root = _f40_stage(spark, sf_dir)
    df = spark.read.format("kmce_versioned").option("root", root).load()
    return (
        df.filter(F.col("source") == F40_PROBE)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )
