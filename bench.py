"""Benchmark harness: run every registered engine query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is timed end-to-end: plan build + execution + collect().
Result sets are presentation-sized (the large tables only ever leave
aggregates/top-k), so collect() measures engine work, not driver I/O.

Isolation mode (for regression triage on a host with ~3x same-day
ambient variance between full-suite runs):

    python bench.py --isolate k2_kmeans_mllib [-n 3]

runs ONE query n times in a fresh warmed session and prints a JSON line
with min/median/all timings.  min-of-n warm runs is the stable statistic
used by BASELINE.md's named tables.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import pandas as pd  # module-level so pandas_udf type hints resolve

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from k_means_clustering_via_map_reduce_spark.session import get_spark

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()


def _warm(spark) -> None:
    # Warm the JVM / codegen / parquet footer caches AND the Python UDF
    # worker pool (fork + numpy/pandas import across all cores) with
    # trivial actions, so the first timed query doesn't absorb session
    # startup. Workers are reused afterwards (spark.python.worker.reuse).
    spark.range(1000).selectExpr("sum(id)").collect()

    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _noop(s: pd.Series) -> pd.Series:
        return s

    spark.range(100_000, numPartitions=64).select(_noop(col("id"))).count()

    # The iterator-style Python eval paths (MapInPandasExec /
    # MapInArrowExec) have their own first-use JVM class loading and
    # executor worker-module pools, separate from the scalar
    # ArrowEvalPython path warmed above — m1-m17/d3-class entries paid
    # it inside their first timed run (m10 measured 2.1 s first vs
    # 1.1 s warm in one session). One-row passes load both.
    def _mip(batches):
        for b in batches:
            yield b

    spark.range(10).mapInPandas(_mip, "id LONG").count()
    spark.range(10).mapInArrow(_mip, "id LONG").count()

    # Warm the Structured Streaming machinery (engine classes, state
    # store provider, offset/commit logs, stateful-agg codegen) with a
    # one-row stream, so the first timed streaming query measures the
    # query, not one-time class loading. The warm query CHAINS two
    # windowed aggregations: the multiple-stateful-operators planner
    # and codegen path is a separate one-time cost that a single-agg
    # warm leaves cold (k18 measured 19.5 s first-use vs 4.1 s warm in
    # one session — the whole in-suite-vs-isolated gap was its own
    # first-use class loading, not neighbor interference).
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory(prefix="kmce_warm_") as warm_dir:
        src = os.path.join(warm_dir, "src")
        spark.sql(
            "SELECT TIMESTAMP'2024-01-01 00:00:00' AS ts, 1L AS v"
        ).write.parquet(src)
        q = (
            spark.readStream.schema("ts TIMESTAMP, v BIGINT")
            .parquet(src)
            .withWatermark("ts", "1 minute")
            .groupBy(F.window("ts", "15 minutes").alias("w1"))
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(F.window(F.window_time("w1"), "1 hour"))
            .agg(F.sum("c").alias("s"))
            .writeStream.format("memory")
            .queryName("warm_stream")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(warm_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.dropTempView("warm_stream")

    _warm_python_datasource(spark)
    _warm_tws(spark)


def _warm_python_datasource(spark) -> None:
    """Warm the Python DataSource framework (Spark 4, SPARK-44076).

    Each of its driver-side worker MODULES (create_data_source,
    plan_data_source, write_into_data_source, the streaming-reader
    runner) spawns a fresh Python process that imports pyspark on its
    FIRST use (~1-3 s each on this host), and the executor-side
    PythonDataSource scan/write exec nodes have their own one-time JVM
    class loading. A full read + write + streaming-read round through a
    bench-local ONE-ROW source loads all of it once, untimed, so the
    f15/f17/k16/f24/k23-class entries measure their queries instead of
    framework bootstrap — measured first-use 4.2/5.1/7.1 s vs warm
    0.7/0.2/3.2 s in one session (guide §1.5/§4; VERDICT r13
    "Next round" #1). The warm source is registered under its own name;
    every engine source still registers and plans itself inside its
    timed run."""
    import os
    import tempfile

    try:
        from pyspark.sql.datasource import (
            DataSource,
            DataSourceReader,
            DataSourceWriter,
            InputPartition,
            SimpleDataSourceStreamReader,
            WriterCommitMessage,
        )
    except ImportError:  # pre-4.0 PySpark: nothing to warm
        return

    class _WarmReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(0)]

        def read(self, part):
            yield (0,)

    class _WarmStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= 1:
                return [], start
            return [(0,)], {"pos": 1}

        def readBetweenOffsets(self, start, end):
            return [(0,)] if end["pos"] > start["pos"] else []

    class _WarmWriter(DataSourceWriter):
        def write(self, rows):
            n = sum(1 for _ in rows)
            return WriterCommitMessage()

        def commit(self, messages):
            pass

        def abort(self, messages):
            pass

    class _WarmSource(DataSource):
        @classmethod
        def name(cls):
            return "kmce_bench_warm"

        def schema(self):
            return "i BIGINT"

        def reader(self, schema):
            return _WarmReader()

        def simpleStreamReader(self, schema):
            return _WarmStreamReader()

        def writer(self, schema, overwrite):
            return _WarmWriter()

    try:
        spark.dataSource.register(_WarmSource)
        # batch read path (create_data_source + plan_data_source +
        # executor scan workers)
        spark.read.format("kmce_bench_warm").load().collect()
        # write path (write_into_data_source + commit protocol)
        with tempfile.TemporaryDirectory(prefix="kmce_warm_ds_") as tmp:
            spark.range(1).write.format("kmce_bench_warm").mode(
                "append"
            ).save(os.path.join(tmp, "out"))
            # streaming read path (python streaming source runner +
            # offset log plumbing)
            q = (
                spark.readStream.format("kmce_bench_warm")
                .load()
                .writeStream.format("noop")
                .option(
                    "checkpointLocation", os.path.join(tmp, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    except Exception as exc:  # warm must never kill the bench
        print(f"# datasource warm failed: {exc}", file=sys.stderr)


def _warm_tws(spark) -> None:
    """Warm transformWithStateInPandas + the RocksDB state store
    provider with a one-row, one-key, 2-partition stream: RocksDB JNI
    library load, the TWS planner rules and state-server protocol
    classes, the stateful-processor Python worker module, and the
    timer/expiry path are all one-time costs the first TWS entry
    (k8b, then k29-k31) absorbed inside its timed run (k8b measured
    4.6 s first-use vs 3.2 s warm). VERDICT r13 "Next round" #3 asks
    for exactly this: fold the provider init into _warm. The warm uses
    its own throwaway checkpoint and state; the timed queries still
    build, run, and commit their own streams end-to-end."""
    import os
    import tempfile

    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )
    except ImportError:
        return
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        return

    class _WarmProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._h = handle
            self._v = handle.getValueState("v", "n BIGINT")
            self._l = handle.getListState("l", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            self._v.update((n,))
            self._l.appendList([(n,)])
            # register an already-expired timer so the expiry path
            # (handleExpiredTimer + timer state column families) loads
            self._h.registerTimer(1)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield pd.DataFrame({"k": [key[0]], "n": [1]})

        def close(self) -> None:
            pass

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(conf_key)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(conf_key, ROCKSDB_PROVIDER)
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        with tempfile.TemporaryDirectory(prefix="kmce_warm_tws_") as tmp:
            src = os.path.join(tmp, "src")
            spark.sql(
                "SELECT TIMESTAMP'2024-01-01 00:00:00' AS ts, 1L AS k"
            ).write.parquet(src)
            q = (
                spark.readStream.schema("ts TIMESTAMP, k BIGINT")
                .parquet(src)
                .withWatermark("ts", "0 seconds")
                .groupBy("k")
                .transformWithStateInPandas(
                    statefulProcessor=_WarmProc(),
                    outputStructType="k BIGINT, n BIGINT",
                    outputMode="Append",
                    timeMode="EventTime",
                )
                .writeStream.format("noop")
                .option(
                    "checkpointLocation", os.path.join(tmp, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    except Exception as exc:  # warm must never kill the bench
        print(f"# tws warm failed: {exc}", file=sys.stderr)
    finally:
        spark.conf.set(conf_key, prev_provider)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _prestage(spark, sf_dir: str) -> float:
    """Build SHARED artifacts before the timed sweep — the persisted
    s7/s8 ANN catalog tables and the staged streaming feed dirs — so
    in-suite numbers measure queries, not whichever entry happens to
    run first after a registry reorder (the s12/s5/m-family audit-noise
    class, VERDICT r11 "What's wrong" #2). Returns the staging seconds,
    reported separately in the bench record. Each module exposes ONE
    public ``ensure_staged`` that its queries call too, so the bench
    prestage can never desynchronize from what the queries actually
    serve from (round-12 ADVICE #3)."""
    from k_means_clustering_via_map_reduce_spark.operators import (
        dedup as D,
    )
    from k_means_clustering_via_map_reduce_spark.operators import (
        similarity as S,
    )
    from k_means_clustering_via_map_reduce_spark.queries import (
        ensure_staged_incremental,
        staged_partitioned_events,
    )
    from k_means_clustering_via_map_reduce_spark.sources import (
        python_source as P,
    )
    from k_means_clustering_via_map_reduce_spark.streaming import (
        ingest as I,
    )
    from k_means_clustering_via_map_reduce_spark.streaming import (
        latedata as L,
    )
    from k_means_clustering_via_map_reduce_spark.streaming import (
        windows as W,
    )

    t0 = time.perf_counter()
    S.ensure_staged(spark, sf_dir)
    W.ensure_staged(spark, sf_dir)
    I.ensure_staged(spark, sf_dir)
    L.ensure_staged(spark, sf_dir)
    D.ensure_staged(spark, sf_dir)
    P.ensure_staged(spark, sf_dir)
    ensure_staged_incremental(spark, sf_dir)
    staged_partitioned_events(spark, sf_dir)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--isolate",
        metavar="QUERY",
        help="time ONE named query n times instead of the full suite",
    )
    parser.add_argument(
        "-n",
        type=int,
        default=3,
        help="repetitions for --isolate (default 3)",
    )
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="kmce-bench")
    _warm(spark)
    prestage_sec = _prestage(spark, sf_dir)
    print(f"# prestage: {prestage_sec:.3f}s", file=sys.stderr, flush=True)

    if args.isolate:
        if args.isolate not in Q.QUERIES:
            sys.exit(f"unknown query: {args.isolate}")
        fn = Q.QUERIES[args.isolate]
        runs = []
        for i in range(args.n):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            print(
                f"# {args.isolate} run {i + 1}/{args.n}: {dt:.3f}s "
                f"({len(rows)} rows)",
                file=sys.stderr,
                flush=True,
            )
        print(
            json.dumps(
                {
                    "metric": f"isolated:{args.isolate}",
                    "value": min(runs),
                    "unit": "sec",
                    "runs": runs,
                    "median": round(statistics.median(runs), 3),
                    "sf": sf,
                }
            )
        )
        return

    # Live-trigger streaming entries leave engine machinery winding
    # down after query.stop() — state-store maintenance threads,
    # trigger executors, checkpoint cleanup — which bleeds into the
    # NEXT few timed entries (m10 measured 9.4 s in-suite vs 1.4 s
    # isolated in r13 purely from running after k31; after the r13
    # TWS-last reorder the m-family STILL read 4-5x its isolated
    # numbers because the sorted order puts it right after the non-TWS
    # k-stream tail). Round-13 optimization: schedule ALL live-trigger
    # streaming entries after the batch entries (sorted within each
    # block), with the transformWithStateInPandas/RocksDB entries last
    # of all, so wind-down bleed lands inside the streaming block —
    # whose numbers are bootstrap-dominated and self-inflicted — or
    # after the final measurement. Ordering only; every entry is still
    # timed end-to-end with the same action (old numbers kept:
    # BENCH_LOCAL_r13.json predates this reorder).
    _STREAM_LAST = (
        "k4_stream_sessions",
        "k4_stream_sliding",
        "k4_stream_tumbling",
        "k5_stream_cluster_counts",
        "k6_stream_attribution",
        "k7_stream_dedup",
        "k7b_dedup_within_watermark",
        "k8_stateful_totals",
        "k9_stream_enrich",
        "k10_watermark_eviction",
        "k11_stream_parquet_sink",
        "k12_foreachbatch_upsert",
        "k15_stream_outer_join",
        "k16_python_stream_source",
        "k17_stream_full_outer_join",
        "k18_chained_stream_agg",
        "k19_stream_join_then_agg",
        "k20_stream_source_watermark",
        "k21_stream_versioned_ingest",
        "k22_joined_versioned_ingest",
        "k23_version_feed_read",
        "k27_stream_semi_join",
        "k28_pinned_enrich",
    )
    _TWS_LAST = (
        "k8b_stateful_totals_tws",
        "k29_session_timers",
        "k30_mapstate_totals",
        "k31_streaming_topk",
    )
    _deferred = set(_STREAM_LAST) | set(_TWS_LAST)
    run_order = [n for n in sorted(Q.QUERIES) if n not in _deferred]
    run_order += [n for n in _STREAM_LAST if n in Q.QUERIES]
    run_order += [n for n in _TWS_LAST if n in Q.QUERIES]

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in ((n, Q.QUERIES[n]) for n in run_order):
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(
            f"# {name}: {dt:.3f}s ({len(rows)} rows)",
            file=sys.stderr,
            flush=True,
        )

    # The driver preserves only the TAIL of this output (observed: last
    # ~2000 chars of the one JSON line), so order the per-query map by
    # time ASCENDING: the heaviest (most regression-relevant) timings
    # sit at the end of the dict and survive any tail cut.
    ordered = dict(sorted(timings.items(), key=lambda kv: kv[1]))
    record = {
        "metric": "engine_query_suite_total",
        "value": round(total, 3),
        "unit": "sec",
        "prestage_sec": prestage_sec,
        "queries": ordered,
        "sf": sf,
    }
    # Truncation-proof durable copy: the full timing map, written into
    # the repo so the d*/f*/k* numbers survive regardless of the
    # driver's artifact policy (VERDICT r04 "What's wrong" #2).
    local_path = os.environ.get(
        "SPARK_GRAFT_BENCH_LOCAL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    try:
        with open(local_path, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=False)
            fh.write("\n")
    except OSError as exc:  # never let the durable copy kill the bench
        print(f"# BENCH_LOCAL write failed: {exc}", file=sys.stderr)
    print(json.dumps(record))
    # The driver keeps only the last ~2000 chars of stdout, which
    # truncates the full record into an unparseable fragment (VERDICT
    # r12 "Next round" #4) — so the LAST line is a compact
    # aggregate-only record that always survives the tail cut; the
    # full per-query map lives in the line above and in BENCH_LOCAL.
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "engine_query_suite_total",
                "value": round(total, 3),
                "unit": "sec",
                "n_queries": len(timings),
                "prestage_sec": prestage_sec,
                "sf": sf,
                "top5": top5,
                "full_map": "BENCH_LOCAL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
