"""Streaming state-boundedness probe (BASELINE.md §round-6).

The k-family's 100 TB claim is that watermarked event-time aggregation
holds state proportional to OPEN windows × keys — independent of how
much history flows through — while throughput stays linear in rows.
The plan tests pin one stateful operator; this probe MEASURES the state
curve, which no fixture-scale oracle run can show:

1. synthesize a tick history of H hours × K event types at a constant
   rate, staged as one parquet file per 3-hour span in event-time order
   (so the watermark advances batch by batch exactly as a live queue
   consumer would see it);
2. scale HISTORY LENGTH ×1/×2/×4/×8 (same rate, same key cardinality —
   only the amount of history grows);
3. run the k10-shaped query per scale — 10-minute watermark, 1-hour
   tumbling window per type, APPEND mode, maxFilesPerTrigger=1 — and
   read `stateOperators.numRowsTotal` from every progress event: the
   MAX over the run is the state high-water mark;
4. contrast with the SAME aggregate in COMPLETE mode with no watermark
   (the anti-pattern): its state must grow linearly with history.

Expected shape: append-mode high-water state ~constant at every scale
(windows spanning one 3-hour batch + the watermark slack, × K);
complete-mode state = total windows = H × K, doubling per decade. Emitted
rows grow linearly in BOTH modes — correctness is not the difference,
state is.

Run: python scripts/streaming_state_probe.py  (prints markdown tables;
paste/refresh the BASELINE.md section from them).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.session import configure

MULTS = (1, 2, 4, 8)
BASE_HOURS = 48
ROWS_PER_HOUR = 2_000
N_TYPES = 20
CHUNK_HOURS = 3
T0 = "TIMESTAMP '2024-01-01 00:00:00'"


def _spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("kmce-stream-state-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    return spark


def _stage_feed(spark: SparkSession, root: str, hours: int) -> str:
    """One parquet file per CHUNK_HOURS span, named in event-time order."""
    src = os.path.join(root, f"feed_{hours}h")
    os.makedirs(src)
    step_us = 3_600_000_000 // ROWS_PER_HOUR
    for chunk_idx, h0 in enumerate(range(0, hours, CHUNK_HOURS)):
        n = CHUNK_HOURS * ROWS_PER_HOUR
        offset = h0 * ROWS_PER_HOUR
        df = (
            spark.range(offset, offset + n)
            .select(
                F.col("id").alias("event_id"),
                F.expr(
                    f"{T0} + make_interval(0,0,0,0,0,0, id * {step_us} / 1e6)"
                ).alias("ts"),
                (F.col("id") % N_TYPES).cast("string").alias("event_type"),
                (F.col("id") % 97).cast("double").alias("value"),
            )
            .coalesce(1)
        )
        stage = os.path.join(root, f"stage_{hours}_{chunk_idx}")
        df.write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        dst = os.path.join(src, f"{chunk_idx:04d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + 60 * chunk_idx,) * 2)
        shutil.rmtree(stage)
    return src


def _run(spark: SparkSession, src: str, mode: str, name: str):
    """Run the hourly-window aggregate over the staged feed; return
    (wall_s, rows_emitted, max_state_rows, n_batches)."""
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream
    if mode == "append":
        agg = agg.withWatermark("ts", "10 minutes")
    agg = (
        agg.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    t0 = time.time()
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    states = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    emitted = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return wall, emitted, max(states) if states else 0, len(q.recentProgress)


N_USERS = 500
JOIN_HOURS_BASE = 24


def _stage_join_feed(
    spark: SparkSession, root: str, hours: int, side: str
) -> str:
    """Per-side tick feed for the join arm: same rate/keys, clicks
    offset by half a step so every view has in-window candidates."""
    src = os.path.join(root, f"{side}_{hours}h")
    os.makedirs(src)
    step_us = 3_600_000_000 // ROWS_PER_HOUR
    half = step_us // 2 if side == "click" else 0
    for chunk_idx, h0 in enumerate(range(0, hours, CHUNK_HOURS)):
        n = CHUNK_HOURS * ROWS_PER_HOUR
        offset = h0 * ROWS_PER_HOUR
        df = (
            spark.range(offset, offset + n)
            .select(
                F.col("id").alias(f"{side}_id"),
                F.expr(
                    f"{T0} + make_interval(0,0,0,0,0,0,"
                    f" (id * {step_us} + {half}) / 1e6)"
                ).alias(f"{side}_ts"),
                (F.col("id") % N_USERS).alias("user_id"),
            )
            .coalesce(1)
        )
        stage = os.path.join(root, f"stage_{side}_{hours}_{chunk_idx}")
        df.write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        dst = os.path.join(src, f"{chunk_idx:04d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + 60 * chunk_idx,) * 2)
        shutil.rmtree(stage)
    return src


def _run_join(spark: SparkSession, vsrc: str, csrc: str, bounded: bool,
              name: str):
    """Inner stream-stream join; bounded = watermarks + interval
    condition (state evictable), unbounded = bare 1:1 equi-join on the
    unique event id — the OUTPUT stays linear (one match per row, so
    the two arms' result volumes are comparable) but with no watermark
    Spark cannot prove a key won't match again and must buffer BOTH
    sides forever."""
    def _stream(src):
        return (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    views, clicks = _stream(vsrc), _stream(csrc)
    if bounded:
        views = views.withWatermark("view_ts", "10 minutes")
        clicks = clicks.withWatermark("click_ts", "10 minutes")
        cond = (
            (views.user_id == clicks.user_id)
            & (clicks.click_ts >= views.view_ts)
            & (clicks.click_ts < views.view_ts + F.expr("INTERVAL 5 MINUTES"))
        )
    else:
        cond = views.view_id == clicks.click_id
    joined = views.join(clicks, cond, "inner").select(
        views.user_id, "view_id", "click_id"
    )
    t0 = time.time()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    states = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    emitted = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return wall, emitted, max(states) if states else 0


def join_probe(spark: SparkSession) -> None:
    rows = []
    with tempfile.TemporaryDirectory(
        prefix="kmce_join_probe_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    ) as tmp:
        for mult in MULTS:
            hours = JOIN_HOURS_BASE * mult
            vsrc = _stage_join_feed(spark, tmp, hours, "view")
            csrc = _stage_join_feed(spark, tmp, hours, "click")
            w_b, e_b, s_b = _run_join(
                spark, vsrc, csrc, True, f"jb_{mult}"
            )
            w_u, e_u, s_u = _run_join(
                spark, vsrc, csrc, False, f"ju_{mult}"
            )
            rows.append((mult, hours, hours * ROWS_PER_HOUR, w_b, e_b,
                         s_b, w_u, e_u, s_u))
            print(f"x{mult}: bounded wall {w_b:.1f}s state_max {s_b} "
                  f"emitted {e_b} | unbounded wall {w_u:.1f}s "
                  f"state_max {s_u} emitted {e_u}", flush=True)
    print("\n| hist | hours | rows/side | bounded wall s | bounded emitted"
          " | bounded state max | unbounded wall s | unbounded state max |")
    print("|---|---|---|---|---|---|---|---|")
    for m, h, n, wb, eb, sb, wu, eu, su in rows:
        print(f"| ×{m} | {h} | {n:,} | {wb:.1f} | {eb:,} | {sb:,} | "
              f"{wu:.1f} | {su:,} |")


def _stage_k22_feed(
    spark: SparkSession, root: str, hours: int, side: str
) -> str:
    """k22-schema feed (event_id, ts, user_id) — same constant rate and
    half-step click offset as the join arm, staged in time order."""
    src = os.path.join(root, f"k22_{side}_{hours}h")
    os.makedirs(src)
    step_us = 3_600_000_000 // ROWS_PER_HOUR
    half = step_us // 2 if side == "click" else 0
    base = 1_000_000_000 if side == "click" else 0
    for chunk_idx, h0 in enumerate(range(0, hours, CHUNK_HOURS)):
        n = CHUNK_HOURS * ROWS_PER_HOUR
        offset = h0 * ROWS_PER_HOUR
        df = (
            spark.range(offset, offset + n)
            .select(
                (F.col("id") + base).alias("event_id"),
                F.expr(
                    f"{T0} + make_interval(0,0,0,0,0,0,"
                    f" (id * {step_us} + {half}) / 1e6)"
                ).alias("ts"),
                (F.col("id") % N_USERS).alias("user_id"),
            )
            .coalesce(1)
        )
        stage = os.path.join(root, f"k22stage_{side}_{hours}_{chunk_idx}")
        df.write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        dst = os.path.join(src, f"{chunk_idx:04d}.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + 60 * chunk_idx,) * 2)
        shutil.rmtree(stage)
    return src


def ingest_join_probe(spark: SparkSession) -> None:
    """k22 = the watermarked interval join chained into the VERSIONED
    SINK. The round-6 join arm proved join state flat under history
    growth with a memory sink; this arm proves the claim SURVIVES the
    storage chaining — same state curve, plus the sink-side costs the
    memory arm can't show: versions = micro-batches (not history),
    per-commit ledger work = one latest-manifest read (ledger length =
    versions), landed rows exactly linear. A sink that held rows back,
    or a ledger that rescanned per batch, would bend these curves."""
    import json as _json

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        applied_batches,
        latest_version,
        read_version,
    )
    from k_means_clustering_via_map_reduce_spark.streaming.ingest import (
        run_joined_versioned_ingest,
    )

    rows = []
    with tempfile.TemporaryDirectory(
        prefix="kmce_k22_probe_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    ) as tmp:
        for mult in MULTS:
            hours = JOIN_HOURS_BASE * mult
            vsrc = _stage_k22_feed(spark, tmp, hours, "view")
            csrc = _stage_k22_feed(spark, tmp, hours, "click")
            root = os.path.join(tmp, f"table_{mult}")
            t0 = time.time()
            progress = run_joined_versioned_ingest(
                spark, vsrc, csrc, root, os.path.join(tmp, f"ckpt_{mult}")
            )
            wall = time.time() - t0
            states = [
                p["stateOperators"][0]["numRowsTotal"]
                for p in progress
                if p.get("stateOperators")
            ]
            versions = latest_version(root)
            landed = read_version(spark, root).count()
            ledger = len(applied_batches(root))
            manifest = os.path.join(
                root, "_manifests", f"v{versions:05d}.json"
            )
            with open(manifest) as fh:
                n_files = len(_json.load(fh)["files"])
            rows.append((mult, hours, hours * ROWS_PER_HOUR, wall,
                         max(states) if states else 0, versions, ledger,
                         landed, n_files))
            print(f"x{mult}: wall {wall:.1f}s state_max "
                  f"{max(states) if states else 0} versions {versions} "
                  f"ledger {ledger} landed {landed} files {n_files}",
                  flush=True)
    print("\n| hist | hours | rows/side | wall s | join state max | "
          "versions | ledger len | landed pairs | files @ latest |")
    print("|---|---|---|---|---|---|---|---|---|")
    for m, h, n, w, s, v, led, landed, nf in rows:
        print(f"| ×{m} | {h} | {n:,} | {w:.1f} | {s:,} | {v} | {led} | "
              f"{landed:,} | {nf} |")


def main() -> None:
    spark = _spark()
    if "--ingest-join" in sys.argv:
        ingest_join_probe(spark)
        spark.stop()
        return
    if "--join" in sys.argv:
        join_probe(spark)
        spark.stop()
        return
    rows = []
    with tempfile.TemporaryDirectory(
        prefix="kmce_state_probe_",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    ) as tmp:
        for mult in MULTS:
            hours = BASE_HOURS * mult
            src = _stage_feed(spark, tmp, hours)
            w_app, emit_app, st_app, nb_app = _run(
                spark, src, "append", f"probe_app_{mult}"
            )
            w_cmp, emit_cmp, st_cmp, nb_cmp = _run(
                spark, src, "complete", f"probe_cmp_{mult}"
            )
            rows.append(
                (mult, hours, hours * ROWS_PER_HOUR, w_app, emit_app,
                 st_app, w_cmp, emit_cmp, st_cmp)
            )
            print(
                f"x{mult}: append wall {w_app:.1f}s state_max {st_app} "
                f"emitted {emit_app} ({nb_app} batches) | complete wall "
                f"{w_cmp:.1f}s state_max {st_cmp}", flush=True,
            )
    print("\n| hist | hours | rows | append wall s | append emitted | "
          "append state max | complete wall s | complete state max |")
    print("|---|---|---|---|---|---|---|---|")
    for m, h, n, wa, ea, sa, wc, ec, sc in rows:
        print(f"| ×{m} | {h} | {n:,} | {wa:.1f} | {ea:,} | {sa:,} | "
              f"{wc:.1f} | {sc:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
