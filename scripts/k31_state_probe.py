"""k31 streaming-top-k state-growth probe (VERDICT r12 "Next round" #7).

The k31 leaderboard keeps one MapState entry per (event_type, user)
plus one epoch ValueState per event_type — the irreducible floor for
an EXACT cumulative-sum top-k (any user may climb into the board
later, so no per-user total can be dropped; only a lossy sketch could
shrink it). The claim to verify is therefore two-sided:

1. state high-water grows LINEARLY in distinct users (the floor), and
2. state is FLAT in history length — replaying more batches over the
   same user population adds zero state rows (totals update in place;
   nothing accumulates per event or per batch).

Method: synthesize a feed of B single-file batches over U users x 5
event types, run ``streaming_topk`` with the RocksDB provider and
``maxFilesPerTrigger=1``, and take the max of
``stateOperators[*].numRowsTotal`` over all progress events.

Run: python scripts/k31_state_probe.py   (prints markdown rows;
paste/refresh the BASELINE.md section from them).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.session import configure
from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    streaming_topk,
)

N_TYPES = 5
ROWS_PER_BATCH = 3_000


def _spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("kmce-k31-state-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return spark


def _stage(
    spark: SparkSession, root: str, users: int, batches: int, tag: str
) -> str:
    src = os.path.join(root, f"{tag}_u{users}_b{batches}")
    os.makedirs(src)
    for b in range(batches):
        (
            spark.range(b * ROWS_PER_BATCH, (b + 1) * ROWS_PER_BATCH)
            .select(
                F.concat(F.lit("t"), (F.col("id") % N_TYPES).cast("string"))
                .alias("event_type"),
                (F.col("id") % users).alias("user_id"),
                F.round((F.col("id") % 997) * 0.01 * 100)
                .cast("bigint")
                .alias("cents"),
            )
            .coalesce(1)
            .write.parquet(os.path.join(src, f"b{b:03d}"))
        )
    return src


def _high_water(spark: SparkSession, src: str, ckpt: str) -> int:
    stream = (
        spark.readStream.schema(
            "event_type STRING, user_id BIGINT, cents BIGINT"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    q = (
        streaming_topk(stream)
        .writeStream.format("memory")
        .queryName("k31_probe")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hw = 0
    for p in q.recentProgress:
        for op in p.get("stateOperators", []):
            hw = max(hw, op.get("numRowsTotal", 0))
    spark.catalog.dropTempView("k31_probe")
    return hw


def main() -> None:
    spark = _spark()
    with tempfile.TemporaryDirectory(prefix="kmce_k31_probe_") as tmp:
        print("| axis | users | batches | state high-water rows |")
        print("|---|---|---|---|")
        for users in (200, 400, 800):
            src = _stage(spark, tmp, users, 4, "u")
            hw = _high_water(
                spark, src, os.path.join(tmp, f"ck_u{users}")
            )
            print(f"| users x{users // 200} | {users} | 4 | {hw} |")
        for batches in (4, 8, 16):
            src = _stage(spark, tmp, 400, batches, "h")
            hw = _high_water(
                spark, src, os.path.join(tmp, f"ck_b{batches}")
            )
            print(f"| history x{batches // 4} | 400 | {batches} | {hw} |")


if __name__ == "__main__":
    main()
