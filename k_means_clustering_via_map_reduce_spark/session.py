"""SparkSession factory and engine-canonical configuration.

The reference boots one gRPC server per worker (mapper.py:13-20,
reducer.py:145-152); the Spark-native equivalent of that whole bootstrap
layer is a single SparkSession. All confs here are chosen for the 100 TB
design point (AQE on, skew handling on) while remaining correct on
local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf values applied both at build time and (idempotently) at runtime on
# sessions we did not create (the verify driver hands us its own session).
_RUNTIME_CONFS: dict[str, str] = {
    # Correctness vs the DuckDB oracle: naive timestamps, compared as UTC.
    "spark.sql.session.timeZone": "UTC",
    # Parquet written without isAdjustedToUTC must surface as TIMESTAMP_NTZ
    # so semantics match DuckDB's naive TIMESTAMP.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # The events table stores TIMESTAMP(NANOS) which Spark cannot read
    # natively; read as long and convert in sources.tables.load_events.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Adaptive execution: runtime broadcast selection, partition coalescing
    # and skew-join splitting — the scale path for every join/agg we emit.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-built session."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — leave whatever the session has.
            pass
    return spark


def get_spark(
    app_name: str = "kmce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build the engine session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — sized so each test
    scale factor's partitions stay well under executor memory; a real
    cluster deployment would raise it (or rely on AQE coalescing, which is
    enabled).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in _RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return configure(spark)
