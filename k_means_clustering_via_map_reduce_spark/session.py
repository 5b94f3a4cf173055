"""SparkSession factory and engine-canonical configuration.

The reference boots one gRPC server per worker (mapper.py:13-20,
reducer.py:145-152); the Spark-native equivalent of that whole bootstrap
layer is a single SparkSession. All confs here are chosen for the 100 TB
design point (AQE on, skew handling on) while remaining correct on
local[N] test runs.
"""

from __future__ import annotations

import os
import tempfile
import uuid
import zipfile

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
    # Catalyst filter pushdown INTO Python DataSources (4.1 API) — the
    # kmce_versioned connector turns pushed predicates into manifest
    # file skipping (sources/python_source.py:register_versioned_source).
    "spark.sql.python.filterPushdown.enabled": "true",
}


def _ship_package(spark: SparkSession) -> None:
    """Make the engine package importable on executor Python workers.

    Pandas UDF / mapInPandas closures are cloudpickled with by-reference
    imports of this package; when the driver (e.g. the verify harness)
    runs from a cwd outside the repo, workers cannot resolve them. Zip the
    package once and ``addPyFile`` it — Spark distributes the zip and puts
    it on every worker's sys.path, locally and on a real cluster alike.
    """
    sc = spark.sparkContext
    if getattr(sc, "_kmce_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="kmce_pkg_")
    zpath = os.path.join(staging, f"kmce_engine_{uuid.uuid4().hex[:8]}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    sc._kmce_pkg_shipped = True


def configure(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-built session."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static conf on this build — leave whatever the session has.
            pass
    # Size the shuffle fan-out to the session's actual parallelism, like
    # get_spark does for our own sessions: an externally-built session
    # (the verify driver's) carries Spark's 200-partition default, which
    # multiplies per-JOB fixed cost ~6x on iterative operators (connected
    # components, Lloyd's — one job per round) at test scale. ONLY when
    # the conf still sits at Spark's out-of-the-box 200 though — a
    # caller that set its own value (a cluster session configured before
    # calling into the engine) keeps it. The large-data case is owned by
    # AQE coalescing either way.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(spark.sparkContext.defaultParallelism),
            )
    except Exception:
        pass
    _ship_package(spark)
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
    # transformWithState's Python driver worker imports the protobuf
    # state protocol, and inherits PYTHONPATH as captured at JVM
    # launch — so the protobuf shim must export it BEFORE the session
    # is built (import-order-independent here; the gate inside
    # streaming.stateful covers externally-built sessions only when
    # the package is imported first, which pytest collection order
    # does not guarantee).
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        _enable_tws_protobuf_shim,
    )

    _enable_tws_protobuf_shim()
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
