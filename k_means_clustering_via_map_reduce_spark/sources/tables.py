"""Table sources with explicit schemas.

The reference's only source is a hand-rolled ``x,y``-per-line text parser
(master.py:12-16, mapper.py:107-111). The engine's canonical storage is
Parquet with explicit schemas everywhere — ``inferSchema`` is prohibited
(SURVEY.md §1.5) so scans stay deterministic and column-prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Events parquet stores TIMESTAMP(NANOS), which the Spark parquet
    reader rejects. With ``spark.sql.legacy.parquet.nanosAsLong=true`` the
    column arrives as nanoseconds-since-epoch; convert with integer
    division (``DIV`` — a double round-trip would lose precision at the
    ~1.7e18 magnitude) and truncate to microseconds, exactly matching
    DuckDB's own ns→us truncation.
    """
    df = spark.read.parquet(path)
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame up to the cluster's default
    parallelism when its scan would otherwise under-parallelize.

    Rationale: the test fixtures are single-row-group parquet files, so a
    scan yields ONE partition and every downstream narrow op (pandas UDFs,
    pair-join probe sides, signature computation) runs on one core. On a
    real cluster reading 100 TB the input already has thousands of splits
    and this is a no-op (cur >= target). The repartition shuffle moves only
    the small side once — cheap relative to the compute it parallelizes.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every engine table for one scale factor."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def read_points_csv(spark: SparkSession, path: str) -> DataFrame:
    """The reference's input format: one ``x,y`` float pair per line, no
    header (master.py:12-16, Input/points1.txt). Row order is semantically
    significant (first-K init, master.py:27-30), so attach a stable
    ``row_idx`` from the file line order.

    Engine precision decision: float64 end-to-end; the reference's float32
    gRPC coercion is an artifact, not a semantic (SURVEY.md §1.2, §7.4).
    """
    df = (
        spark.read.schema("x DOUBLE, y DOUBLE")
        .option("header", "false")
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    # zipWithIndex reformulated for DataFrames: number rows WITHIN each
    # scan partition (parallel window keyed on spark_partition_id), then
    # add per-partition offsets from one tiny count aggregate — no
    # unpartitioned global sort, so a large file never funnels through a
    # single task. File scans plan partitions deterministically, so the
    # count pass and the numbering pass see identical partitioning (the
    # same property RDD.zipWithIndex relies on). Index order follows
    # scan-partition order: identical to line order for the single-file
    # parity fixtures this source exists for.
    from pyspark.sql.window import Window

    df = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    counts = df.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    acc, offsets = 0, {}
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offsets[r["_pid"]] = acc
        acc += r["_cnt"]
    offset_map = F.create_map(
        *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
    )
    per_part = Window.partitionBy("_pid").orderBy("_mid")
    return (
        df.withColumn(
            "row_idx",
            (F.row_number().over(per_part) - 1 + offset_map[F.col("_pid")]).cast(
                "int"
            ),
        )
        .drop("_pid", "_mid")
    )
