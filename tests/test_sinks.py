"""Sink round-trips: every writer must produce data the matching reader
recovers exactly, and the centroid text sink must reproduce the
reference's ``centroids.txt`` format (master.py:264-266)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources import (
    load_table,
    write_centroids_txt,
    write_csv,
    write_json,
    write_parquet,
)


def _collect_sorted(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_parquet_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_pq")
    write_parquet(src, out)
    back = spark.read.parquet(out)
    assert _collect_sorted(back, "o_orderkey") == _collect_sorted(src, "o_orderkey")


def test_parquet_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """partitionBy produces a hive layout whose partitions a filtered read
    prunes (the scan only lists matching directories)."""
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_part")
    write_parquet(src, out, partition_by=("o_orderstatus",))
    statuses = {
        r["o_orderstatus"] for r in src.select("o_orderstatus").distinct().collect()
    }
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}
    one = sorted(statuses)[0]
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == one)
    want = src.filter(F.col("o_orderstatus") == one)
    assert back.count() == want.count()


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(src, out)
    back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert _collect_sorted(back, "n_nationkey") == _collect_sorted(src, "n_nationkey")


def test_json_round_trip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    write_json(src, out)
    back = spark.read.schema(src.schema).json(out)
    assert _collect_sorted(back, "r_regionkey") == _collect_sorted(src, "r_regionkey")


def test_centroids_txt_reference_format(tmp_path):
    cents = [(86.80427551269531, 24.972623825073242), (1.5, -2.0)]
    path = str(tmp_path / "centroids.txt")
    write_centroids_txt(cents, path)
    lines = open(path).read().splitlines()
    # the reference's '%.4f,%.4f' per line, no key (master.py:266)
    assert lines == ["86.8043,24.9726", "1.5000,-2.0000"]


def test_centroids_txt_keyed(tmp_path):
    cents = [(0.0, 1.0), (2.0, 3.0)]
    path = str(tmp_path / "centroids_keyed.txt")
    write_centroids_txt(cents, path, keyed=True)
    assert open(path).read().splitlines() == ["0,0.0000,1.0000", "1,2.0000,3.0000"]
