"""F24: the versioned table as a Spark Python DataSource with
pushdown-driven file skipping (round-8 pre-build)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    F24_ORACLE,
    f24_versioned_connector_read,
    register_versioned_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    read_version,
)
from tests.oracle_utils import compare_to_oracle


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        commit_append(
            spark.range(lo, lo + 10)
            .selectExpr("id", "cast(id % 7 as double) as v")
            .coalesce(1),
            root,
        )
    register_versioned_source(spark)
    return root


def _load(spark, root, **opts):
    r = spark.read.format("kmce_versioned").option("root", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_connector_equals_read_version(spark, table):
    got = sorted(map(tuple, _load(spark, table).collect()))
    want = sorted(map(tuple, read_version(spark, table).collect()))
    assert got == want and len(got) == 30


def test_pushed_range_prunes_partitions_and_keeps_rows(spark, table):
    q = _load(spark, table).filter("id >= 100 and id < 110")
    # partitions == surviving files: 1 of 3 (observable skipping)
    assert q.rdd.getNumPartitions() == 1
    assert sorted(r["id"] for r in q.collect()) == list(range(100, 110))
    # a range spanning two files keeps exactly two partitions
    q2 = _load(spark, table).filter("id >= 95 and id <= 205")
    assert q2.rdd.getNumPartitions() == 2


def test_residual_filters_still_apply_post_scan(spark, table):
    """Pruning is file-granular; Spark must still drop the non-matching
    rows INSIDE the surviving file (every filter is yielded back)."""
    q = _load(spark, table).filter("id >= 100 and id < 103")
    assert q.rdd.getNumPartitions() == 1
    assert sorted(r["id"] for r in q.collect()) == [100, 101, 102]


def test_time_travel_option(spark, table):
    v1 = _load(spark, table, version="1")
    assert sorted(r["id"] for r in v1.collect()) == list(range(10))


def test_schema_evolution_null_fill_through_connector(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a")], "id bigint, tag string")
    commit_append(base, root)
    commit_append(
        base.withColumn("id", F.lit(2).cast("bigint")).withColumn(
            "score", F.lit(0.5)
        ),
        root,
    )
    register_versioned_source(spark)
    rows = {r["id"]: r["score"] for r in _load(spark, root).collect()}
    assert rows == {1: None, 2: 0.5}


def test_unpruneable_filter_keeps_all_files(spark, table):
    """A filter on a column with no per-file spread still returns the
    right rows — pruning must never turn conservative-keep into drop."""
    q = _load(spark, table).filter("v = 3.0")
    assert q.rdd.getNumPartitions() == 3
    assert q.count() == read_version(spark, table).filter("v = 3.0").count()


def test_f24_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        f24_versioned_connector_read(spark, sf_dir), F24_ORACLE, sf_dir
    )
