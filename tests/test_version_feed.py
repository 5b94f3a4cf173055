"""K23: the versioned table as a streaming change feed (round-8
pre-build) — version-offset determinism, restart incrementality, and
the driver-style oracle pre-validation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    K23_ORACLE,
    k23_version_feed_read,
    register_version_feed_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
)
from tests.oracle_utils import compare_to_oracle


def _run_feed_to_sink(spark, root, sink, ckpt):
    """One availableNow run: land the feed's NEW rows into a parquet
    sink (durable — the append-mode memory sink cannot recover from a
    checkpoint)."""
    q = (
        spark.readStream.format("kmce_version_feed")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_feed_drains_all_versions_once(spark, tmp_path):
    root = str(tmp_path / "t")
    for b in range(3):
        commit_append(
            spark.range(b * 10, b * 10 + 10).selectExpr(
                "id", "cast(id as double) as v"
            ),
            root,
        )
    register_version_feed_source(spark)
    sink = str(tmp_path / "sink")
    _run_feed_to_sink(spark, root, sink, str(tmp_path / "ckpt"))
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(30))


def test_restart_consumes_only_new_versions(spark, tmp_path):
    """The scheduled-job contract: run 1 lands versions 1-2; more
    commits happen; run 2 with the SAME checkpoint lands exactly the
    new versions — no replay, no loss."""
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    for b in range(2):
        commit_append(
            spark.range(b * 10, b * 10 + 10).selectExpr(
                "id", "cast(id as double) as v"
            ),
            root,
        )
    register_version_feed_source(spark)
    _run_feed_to_sink(spark, root, sink, ckpt)
    n_after_first = spark.read.parquet(sink).count()
    assert n_after_first == 20
    commit_append(
        spark.range(100, 105).selectExpr("id", "cast(id as double) as v"),
        root,
    )
    _run_feed_to_sink(spark, root, sink, ckpt)
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(20)) + list(range(100, 105))


def test_noop_run_emits_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    commit_append(
        spark.range(5).selectExpr("id", "cast(id as double) as v"), root
    )
    register_version_feed_source(spark)
    _run_feed_to_sink(spark, root, sink, ckpt)
    _run_feed_to_sink(spark, root, sink, ckpt)  # nothing new committed
    assert spark.read.parquet(sink).count() == 5


def test_feed_null_fills_evolved_columns(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "a")], "id bigint, tag string")
    commit_append(base, root)
    commit_append(
        base.withColumn("id", F.lit(2).cast("bigint")).withColumn(
            "score", F.lit(0.5)
        ),
        root,
    )
    register_version_feed_source(spark)
    sink = str(tmp_path / "sink")
    _run_feed_to_sink(spark, root, sink, str(tmp_path / "ckpt"))
    rows = {r["id"]: r["score"] for r in spark.read.parquet(sink).collect()}
    assert rows == {1: None, 2: 0.5}


def test_k23_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(k23_version_feed_read(spark, sf_dir), K23_ORACLE, sf_dir)


def test_read_changes_batch_diff(spark, tmp_path):
    """Batch table_changes: the diff between any two versions equals
    the rows appended between them; diffs COMPOSE (v0->v1 + v1->v2 ==
    v0->v2); compaction contributes nothing; COW raises."""
    import pytest

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
        delete_where,
        read_changes,
    )

    root = str(tmp_path / "t")
    batches = []
    for b in range(3):
        rows = [(b * 10 + i, f"b{b}") for i in range(4)]
        commit_append(
            spark.createDataFrame(rows, "id BIGINT, tag STRING"), root
        )
        batches.append(rows)

    def got(v0, v1=None):
        return sorted(map(tuple, read_changes(spark, root, v0, v1).collect()))

    assert got(0) == sorted(r for b in batches for r in b)
    assert got(1, 2) == sorted(batches[1])
    # composition
    assert sorted(got(0, 1) + got(1, 3)) == got(0, 3)
    # empty range on a schema-recorded table
    assert got(2, 2) == []
    # compaction inside the range contributes nothing
    compact(spark, root, target_files=1)  # v4
    commit_append(
        spark.createDataFrame([(99, "z")], "id BIGINT, tag STRING"), root
    )  # v5
    assert got(3) == [(99, "z")]
    # COW poisons the diff
    delete_where(spark, root, "id = 0")  # v6
    with pytest.raises(ValueError, match="copy-on-write"):
        read_changes(spark, root, 5)
    # but a range BEFORE the COW still reads fine
    assert got(3, 5) == [(99, "z")]
    # bounds are validated
    with pytest.raises(ValueError, match="need 0 <= v0"):
        read_changes(spark, root, 7, 99)


def test_f27_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F27_ORACLE,
        f27_change_diff_read,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(f27_change_diff_read(spark, sf_dir), F27_ORACLE, sf_dir)
