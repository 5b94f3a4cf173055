"""F26 MERGE INTO (round-9 pre-build): upsert semantics, file-granular
COW, history immutability, loud guards, and the driver-style oracle
pre-validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    latest_version,
    merge_into,
    read_manifest,
    read_version,
)


def _rows(spark, root, version=None):
    return sorted(
        map(tuple, read_version(spark, root, version).collect())
    )


def _table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"b{i % 3}", float(i)) for i in range(12)],
        "id BIGINT, tag STRING, v DOUBLE",
    )
    commit_append(df.repartition(3, "tag"), root)
    return root


def test_merge_updates_and_inserts_in_one_commit(spark, tmp_path):
    root = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "UPD", 200.0), (5, "UPD", 500.0), (100, "NEW", 1.0)],
        "id BIGINT, tag STRING, v DOUBLE",
    )
    v = merge_into(spark, root, src, "id")
    assert v == 2
    got = dict((r[0], (r[1], r[2])) for r in _rows(spark, root))
    assert got[2] == ("UPD", 200.0) and got[5] == ("UPD", 500.0)
    assert got[100] == ("NEW", 1.0)
    assert len(got) == 13
    # untouched rows byte-identical
    assert got[0] == ("b0", 0.0) and got[7] == ("b1", 7.0)


def test_merge_preserves_target_duplicate_multiplicity(spark, tmp_path):
    """Delta semantics: EVERY stored row with a matched key updates —
    duplicates stay duplicates, each carrying the source values."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (1, "a2", 2.0), (2, "b", 3.0)],
        "id BIGINT, tag STRING, v DOUBLE",
    )
    commit_append(df, root)
    src = spark.createDataFrame(
        [(1, "U", 9.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    merge_into(spark, root, src, "id")
    rows = _rows(spark, root)
    assert rows == [(1, "U", 9.0), (1, "U", 9.0), (2, "b", 3.0)]


def test_merge_carries_clean_files_by_name(spark, tmp_path):
    root = _table(spark, tmp_path)
    before = set(read_manifest(root, 1)["files"])
    # update rows of ONE tag bucket only
    src = spark.createDataFrame(
        [(0, "X", 0.5), (3, "X", 3.5)], "id BIGINT, tag STRING, v DOUBLE"
    )
    v = merge_into(spark, root, src, "id")
    m = read_manifest(root, v)
    carried = before & set(m["files"])
    assert m["merged_from"] and set(m["merged_from"]) <= before
    assert carried == before - set(m["merged_from"])


def test_merge_history_immutable_and_empty_source_noop(spark, tmp_path):
    root = _table(spark, tmp_path)
    pre = _rows(spark, root, 1)
    src = spark.createDataFrame(
        [(2, "UPD", 200.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    merge_into(spark, root, src, "id")
    assert _rows(spark, root, 1) == pre  # time travel unchanged
    empty = spark.createDataFrame([], "id BIGINT, tag STRING, v DOUBLE")
    assert merge_into(spark, root, empty, "id") == 2  # no version burned
    assert latest_version(root) == 2


def test_merge_insert_only_source_still_commits(spark, tmp_path):
    root = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(50, "NEW", 5.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    v = merge_into(spark, root, src, "id")
    assert v == 2
    m = read_manifest(root, v)
    assert m["merged_from"] == []  # nothing rewritten, pure insert
    assert (50, "NEW", 5.0) in _rows(spark, root)


def test_merge_rejects_duplicate_source_keys_and_bad_columns(spark, tmp_path):
    root = _table(spark, tmp_path)
    dup = spark.createDataFrame(
        [(1, "a", 1.0), (1, "b", 2.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, root, dup, "id")
    bad = spark.createDataFrame([(1, "a")], "id BIGINT, tag STRING")
    with pytest.raises(ValueError, match="must\n?.*equal table columns"):
        merge_into(spark, root, bad, "id")


def test_merge_poisons_the_change_feed(spark, tmp_path):
    """A merge version is a COW rewrite — the append-only change feed
    must refuse to stream across it."""
    from k_means_clustering_via_map_reduce_spark.sources.python_source import (
        register_version_feed_source,
    )

    register_version_feed_source(spark)
    root = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "UPD", 200.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    merge_into(spark, root, src, "id")
    with pytest.raises(Exception, match="copy-on-write"):
        q = (
            spark.readStream.format("kmce_version_feed")
            .option("root", root)
            .load()
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "s"))
            .option("checkpointLocation", str(tmp_path / "c"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def test_f26_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F26_ORACLE,
        f26_merge_into_read,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(f26_merge_into_read(spark, sf_dir), F26_ORACLE, sf_dir)


def test_merge_rejects_null_source_keys(spark, tmp_path):
    root = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [(None, "a", 1.0)], "id BIGINT, tag STRING, v DOUBLE"
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_into(spark, root, src, "id")
