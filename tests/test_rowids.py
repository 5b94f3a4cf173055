"""F36 stable row ids (round-10 wave 4): metadata-derived dense ids —
append/rename/DV-delete stability, COW renumbering honesty, and
determinism across read layouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    compact,
    delete_where_dv,
    read_with_rowids,
    rename_column,
)


def _ids(spark, root, version=None):
    return {
        r["id"]: r["_row_id"]
        for r in read_with_rowids(spark, root, version).collect()
    }


def _staged(spark, root, lo, hi, parts=2):
    return commit_append(
        spark.range(lo, hi).select("id", (F.col("id") * 2).alias("v"))
        .repartition(parts),
        root,
    )


def test_ids_dense_at_birth_and_append_stable(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root, 0, 10)
    m1 = _ids(spark, root)
    assert sorted(m1.values()) == list(range(10))
    _staged(spark, root, 10, 15)
    m2 = _ids(spark, root)
    assert sorted(m2.values()) == list(range(15))
    # old rows keep their ids exactly
    assert all(m2[k] == v for k, v in m1.items())


def test_ids_survive_rename_and_dv_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root, 0, 12)
    before = _ids(spark, root)
    rename_column(root, "v", "val")
    delete_where_dv(spark, root, "id % 3 = 0")
    after = {
        r["id"]: r["_row_id"]
        for r in read_with_rowids(spark, root).collect()
    }
    assert set(after) == {i for i in range(12) if i % 3}
    # survivors keep their pre-delete ids (gaps appear, no shifting)
    assert all(before[k] == v for k, v in after.items())
    cols = read_with_rowids(spark, root).columns
    assert "val" in cols and "v" not in cols


def test_compact_renumbers_as_documented(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root, 0, 10, parts=3)
    compact(spark, root, target_files=1)
    m = _ids(spark, root)
    assert sorted(m.values()) == list(range(10))  # dense again


def test_ids_layout_independent(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root, 0, 50, parts=5)
    a = _ids(spark, root)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force a different split layout: ids must not move
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        b = _ids(spark, root)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert a == b
