"""F35 column mapping (round-10 wave 4): metadata-only RENAME COLUMN —
zero-rewrite renames with physical-name indirection, composed with
append/evolution, COW rewrites, merge, DV deletes, compaction flush,
restore, clone, pruning, and the change feed.

Reference: the MapReduce substrate has no schema lifecycle
(SURVEY.md §2.1); this is engine surface beyond it — Delta's
column-mapping name mode, minimally.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    add_check_constraint,
    clone_table,
    column_mapping,
    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    latest_version,
    materialize_dvs,
    merge_into,
    prune_files,
    read_changes,
    read_manifest,
    read_version,
    rename_column,
    restore_table,
    table_history,
    update_where,
)


def _rows(spark, root, version=None):
    df = read_version(spark, root, version)
    return sorted(df.columns), sorted(map(tuple, df.collect()))


def _data_files(root):
    return set(
        glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                  recursive=True)
    )


def _staged(spark, root):
    df = spark.range(10).select(
        "id", (F.col("id") * 3).alias("val")
    ).repartition(2)
    return commit_append(df, root, batch_id=7)


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    before = _data_files(root)
    v = rename_column(root, "val", "amount")
    assert v == 2
    assert _data_files(root) == before
    cols, rows = _rows(spark, root)
    assert cols == ["amount", "id"]
    assert rows == sorted((i, 3 * i) for i in range(10))
    # history below the rename still speaks the old name
    cols1, rows1 = _rows(spark, root, 1)
    assert cols1 == ["id", "val"] and rows1 == rows
    assert column_mapping(root) == {"amount": "val"}


def test_append_and_evolution_after_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    commit_append(
        spark.range(10, 15).select(
            "id",
            (F.col("id") * 3).alias("amount"),
            F.lit("x").alias("tag"),  # evolution post-rename
        ),
        root,
    )
    cols, rows = _rows(spark, root)
    assert cols == ["amount", "id", "tag"]
    got = {(r[1], r[0]) for r in ((a, i) for i, a, *_ in
           ((r[1], r[0], r[2]) for r in rows))}
    df = read_version(spark, root)
    assert df.count() == 15
    assert df.filter("amount = 33").count() == 1
    # new files store the PHYSICAL spelling: a raw read of the newest
    # file must show 'val', not 'amount'
    m = read_manifest(root, latest_version(root))
    newest = [f for f in m["added"]][0]
    raw = spark.read.parquet(os.path.join(root, newest))
    assert "val" in raw.columns and "amount" not in raw.columns


def test_rename_chain_and_bad_renames(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    rename_column(root, "amount", "total")
    assert column_mapping(root) == {"total": "val"}
    cols, _ = _rows(spark, root)
    assert cols == ["id", "total"]
    with pytest.raises(ValueError, match="already exists"):
        rename_column(root, "total", "id")
    with pytest.raises(ValueError, match="no column"):
        rename_column(root, "val", "x")


def test_cow_update_delete_merge_under_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    update_where(spark, root, "amount = 9", {"amount": "amount + 100"})
    delete_where(spark, root, "amount >= 24")
    src = spark.createDataFrame([(0, -5), (40, -6)], "id long, amount long")
    merge_into(spark, root, src, "id")
    _, rows = _rows(spark, root)
    # update turns (3, 9) into (3, 109), which the delete then removes
    expect = {(i, 3 * i) for i in range(8)}
    expect.discard((0, 0))
    expect.discard((3, 9))
    expect |= {(0, -5), (40, -6)}
    assert set(rows) == expect
    # all files still speak physical 'val'
    m = read_manifest(root, latest_version(root))
    for f in m["files"]:
        raw = spark.read.parquet(os.path.join(root, f))
        assert "val" in raw.columns


def test_compact_flushes_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    before = _rows(spark, root)
    compact(spark, root, target_files=1)
    m = read_manifest(root, latest_version(root))
    assert "column_mapping" not in m
    assert _rows(spark, root) == before
    raw = spark.read.parquet(os.path.join(root, m["files"][0]))
    assert "amount" in raw.columns  # logical names on disk post-flush


def test_retired_name_collision_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    with pytest.raises(ValueError, match="retired physical"):
        commit_append(
            spark.range(3).select(
                "id",
                (F.col("id") * 3).alias("amount"),
                F.lit(1.0).alias("val"),  # reuses the retired name
            ),
            root,
        )


def test_constraint_blocks_rename_of_referenced_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    add_check_constraint(spark, root, "nonneg", "val >= 0")
    with pytest.raises(ValueError, match="references"):
        rename_column(root, "val", "amount")
    # renaming the UNreferenced column carries the constraint through
    rename_column(root, "id", "row_id")
    commit_append(
        spark.range(10, 12).select(
            F.col("id").alias("row_id"), (F.col("id") * 3).alias("val")
        ),
        root,
    )
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        commit_append(
            spark.createDataFrame([(99, -1)], "row_id long, val long"),
            root,
        )


def test_prune_files_translates_logical_names(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(100).select("id", (F.col("id") * 3).alias("val"))
    commit_append(df.repartitionByRange(4, "val"), root)
    rename_column(root, "val", "amount")
    v = latest_version(root)
    kept = prune_files(root, v, "amount", 0, 30)
    assert 0 < len(kept) < len(read_manifest(root, v)["files"])


def test_dv_delete_and_materialize_under_mapping(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    rename_column(root, "val", "amount")
    delete_where_dv(spark, root, "amount % 2 = 0")
    _, rows = _rows(spark, root)
    assert set(rows) == {(i, 3 * i) for i in range(10) if (3 * i) % 2}
    materialize_dvs(spark, root)
    m = read_manifest(root, latest_version(root))
    assert "dvs" not in m and m["column_mapping"] == {"amount": "val"}
    _, rows2 = _rows(spark, root)
    assert rows2 == rows


def test_restore_clone_history_and_change_feed(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)                      # v1
    rename_column(root, "val", "amount")      # v2
    commit_append(
        spark.range(10, 12).select(
            "id", (F.col("id") * 3).alias("amount")
        ),
        root,
    )                                         # v3
    # restore below the rename: old naming comes back
    restore_table(root, 1)                    # v4
    cols, _ = _rows(spark, root)
    assert cols == ["id", "val"]
    restore_table(root, 3)                    # v5
    cols, _ = _rows(spark, root)
    assert cols == ["amount", "id"]
    kinds = [r["kind"] for r in table_history(spark, root)
             .orderBy("version").collect()]
    assert kinds == ["append", "rename", "append", "restore", "restore"]
    # change feed across the rename: v1..v3 presented in v3's names
    ch = read_changes(spark, root, 0, 3)
    assert sorted(ch.columns) == ["amount", "id"]
    assert ch.count() == 12
    # clone carries the mapping
    dst = str(tmp_path / "c")
    clone_table(root, dst)
    ccols, crows = _rows(spark, dst)
    assert ccols == ["amount", "id"] and len(crows) == 12
