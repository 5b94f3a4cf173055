"""F30 RESTORE (round-11 staged): zero-copy rollback-as-commit —
content equality, history immutability, ledger carry, change-feed
refusal, vacuum safety, and the driver-style oracle compare."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    compact,
    delete_where,
    expire_versions,
    latest_version,
    read_changes,
    read_manifest,
    read_version,
    restore_table,
    vacuum,
    version_for_batch,
)


def _rows(spark, root, version=None):
    return sorted(map(tuple, read_version(spark, root, version).collect()))


def _data_files(root):
    return set(
        glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                  recursive=True)
    )


def _staged(spark, root):
    commit_append(spark.range(0, 5).select("id"), root, batch_id=10)
    commit_append(spark.range(5, 10).select("id"), root, batch_id=20)
    delete_where(spark, root, "id % 2 = 0")  # v3: the mistake
    return latest_version(root)


def test_restore_restores_content_zero_copy(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    before_files = _data_files(root)
    v = restore_table(root, 2)
    assert v == 4
    assert _rows(spark, root) == _rows(spark, root, 2)
    assert _rows(spark, root) == [(i,) for i in range(10)]
    # zero copy: the restore wrote NO data files
    assert _data_files(root) == before_files
    assert read_manifest(root, 4)["restored_from"] == 2
    assert read_manifest(root, 4)["added"] == []


def test_restore_keeps_history_and_later_appends_compose(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    restore_table(root, 2)
    # the rolled-back COW version is still readable (history immutable)
    assert _rows(spark, root, 3) == [(i,) for i in range(10) if i % 2]
    commit_append(spark.range(10, 12).select("id"), root, batch_id=30)
    assert _rows(spark, root) == [(i,) for i in range(12)]


def test_restore_to_head_is_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    assert restore_table(root, 3) == 3
    assert latest_version(root) == 3


def test_restore_guards(spark, tmp_path):
    root = str(tmp_path / "t")
    with pytest.raises(ValueError, match="empty"):
        restore_table(root, 1)
    _staged(spark, root)
    with pytest.raises(ValueError, match="out of range"):
        restore_table(root, 9)
    expire_versions(root, keep_last=1)
    with pytest.raises(FileNotFoundError):
        restore_table(root, 1)  # expired target must fail loudly


def test_restore_carries_ledger_not_snapshot(spark, tmp_path):
    """Batches ingested BEFORE the restore point and AFTER it both keep
    resolving to their original introducing versions — the restore is
    table history, not ledger surgery."""
    root = str(tmp_path / "t")
    _staged(spark, root)
    restore_table(root, 1)  # roll all the way back to batch 10's state
    assert version_for_batch(root, 10) == 1
    assert version_for_batch(root, 20) == 2  # still resolvable, v2 alive
    assert _rows(spark, root) == [(i,) for i in range(5)]
    # a post-restore batch lands normally
    commit_append(spark.range(100, 102).select("id"), root, batch_id=30)
    assert version_for_batch(root, 30) == 5


def test_change_feed_refuses_a_restore_version(spark, tmp_path):
    root = str(tmp_path / "t")
    commit_append(spark.range(0, 5).select("id"), root)
    commit_append(spark.range(5, 10).select("id"), root)
    restore_table(root, 1)
    with pytest.raises(ValueError, match="restore"):
        read_changes(spark, root, 0)
    # a range that stops BEFORE the restore still works
    assert read_changes(spark, root, 0, 2).count() == 10


def test_vacuum_after_restore_keeps_referenced_files(spark, tmp_path):
    """Even after retention expires the rolled-back head, the restore
    manifest pins the old files — vacuum must keep them and the read
    must keep working (the zero-copy promise under GC)."""
    root = str(tmp_path / "t")
    _staged(spark, root)
    restore_table(root, 2)
    compact(spark, root, target_files=1)  # v5 rewrites into new files
    expire_versions(root, keep_last=1)
    vacuum(root, retention_seconds=0.0)
    assert _rows(spark, root) == [(i,) for i in range(10)]


def test_f30_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F30_ORACLE,
        f30_restore_read,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(f30_restore_read(spark, sf_dir), F30_ORACLE, sf_dir)


def test_restore_composes_with_clone_external_refs(spark, tmp_path):
    """Restoring a FORK back to its clone point must carry the
    external source references (and their loud-missing check) — a
    restore that dropped the external_files key would silently lose
    the integrity guard."""
    import shutil

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        clone_table,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(10).select("id"), src)
    clone_table(src, dst)
    commit_append(spark.range(100, 105).select("id"), dst)
    restore_table(dst, 1)  # back to the clone point
    assert _rows(spark, dst) == [(i,) for i in range(10)]
    assert read_manifest(dst, 3)["external_files"]
    shutil.move(src, str(tmp_path / "gone"))
    with pytest.raises(FileNotFoundError, match="externally-referenced"):
        read_version(spark, dst)
