"""F28 shallow clone (round-10 staged): zero-copy property, fork
isolation in both directions, carried stats/schema, lifecycle safety,
and the driver-style oracle compare."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import (
    F28_ORACLE,
    f28_shallow_clone_read,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    clone_table,
    commit_append,
    delete_where,
    latest_version,
    prune_files,
    read_version,
    vacuum,
)
from tests.oracle_utils import compare_to_oracle


def _rows(spark, root, version=None):
    return sorted(map(tuple, read_version(spark, root, version).collect()))


def _data_files(root):
    return glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                     recursive=True)


def test_clone_is_zero_copy_and_content_identical(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    d = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    commit_append(d.repartition(4), src)
    v = clone_table(src, dst)
    assert v == 1
    assert _rows(spark, dst) == _rows(spark, src)
    # ZERO data files under the clone's own data dir
    assert _data_files(dst) == []


def test_clone_forks_are_isolated_both_ways(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(10).select("id"), src)
    clone_table(src, dst)
    before_src = _rows(spark, src)
    # fork-side append: invisible to the source
    commit_append(
        spark.range(100, 105).select("id"), dst
    )
    assert _rows(spark, src) == before_src
    assert len(_rows(spark, dst)) == 15
    # source-side append AFTER the clone: invisible to the fork
    commit_append(spark.range(200, 210).select("id"), src)
    assert len(_rows(spark, dst)) == 15
    # COW delete on the fork rewrites fork-local files only; the
    # source files the delete didn't touch stay referenced by name
    delete_where(spark, dst, "id >= 100")
    assert _rows(spark, dst) == before_src
    assert len(_rows(spark, src)) == 20


def test_clone_carries_stats_for_pruning(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    for b in range(8):
        commit_append(
            spark.range(b * 100, (b + 1) * 100).select("id").coalesce(1),
            src,
        )
    clone_table(src, dst)
    kept = prune_files(dst, 1, "id", 0, 99)
    assert len(kept) == 1, kept


def test_clone_vacuum_never_touches_source_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(10).select("id"), src)
    clone_table(src, dst)
    n_src_files = len(_data_files(src))
    assert n_src_files > 0
    vacuum(dst, retention_seconds=0.0)
    assert len(_data_files(src)) == n_src_files
    assert _rows(spark, dst) == _rows(spark, src)


def test_clone_guards(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    with pytest.raises(ValueError, match="empty"):
        clone_table(src, dst)
    commit_append(spark.range(3).select("id"), src)
    clone_table(src, dst)
    with pytest.raises(ValueError, match="not empty"):
        clone_table(src, dst)


def test_f28_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        f28_shallow_clone_read(spark, sf_dir), F28_ORACLE, sf_dir
    )
    # the source must be byte-identical to the fixture after the fork
    # diverged — read it back through the staged handle
    from k_means_clustering_via_map_reduce_spark.queries import _F28_STAGED

    (_, src, _dst) = next(iter(_F28_STAGED.values()))
    got = sorted(map(tuple, read_version(spark, src).collect()))
    want = sorted(
        map(
            tuple,
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang", "n_chars")
            .collect(),
        )
    )
    assert got == want
    assert latest_version(src) == 1


def test_compacting_a_clone_materializes_it_locally(spark, tmp_path):
    """OPTIMIZE on a clone rewrites the (absolute-ref) source files into
    clone-local files — the zero-copy fork's escape hatch from source
    retention: after compact, vacuum+expire on the SOURCE can no longer
    break the clone."""
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(50).select("id").repartition(4), src)
    clone_table(src, dst)
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        compact,
        expire_versions,
        read_manifest,
    )

    compact(spark, dst, target_files=1)
    man = read_manifest(dst, 2)
    assert all(not os.path.isabs(f) for f in man["files"]), man["files"]
    # the fork now survives total source destruction
    expire_versions(dst, keep_last=1)
    shutil.rmtree(src)
    assert len(_rows(spark, dst)) == 50


# ---------------------------------------------------------------- F29
def test_version_for_batch_resolution_and_guards(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        version_for_batch,
    )

    root = str(tmp_path / "t")
    commit_append(spark.range(3).select("id"), root, batch_id=100)
    commit_append(spark.range(3, 6).select("id"), root)  # no batch
    commit_append(spark.range(6, 9).select("id"), root, batch_id=200)
    assert version_for_batch(root, 100) == 1
    # the ledger is cumulative: batch 200 first appears at v3
    assert version_for_batch(root, 200) == 3
    with pytest.raises(KeyError):
        version_for_batch(root, 999)


def test_version_for_batch_raises_when_batch_predates_retention(
    spark, tmp_path
):
    """Retention expiring the INTRODUCING manifest makes the earliest
    surviving ledger match a later snapshot (it contains commits after
    the batch) — resolution must raise, never silently time-travel
    forward (round-10 ADVICE medium; Delta's TIMESTAMP AS OF errors
    the same way). A batch whose introducing manifest SURVIVES keeps
    resolving."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        expire_versions,
        version_for_batch,
    )

    root = str(tmp_path / "t")
    for i, b in enumerate((10, 20, 30, 40)):
        commit_append(
            spark.range(i * 3, i * 3 + 3).select("id"), root, batch_id=b
        )
    assert version_for_batch(root, 20) == 2
    expire_versions(root, keep_last=2)  # v1, v2 manifests gone
    # batch 30 introduced at v3; v2 expired, so v3's introduction point
    # is unconfirmable too — BOTH pre-retention batches must raise
    for b in (10, 20, 30):
        with pytest.raises(KeyError, match="retained history|carries"):
            version_for_batch(root, b)
    # batch 40's parent manifest (v3) survives: still resolvable
    assert version_for_batch(root, 40) == 4


def test_clone_read_fails_loudly_when_source_relocated(spark, tmp_path):
    """A clone references source files by absolute path (recorded under
    the manifest's external_files key); relocating the source must fail
    at PLAN time with table context, not as an opaque scan error or a
    stale-path read (round-10 ADVICE)."""
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "fork")
    commit_append(spark.range(10).select("id"), src)
    clone_table(src, dst)
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_manifest,
    )

    man = read_manifest(dst, 1)
    assert man["external_files"] == man["files"]
    shutil.move(src, str(tmp_path / "relocated"))
    with pytest.raises(FileNotFoundError, match="externally-referenced"):
        read_version(spark, dst)


def test_f29_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F29_ORACLE,
        f29_asof_batch_read,
    )

    compare_to_oracle(
        f29_asof_batch_read(spark, sf_dir), F29_ORACLE, sf_dir
    )
