"""F37 (round-11 bank): atomic multi-table transactions — all-or-
nothing visibility across tables, crash-recovery via the coordinator
CAS, slot blocking, garbage reclamation, and composition with the
single-table verbs.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    ConcurrentWriteError,
    abort_txn,
    commit_append,
    commit_multi,
    latest_version,
    read_manifest,
    read_version,
    table_history,
    vacuum,
)


def _rows(spark, root):
    return sorted(r["id"] for r in read_version(spark, root).collect())


def _seeded(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    commit_append(spark.range(0, 5).select("id"), a)
    commit_append(spark.range(100, 105).select("id"), b)
    return a, b


def test_commit_multi_is_atomic_and_both_visible(spark, tmp_path):
    a, b = _seeded(spark, tmp_path)
    got = commit_multi(
        {
            a: spark.range(5, 8).select("id"),
            b: spark.range(105, 108).select("id"),
        },
        batch_id=42,
    )
    assert got == {os.path.abspath(a): 2, os.path.abspath(b): 2}
    assert _rows(spark, a) == list(range(8))
    assert _rows(spark, b) == list(range(100, 108))
    # the shared ledger entry landed on both tables
    assert read_manifest(a, 2)["batches"] == [42]
    assert read_manifest(b, 2)["batches"] == [42]
    # both manifests carry the txn tag, both visible through history
    kinds = [r["kind"] for r in table_history(spark, a).collect()]
    assert kinds == ["append", "append"]


def test_crash_before_finalize_hides_both_and_blocks_writers(
    spark, tmp_path
):
    a, b = _seeded(spark, tmp_path)
    pend = commit_multi(
        {
            a: spark.range(5, 8).select("id"),
            b: spark.range(105, 108).select("id"),
        },
        _crash_before_finalize=True,
    )
    # NOTHING is visible on either table
    assert latest_version(a) == 1 and latest_version(b) == 1
    assert _rows(spark, a) == list(range(5))
    assert _rows(spark, b) == list(range(100, 105))
    # the pending slot blocks single-table writers LOUDLY
    with pytest.raises(ConcurrentWriteError, match="in-flight"):
        commit_append(spark.range(50, 52).select("id"), a)
    # an explicit read of the pending version refuses
    with pytest.raises(ValueError, match="uncommitted or aborted"):
        read_version(spark, a, 2)
    # recovery: abort settles the verdict, writers proceed, and the
    # aborted garbage manifest is reclaimed by the next slot claim
    txn_id = read_manifest(a, 2)["txn"]["id"]
    coordinator = read_manifest(a, 2)["txn"]["coordinator"]
    assert abort_txn(coordinator, txn_id) is True
    v = commit_append(spark.range(50, 52).select("id"), a)
    assert v == 2
    assert _rows(spark, a) == [0, 1, 2, 3, 4, 50, 51]
    # table b's garbage clears on its next writer too
    vb = commit_append(spark.range(200, 201).select("id"), b)
    assert vb == 2
    assert _rows(spark, b) == [*range(100, 105), 200]
    assert pend  # the hook returned the would-be versions


def test_abort_loses_to_committed_txn(spark, tmp_path):
    a, b = _seeded(spark, tmp_path)
    commit_multi(
        {a: spark.range(5, 6).select("id"), b: spark.range(105, 106).select("id")}
    )
    txn = read_manifest(a, 2)["txn"]
    # the txn already committed: a late recoverer must lose the CAS
    assert abort_txn(txn["coordinator"], txn["id"]) is False
    assert _rows(spark, a) == list(range(6))


def test_failed_member_aborts_whole_txn(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        add_check_constraint,
    )

    a, b = _seeded(spark, tmp_path)
    add_check_constraint(spark, b, "pos", "id < 200")
    with pytest.raises(Exception):
        commit_multi(
            {
                a: spark.range(5, 8).select("id"),
                # violates b's CHECK -> the WHOLE txn must abort
                b: spark.range(500, 503).select("id"),
            }
        )
    assert _rows(spark, a) == list(range(5))
    assert _rows(spark, b) == list(range(100, 105))
    # a's slot is free again for normal writers
    commit_append(spark.range(5, 6).select("id"), a)
    assert _rows(spark, a) == list(range(6))


def test_vacuum_keeps_pending_files_reclaims_aborted(spark, tmp_path):
    a, b = _seeded(spark, tmp_path)
    commit_multi(
        {
            a: spark.range(5, 8).select("id"),
            b: spark.range(105, 108).select("id"),
        },
        _crash_before_finalize=True,
    )
    # pending: the txn's data files are protected even at zero grace
    n_before = len(
        glob.glob(os.path.join(a, "data", "**", "*.parquet"),
                  recursive=True)
    )
    assert vacuum(a, retention_seconds=0) == []
    txn = read_manifest(a, 2)["txn"]
    abort_txn(txn["coordinator"], txn["id"])
    # aborted manifest still references them; reclaim after the next
    # writer clears the garbage slot
    commit_append(spark.range(5, 6).select("id"), a)
    removed = vacuum(a, retention_seconds=0)
    assert removed  # the aborted txn's orphaned data files
    n_after = len(
        glob.glob(os.path.join(a, "data", "**", "*.parquet"),
                  recursive=True)
    )
    assert n_after < n_before + 1
    assert _rows(spark, a) == list(range(6))


def test_committed_history_survives_coordinator_loss(spark, tmp_path):
    """The participant-local verdict mirror: deleting the COORDINATOR
    table must not darken the other participant's committed history
    (a missing coordinator otherwise reads as 'pending')."""
    import shutil

    a, b = _seeded(spark, tmp_path)
    commit_multi(
        {
            a: spark.range(5, 8).select("id"),
            b: spark.range(105, 108).select("id"),
        }
    )
    coordinator = read_manifest(b, 2)["txn"]["coordinator"]
    other = b if os.path.abspath(a) == coordinator else a
    shutil.rmtree(coordinator)
    # the surviving participant still reads its committed txn version
    rows = sorted(
        r["id"] for r in read_version(spark, other).collect()
    )
    assert len(rows) == 8 and latest_version(other) == 2


def test_restore_and_clone_refuse_pending_versions(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        clone_table,
        restore_table,
    )

    a, b = _seeded(spark, tmp_path)
    commit_multi(
        {
            a: spark.range(5, 8).select("id"),
            b: spark.range(105, 108).select("id"),
        },
        _crash_before_finalize=True,
    )
    # the pending version sits ABOVE the visible head, so restore
    # refuses it as out of range (visible latest is 1); an explicit
    # clone of the invisible manifest refuses on visibility itself
    with pytest.raises(ValueError, match="out of range|uncommitted"):
        restore_table(a, 2)
    with pytest.raises(ValueError, match="uncommitted or aborted"):
        clone_table(a, str(tmp_path / "c"), version=2)


def test_latest_version_walks_past_expired_hole_below_pending_head(
    spark, tmp_path
):
    """Round-11 ADVICE: when an expired (missing) manifest sits
    directly below an invisible pending head, latest_version must keep
    walking to the highest READABLE visible version instead of handing
    back the unreadable hole (which read_version could only throw on)."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        _manifest_path,
    )

    a, b = _seeded(spark, tmp_path)
    commit_append(spark.range(5, 7).select("id"), a)   # a at v2
    commit_append(spark.range(7, 9).select("id"), a)   # a at v3
    commit_multi(
        {a: spark.range(9, 10).select("id"),
         b: spark.range(105, 106).select("id")},
        _crash_before_finalize=True,
    )  # pending, invisible head at a:v4
    os.remove(_manifest_path(a, 3))  # simulated expired hole below it
    assert latest_version(a) == 2
    assert _rows(spark, a) == list(range(7))


def test_read_changes_refuses_pending_slot_inside_range(spark, tmp_path):
    """Round-11 ADVICE: read_changes must mirror read_version's
    visibility check inside the range walk — if an uncommitted
    multi-table slot ever lands below the resolved head (invariant
    erosion simulated here with a hand-linked v4), its 'added' files
    must not be served as committed changes."""
    import json

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        _manifest_path,
        read_changes,
    )

    a, b = _seeded(spark, tmp_path)
    commit_append(spark.range(5, 7).select("id"), a)  # a at v2
    commit_multi(
        {a: spark.range(9, 10).select("id"),
         b: spark.range(105, 106).select("id")},
        _crash_before_finalize=True,
    )  # pending invisible slot at a:v3
    with open(_manifest_path(a, 2)) as f:
        m = json.load(f)
    m["version"], m["parent"], m["added"] = 4, 3, []
    with open(_manifest_path(a, 4), "w") as f:
        json.dump(m, f)  # visible head ABOVE the pending slot
    assert latest_version(a) == 4
    with pytest.raises(ValueError, match="uncommitted or aborted"):
        read_changes(spark, a, 0, 4)
