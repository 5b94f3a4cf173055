"""F34 deletion vectors (round-10 wave 4): merge-on-read DELETE via
(file, row-position) sidecars — reader equivalence with copy-on-write
DELETE, vector union across deletes, zero write amplification,
materialization, and composition with every other lifecycle verb
(append, COW update/delete, merge, compact, restore, clone, vacuum,
change feed, history).

Reference: the MapReduce substrate has no deletes (SURVEY.md §2.1);
this is engine surface beyond it — Delta's deletion vectors / Iceberg
positional deletes re-expressed over `_metadata.row_index`.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    ConcurrentWriteError,
    clone_table,
    commit_append,
    compact,
    delete_where,
    delete_where_dv,
    expire_versions,
    latest_version,
    materialize_dvs,
    merge_into,
    read_changes,
    read_manifest,
    read_version,
    restore_table,
    table_history,
    update_where,
    vacuum,
)


def _rows(spark, root, version=None):
    return sorted(map(tuple, read_version(spark, root, version).collect()))


def _files(root, top="data"):
    return set(
        glob.glob(os.path.join(root, top, "**", "*.parquet"), recursive=True)
    )


def _staged(spark, root, n=20, parts=4):
    df = spark.range(n).select(
        "id", (F.col("id") * 2).alias("v")
    ).repartition(parts)
    return commit_append(df, root, batch_id=10)


def test_dv_delete_matches_cow_delete_and_writes_no_data(spark, tmp_path):
    a, b = str(tmp_path / "dv"), str(tmp_path / "cow")
    _staged(spark, a)
    _staged(spark, b)
    data_before = _files(a)
    va = delete_where_dv(spark, a, "id % 3 = 0")
    vb = delete_where(spark, b, "id % 3 = 0")
    assert va == vb == 2
    assert _rows(spark, a) == _rows(spark, b)
    assert _rows(spark, a) == [
        (i, 2 * i) for i in range(20) if i % 3 != 0
    ]
    # merge-on-read: zero data files written, sidecars only
    assert _files(a) == data_before
    assert _files(a, "dv")
    m = read_manifest(a, 2)
    assert m["added"] == [] and m["dvs"] == m["dv_added"]


def test_dv_deletes_union_and_reruns_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id % 3 = 0")
    v = delete_where_dv(spark, root, "id % 5 = 0")
    assert v == 3
    assert _rows(spark, root) == [
        (i, 2 * i) for i in range(20) if i % 3 and i % 5
    ]
    assert len(read_manifest(root, 3)["dvs"]) > len(
        read_manifest(root, 2)["dvs"]
    )
    # already-deleted rows are invisible: re-running burns no version
    assert delete_where_dv(spark, root, "id % 3 = 0") == 3
    assert delete_where_dv(spark, root, "id = 999") == 3
    assert latest_version(root) == 3


def test_time_travel_below_and_above_the_dv_version(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id < 5")
    commit_append(
        spark.range(20, 25).select("id", (F.col("id") * 2).alias("v")),
        root,
        batch_id=20,
    )
    assert _rows(spark, root, 1) == [(i, 2 * i) for i in range(20)]
    assert _rows(spark, root, 2) == [(i, 2 * i) for i in range(5, 20)]
    # the append carries the vectors forward: old deletions stay
    # applied, new rows flow in
    assert _rows(spark, root, 3) == [(i, 2 * i) for i in range(5, 25)]
    assert read_manifest(root, 3)["dvs"] == read_manifest(root, 2)["dvs"]


def test_materialize_flushes_vectors_file_granularly(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id = 7")
    before = _rows(spark, root)
    m2 = read_manifest(root, 2)
    v = materialize_dvs(spark, root)
    assert v == 3
    m3 = read_manifest(root, 3)
    assert "dvs" not in m3
    assert _rows(spark, root) == before
    # file-granular: only files holding id=7 were rewritten; the rest
    # carry by name
    assert m3["dv_materialized_from"]
    assert set(m3["dv_materialized_from"]) < set(m2["files"])
    kept = set(m2["files"]) - set(m3["dv_materialized_from"])
    assert kept <= set(m3["files"])
    # time travel to the DV version still applies its vectors
    assert _rows(spark, root, 2) == before
    # a DV-free table is a materialize no-op
    assert materialize_dvs(spark, root) == 3


def test_cow_update_and_delete_never_resurrect_dv_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id % 2 = 0")
    # COW UPDATE touches every file (predicate on survivors): the
    # rewritten files must bake the DV deletions in
    update_where(spark, root, "id % 3 = 0", {"v": "v + 1000"})
    assert _rows(spark, root) == sorted(
        (i, 2 * i + (1000 if i % 3 == 0 else 0))
        for i in range(20)
        if i % 2
    )
    # and a follow-up COW delete still sees only live rows
    delete_where(spark, root, "id < 10")
    assert _rows(spark, root) == sorted(
        (i, 2 * i + (1000 if i % 3 == 0 else 0))
        for i in range(10, 20)
        if i % 2
    )


def test_merge_into_does_not_match_dv_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id = 4")
    src = spark.createDataFrame([(4, -1), (3, -2), (50, -3)], "id long, v long")
    merge_into(spark, root, src, "id")
    got = dict(_rows(spark, root))
    # id=4 was dead: the source row INSERTS fresh (not-matched branch),
    # it must not "update" a deleted row back to life with multiplicity
    assert got[4] == -1 and got[3] == -2 and got[50] == -3
    assert len(_rows(spark, root)) == 21  # 20 - 1 dead + 1 insert + 1 new


def test_compact_applies_and_clears_vectors(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id >= 15")
    before = _rows(spark, root)
    compact(spark, root, target_files=1)
    m = read_manifest(root, 3)
    assert "dvs" not in m and len(m["files"]) == 1
    assert _rows(spark, root) == before


def test_restore_carries_vectors_both_ways(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)                       # v1
    delete_where_dv(spark, root, "id < 10")    # v2
    materialize_dvs(spark, root)               # v3
    # roll back to the DV snapshot: vectors come back live
    restore_table(root, 2)                     # v4
    assert read_manifest(root, 4)["dvs"] == read_manifest(root, 2)["dvs"]
    assert _rows(spark, root) == [(i, 2 * i) for i in range(10, 20)]
    # roll back below the delete: full content, no vectors
    restore_table(root, 1)                     # v5
    assert "dvs" not in read_manifest(root, 5)
    assert _rows(spark, root) == [(i, 2 * i) for i in range(20)]


def test_clone_refuses_live_vectors_then_works_after_flush(
    spark, tmp_path
):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _staged(spark, src)
    delete_where_dv(spark, src, "id = 0")
    with pytest.raises(ValueError, match="deletion vectors"):
        clone_table(src, dst)
    materialize_dvs(spark, src)
    clone_table(src, dst)
    assert _rows(spark, dst) == [(i, 2 * i) for i in range(1, 20)]


def test_vacuum_keeps_live_sidecars_reclaims_flushed_ones(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id % 4 = 0")
    before = _rows(spark, root)
    assert vacuum(root, retention_seconds=0) == []
    assert _rows(spark, root) == before  # sidecars survived GC
    materialize_dvs(spark, root)
    expire_versions(root, keep_last=1)
    removed = vacuum(root, retention_seconds=0)
    assert any(r.startswith("dv" + os.sep) for r in removed)
    assert _files(root, "dv") == set()
    assert _rows(spark, root) == before


def test_change_feed_raises_on_dv_and_skips_materialize(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id = 1")
    with pytest.raises(ValueError, match="deletion-vector"):
        read_changes(spark, root, 1)
    materialize_dvs(spark, root)
    # a range covering ONLY the no-data-change flush is empty
    assert read_changes(spark, root, 2, 3).count() == 0


def test_history_kinds_and_cas(spark, tmp_path):
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id = 2")
    materialize_dvs(spark, root)
    kinds = {
        r["version"]: r["kind"] for r in table_history(spark, root).collect()
    }
    assert kinds == {1: "append", 2: "dv_delete", 3: "dv_materialize"}
    with pytest.raises(ConcurrentWriteError):
        delete_where_dv(spark, root, "id = 3", expected_version=2)


def test_dv_keys_are_table_relative(spark, tmp_path):
    """Relocation contract: sidecar keys for table-local files must be
    RELATIVE (they match the manifest's file spelling), so a moved
    table keeps its deletions."""
    root = str(tmp_path / "t")
    _staged(spark, root)
    delete_where_dv(spark, root, "id = 5")
    dv_rel = read_manifest(root, 2)["dvs"]
    dv = spark.read.schema("_dv_file STRING, _dv_pos BIGINT").parquet(
        *[os.path.join(root, f) for f in dv_rel]
    )
    keys = {r["_dv_file"] for r in dv.collect()}
    assert keys, "expected at least one vector row"
    for k in keys:
        assert not os.path.isabs(k)
        assert k in set(read_manifest(root, 2)["files"])


def test_dv_keys_relative_under_uri_hostile_root(spark, tmp_path):
    """Round-11 ADVICE (medium): Spark reports _metadata.file_path
    percent-encoded, so a table root containing a space, '%', '+', or
    non-ASCII must still produce table-RELATIVE keys that match the
    manifest's raw spellings — and deletes must survive a flush."""
    root = str(tmp_path / "we ird %tb+l ü")
    _staged(spark, root)
    v = delete_where_dv(spark, root, "id IN (3, 7)")
    dv_rel = read_manifest(root, v)["dvs"]
    dv = spark.read.schema("_dv_file STRING, _dv_pos BIGINT").parquet(
        *[os.path.join(root, f) for f in dv_rel]
    )
    keys = {r["_dv_file"] for r in dv.collect()}
    assert keys, "expected vector rows"
    live = set(read_manifest(root, v)["files"])
    for k in keys:
        assert not os.path.isabs(k), k
        assert "%" not in os.path.dirname(k), k
        assert k in live, k
    assert {r[0] for r in _rows(spark, root)} == set(range(20)) - {3, 7}
    v2 = materialize_dvs(spark, root)
    assert "dvs" not in read_manifest(root, v2)
    assert {r[0] for r in _rows(spark, root)} == set(range(20)) - {3, 7}


def test_materialize_refuses_alternate_spellings_of_live_files(
    spark, tmp_path
):
    """Round-11 ADVICE guard: a sidecar key that is an absolute (or
    percent-encoded absolute) spelling of a LIVE manifest file is a
    key-normalization bug, not a stale vector — materialize_dvs must
    raise instead of silently resurrecting the deleted rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from urllib.parse import quote

    root = str(tmp_path / "t")
    _staged(spark, root)
    v = delete_where_dv(spark, root, "id = 5")
    man = read_manifest(root, v)
    side = os.path.join(root, man["dvs"][0])
    tbl = pq.read_table(side)
    base = os.path.abspath(root) + os.sep
    bad = [
        quote(base, safe="/") + f for f in tbl.column("_dv_file").to_pylist()
    ]
    pq.write_table(
        pa.table(
            {"_dv_file": bad, "_dv_pos": tbl.column("_dv_pos").to_pylist()}
        ),
        side,
    )
    crc = os.path.join(
        os.path.dirname(side), "." + os.path.basename(side) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(ValueError, match="alternate"):
        materialize_dvs(spark, root)
