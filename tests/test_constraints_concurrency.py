"""CHECK-constraint and optimistic-concurrency pins for the versioned
lakehouse layer (f32/f33 surface): enforcement on every row-adding
verb, metadata carry across the whole lifecycle, rebase semantics for
racing appends, CAS refusal for non-commuting verbs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    ConcurrentWriteError,
    ConstraintViolationError,
    add_check_constraint,
    clone_table,
    commit_append,
    compact,
    delete_where,
    latest_version,
    merge_into,
    read_manifest,
    read_version,
    restore_table,
    table_constraints,
    update_where,
)


def _df(spark, ids, chars=100):
    return spark.createDataFrame(
        [(i, "en", chars) for i in ids],
        "doc_id long, lang string, n_chars long",
    )


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    commit_append(_df(spark, range(10)), root)
    add_check_constraint(spark, root, "chars_nonneg", "n_chars >= 0")
    return root


def test_attach_validates_existing_rows(spark, tmp_path):
    root = str(tmp_path / "bad")
    commit_append(_df(spark, range(5), chars=-3), root)
    with pytest.raises(ConstraintViolationError):
        add_check_constraint(spark, root, "chars_nonneg", "n_chars >= 0")
    assert latest_version(root) == 1, "failed attach must burn no version"


def test_attach_is_metadata_only_and_named_unique(spark, table):
    m = read_manifest(table, 2)
    assert m["added"] == [] and m["files"] == read_manifest(table, 1)["files"]
    with pytest.raises(ValueError, match="already exists"):
        add_check_constraint(spark, table, "chars_nonneg", "n_chars >= 0")


def test_append_enforcement_null_passes_false_fails(spark, table):
    # SQL CHECK: NULL passes, FALSE fails
    ok = spark.createDataFrame(
        [(100, "en", None)], "doc_id long, lang string, n_chars long"
    )
    v = commit_append(ok, table)
    assert v == 3
    with pytest.raises(ConstraintViolationError):
        commit_append(_df(spark, [200], chars=-1), table)
    assert latest_version(table) == 3, "rejection must burn no version"


def test_update_and_merge_enforcement(spark, table):
    with pytest.raises(ConstraintViolationError):
        update_where(spark, table, "doc_id = 3", {"n_chars": "-5"})
    with pytest.raises(ConstraintViolationError):
        merge_into(spark, table, _df(spark, [3], chars=-5), "doc_id")
    assert latest_version(table) == 2
    # a compliant update still flows
    update_where(spark, table, "doc_id = 3", {"n_chars": "n_chars + 1"})
    assert latest_version(table) == 3


def test_constraints_carry_through_lifecycle(spark, table, tmp_path):
    cons = table_constraints(table)
    assert cons == {"chars_nonneg": "n_chars >= 0"}
    compact(spark, table, target_files=1)
    assert table_constraints(table) == cons, "compact dropped constraints"
    delete_where(spark, table, "doc_id = 1")
    assert table_constraints(table) == cons, "delete dropped constraints"
    restore_table(table, 2)
    assert table_constraints(table) == cons, "restore dropped constraints"
    dst = str(tmp_path / "c")
    clone_table(table, dst)
    assert table_constraints(dst) == cons, "clone dropped constraints"
    with pytest.raises(ConstraintViolationError):
        commit_append(_df(spark, [300], chars=-1), dst)


def test_append_race_rebases_and_keeps_both(spark, tmp_path):
    root = str(tmp_path / "race")
    base = commit_append(_df(spark, range(5)), root, batch_id=1)
    vx = commit_append(_df(spark, range(10, 15)), root, batch_id=2)
    vy = commit_append(
        _df(spark, range(20, 25)), root, batch_id=3, _assume_parent=base
    )
    assert (base, vx, vy) == (1, 2, 3)
    got = sorted(
        r.doc_id for r in read_version(spark, root).select("doc_id").collect()
    )
    assert got == sorted([*range(5), *range(10, 15), *range(20, 25)])
    # the loser's batch id must ride its REBASED manifest atomically
    assert read_manifest(root, 3)["batches"] == [1, 2, 3]


def test_append_rebase_refuses_on_metadata_change(spark, tmp_path):
    root = str(tmp_path / "meta")
    base = commit_append(_df(spark, range(5)), root)
    # a constraint lands between Y's validation snapshot and its commit
    add_check_constraint(spark, root, "chars_nonneg", "n_chars >= 0")
    with pytest.raises(ConcurrentWriteError, match="constraints changed"):
        commit_append(_df(spark, [50]), root, _assume_parent=base)
    assert latest_version(root) == 2


def test_stale_cas_refused_for_noncommuting_verbs(spark, tmp_path):
    root = str(tmp_path / "cas")
    commit_append(_df(spark, range(5)), root)
    commit_append(_df(spark, range(10, 15)), root)
    with pytest.raises(ConcurrentWriteError):
        delete_where(spark, root, "doc_id = 1", expected_version=1)
    with pytest.raises(ConcurrentWriteError):
        merge_into(
            spark, root, _df(spark, [1]), "doc_id", expected_version=1
        )
    # the matching CAS goes through
    delete_where(spark, root, "doc_id = 1", expected_version=2)
    assert latest_version(root) == 3
