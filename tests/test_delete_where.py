"""F22 copy-on-write DELETE on the versioned table (round-8 pre-build):
file-granular rewrites, snapshot isolation of deleted history, no-op
discipline, and the driver-style oracle pre-validation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    delete_where,
    read_manifest,
    read_version,
)


def _commit_batches(spark, root):
    """Two commits, four files total, with 'del' rows isolated to
    known files so COW granularity is observable."""
    a = spark.createDataFrame(
        [(1, "keep"), (2, "del")], "id bigint, tag string"
    ).repartition(2, "tag")
    b = spark.createDataFrame(
        [(3, "keep"), (4, "keep")], "id bigint, tag string"
    ).coalesce(1)
    commit_append(a, root)
    commit_append(b, root)


def test_delete_removes_rows_and_only_rewrites_affected_files(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _commit_batches(spark, root)
    before = read_manifest(root, 2)["files"]
    v = delete_where(spark, root, "tag = 'del'")
    assert v == 3
    after = read_manifest(root, 3)
    # every kept file is carried BY NAME (no rewrite of clean files)
    untouched = [f for f in before if f in after["files"]]
    assert untouched, "COW must carry clean files forward unrewritten"
    assert after["deleted_from"], "affected files recorded"
    # affected files are gone from the live set
    assert not set(after["deleted_from"]) & set(after["files"])
    rows = {
        (r["id"], r["tag"]) for r in read_version(spark, root).collect()
    }
    assert rows == {(1, "keep"), (3, "keep"), (4, "keep")}


def test_history_still_shows_deleted_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit_batches(spark, root)
    delete_where(spark, root, "tag = 'del'")
    v2 = {(r["id"], r["tag"]) for r in read_version(spark, root, 2).collect()}
    assert (2, "del") in v2 and len(v2) == 4


def test_noop_delete_burns_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    _commit_batches(spark, root)
    files_before = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(root) for f in fs
    )
    assert delete_where(spark, root, "tag = 'absent'") == 2
    files_after = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(root) for f in fs
    )
    assert files_after == files_before


def test_delete_preserves_schema_and_ledger(spark, tmp_path):
    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "x")], "id bigint, tag string")
    commit_append(base, root, batch_id=7)
    commit_append(
        base.withColumn("q", F.lit(1.0)).withColumn(
            "id", F.lit(2).cast("bigint")
        ),
        root,
        batch_id=8,
    )
    delete_where(spark, root, "id = 1")
    m = read_manifest(root, 3)
    assert m["batches"] == [7, 8]  # replay protection survives deletes
    latest = read_version(spark, root)
    assert [f.name for f in latest.schema.fields] == ["id", "tag", "q"]
    assert {r["id"] for r in latest.collect()} == {2}


def test_delete_composes_with_evolution_null_semantics(spark, tmp_path):
    """Deleting on an EVOLVED column: pre-evolution rows read it as
    NULL, and 'q IS NULL' must target exactly them."""
    root = str(tmp_path / "t")
    base = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, tag string")
    commit_append(base, root)
    commit_append(
        spark.createDataFrame([(3, "z", 0.5)], "id bigint, tag string, q double"),
        root,
    )
    delete_where(spark, root, "q IS NULL")
    assert {r["id"] for r in read_version(spark, root).collect()} == {3}


def test_f22_query_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F22_ORACLE,
        f22_delete_where_read,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(f22_delete_where_read(spark, sf_dir), F22_ORACLE, sf_dir)


# ------------------------------------------------------------------
# update_where (the COW UPDATE companion)
# ------------------------------------------------------------------


def test_update_rewrites_matching_rows_only(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        update_where,
    )

    root = str(tmp_path / "t")
    _commit_batches(spark, root)
    before = read_manifest(root, 2)["files"]
    v = update_where(spark, root, "tag = 'del'", {"tag": "'redacted'"})
    assert v == 3
    after = read_manifest(root, 3)
    assert [f for f in before if f in after["files"]], "clean files carried"
    assert after["updated_from"]
    rows = {(r["id"], r["tag"]) for r in read_version(spark, root).collect()}
    assert rows == {(1, "keep"), (2, "redacted"), (3, "keep"), (4, "keep")}
    # history unchanged
    v2 = {(r["id"], r["tag"]) for r in read_version(spark, root, 2).collect()}
    assert (2, "del") in v2


def test_update_rhs_reads_the_old_row(spark, tmp_path):
    """SQL UPDATE semantics: SET a = b, b = a must SWAP — every
    right-hand side binds to the pre-update row, never to an earlier
    assignment's new value."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        update_where,
    )

    root = str(tmp_path / "t")
    commit_append(
        spark.createDataFrame([(1, 10, 20)], "id bigint, a bigint, b bigint"),
        root,
    )
    update_where(spark, root, "id = 1", {"a": "b", "b": "a"})
    r = read_version(spark, root).collect()[0]
    assert (r["a"], r["b"]) == (20, 10)


def test_update_noop_and_unknown_column_guard(spark, tmp_path):
    import pytest as _pytest

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        update_where,
    )

    root = str(tmp_path / "t")
    _commit_batches(spark, root)
    assert update_where(spark, root, "tag = 'absent'", {"tag": "'x'"}) == 2
    with _pytest.raises(ValueError, match="only SET existing columns"):
        update_where(spark, root, "tag = 'del'", {"brand_new": "1"})


# ------------------------------------------------------------------
# Manifest-stats data skipping (Delta add-action stats, minimally)
# ------------------------------------------------------------------


def test_manifest_stats_enable_file_pruning(spark, tmp_path):
    """Files whose recorded [min,max] cannot intersect the probe range
    must be skipped at the MANIFEST level — the pruning a plain parquet
    scan cannot do (Spark prunes row groups inside the files it is
    given; the manifest decides which files it is given)."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        prune_files,
        read_manifest,
    )

    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        commit_append(
            spark.createDataFrame(
                [(lo + i, f"r{lo + i}") for i in range(10)],
                "id bigint, tag string",
            ).coalesce(1),
            root,
        )
    m = read_manifest(root, 3)
    assert len(m["files"]) == 3 and m["stats"]
    hit = prune_files(root, 3, "id", 100, 105)
    assert len(hit) == 1
    # probe range covering two files keeps exactly those two
    assert len(prune_files(root, 3, "id", 95, 205)) == 2
    # string column stats prune too
    assert len(prune_files(root, 3, "tag", "r100", "r105")) < 3
    # unknown column: conservative — every file kept
    assert len(prune_files(root, 3, "absent", 0, 1)) == 3


def test_pruned_read_equals_full_read_filtered(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        prune_files,
        read_version,
    )
    import os as _os

    root = str(tmp_path / "t")
    for lo in (0, 100, 200):
        commit_append(
            spark.createDataFrame(
                [(lo + i,) for i in range(10)], "id bigint"
            ).coalesce(1),
            root,
        )
    files = prune_files(root, 3, "id", 100, 109)
    got = sorted(
        r["id"]
        for r in spark.read.parquet(
            *[_os.path.join(root, f) for f in files]
        )
        .filter("id BETWEEN 100 AND 109")
        .collect()
    )
    want = sorted(
        r["id"]
        for r in read_version(spark, root)
        .filter("id BETWEEN 100 AND 109")
        .collect()
    )
    assert got == want == list(range(100, 110))


def test_stats_survive_cow_and_compaction(spark, tmp_path):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
        compact,
        delete_where,
        prune_files,
        read_manifest,
    )

    root = str(tmp_path / "t")
    for lo in (0, 100):
        commit_append(
            spark.createDataFrame(
                [(lo + i,) for i in range(10)], "id bigint"
            ).coalesce(1),
            root,
        )
    v = delete_where(spark, root, "id = 105")
    m = read_manifest(root, v)
    # every live file carries stats (kept ones forwarded, rewritten
    # ones re-collected from their fresh footers)
    assert set(m["stats"]) == set(m["files"])
    assert len(prune_files(root, v, "id", 0, 9)) == 1
    v2 = compact(spark, root)
    m2 = read_manifest(root, v2)
    assert set(m2["stats"]) == set(m2["files"])


def test_f23_query_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F23_ORACLE,
        f23_data_skipping_read,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(f23_data_skipping_read(spark, sf_dir), F23_ORACLE, sf_dir)


def test_uri_to_local_normalizes_every_spark_form():
    """Round-7 ADVICE: input_file_name() URI forms vary by build and
    filesystem — triple-slash, single-slash, percent-encoded, and bare
    paths must all resolve to the same local path."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        _uri_to_local,
    )

    want = os.path.realpath("/tmp/kmce t/part-0.parquet")
    assert _uri_to_local("file:///tmp/kmce%20t/part-0.parquet") == want
    assert _uri_to_local("file:/tmp/kmce%20t/part-0.parquet") == want
    assert _uri_to_local("/tmp/kmce t/part-0.parquet") == want
