"""F21 schema evolution on the versioned table (round-8 pre-build):
manifest-recorded union schema, deterministic null-fill reads, loud
type-conflict guard, and snapshot isolation of old schemas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import (
    F21_ORACLE,
    f21_schema_evolution_read,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    compact,
    read_version,
    table_schema,
)
from tests.oracle_utils import compare_to_oracle


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id bigint, tag string, n bigint"
    )


def test_added_column_null_fills_old_files(spark, base, tmp_path):
    root = str(tmp_path / "t")
    commit_append(base, root)
    commit_append(
        base.withColumn("score", F.lit(0.5)).withColumn(
            "id", F.col("id") + 10
        ),
        root,
    )
    latest = read_version(spark, root)
    assert [f.name for f in latest.schema.fields] == [
        "id", "tag", "n", "score",
    ]
    rows = {r["id"]: r["score"] for r in latest.collect()}
    assert rows[1] is None and rows[2] is None
    assert rows[11] == 0.5 and rows[12] == 0.5


def test_time_travel_keeps_pre_evolution_schema(spark, base, tmp_path):
    root = str(tmp_path / "t")
    commit_append(base, root)
    commit_append(base.withColumn("score", F.lit(1.0)), root)
    v1 = read_version(spark, root, version=1)
    assert "score" not in v1.columns
    assert v1.count() == 2


def test_type_change_fails_loudly_before_writing(spark, base, tmp_path):
    root = str(tmp_path / "t")
    commit_append(base, root)
    import os

    files_before = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
    )
    with pytest.raises(ValueError, match="incompatible schema evolution"):
        commit_append(
            base.withColumn("n", F.col("n").cast("string")), root
        )
    # the guard fires at the commit POINT: no data files, no manifest
    files_after = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(root)
        for f in fs
    )
    assert files_after == files_before


def test_missing_column_in_later_commit_null_fills(spark, base, tmp_path):
    """A commit may be NARROWER than the table (a source that stopped
    sending a field): the table schema keeps the column and the new
    files read it as NULL."""
    root = str(tmp_path / "t")
    commit_append(base, root)
    commit_append(
        spark.createDataFrame([(100, "z")], "id bigint, tag string"), root
    )
    latest = read_version(spark, root)
    assert [f.name for f in latest.schema.fields] == ["id", "tag", "n"]
    assert {r["n"] for r in latest.filter("id = 100").collect()} == {None}


def test_compaction_carries_schema_forward(spark, base, tmp_path):
    root = str(tmp_path / "t")
    commit_append(base, root)
    commit_append(base.withColumn("score", F.lit(2.0)), root)
    v3 = compact(spark, root)
    assert table_schema(root, v3) == table_schema(root, 2)
    latest = read_version(spark, root)
    assert "score" in latest.columns and latest.count() == 4


def test_pre_evolution_manifest_reads_unchanged(spark, base, tmp_path):
    """Backward compatibility: a manifest without a schema record (the
    pre-round-7 format) falls back to the footer-based read."""
    import json
    import os

    root = str(tmp_path / "t")
    commit_append(base, root)
    mpath = os.path.join(root, "_manifests", "v00001.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["schema"]
    os.remove(mpath)
    with open(mpath, "w") as f:
        json.dump(m, f)
    assert table_schema(root, 1) is None
    assert read_version(spark, root).count() == 2


def test_f21_query_matches_oracle_driver_style(spark, sf_dir):
    """Pre-validate the round-8 registration end-to-end: the engine
    query against its DuckDB oracle through the driver's canonical
    compare, at the suite fixture scale."""
    compare_to_oracle(f21_schema_evolution_read(spark, sf_dir), F21_ORACLE, sf_dir)


def test_nullability_variants_are_not_type_conflicts(spark, tmp_path):
    """Nested nullability reflects how a frame was BUILT (F.array of
    literals is containsNull=false; a parquet round-trip reads back
    true) — committing the same logical type with different nullability
    must evolve cleanly, not trip the type guard."""
    root = str(tmp_path / "t")
    built = spark.createDataFrame([(1,)], "id bigint").withColumn(
        "v", F.array(F.lit(1.0), F.lit(2.0))  # containsNull=false
    )
    commit_append(built, root)
    roundtripped = read_version(spark, root).filter("id = 1")
    assert commit_append(roundtripped, root) == 2
    latest = read_version(spark, root)
    assert latest.count() == 2
    assert {tuple(r["v"]) for r in latest.collect()} == {(1.0, 2.0)}
