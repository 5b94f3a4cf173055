"""F25 Z-order clustering: the interleave itself, the layout's 2-D
stats-tightness claim, and the driver-style oracle compare."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.queries import (
    F25_ORACLE,
    f25_zorder_skipping_read,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    prune_files,
    read_manifest,
    z_value,
    zorder_commit,
)
from tests.oracle_utils import compare_to_oracle


def _py_z(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 513, 1023) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(rows, "x BIGINT, y BIGINT").withColumn(
        "z", z_value(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _py_z(r["x"], r["y"]), (r["x"], r["y"])


def test_z_locality_orders_quadrants(spark):
    """The defining property: all of quadrant (x<512, y<512) sorts
    before any point with both coords >= 512."""
    import itertools

    pts = list(itertools.product([0, 100, 511, 512, 900], repeat=2))
    df = spark.createDataFrame(pts, "x BIGINT, y BIGINT").withColumn(
        "z", z_value(F.col("x"), F.col("y"))
    )
    zs = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    lo = max(z for (x, y), z in zs.items() if x < 512 and y < 512)
    hi = min(z for (x, y), z in zs.items() if x >= 512 and y >= 512)
    assert lo < hi


def test_zorder_layout_gives_both_columns_pruning_power(spark, sf_dir, tmp_path):
    """On the z layout, EACH column's stats prune alone — the property
    a 1-D sort layout cannot give its non-sort column."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    root = str(tmp_path / "z")
    v = zorder_commit(d, root, "doc_id", "n_chars", n_files=16)
    n = len(read_manifest(root, v)["files"])
    assert n == 16
    by_doc = prune_files(root, v, "doc_id", 100, 299)
    by_chars = prune_files(root, v, "n_chars", 150, 299)
    assert len(by_doc) < n
    assert len(by_chars) < n
    # contrast: a doc_id-SORTED 1-D layout cannot prune on n_chars
    root1d = str(tmp_path / "lin")
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        commit_append,
    )

    v1 = commit_append(
        d.repartitionByRange(16, "doc_id").sortWithinPartitions("doc_id"),
        root1d,
    )
    by_chars_1d = prune_files(root1d, v1, "n_chars", 150, 299)
    assert len(by_chars_1d) == len(read_manifest(root1d, v1)["files"])


def test_f25_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        f25_zorder_skipping_read(spark, sf_dir), F25_ORACLE, sf_dir
    )


def test_zorder_normalizes_negative_and_offset_columns(spark, tmp_path):
    """Min-max normalization (round-8 ADVICE fix): negative values and a
    large positive minimum must land every row in a valid [0, 2^bits)
    bin, keeping the layout clustered — the old max-only form produced
    negative bins (broken interleave) for exactly these inputs."""
    d = spark.range(1024).select(
        (F.col("id") - 512).alias("x"),          # negative half-range
        (F.col("id") + 1_000_000).alias("y"),    # large positive minimum
    )
    root = str(tmp_path / "zneg")
    v = zorder_commit(d, root, "x", "y", n_files=8)
    man = read_manifest(root, v)
    assert len(man["files"]) == 8
    # every file's stats must be tight enough that a narrow probe on
    # EITHER column prunes — degenerate (single-bin) normalization
    # would leave per-file ranges spanning the whole domain
    by_x = prune_files(root, v, "x", -512, -384)
    by_y = prune_files(root, v, "y", 1_000_000, 1_000_128)
    assert len(by_x) < 8
    assert len(by_y) < 8
    # and the read-back is lossless
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_version,
    )

    assert read_version(spark, root).count() == 1024


def test_zorder_rejects_empty_and_non_numeric(spark, tmp_path):
    import pytest as _pt

    empty = spark.range(0).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    with _pt.raises(ValueError, match="empty"):
        zorder_commit(empty, str(tmp_path / "ze"), "x", "y")
    txt = spark.range(4).select(
        F.col("id").alias("x"), F.col("id").cast("string").alias("y")
    )
    with _pt.raises(TypeError, match="numeric"):
        zorder_commit(txt, str(tmp_path / "zt"), "x", "y")
