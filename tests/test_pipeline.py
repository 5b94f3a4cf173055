"""P2 curation-pipeline invariants (the value-level oracle equivalence
runs via the driver harness in test_queries_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.pipeline import (
    CURATION_QUALITY_MIN,
    curate,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table, spread


def _curated(spark, sf_dir):
    return curate(spread(load_table(spark, sf_dir, "documents")))


def test_curation_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = _curated(spark, sf_dir).cache()
    try:
        n_docs = docs.count()
        n_out = out.count()
        assert 0 < n_out < n_docs
        # Quality floor holds.
        assert out.filter(F.col("quality") < CURATION_QUALITY_MIN).count() == 0
        # No two surviving docs share exact text.
        assert out.select("text").distinct().count() == n_out
        # Split labels well-formed and both present at fixture size.
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits == {"train", "val"}
    finally:
        out.unpersist()


def test_curation_removes_near_dup_pairs(spark, sf_dir):
    """No surviving pair of docs may be near-dups of each other: the
    canonical-only rule means every jaccard>=0.5 pair among survivors
    would contradict cluster collapse."""
    from k_means_clustering_via_map_reduce_spark.functions.text import shingles
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        jaccard_pairs_capped,
    )

    out = _curated(spark, sf_dir)
    sh = out.select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    assert jaccard_pairs_capped(sh).count() == 0


def test_curation_split_is_value_deterministic(spark, sf_dir):
    a = {r["doc_id"]: r["split"] for r in _curated(spark, sf_dir).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in _curated(spark, sf_dir).repartition(7).collect()
    }
    assert a == b
