"""Sampling operators: hash_split determinism + subset + fraction;
stratified sampleBy per-stratum fraction."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table


def test_hash_split_is_deterministic_and_subset(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = sorted(r["doc_id"] for r in hash_split(d, ["doc_id"], 0.2).collect())
    # Repartitioned input must produce the IDENTICAL row set.
    b = sorted(
        r["doc_id"]
        for r in hash_split(d.repartition(7), ["doc_id"], 0.2).collect()
    )
    assert a == b
    all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert set(a) <= all_ids
    # Fraction within a generous binomial tolerance.
    assert 0.1 * len(all_ids) <= len(a) <= 0.3 * len(all_ids)


def test_hash_split_complement_partitions(spark, sf_dir):
    """80/20 split: the two sides are disjoint and exhaustive — the
    train/eval-split contract."""
    d = load_table(spark, sf_dir, "documents")
    lo = {r["doc_id"] for r in hash_split(d, ["doc_id"], 0.2).collect()}
    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        hash_split as hs,
    )

    bucket = F.pmod(
        F.xxhash64(F.lit("kmce"), F.col("doc_id")), F.lit(1_000_000)
    )
    hi = {
        r["doc_id"]
        for r in d.filter(bucket >= 200_000).select("doc_id").collect()
    }
    all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert lo | hi == all_ids
    assert lo & hi == set()


def test_stratified_sample_fractions(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    fr = {lg: 0.5 for lg in langs}
    s = stratified_sample(d, "lang", fr)
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {r["lang"]: r["n"] for r in s.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lg in langs:
        assert 0.25 * tot[lg] <= got.get(lg, 0) <= 0.75 * tot[lg], lg
