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


def test_p7_temperature_flattens_lang_skew(spark, sf_dir):
    """Temperature α=0.5 must CUT the dominant language hardest:
    keep-rate ordering is the inverse of corpus-count ordering, and the
    kept mixture is strictly flatter than the input (max/min lang ratio
    shrinks toward its sqrt)."""
    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.queries import QUERIES

    d = load_table(spark, sf_dir, "documents")
    n_in = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = {
        r["lang"]: (r["n_kept"], r["permille"])
        for r in QUERIES["p7_temperature_mix"](spark, sf_dir).collect()
    }
    assert set(out) == set(n_in)
    # Keep-rate (permille) ordering inverts the count ordering.
    by_count = sorted(n_in, key=n_in.get)
    permilles = [out[lang][1] for lang in by_count]
    assert permilles == sorted(permilles, reverse=True)
    # Mixture flatter than input: max/min kept ratio < max/min input ratio.
    in_ratio = max(n_in.values()) / min(n_in.values())
    kept = {lang: out[lang][0] for lang in out}
    kept_ratio = max(kept.values()) / max(1, min(kept.values()))
    assert kept_ratio < in_ratio
    # Value-pure draw: rerun is bit-identical.
    again = {
        r["lang"]: (r["n_kept"], r["permille"])
        for r in QUERIES["p7_temperature_mix"](spark, sf_dir).collect()
    }
    assert again == out


def test_p8_decontamination_is_live_and_consistent(spark, sf_dir):
    """The fixture's planted near-dups must actually cross the split
    (n_removed > 0 somewhere — a decontamination step that never fires
    is untested), and the per-lang accounting must balance:
    train = removed + clean, eval + train = corpus."""
    import pyspark.sql.functions as F

    from k_means_clustering_via_map_reduce_spark.queries import QUERIES

    rows = QUERIES["p8_decontaminated_split"](spark, sf_dir).collect()
    assert sum(r["n_removed"] for r in rows) > 0
    for r in rows:
        assert r["n_train"] == r["n_removed"] + r["n_train_clean"]
    d = load_table(spark, sf_dir, "documents")
    totals = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for r in rows:
        assert r["n_eval"] + r["n_train"] == totals[r["lang"]]


# ---------------------------------------------------------------- P12
def test_p12_target_mix_shapes_the_output(spark, sf_dir):
    """The survivors' per-source shares must track the graded target
    (share ∝ source index + 1): the heaviest-target source keeps ~all
    its docs (it is the downsample-only bottleneck) and shares must be
    monotone-ish in the index (Bernoulli noise bounded at fixture
    scale by a loose factor-2 band)."""
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        target_mix_resample,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    share = F.substring("source", 4, 10).cast("double") + F.lit(1.0)
    out = target_mix_resample(docs, share)
    n_in = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n_out = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    total = sum(n_out.values())
    # bottleneck source (highest target share) keeps everything
    assert n_out.get("src19", 0) == n_in["src19"]
    # graded: src19's share must exceed src0's by a wide margin
    share0 = n_out.get("src0", 0) / total
    share19 = n_out["src19"] / total
    assert share19 > 4 * max(share0, 1e-9), (share0, share19)
    # downsample-only: never more docs out than in, per source
    assert all(n_out.get(s, 0) <= n_in[s] for s in n_in)


def test_p12_is_value_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        target_mix_resample,
    )
    from k_means_clustering_via_map_reduce_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    share = F.substring("source", 4, 10).cast("double") + F.lit(1.0)
    a = sorted(
        r["doc_id"]
        for r in target_mix_resample(docs, share).select("doc_id").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in target_mix_resample(
            docs.repartition(13), share
        ).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_p12_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P12_ORACLE,
        p12_target_mix_resample,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        p12_target_mix_resample(spark, sf_dir), P12_ORACLE, sf_dir
    )


# ---------------------------------------------------------------- P13
def test_p13_buckets_are_monotone_and_balanced(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P13_BUCKETS,
        p13_quality_curriculum,
    )

    rows = p13_quality_curriculum(spark, sf_dir).collect()
    assert len(rows) == P13_BUCKETS
    qs = [r["avg_quality"] for r in rows]
    assert qs == sorted(qs)  # curriculum order: easy-to-hard
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile equal depth


def test_p13_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.sampling import (
        P13_ORACLE,
        p13_quality_curriculum,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        p13_quality_curriculum(spark, sf_dir), P13_ORACLE, sf_dir
    )
