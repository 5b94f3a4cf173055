"""P11 weighted sample-without-replacement (round-9 pre-build):
sequential-Poisson ranking invariants, weight bias, cross-engine
key exactness, and the driver-style oracle pre-validation."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.operators.sampling import (
    P11_K,
    P11_ORACLE,
    P11_SALT,
    p11_weighted_sample,
    weighted_sample,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from tests.oracle_utils import compare_to_oracle


def test_sample_is_deterministic_and_partition_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    a = sorted(r["doc_id"] for r in weighted_sample(docs).collect())
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(docs.repartition(17)).collect()
    )
    assert a == b and len(a) == min(P11_K, docs.count())


def test_sample_matches_pure_python_ranking(spark, sf_dir):
    """The engine's top-K must equal a from-scratch recompute of the
    md5 draw, the division, and the (key, doc_id) cut."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    rows = [(r["doc_id"], r["n_chars"]) for r in docs.collect()]
    keyed = []
    for did, w in rows:
        u = int(
            hashlib.md5(f"{P11_SALT}{did}".encode()).hexdigest()[:13], 16
        ) * 1.0 + 1.0
        keyed.append((u / max(float(w), 1.0), did))
    want = sorted(did for _, did in sorted(keyed)[:P11_K])
    got = sorted(
        r["doc_id"] for r in weighted_sample(docs).collect()
    )
    assert got == want


def test_heavier_docs_are_overrepresented(spark, sf_dir):
    """Inclusion ~ proportional to weight: the sampled docs' mean
    n_chars must exceed the corpus mean by a clear margin."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pop = docs.agg({"n_chars": "avg"}).collect()[0][0]
    samp = (
        weighted_sample(docs).agg({"n_chars": "avg"}).collect()[0][0]
    )
    assert samp > pop * 1.05, (samp, pop)


def test_p11_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(p11_weighted_sample(spark, sf_dir), P11_ORACLE, sf_dir)
