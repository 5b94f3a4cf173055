"""T24 exact heavy hitters via per-partition Misra-Gries + verify
(round-8 pre-build). The fixture vocabulary (31 words) is smaller than
MG_COUNTERS, so the corpus tests alone never exercise the sketch's
decrement path — the property tests here drive it on adversarial
streams where eviction is constant."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.sketch import (
    T24_ORACLE,
    _misra_gries,
    heavy_hitters,
    t24_heavy_hitters,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from tests.oracle_utils import compare_to_oracle

# ------------------------------------------------------------------
# The MG guarantee, on streams that FORCE decrements
# ------------------------------------------------------------------


@settings(max_examples=500, deadline=None)
@given(
    stream=st.lists(st.integers(0, 9), min_size=1, max_size=400),
    k=st.integers(2, 6),
)
def test_mg_keeps_every_item_above_n_over_k(stream, k):
    """Soundness: every item with freq > n/k must survive (10 distinct
    values vs k-1 ≤ 5 counters → constant eviction pressure). Also the
    lower-bound property: count ≤ freq, freq − count ≤ n/k."""
    survivors = _misra_gries(stream, k)
    exact = Counter(stream)
    n = len(stream)
    for item, freq in exact.items():
        if freq > n / k:
            assert item in survivors, (item, freq, n, k, survivors)
    for item, cnt in survivors.items():
        assert cnt <= exact[item]
        assert exact[item] - cnt <= n / k


def test_mg_decrement_evicts_singletons():
    """k=3 → 2 counters: the third distinct item decrements both and
    evicts the singleton — the classic MG step, exercised explicitly."""
    assert _misra_gries(["a", "a", "b", "c"], 3) == {"a": 1}


def test_mg_bounded_memory():
    stream = list(range(1000))  # all distinct
    assert len(_misra_gries(stream, 5)) <= 4


# ------------------------------------------------------------------
# The distributed construction
# ------------------------------------------------------------------


def _skewed_docs(spark):
    """Synthetic skewed corpus: two hot words (~30%/~15% of all tokens)
    plus a long tail of UNIQUE words per doc — with k=4 (3 counters)
    every partition constantly evicts, so the candidate sets genuinely
    depend on partitioning while the true heavy hitters do not."""
    rows = []
    for i in range(200):
        words = ["hot"] * 4 + ["warm"] * 2 + [f"u{i}_{j}" for j in range(7)]
        rows.append((i, "en", " ".join(words)))
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )


def test_verified_output_is_partitioning_independent(spark):
    """The candidate SET depends on partitioning; the verified output
    must not."""
    docs = _skewed_docs(spark)
    outs = []
    for parted in (
        docs,
        docs.repartition(17),
        docs.repartition(3, "lang"),
        docs.coalesce(1),
    ):
        outs.append(
            sorted(
                (r["token"], r["freq"])
                for r in heavy_hitters(parted, k=4).collect()
            )
        )
    assert outs[0] and all(o == outs[0] for o in outs[1:])


def test_verified_output_equals_exact_group_by(spark):
    docs = _skewed_docs(spark)
    k = 4
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    total = toks.count()
    exact = sorted(
        (r["token"], r["freq"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > total / k)
        .collect()
    )
    got = sorted(
        (r["token"], r["freq"])
        for r in heavy_hitters(docs, k=k).collect()
    )
    assert got == exact and got


def test_threshold_is_strict_and_excludes_light_tokens(spark, sf_dir):
    """With the default K the fixture's lightest tokens fall below
    n/K — the HAVING must exclude at least one, or the compare is
    vacuous (every token in = no sketch needed)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        )
        .distinct()
        .count()
    )
    kept = heavy_hitters(docs).count()
    assert 0 < kept < vocab


def test_t24_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(t24_heavy_hitters(spark, sf_dir), T24_ORACLE, sf_dir)
