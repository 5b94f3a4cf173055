"""T27 repetition quality filters (round-10 staged): synthetic
pathological docs, the driver-style oracle compare, and the
zero-shuffle plan claim."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.operators.text import (
    T27_ORACLE,
    repetition_stats,
    t27_repetition_filter,
)
from tests.oracle_utils import compare_to_oracle


def test_repetition_pins_on_pathological_docs(spark):
    d = spark.createDataFrame(
        [
            (1, "en", "a b a b a b"),  # one bigram x3 of 5 => 0.6
            (2, "en", " ".join(f"u{i}" for i in range(30))),  # clean
            (3, "en", "q q q q q"),  # 1 distinct word of 5 => 0.2
            (4, "en", "solo"),  # <2 words: excluded
        ],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(d).collect()}
    assert sorted(rows) == [1, 2, 3]
    assert rows[1]["top_bigram_frac"] == 0.6 and rows[1]["flagged"]
    assert rows[2]["distinct_frac"] == 1.0 and not rows[2]["flagged"]
    assert rows[3]["distinct_frac"] == 0.2 and rows[3]["flagged"]
    # the run-length fold counts MULTIPLICITY, not runs in original
    # order: 'a b' occurrences are interleaved with 'b a' yet count 3
    assert rows[1]["n_words"] == 6


def test_repetition_plan_is_shuffle_free(spark, sf_dir):
    """The claim that earns the narrow formulation: no Exchange before
    the display sort — per-doc stats never leave the row."""
    df = t27_repetition_filter(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = plan.split("Sort")[-1]  # everything under the orderBy
    assert "Exchange hashpartitioning" not in body, body[:2000]


def test_t27_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        t27_repetition_filter(spark, sf_dir), T27_ORACLE, sf_dir
    )


# ---------------------------------------------------------------- T28
def test_t28_novelty_ordering_pin(spark):
    """First doc is all-novel; an exact copy later is zero-novel; a
    half-overlapping doc scores its new half."""
    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        novelty_profile,
    )
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [
            (1, "en", "a b c d e"),
            (2, "en", "a b c d e"),          # exact copy: novelty 0
            (3, "en", "c d e f g h"),        # mixes seen + new
            (4, "fr", "a b c d e"),          # other lang: independent
        ],
        "doc_id BIGINT, lang STRING, text STRING",
    )
    sh = d.select("doc_id", "lang", shingles(F.col("text"), 3).alias("sh"))
    rows = {r["doc_id"]: r.asDict() for r in novelty_profile(sh).collect()}
    assert rows[1]["novelty_frac"] == 1.0
    assert rows[2]["novelty_frac"] == 0.0
    assert 0.0 < rows[3]["novelty_frac"] < 1.0
    assert rows[4]["novelty_frac"] == 1.0  # per-lang first-seen


def test_t28_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T28_ORACLE,
        t28_novelty_profile,
    )
    from tests.oracle_utils import compare_to_oracle

    compare_to_oracle(
        t28_novelty_profile(spark, sf_dir), T28_ORACLE, sf_dir
    )
