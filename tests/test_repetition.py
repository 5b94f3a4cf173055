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


# ------------------------------------------------- hypothesis guards
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXTS = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c d ee f "),
        min_size=1,
        max_size=40,
    ).filter(lambda t: t.strip()),
    min_size=2,
    max_size=8,
)


@settings(max_examples=20, deadline=None)
@given(texts=_TEXTS)
def test_t27_oracle_replays_engine_on_arbitrary_text(spark_prop, texts):
    """t27's guard (the d3/d2b discipline): on arbitrary token soups —
    repeated bigrams, single-char words, multi-space runs — the DuckDB
    replay of bigram multiplicity, distinct fraction, and the threshold
    gate must emit exactly the engine's rows. A divergence in the
    run-length fold (the sorted-array trick), the pair window, or a
    threshold boundary shows here before the driver sees it."""
    import duckdb
    import pandas as pd

    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T27_ORACLE,
        repetition_stats,
    )

    spark = spark_prop
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )
    got = sorted(
        map(
            tuple,
            repetition_stats(spark.createDataFrame(pdf)).collect(),
        )
    )
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = sorted(map(tuple, con.execute(T27_ORACLE).fetchall()))
    finally:
        con.close()
    assert got == want


@settings(max_examples=20, deadline=None)
@given(texts=_TEXTS)
def test_t28_oracle_replays_engine_on_arbitrary_text(spark_prop, texts):
    """t28's guard: first-occurrence accounting must agree on arbitrary
    corpora — duplicated docs, shingle sets of size one, shared and
    disjoint vocabularies."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.functions.text import (
        shingles,
    )
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T28_ORACLE,
        novelty_profile,
    )

    spark = spark_prop
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    )
    sh = spark.createDataFrame(pdf).select(
        "doc_id", "lang", shingles(F.col("text"), 3).alias("sh")
    )
    got = sorted(map(tuple, novelty_profile(sh).collect()))
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = sorted(map(tuple, con.execute(T28_ORACLE).fetchall()))
    finally:
        con.close()
    assert got == want
