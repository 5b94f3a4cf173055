"""Round-11 bank (library-first, unregistered): driver-style oracle
compares for the banked operators — registration is one decorator
away once the round-11 window clears the wave-4 overflow."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.queries import (
    Q98_ORACLE,
    Q99_ORACLE,
    q98_max_drawdown,
    q99_interval_union,
)
from tests.oracle_utils import compare_to_oracle


def test_q98_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(q98_max_drawdown(spark, sf_dir), Q98_ORACLE, sf_dir)


def test_q98_drawdown_nonnegative_and_peaks_consistent(spark, sf_dir):
    rows = q98_max_drawdown(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_drawdown_cents"] >= 0
        assert r["n_at_peak"] >= 1  # the first event is always a peak


def test_q99_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(q99_interval_union(spark, sf_dir), Q99_ORACLE, sf_dir)


def test_q99_coverage_bounded_by_day(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import Q93_DAY_US

    rows = q99_interval_union(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["covered_us"] <= Q93_DAY_US
        assert r["n_busy_spans"] >= 1


def test_f37_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        F37_ORACLE,
        f37_multi_table_txn_read,
    )

    compare_to_oracle(
        f37_multi_table_txn_read(spark, sf_dir), F37_ORACLE, sf_dir
    )


def test_k28_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.streaming.ingest import (
        K28_ORACLE,
        k28_pinned_enrich,
    )

    compare_to_oracle(k28_pinned_enrich(spark, sf_dir), K28_ORACLE, sf_dir)


def test_t33_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.text import (
        T33_ORACLE,
        t33_rake_keywords,
    )

    compare_to_oracle(t33_rake_keywords(spark, sf_dir), T33_ORACLE, sf_dir)


def test_d16_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.dedup import (
        _D16_ORACLE,
        d16_golden_records,
    )

    compare_to_oracle(d16_golden_records(spark, sf_dir), _D16_ORACLE, sf_dir)
