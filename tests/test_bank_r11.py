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


def _sweep_events(spark, rows):
    """(user_id, us) synthetic event frame for boundary pins."""
    return spark.createDataFrame(rows, "user_id long, us long")


def test_q99_midnight_and_meeting_interval_edges(spark):
    """Deterministic boundary pins the fixture can't guarantee to hit:
    a session ending EXACTLY at midnight (its exclusive end lands on
    the day boundary and must contribute zero to the next day), one
    crossing midnight (split coverage), and two users' sessions
    meeting at the same instant (union merges them into ONE busy
    span)."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q84_GAP_US,
        Q93_DAY_US,
        q99_interval_union,
    )
    import k_means_clustering_via_map_reduce_spark.queries as Q

    day = Q93_DAY_US
    g = Q84_GAP_US
    rows = [
        # user 1: one session (events one gap-width apart, still ONE
        # session under the > g cut) ending EXACTLY at midnight — the
        # exclusive end lands on the day boundary and must contribute
        # zero to day 1
        (1, day - g),
        (1, day - 1),
        # user 2: crosses midnight: [day-5, day+5]
        (2, day - 5),
        (2, day + 5),
        # users 3 and 4 on day 2: 3's session is [2*day+100, 2*day+200+1),
        # 4's starts exactly at 3's exclusive end -> ONE merged span
        (3, 2 * day + 100),
        (3, 2 * day + 200),
        (4, 2 * day + 201),
        (4, 2 * day + 300),
    ]
    import unittest.mock as um

    ev = _sweep_events(spark, rows)
    with um.patch.object(
        Q, "load_table", lambda s, d, t: ev.selectExpr(
            "user_id",
            "timestamp_micros(us) as ts",
        )
    ):
        got = {
            r["day_idx"]: (r["covered_us"], r["n_busy_spans"])
            for r in q99_interval_union(spark, "ignored").collect()
        }
    # day 0: user1's [day-g, day) covers user2's [day-5, day) entirely
    # -> union = g microseconds, ONE span; the midnight-exact end adds
    # nothing to day 1
    assert got[0] == (g, 1)
    # day 1: user2's remainder [day, day+5+1) -> 6 us
    assert got[1] == (6, 1)
    # day 2: [100, 201) + [201, 301) meet exactly -> one span, 201 us
    assert got[2] == (201, 1)


def test_q93_peak_counts_meeting_sessions_once(spark):
    """At the meeting instant the ending session's -1 applies before
    the starting session's +1 (end-exclusive), so the peak stays 1."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q93_DAY_US,
        q93_peak_concurrency,
    )
    import k_means_clustering_via_map_reduce_spark.queries as Q
    import unittest.mock as um

    day = Q93_DAY_US
    rows = [
        (3, 2 * day + 100),
        (3, 2 * day + 200),
        (4, 2 * day + 201),  # starts exactly at 3's exclusive end
        (4, 2 * day + 300),
        (5, 2 * day + 150),  # genuine overlap with 3 -> peak 2
        (5, 2 * day + 160),
    ]
    ev = _sweep_events(spark, rows)
    with um.patch.object(
        Q, "load_table", lambda s, d, t: ev.selectExpr(
            "user_id", "timestamp_micros(us) as ts"
        )
    ):
        got = {
            r["day_idx"]: (r["peak_concurrent"], r["n_active_sessions"])
            for r in q93_peak_concurrency(spark, "ignored").collect()
        }
    assert got[2] == (2, 3)


def test_m16_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.operators.multimodal import (
        M16_ORACLE,
        m16_clipping_runs,
    )

    compare_to_oracle(m16_clipping_runs(spark, sf_dir), M16_ORACLE, sf_dir)


def test_q100_matches_oracle_driver_style(spark, sf_dir):
    from k_means_clustering_via_map_reduce_spark.queries import (
        Q100_ORACLE,
        q100_reconciliation,
    )

    compare_to_oracle(
        q100_reconciliation(spark, sf_dir), Q100_ORACLE, sf_dir
    )
