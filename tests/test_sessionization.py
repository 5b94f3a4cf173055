"""Q84 sessionization + Q85 cohort retention (round-11 staged):
gap-boundary exactness, tie safety, cross-user isolation, and the
driver-style oracle compares."""

from __future__ import annotations

from k_means_clustering_via_map_reduce_spark.queries import (
    Q84_GAP_US,
    Q84_ORACLE,
    Q85_ORACLE,
    q84_sessionization,
    q85_cohort_retention,
    sessionize,
)
from tests.oracle_utils import compare_to_oracle


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id BIGINT, us BIGINT")


def _sessions(spark, rows):
    return {
        (r["user_id"], r["sid"]): (r["n_events"], r["dur"])
        for r in sessionize(_events(spark, rows)).collect()
    }


def test_gap_boundary_is_strict(spark):
    """A silence of EXACTLY the gap stays one session (> cuts, >= would
    split); one microsecond more splits."""
    base = 1_000_000_000
    same = _sessions(
        spark, [(1, base), (1, base + Q84_GAP_US)]
    )
    assert same == {(1, 1): (2, Q84_GAP_US)}
    split = _sessions(
        spark, [(1, base), (1, base + Q84_GAP_US + 1)]
    )
    assert split == {(1, 1): (1, 0), (1, 2): (1, 0)}


def test_sessions_are_per_user(spark):
    base = 1_000_000_000
    got = _sessions(
        spark,
        [(1, base), (2, base + 1), (1, base + 2), (2, base + 3)],
    )
    assert got == {(1, 1): (2, 2), (2, 1): (2, 2)}


def test_tied_timestamps_share_a_session(spark):
    base = 1_000_000_000
    got = _sessions(
        spark,
        [(1, base), (1, base), (1, base + Q84_GAP_US + 1)],
    )
    assert got == {(1, 1): (2, 0), (1, 2): (1, 0)}


def test_multi_session_history(spark):
    base = 1_000_000_000
    step = Q84_GAP_US + 100  # inter-session silence = step - 10 > gap
    rows = [(1, base + i * step + j) for i in range(3) for j in (0, 10)]
    got = _sessions(spark, rows)
    assert got == {(1, s): (2, 10) for s in (1, 2, 3)}


def test_q84_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(q84_sessionization(spark, sf_dir), Q84_ORACLE, sf_dir)


def test_q85_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(
        q85_cohort_retention(spark, sf_dir), Q85_ORACLE, sf_dir
    )


def test_q85_offsets_anchor_to_first_week(spark, sf_dir):
    rows = {
        (r["cohort_wk"], r["week_offset"]): r["n_active"]
        for r in q85_cohort_retention(spark, sf_dir).collect()
    }
    assert rows
    # offset 0 exists for every cohort (a user is active in their own
    # first week by definition) and offsets are never negative
    cohorts = {c for c, _ in rows}
    assert all((c, 0) in rows for c in cohorts)
    assert all(off >= 0 for _, off in rows)
