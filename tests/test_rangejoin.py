"""Binned range join: exact-once pair semantics, inclusive bounds, bin
width invariance, and the no-cartesian plan pin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.operators.rangejoin import (
    range_join,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _frame(spark, rows, ts_col="ts"):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(microseconds=us)) for i, us in rows],
        f"id BIGINT, {ts_col} TIMESTAMP_NTZ",
    )


def test_inclusive_bounds_and_exact_once(spark):
    """Pairs on the exact window edges are kept, each qualifying pair
    appears exactly once (the right row meets the left row only in its
    own bin), and out-of-window pairs are dropped."""
    left = _frame(spark, [(1, 10_000_000)])
    right = _frame(
        spark,
        [
            (10, 9_000_000),   # 1s before: in [-1s, +2s]
            (11, 9_000_000 - 1),  # 1 us beyond lower edge: out
            (12, 12_000_000),  # exactly upper edge: in
            (13, 12_000_001),  # 1 us past upper edge: out
            (14, 10_000_000),  # equal ts: in
        ],
        ts_col="rts",
    )
    got = sorted(
        r["rid"]
        for r in range_join(
            left,
            right.select(F.col("id").alias("rid"), "rts"),
            "ts",
            "rts",
            -1_000_000,
            2_000_000,
        ).collect()
    )
    assert got == [10, 12, 14]


@pytest.mark.parametrize("bin_us", [100_000, 1_000_000, 3_000_000, 60_000_000])
def test_bin_width_does_not_change_result(spark, bin_us):
    """Any bin width yields the same pair set — width only trades left
    duplication against residual-filter work."""
    rows = [(i, i * 777_777) for i in range(40)]
    left = _frame(spark, rows)
    right = _frame(spark, rows, ts_col="rts").select(
        F.col("id").alias("rid"), "rts"
    )
    got = sorted(
        (r["id"], r["rid"])
        for r in range_join(
            left, right, "ts", "rts", -2_000_000, 2_000_000, bin_us=bin_us
        ).collect()
    )
    want = sorted(
        (a, b)
        for a, ta in rows
        for b, tb in rows
        if ta - 2_000_000 <= tb <= ta + 2_000_000
    )
    assert got == want


def test_rejects_empty_window(spark):
    df = _frame(spark, [(1, 0)])
    with pytest.raises(ValueError):
        range_join(df, df, "ts", "ts", 5, 5)


def test_q28_plan_has_no_cartesian(spark, sf_dir):
    """The binned plan must never degrade to a cartesian/nested-loop
    pair space — that is the entire point of the operator."""
    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    df = Q.QUERIES["q28_range_join_neighbors"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
