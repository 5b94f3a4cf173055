"""Sketch aggregates must land within their accuracy bounds of the exact
answers (exact = DuckDB over the same parquet)."""

from __future__ import annotations

import duckdb
import os

import k_means_clustering_via_map_reduce_spark.queries as Q

Q.load_all()


def test_sketch_stats_within_bounds(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in Q.QUERIES["t5_sketch_stats"](spark, sf_dir).collect()
    }
    exact = duckdb.sql(
        f"""
        SELECT event_type,
               count(DISTINCT user_id) AS users,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.95) AS p95
        FROM read_parquet('{os.path.join(sf_dir, "events.parquet")}')
        GROUP BY event_type
        """
    ).fetchall()
    assert len(exact) == len(got)
    for event_type, users, p50, p95 in exact:
        r = got[event_type]
        # HLL++ at rsd=0.05: allow 3 sigma plus integer slack.
        assert abs(r["approx_users"] - users) <= max(3, 0.15 * users), (
            event_type,
            r["approx_users"],
            users,
        )
        # Both sides return actual data points (GK sketch / quantile_disc)
        # but may pick neighboring ranks; allow a neighborhood scaled by
        # the distribution's spread.
        spread = abs(p95 - p50) or 1.0
        assert abs(r["approx_p50"] - p50) <= 0.1 * spread
        assert abs(r["approx_p95"] - p95) <= 0.1 * spread
