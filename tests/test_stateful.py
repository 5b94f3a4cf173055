"""applyInPandasWithState operator: state accumulates across
micro-batches, final totals equal the batch aggregate, and the threshold
flag fires exactly once per user."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
    running_user_totals,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, value DOUBLE"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.mark.timeout(300)
def test_stateful_running_totals(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    name = f"stateful_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory(prefix="kmce_state_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        # Batch 1: u1 at 60 (below threshold), u2 at 30.
        _write_batch(
            spark,
            src,
            [(1, t0, 1, 60.0), (2, t0, 2, 30.0)],
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            running_user_totals(stream, threshold=100.0)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            # Batch 2: u1 crosses (60+50 > 100), u2 stays below.
            _write_batch(spark, src, [(3, t0, 1, 50.0), (4, t0, 2, 40.0)])
            q.processAllAvailable()
            # Batch 3: u1 already flagged — crossed must NOT re-fire.
            _write_batch(spark, src, [(5, t0, 1, 10.0)])
            q.processAllAvailable()

            rows = spark.table(name).collect()
            # Final state per user = the emission with max n_events.
            final = {}
            for r in rows:
                cur = final.get(r["user_id"])
                if cur is None or r["n_events"] > cur["n_events"]:
                    final[r["user_id"]] = r
            assert final[1]["n_events"] == 3
            assert final[1]["total_value"] == pytest.approx(120.0)
            assert final[2]["n_events"] == 2
            assert final[2]["total_value"] == pytest.approx(70.0)
            # crossed fired exactly once, for u1 only, on batch 2.
            crossings = [
                (r["user_id"], r["n_events"])
                for r in rows
                if r["crossed"]
            ]
            assert crossings == [(1, 2)]
        finally:
            q.stop()
            spark.catalog.dropTempView(name)


def test_k8b_tws_gate_is_honest(spark, sf_dir):
    """k8b (transformWithStateInPandas) self-registers ONLY where its
    protobuf state-server dependency exists. Where it does, the full
    query must run and agree with k8 (same operator on the legacy
    applyInPandasWithState API, same oracle); where it doesn't, it must
    NOT be registered (an entry that can only STREAM_FAIL would break
    the driver's zero-failure record dishonestly)."""
    from k_means_clustering_via_map_reduce_spark.queries import (
        ORACLE_SQL,
        QUERIES,
    )
    from k_means_clustering_via_map_reduce_spark.streaming.stateful import (
        stateful_totals_tws_query,
        tws_runtime_available,
    )

    if not tws_runtime_available():
        assert "k8b_stateful_totals_tws" not in QUERIES
        assert "k8b_stateful_totals_tws" not in ORACLE_SQL
        import pytest

        pytest.skip("protobuf not installed: transformWithState cannot run")
    assert "k8b_stateful_totals_tws" in QUERIES
    k8b = sorted(map(tuple, stateful_totals_tws_query(spark, sf_dir).collect()))
    k8 = sorted(
        map(tuple, QUERIES["k8_stateful_totals"](spark, sf_dir).collect())
    )
    assert k8b == k8
