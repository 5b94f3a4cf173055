"""K21 streaming-ingest tests: the foreachBatch → versioned-table commit
loop (streaming/ingest.py). The oracle harness (test_queries_oracle)
already proves the terminal aggregate; here — the lifecycle claims the
docstring makes:

- one immutable VERSION per micro-batch, each time-travelable after the
  stream finishes (version N = prefix of the first N batches);
- restart idempotency: a second run over the same checkpoint applies
  nothing (the availableNow trigger + ledger absorb the replay);
- crash-window idempotency: a manual foreachBatch replay of an
  already-applied batch id is a no-op — the batch id rides INSIDE the
  manifest (cumulative ``batches`` list, the Delta txn-action idiom),
  so the ledger record and the commit are one atomic link and no crash
  order can double-apply a batch (the round-6 separate-marker design
  had a link-before-marker window that let a replay add one duplicate
  version; the round-7 advisor flagged it and this suite now pins the
  duplicate as PREVENTED, not healed);
- a crash after the data write but before the manifest link leaves only
  orphan files no reader sees, and the replay commits cleanly.

The reference has no streaming or storage lifecycle (one static CSV,
master.py:12-266); this is engine-only surface.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    applied_batches,
    latest_version,
    read_manifest,
    read_version,
)
from k_means_clustering_via_map_reduce_spark.streaming.ingest import (
    _stage_ingest_feed,
    commit_batch_versioned,
    run_versioned_ingest,
)


@pytest.fixture(scope="module")
def ingested(spark, sf_dir):
    """Run the three-batch ingest once; share the table + checkpoint."""
    src = _stage_ingest_feed(spark, sf_dir)
    tmp = tempfile.TemporaryDirectory(prefix="kmce_ingest_test_")
    root = os.path.join(tmp.name, "table")
    ckpt = os.path.join(tmp.name, "ckpt")
    run_versioned_ingest(spark, src, root, ckpt)
    yield {"src": src, "root": root, "ckpt": ckpt}
    tmp.cleanup()


@pytest.mark.timeout(300)
def test_one_version_per_microbatch(spark, sf_dir, ingested):
    """maxFilesPerTrigger=1 over 3 staged files → versions 1..3, and
    version N is exactly the union of source slices 0..N-1 (mtime
    order), i.e. every historical prefix stays readable."""
    root = ingested["root"]
    assert latest_version(root) == 3
    slices = sorted(
        os.path.join(ingested["src"], f) for f in os.listdir(ingested["src"])
    )
    for v in range(1, 4):
        got = sorted(
            r.event_id
            for r in read_version(spark, root, v).select("event_id").collect()
        )
        want = sorted(
            r.event_id
            for r in spark.read.parquet(*slices[:v]).select("event_id").collect()
        )
        assert got == want, f"version {v} is not the first-{v}-batch prefix"


@pytest.mark.timeout(300)
def test_restart_applies_nothing(spark, ingested):
    """Re-running the drained stream over the same checkpoint must not
    add versions or ledger entries (offsets recovered, no batch rerun)."""
    root, ckpt = ingested["root"], ingested["ckpt"]
    before_v = latest_version(root)
    before_ledger = applied_batches(root)
    run_versioned_ingest(spark, ingested["src"], root, ckpt)
    assert latest_version(root) == before_v
    assert applied_batches(root) == before_ledger


@pytest.mark.timeout(300)
def test_replayed_batch_is_noop(spark, ingested):
    """foreachBatch redelivery of an applied batch id must skip: no new
    version, ledger unchanged. With the in-manifest ledger this holds
    for EVERY crash order — the only states a crash can leave are
    (committed, ledgered) atomically together, or neither."""
    root = ingested["root"]
    before_v = latest_version(root)
    assert applied_batches(root) == {0, 1, 2}
    df = read_version(spark, root, 1)
    assert commit_batch_versioned(df, 0, root) is False
    assert latest_version(root) == before_v


@pytest.mark.timeout(300)
def test_replay_after_commit_is_prevented_not_healed(spark, ingested):
    """The round-6 dangerous order (manifest linked, separate marker
    never written) cannot exist anymore: the manifest IS the marker.
    Redelivering a committed batch's data is a pure no-op — zero
    duplicate versions, zero duplicate rows (the old design admitted
    one bounded duplicate version here)."""
    root = ingested["root"]
    slices = sorted(
        os.path.join(ingested["src"], f) for f in os.listdir(ingested["src"])
    )
    batch2 = spark.read.parquet(slices[2])
    before_v = latest_version(root)
    n_before = read_version(spark, root).count()
    assert commit_batch_versioned(batch2, 2, root) is False
    assert latest_version(root) == before_v
    assert read_version(spark, root).count() == n_before
    # the ledger lives in the manifest: latest manifest names all three
    assert set(read_manifest(root, before_v)["batches"]) == {0, 1, 2}


@pytest.mark.timeout(300)
def test_crash_before_link_replay_commits_cleanly(spark, ingested, tmp_path):
    """The other crash order: data files written, manifest link never
    happened. The orphans are invisible to readers; the replay's fresh
    commit applies the batch exactly once."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        vacuum,
    )

    root = str(tmp_path / "crash_table")
    src = ingested["src"]
    slices = sorted(os.path.join(src, f) for f in os.listdir(src))
    commit_batch_versioned(spark.read.parquet(slices[0]), 0, root)
    # simulate: batch 1's data landed but the process died pre-link —
    # write the data dir by hand, exactly like commit_append's first half
    orphan_dir = os.path.join(root, "data", "txn-00002-deadbeef0000")
    spark.read.parquet(slices[1]).write.parquet(orphan_dir)
    assert latest_version(root) == 1  # reader sees only version 1
    # replay of batch 1 commits cleanly (ledger has no record of it)
    assert commit_batch_versioned(spark.read.parquet(slices[1]), 1, root)
    assert latest_version(root) == 2
    want = spark.read.parquet(*slices[:2]).count()
    assert read_version(spark, root).count() == want
    # vacuum (grace window elapsed) reclaims exactly the orphan files
    old = 10_000
    for n in os.listdir(orphan_dir):
        os.utime(os.path.join(orphan_dir, n), (old, old))
    os.utime(orphan_dir, (old, old))
    removed = vacuum(root)
    assert removed and all("deadbeef0000" in r for r in removed)
    assert read_version(spark, root).count() == want


@pytest.mark.timeout(300)
def test_applied_count_matches_event_total(spark, sf_dir, ingested):
    """End-to-end conservation on the UNTOUCHED prefix: version 3 (the
    stream's own terminal commit, before the crash-sim test above) holds
    every source event exactly once."""
    root = ingested["root"]
    src_total = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).count()
    v3 = read_version(spark, root, 3)
    assert v3.count() == src_total
    assert (
        v3.select(F.countDistinct("event_id").alias("n")).collect()[0].n
        == src_total
    )


# ---- K22: stream-stream join chained into the versioned sink ----------

import datetime as _dt

from pyspark.sql import functions as _F

from k_means_clustering_via_map_reduce_spark.streaming.ingest import (
    run_joined_versioned_ingest,
)


def _stage_pair_feed(spark, root, side: str) -> str:
    """Three mtime-ordered slices per side + a terminal far-future tick
    (sentinel user, never joins) that flushes the join watermark."""
    t0 = _dt.datetime(2024, 1, 1, 0, 0)
    rows_per_slice = 40
    src = os.path.join(root, side)
    os.makedirs(src)
    tick_user = -1 if side == "views" else -2
    for i in range(3):
        rows = []
        for j in range(rows_per_slice):
            k = i * rows_per_slice + j
            ts = t0 + _dt.timedelta(
                seconds=60 * k + (30 if side == "clicks" else 0)
            )
            rows.append((1000 * (2 if side == "clicks" else 1) + k,
                         ts, k % 10))
        if i == 2:  # terminal tick, far future
            rows.append((9999, t0 + _dt.timedelta(hours=12), tick_user))
        df = spark.createDataFrame(
            rows, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT"
        ).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id"
        ).coalesce(1)
        stage = os.path.join(root, f"stage_{side}_{i}")
        df.write.parquet(stage)
        part = next(f for f in os.listdir(stage) if f.startswith("part-"))
        dst = os.path.join(src, f"{i}-slice.parquet")
        os.rename(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + 60 * i,) * 2)
    return src


def _batch_join(spark, vsrc, csrc):
    v = spark.read.parquet(vsrc).alias("v")
    c = spark.read.parquet(csrc).alias("c")
    return (
        v.join(
            c,
            _F.expr(
                "v.user_id = c.user_id AND c.ts > v.ts "
                "AND c.ts <= v.ts + INTERVAL 5 MINUTES"
            ),
        )
        .select(
            _F.col("v.event_id").alias("view_id"),
            _F.col("c.event_id").alias("click_id"),
        )
        .collect()
    )


@pytest.mark.timeout(300)
def test_k22_joined_ingest_lands_full_finalized_join(spark, tmp_path):
    vsrc = _stage_pair_feed(spark, str(tmp_path), "views")
    csrc = _stage_pair_feed(spark, str(tmp_path), "clicks")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    run_joined_versioned_ingest(spark, vsrc, csrc, root, ckpt)
    got = sorted(
        (r.view_id, r.click_id)
        for r in read_version(spark, root).collect()
    )
    want = sorted((r.view_id, r.click_id) for r in _batch_join(
        spark, vsrc, csrc))
    assert want, "fixture must produce a non-empty join"
    assert got == want  # ticks flushed everything; no pair lost or dup'd
    assert latest_version(root) >= 1
    # restart over the same checkpoint applies nothing
    before = latest_version(root)
    run_joined_versioned_ingest(spark, vsrc, csrc, root, ckpt)
    assert latest_version(root) == before


@pytest.mark.timeout(300)
def test_k22_every_version_is_a_prefix_of_the_final_join(spark, tmp_path):
    """Versions are append-only prefixes: each version's pair set is a
    subset of the next and of the finalized batch join (no retraction,
    no speculative emission of un-finalized pairs)."""
    vsrc = _stage_pair_feed(spark, str(tmp_path), "views")
    csrc = _stage_pair_feed(spark, str(tmp_path), "clicks")
    root = str(tmp_path / "table")
    run_joined_versioned_ingest(
        spark, vsrc, csrc, root, str(tmp_path / "ckpt")
    )
    want = set(
        (r.view_id, r.click_id) for r in _batch_join(spark, vsrc, csrc)
    )
    prev: set = set()
    for ver in range(1, latest_version(root) + 1):
        cur = set(
            (r.view_id, r.click_id)
            for r in read_version(spark, root, ver).collect()
        )
        assert prev.issubset(cur)
        assert cur.issubset(want)
        prev = cur
    assert prev == want


# TIME-ORDERED staging (stage_events_side_timesliced) now lives in
# streaming/ingest.py — the registered k22 entry and this test share it.
from k_means_clustering_via_map_reduce_spark.streaming.ingest import (  # noqa: E402
    stage_events_side_timesliced as _stage_events_side_timesliced,
)


@pytest.mark.timeout(600)
def test_k22_registered_form_matches_duckdb_oracle(spark, sf_dir, tmp_path):
    """The exact shape the registered k22 entry runs:
    events views/clicks as time-ordered feeds → watermarked 24h interval
    join → versioned commits → per-user aggregate of the landed table,
    compared to the DuckDB batch-join oracle through the driver-style
    canonical compare."""
    from tests.oracle_utils import compare_to_oracle

    vsrc = _stage_events_side_timesliced(spark, sf_dir, str(tmp_path), "view")
    csrc = _stage_events_side_timesliced(
        spark, sf_dir, str(tmp_path), "click"
    )
    root = str(tmp_path / "table")
    run_joined_versioned_ingest(
        spark, vsrc, csrc, root, str(tmp_path / "ckpt"),
        window_sql="INTERVAL 24 HOUR",
    )
    agg = (
        read_version(spark, root)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("view_id").alias("first_view"),
            F.max("click_id").alias("last_click"),
        )
        .orderBy("user_id")
    )
    import k_means_clustering_via_map_reduce_spark.queries as Q

    Q.load_all()
    compare_to_oracle(
        agg, Q.ORACLE_SQL["k22_joined_versioned_ingest"], sf_dir
    )
