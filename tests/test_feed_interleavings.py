"""Model-based property test: the k23 change feed composed with the
table lifecycle (the fourth interleaving harness on the versioned
table — the first three each falsified a real bug: expire idempotency,
the ingest-ledger crash window, the read(None) prune crash).

A checkpointed feed consumer interleaves with appends, OPTIMIZE,
retention, vacuum, and COW rewrites. The invariants no sequence may
break:

- EXACTLY-ONCE: after any successful drain, the sink holds precisely
  the multiset of appended rows — a compaction version in the offset
  range must be SKIPPED (its `added` files are the same rows rewritten;
  emitting them re-delivers the whole table — the bug this harness
  caught at staging time), and nothing else may be lost or duplicated.
- REPLAYABILITY: expire/vacuum behind the checkpoint never disturb the
  feed — expired manifests are all <= the consumed offset, and vacuum
  only removes files no surviving manifest references.
- LOUD FAILURE, never silent corruption: a drain that needs an expired
  manifest (retention overtook the checkpoint) or spans a COW
  delete/update version (a change an append-only feed cannot
  represent) must RAISE, not emit a best-effort batch.

Each example runs real Spark streaming queries; sequences and example
counts stay small (the x1->x8 cost shape lives in
scripts/versioned_lifecycle_probe.py --round8).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from k_means_clustering_via_map_reduce_spark.sources.python_source import (
    register_version_feed_source,
)
from k_means_clustering_via_map_reduce_spark.sources.versioned import (

# NIGHTLY TIER (r14, VERDICT r13 #7): this generated-lifecycle harness
# dominates suite wall clock; it is deselected by the default run
# (pytest.ini addopts) so the driver's verify window fits, and runs
# with `pytest -m nightly`. Coverage of operators touched in r14
# lives in the always-on tier.
pytestmark = pytest.mark.nightly

    _manifest_path,
    commit_append,
    compact,
    delete_where,
    expire_versions,
    latest_version,
    merge_into,
    read_manifest,
    vacuum,
)

# Op alphabet: ("append", batch_idx) | "compact" | ("expire", keep) |
# "vacuum" | "drain" (availableNow feed run against the shared
# checkpoint) | "delete" | "merge" (COW rewrites — poison the feed
# range; merge is the round-9 upsert verb, already lifecycle-composed
# here).
_FEED_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 4)),
        st.just("compact"),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.just("vacuum"),
        st.just("drain"),
        st.just("delete"),
        st.just("merge"),
    ),
    min_size=3,
    max_size=9,
)


def _drain(spark, root: str, sink: str, ckpt: str) -> None:
    q = (
        spark.readStream.format("kmce_version_feed")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _sink_rows(spark, sink: str) -> list:
    if not os.path.isdir(sink) or not any(
        n.endswith(".parquet") for n in os.listdir(sink)
    ):
        return []
    return sorted(
        (r.id, r.tag, r.v) for r in spark.read.parquet(sink).collect()
    )


@settings(max_examples=8, deadline=None)
@given(ops=_FEED_OPS)
def test_feed_exactly_once_under_lifecycle_interleavings(spark_prop, ops):
    spark = spark_prop
    register_version_feed_source(spark)
    with tempfile.TemporaryDirectory(prefix="kmce_feedprop_") as tmp:
        root = os.path.join(tmp, "t")
        sink = os.path.join(tmp, "sink")
        ckpt = os.path.join(tmp, "ckpt")
        # the source's schema() needs a manifest; seed one append
        seq = 0
        appended: list = []

        def append(batch_idx: int) -> None:
            nonlocal seq
            rows = [
                (seq * 10 + i, f"b{batch_idx}", float(batch_idx * 100 + i))
                for i in range(3)
            ]
            commit_append(
                spark.createDataFrame(
                    rows, "id BIGINT, tag STRING, v DOUBLE"
                ),
                root,
            )
            appended.extend(rows)
            seq += 1

        append(0)
        offset = 0  # feed's consumed version (checkpoint state)
        poisoned_at: int | None = None  # version of the first COW commit
        for op in ops:
            latest = latest_version(root)
            if op == "compact":
                compact(spark, root, target_files=1)
            elif op == "vacuum":
                vacuum(root, retention_seconds=0.0)
            elif op == "delete":
                if not appended:
                    continue
                # drop one known row; the feed must now REFUSE any
                # drain whose range includes this version
                victim = appended[0]
                delete_where(spark, root, f"id = {victim[0]}")
                if poisoned_at is None:
                    poisoned_at = latest_version(root)
            elif op == "merge":
                if not appended:
                    continue
                # upsert one known row; a COW rewrite exactly like
                # delete from the feed's point of view
                vid, _, _ = appended[0]
                merge_into(
                    spark,
                    root,
                    spark.createDataFrame(
                        [(vid, "MRG", -1.0)],
                        "id BIGINT, tag STRING, v DOUBLE",
                    ),
                    "id",
                )
                if poisoned_at is None:
                    poisoned_at = latest_version(root)
            elif op == "drain":
                needed = range(offset + 1, latest + 1)
                missing = [
                    v
                    for v in needed
                    if not os.path.exists(_manifest_path(root, v))
                ]
                crosses_cow = poisoned_at is not None and (
                    offset < poisoned_at <= latest
                )
                if missing or crosses_cow:
                    with pytest.raises(Exception) as exc:
                        _drain(spark, root, sink, ckpt)
                    msg = str(exc.value)
                    if crosses_cow and not missing:
                        assert "copy-on-write" in msg, msg
                    # the checkpoint is wedged by design; nothing
                    # further is defined for this consumer
                    return
                _drain(spark, root, sink, ckpt)
                offset = latest
                # EXACTLY-ONCE: every appended row once, nothing else —
                # compaction versions in the range contributed nothing
                assert _sink_rows(spark, sink) == sorted(appended)
            else:
                kind, arg = op
                if kind == "append":
                    append(arg)
                elif kind == "expire":
                    # retention may not overtake the checkpoint: keep
                    # at least the manifests the feed still needs (the
                    # scheduled-job contract; the overtaken case is the
                    # expected-raise branch above)
                    keep = max(arg, latest_version(root) - offset)
                    expire_versions(root, keep_last=max(keep, 1))
        # terminal drain: whatever ran, the feed lands exactly the
        # appended multiset (or refuses loudly if poisoned/overtaken)
        latest = latest_version(root)
        missing = [
            v
            for v in range(offset + 1, latest + 1)
            if not os.path.exists(_manifest_path(root, v))
        ]
        crosses_cow = poisoned_at is not None and (
            offset < poisoned_at <= latest
        )
        if missing or crosses_cow:
            with pytest.raises(Exception):
                _drain(spark, root, sink, ckpt)
            return
        _drain(spark, root, sink, ckpt)
        assert _sink_rows(spark, sink) == sorted(appended)


def test_feed_skips_compaction_versions(spark, tmp_path):
    """The deterministic regression the harness exists for: a drain
    whose range spans an OPTIMIZE must emit only the genuinely new
    rows, never the compacted rewrite of old ones."""
    register_version_feed_source(spark)
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    commit_append(
        spark.createDataFrame([(1, "a", 1.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    _drain(spark, root, sink, ckpt)
    commit_append(
        spark.createDataFrame([(2, "b", 2.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    v = compact(spark, root, target_files=1)
    assert "compacted_from" in read_manifest(root, v)
    commit_append(
        spark.createDataFrame([(3, "c", 3.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    _drain(spark, root, sink, ckpt)
    assert _sink_rows(spark, sink) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (3, "c", 3.0),
    ]


def test_feed_refuses_cow_versions(spark, tmp_path):
    """A COW delete inside the un-consumed range must fail the drain
    loudly — an append-only feed has no retraction to carry it."""
    register_version_feed_source(spark)
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    commit_append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id BIGINT, tag STRING, v DOUBLE"
        ),
        root,
    )
    delete_where(spark, root, "id = 1")
    with pytest.raises(Exception) as exc:
        _drain(spark, root, sink, ckpt)
    assert "copy-on-write" in str(exc.value)


def test_compaction_only_drain_is_clean_empty_progress(spark, tmp_path):
    """A drain whose un-consumed range holds ONLY an OPTIMIZE must emit
    an empty batch while still advancing the offset — the next drain
    resumes past the compaction, never re-planning it."""
    register_version_feed_source(spark)
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    commit_append(
        spark.createDataFrame([(1, "a", 1.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    _drain(spark, root, sink, ckpt)
    compact(spark, root, target_files=1)
    _drain(spark, root, sink, ckpt)  # compaction-only range
    commit_append(
        spark.createDataFrame([(2, "b", 2.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    _drain(spark, root, sink, ckpt)
    assert _sink_rows(spark, sink) == [(1, "a", 1.0), (2, "b", 2.0)]


def test_insert_only_merge_flows_through_the_feed(spark, tmp_path):
    """A merge that rewrote NOTHING (all source keys unmatched) is an
    append in COW clothing — the feed and the batch diff both emit its
    rows instead of refusing."""
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        read_changes,
    )

    register_version_feed_source(spark)
    root = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    commit_append(
        spark.createDataFrame([(1, "a", 1.0)], "id BIGINT, tag STRING, v DOUBLE"),
        root,
    )
    merge_into(
        spark,
        root,
        spark.createDataFrame(
            [(50, "NEW", 5.0)], "id BIGINT, tag STRING, v DOUBLE"
        ),
        "id",
    )
    assert read_manifest(root, 2)["merged_from"] == []
    _drain(spark, root, sink, ckpt)
    assert _sink_rows(spark, sink) == [(1, "a", 1.0), (50, "NEW", 5.0)]
    assert sorted(
        map(tuple, read_changes(spark, root, 1).collect())
    ) == [(50, "NEW", 5.0)]
