"""Model-based property test of the versioned-table lifecycle.

`sources/versioned.py` is the storage layer under three query entries
(f18 time travel, f20 compaction, k21 streaming ingest) — the one
subsystem where a bug is data LOSS, not a wrong aggregate. The example
tests (tests/test_sources.py, test_streaming_ingest.py) pin the known
scenarios; this test drives RANDOM interleavings of the four lifecycle
ops against a driver-side model and asserts the storage invariants no
sequence may break:

- every surviving manifest replays exactly the row multiset the model
  says that version held when it was committed (append = parent +
  batch; compact = parent content, rewritten);
- `expire_versions` removes exactly the manifests older than the
  retention window and never the latest;
- `vacuum` deletes only files no surviving manifest references —
  injected orphans (aborted commits) go, and every surviving version
  still replays bit-for-bit afterwards;
- version numbers are dense 1..N regardless of interleaving.

Each example runs real Spark writes, so sequences and example counts
stay small (the ×96 cost shape lives in
scripts/versioned_lifecycle_probe.py, not here).
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from k_means_clustering_via_map_reduce_spark.sources.versioned import (
    commit_append,
    compact,
    delete_where,
    expire_versions,
    merge_into,
    update_where,
    latest_version,
    read_manifest,
    read_version,
    vacuum,
)

# Op alphabet: ("append", batch_idx) | "compact" | ("expire", keep) |
# "vacuum" | "orphan" (simulated aborted commit: data files, no manifest).
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 4)),
        st.just("compact"),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.just("vacuum"),
        st.just("orphan"),
        # round-7 COW delete: drop every row of one batch tag
        st.tuples(st.just("delete"), st.integers(0, 4)),
        # round-7 COW update: shift every value of one batch tag
        st.tuples(st.just("update"), st.integers(0, 4)),
        # round-8 MERGE upsert: update one tag's rows + insert one new
        st.tuples(st.just("merge"), st.integers(0, 4)),
    ),
    min_size=3,
    max_size=8,
)


def _batch(spark, batch_idx: int, seq: int):
    """3 deterministic rows; (seq) makes every append's content unique
    so a duplicated or lost batch cannot cancel out in the multiset."""
    rows = [
        (seq * 10 + i, f"b{batch_idx}", float(batch_idx * 100 + i))
        for i in range(3)
    ]
    return spark.createDataFrame(rows, "id BIGINT, tag STRING, v DOUBLE")


def _snapshot(spark, root: str, version: int):
    return sorted(
        (r.id, r.tag, r.v)
        for r in read_version(spark, root, version).collect()
    )


@settings(max_examples=8, deadline=None)
@given(ops=_OPS)
def test_lifecycle_invariants_hold_under_any_interleaving(spark_prop, ops):
    spark = spark_prop
    with tempfile.TemporaryDirectory(prefix="kmce_vprop_") as root:
        # model[version] = expected sorted row list for that version
        model: dict[int, list] = {}
        seq = 0
        for op in ops:
            latest = latest_version(root)
            if op == "compact":
                if latest == 0:
                    continue
                v = compact(spark, root, target_files=1)
                model[v] = model[latest]
                assert read_manifest(root, v)["compacted_from"] == latest
            elif op == "vacuum":
                removed = vacuum(root, retention_seconds=0.0)
                # only unreferenced files may go
                live = set()
                for v in model:
                    live.update(read_manifest(root, v)["files"])
                assert not live.intersection(removed)
            elif op == "orphan":
                # aborted commit: data files land, manifest never does
                odir = os.path.join(root, "data", f"txn-99999-dead{seq}")
                os.makedirs(odir)
                with open(os.path.join(odir, "orphan.parquet"), "wb") as fh:
                    fh.write(b"not a real parquet; never read")
                seq += 1
            elif op[0] == "delete":
                if latest == 0:
                    continue
                tag = f"b{op[1]}"
                v = delete_where(spark, root, f"tag = '{tag}'")
                survivors = [
                    row for row in model[latest] if row[1] != tag
                ]
                if survivors == model[latest]:
                    # no-op contract: no new version, nothing rewritten
                    assert v == latest
                else:
                    assert v == latest + 1
                    model[v] = survivors
            elif op[0] == "update":
                if latest == 0:
                    continue
                tag = f"b{op[1]}"
                v = update_where(
                    spark, root, f"tag = '{tag}'", {"v": "v + 1000"}
                )
                touched = any(row[1] == tag for row in model[latest])
                if not touched:
                    assert v == latest
                else:
                    assert v == latest + 1
                    model[v] = sorted(
                        (i, t, val + 1000 if t == tag else val)
                        for i, t, val in model[latest]
                    )
            elif op[0] == "merge":
                if latest == 0:
                    continue
                tag = f"b{op[1]}"
                seq += 1
                new_id = 100_000 + seq
                src_rows = [
                    (i, "MRG", -1.0)
                    for i, t, _ in model[latest]
                    if t == tag
                ] + [(new_id, "NEW", float(seq))]
                src = spark.createDataFrame(
                    src_rows, "id BIGINT, tag STRING, v DOUBLE"
                )
                v = merge_into(spark, root, src, "id")
                matched = {i for i, t, _ in model[latest] if t == tag}
                assert v == latest + 1  # insert guarantees a commit
                model[v] = sorted(
                    [
                        (i, "MRG", -1.0) if i in matched else (i, t, val)
                        for i, t, val in model[latest]
                    ]
                    + [(new_id, "NEW", float(seq))]
                )
            elif op[0] == "append":
                seq += 1
                v = commit_append(_batch(spark, op[1], seq), root)
                model[v] = sorted(
                    (model.get(latest) or [])
                    + [
                        (seq * 10 + i, f"b{op[1]}", float(op[1] * 100 + i))
                        for i in range(3)
                    ]
                )
                assert v == latest + 1
            else:  # ("expire", keep)
                if latest == 0:
                    continue
                expired = expire_versions(root, keep_last=op[1])
                for v in expired:
                    assert v <= latest - 1  # latest always survives
                    model.pop(v, None)
                assert latest_version(root) == latest

        # Terminal: every surviving version replays its model content,
        # even after a final vacuum has collected everything dead.
        vacuum(root, retention_seconds=0.0)
        for v, expected in model.items():
            assert _snapshot(spark, root, v) == expected, f"version {v}"
        if model:
            assert latest_version(root) == max(model)


# ---- Ingest-ledger exactly-once under random replay interleavings -------
#
# The round-7 advisor target: commit_batch_versioned's exactly-once
# claim. The batch id now rides INSIDE the manifest (one atomic link),
# so NO interleaving of deliveries, replays, crash-orphans, compactions,
# retention runs, or vacuums may ever double-apply or drop a batch.
# Replays carry IDENTICAL content per batch id (Spark replays a batch
# from checkpointed offsets deterministically) — the model asserts the
# landed table is exactly one copy of each distinct delivered batch.

_INGEST_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("deliver"), st.integers(0, 3)),
        st.tuples(st.just("crash_before_link"), st.integers(0, 3)),
        st.just("compact"),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.just("vacuum"),
    ),
    min_size=3,
    max_size=8,
)


def _ingest_batch(spark, batch_id: int):
    """Canonical content for a batch id — identical on every replay."""
    rows = [
        (batch_id * 10 + i, f"batch{batch_id}", float(batch_id + i))
        for i in range(3)
    ]
    return spark.createDataFrame(rows, "id BIGINT, tag STRING, v DOUBLE")


@settings(max_examples=8, deadline=None)
@given(ops=_INGEST_OPS)
def test_ingest_ledger_is_exactly_once_under_any_interleaving(
    spark_prop, ops
):
    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        applied_batches,
    )
    from k_means_clustering_via_map_reduce_spark.streaming.ingest import (
        commit_batch_versioned,
    )

    spark = spark_prop
    with tempfile.TemporaryDirectory(prefix="kmce_iprop_") as root:
        delivered: set[int] = set()
        orphan_n = 0
        for op in ops:
            if op == "compact":
                if latest_version(root) == 0:
                    continue
                compact(spark, root, target_files=1)
                # the ledger must survive the file-list rewrite
                assert applied_batches(root) == delivered
            elif op == "vacuum":
                vacuum(root, retention_seconds=0.0)
            elif op[0] == "expire":
                if latest_version(root) == 0:
                    continue
                expire_versions(root, keep_last=op[1])
                # cumulative batches lists survive manifest expiry
                assert applied_batches(root) == delivered
            elif op[0] == "crash_before_link":
                # data dir lands, manifest never links; ledger unchanged
                bid = op[1]
                odir = os.path.join(
                    root, "data", f"txn-88888-crash{orphan_n}"
                )
                orphan_n += 1
                _ingest_batch(spark, bid).write.parquet(odir)
                assert applied_batches(root) == delivered
            else:  # ("deliver", bid) — original delivery or replay
                bid = op[1]
                applied = commit_batch_versioned(
                    _ingest_batch(spark, bid), bid, root
                )
                assert applied == (bid not in delivered), (
                    f"batch {bid}: applied={applied}, "
                    f"delivered={sorted(delivered)}"
                )
                delivered.add(bid)
                assert applied_batches(root) == delivered

        if delivered:
            got = sorted(
                (r.id, r.tag, r.v)
                for r in read_version(spark, root).collect()
            )
            want = sorted(
                (bid * 10 + i, f"batch{bid}", float(bid + i))
                for bid in delivered
                for i in range(3)
            )
            assert got == want, "landed table is not exactly-once"


# ---- Schema evolution under random commit interleavings -----------------
#
# The round-7 evolution layer (manifest-recorded union schema): NO
# sequence of widening commits, narrower commits, type-conflict
# attempts, and compactions may break (a) per-version schema isolation
# — every surviving version reads back exactly the union schema the
# model says existed when it was committed, (b) cell-level content —
# columns a file predates (or a narrow commit omitted) read NULL,
# everything else reads its written value, (c) the guard — a type
# change never commits and never mutates table state.

_COLS = ["c0", "c1", "c2"]

_EVO_OPS = st.lists(
    st.one_of(
        # commit carrying a chosen subset of the optional columns
        st.tuples(st.just("commit"), st.sets(st.sampled_from(_COLS))),
        # attempt to commit c0 with a conflicting type (must raise)
        st.just("conflict"),
        st.just("compact"),
    ),
    min_size=2,
    max_size=7,
)


@settings(max_examples=8, deadline=None)
@given(ops=_EVO_OPS)
def test_schema_evolution_invariants_hold_under_any_interleaving(
    spark_prop, ops
):
    from pyspark.sql import functions as F

    from k_means_clustering_via_map_reduce_spark.sources.versioned import (
        table_schema,
    )

    spark = spark_prop
    with tempfile.TemporaryDirectory(prefix="kmce_evoprop_") as root:
        # model: schema = ordered column list; rows[id] = {col: value}
        schema_model: dict[int, list[str]] = {}
        rows_model: dict[int, dict] = {}
        seq = 0
        for op in ops:
            latest = latest_version(root)
            if op == "conflict":
                if latest == 0 or "c0" not in schema_model[latest]:
                    continue
                bad = spark.createDataFrame(
                    [(999, "boom")], "id bigint, c0 string"
                )
                try:
                    commit_append(bad, root)
                    raise AssertionError("type conflict committed")
                except ValueError:
                    pass
                assert latest_version(root) == latest  # state untouched
            elif op == "compact":
                if latest == 0:
                    continue
                v = compact(spark, root, target_files=1)
                schema_model[v] = schema_model[latest]
            else:  # ("commit", cols)
                seq += 1
                cols = sorted(op[1])
                df = spark.createDataFrame(
                    [(seq,)], "id bigint"
                )
                for c in cols:
                    df = df.withColumn(c, F.lit(float(seq)))
                v = commit_append(df, root)
                base = list(schema_model.get(latest, ["id"]))
                for c in cols:
                    if c not in base:
                        base.append(c)
                schema_model[v] = base
                rows_model[seq] = {c: float(seq) for c in cols}

        # every surviving version: exact schema + exact cells
        for v, want_cols in schema_model.items():
            snap = read_version(spark, root, v)
            assert [f.name for f in snap.schema.fields] == want_cols, v
            for r in snap.collect():
                written = rows_model[r["id"]]
                for c in want_cols:
                    if c == "id":
                        continue
                    want = written.get(c)  # None if this commit lacked c
                    assert r[c] == want, (v, r["id"], c)
        # the recorded latest schema is queryable without reading data
        if schema_model:
            latest = latest_version(root)
            ts = table_schema(root)
            assert [f.name for f in ts.fields] == schema_model[latest]
