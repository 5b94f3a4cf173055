"""P10 whole-doc bucketed packing (round-8 pre-build): assignment
invariants, padding accounting, and the driver-style oracle
pre-validation."""

from __future__ import annotations

import math

from k_means_clustering_via_map_reduce_spark.operators.sampling import (
    P10_BUDGET,
    P10_ORACLE,
    bucketed_packing,
    p10_bucketed_packing,
)
from k_means_clustering_via_map_reduce_spark.sources import load_table
from tests.oracle_utils import compare_to_oracle


def test_every_doc_fits_its_bucket_and_sequence(spark, sf_dir):
    rows = bucketed_packing(
        load_table(spark, sf_dir, "documents")
    ).collect()
    by_seq: dict[tuple, list] = {}
    for r in rows:
        # bucket is the next power of two at or above the doc length
        assert r["bucket_w"] >= max(r["n_tok"], 1)
        assert r["bucket_w"] < 2 * max(r["n_tok"], 1) or r["n_tok"] == 0
        assert (r["bucket_w"] & (r["bucket_w"] - 1)) == 0
        by_seq.setdefault((r["bucket_w"], r["seq_id"]), []).append(r)
    for (bw, _), docs in by_seq.items():
        cap = P10_BUDGET // bw
        assert len(docs) <= cap
        # a sequence's padded size never exceeds the budget
        assert len(docs) * bw <= P10_BUDGET


def test_sequences_fill_in_doc_id_order_and_densely(spark, sf_dir):
    """Within a bucket, seq ids are dense 0..n and only the LAST
    sequence may be partial — the deterministic fill that makes the
    manifest reproducible."""
    rows = bucketed_packing(
        load_table(spark, sf_dir, "documents")
    ).collect()
    buckets: dict[int, list] = {}
    for r in rows:
        buckets.setdefault(r["bucket_w"], []).append(r)
    for bw, docs in buckets.items():
        cap = P10_BUDGET // bw
        docs.sort(key=lambda r: r["doc_id"])
        for i, r in enumerate(docs):
            assert r["seq_id"] == i // cap, (bw, r["doc_id"])


def test_padding_fraction_reconciles(spark, sf_dir):
    """padding_frac must equal 1 - sum_tokens/(n_seqs*budget) exactly
    (integer inputs, one rounding at the end)."""
    for r in p10_bucketed_packing(spark, sf_dir).collect():
        want = round(
            1.0 - r["sum_tokens"] / (r["n_seqs"] * float(P10_BUDGET)), 4
        )
        assert math.isclose(r["padding_frac"], want, abs_tol=1e-12)
        assert 0.0 <= r["padding_frac"] < 1.0


def test_partitioning_independence(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        map(tuple, bucketed_packing(docs).collect())
    )
    b = sorted(
        map(tuple, bucketed_packing(docs.repartition(13, "lang")).collect())
    )
    assert a == b


def test_p10_matches_oracle_driver_style(spark, sf_dir):
    compare_to_oracle(p10_bucketed_packing(spark, sf_dir), P10_ORACLE, sf_dir)


def test_sharded_variant_bounds_tail_waste(spark, sf_dir):
    """The hot-bucket shard lever: per (bucket, shard) the fill stays
    capacity-dense (only the shard's LAST sequence may be partial), so
    the global overhead vs unsharded packing is at most N-1 extra
    partial sequences per bucket — and assignments stay deterministic
    and globally unique."""
    N = 4
    docs = load_table(spark, sf_dir, "documents")
    rows = bucketed_packing(docs, n_shards=N).collect()
    assert len({(r["bucket_w"], r["seq_id"], r["doc_id"]) for r in rows}) == len(rows)
    by_seq: dict[tuple, int] = {}
    for r in rows:
        by_seq[(r["bucket_w"], r["seq_id"])] = (
            by_seq.get((r["bucket_w"], r["seq_id"]), 0) + 1
        )
    # capacity respected everywhere
    for (bw, _), n in by_seq.items():
        assert n <= P10_BUDGET // bw
    # ≤ N partial sequences per bucket (one tail per shard)
    from collections import defaultdict

    partial = defaultdict(int)
    for (bw, _), n in by_seq.items():
        if n < P10_BUDGET // bw:
            partial[bw] += 1
    assert all(v <= N for v in partial.values()), dict(partial)
    # vs unsharded: same docs, same buckets, bounded extra sequences
    base = bucketed_packing(docs).collect()
    base_seqs = defaultdict(set)
    shard_seqs = defaultdict(set)
    for r in base:
        base_seqs[r["bucket_w"]].add(r["seq_id"])
    for r in rows:
        shard_seqs[r["bucket_w"]].add(r["seq_id"])
    for bw in base_seqs:
        assert len(shard_seqs[bw]) - len(base_seqs[bw]) <= N - 1, bw


def test_single_shard_equals_default(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, bucketed_packing(docs).collect()))
    b = sorted(map(tuple, bucketed_packing(docs, n_shards=1).collect()))
    assert a == b
