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


def test_long_doc_gets_own_overflow_sequence(spark):
    """Round-7 ADVICE: a doc LONGER than the budget lands in a bucket
    wider than the budget; the per-sequence capacity clamps to 1, so
    each such doc gets its OWN non-null overflow sequence — and the
    bucket's padding_frac goes honestly negative."""
    long_text = " ".join(["tok"] * (P10_BUDGET + 952))  # 3000 > 2048
    short_text = " ".join(["tok"] * 10)
    docs = spark.createDataFrame(
        [(1, long_text), (2, long_text), (3, short_text)],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bucketed_packing(docs).collect()}
    assert rows[1]["bucket_w"] == 4096 > P10_BUDGET
    assert rows[1]["seq_id"] is not None and rows[2]["seq_id"] is not None
    # cap clamps to one: the two overlong docs occupy DISTINCT seqs
    assert rows[1]["seq_id"] != rows[2]["seq_id"]
    assert {rows[1]["seq_id"], rows[2]["seq_id"]} == {0, 1}
    # padding accounting stays sum-consistent and goes negative
    ov = rows[1]["n_tok"] + rows[2]["n_tok"]
    assert 1.0 - ov / (2 * float(P10_BUDGET)) < 0


def test_long_doc_oracle_parity(spark):
    """The ORACLE must clamp identically (greatest(..., 1) mirrored in
    P10_ORACLE) so the driver's hash compare survives overlong docs —
    the exact latent divergence round-7 ADVICE flagged."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    long_text = " ".join(["tok"] * (P10_BUDGET + 952))
    short_text = " ".join(["tok"] * 37)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [long_text, long_text, short_text]}
    )
    got = {
        r["bucket_w"]: r["n_seqs"]
        for r in bucketed_packing(spark.createDataFrame(pdf))
        .groupBy("bucket_w")
        .agg(F.countDistinct("seq_id").alias("n_seqs"))
        .collect()
    }
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        want = {r[0]: r[1] for r in con.execute(P10_ORACLE).fetchall()}
    finally:
        con.close()
    assert got == want
    # explicit: overlong bucket 4096 shows n_seqs == 2 on BOTH engines
    assert got[4096] == 2
